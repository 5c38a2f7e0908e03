"""Bidirectional Spark DataType <-> SQL type-string mapper.

Re-expresses the reference's one-way mapper
(`src/utils/spark/type_utils.py:32-76`, `TypeUtils.datatype_to_str`) with the
nested-type recursion actually working: in the reference, the array/map/struct
branches call a nonexistent ``SparkUtils.cast_pyspark_type_to_athena_iceberg_type``
(`type_utils.py:63,66-67,72`), so any nested column raised ``NameError``.
Here nesting recurses, and the mapping round-trips (str -> DataType too, which
the reference needed for casting against catalog type strings,
`spark_utils.py:238-242`).
"""

from __future__ import annotations

from pyspark.sql import types as T

_SIMPLE: dict[type, str] = {
    T.StringType: "string",
    T.IntegerType: "int",
    T.LongType: "bigint",
    T.ShortType: "smallint",
    T.ByteType: "tinyint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp_ntz",
    T.DateType: "date",
    T.BinaryType: "binary",
}


def datatype_to_str(dt: T.DataType) -> str:
    """Spark DataType -> canonical SQL type string (reference type_utils.py:32-76)."""
    for cls, name in _SIMPLE.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"array<{datatype_to_str(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{datatype_to_str(dt.keyType)}, {datatype_to_str(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name}: {datatype_to_str(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    raise ValueError(f"Unsupported Spark data type: {dt}")


_BY_NAME: dict[str, T.DataType] = {
    **{name: cls() for cls, name in _SIMPLE.items()},
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "bool": T.BooleanType(),
    "varchar": T.StringType(),
}


def _split_top(s: str, sep: str = ",") -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def str_to_datatype(type_str: str) -> T.DataType:
    """SQL type string -> Spark DataType (inverse direction the reference
    lacked). Pure Python — no SparkContext needed, so manifest/catalog
    schema strings parse on the driver before any session exists."""
    s = type_str.strip()
    low = s.lower()
    if low in _BY_NAME:
        return _BY_NAME[low]
    if low.startswith("decimal"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        p, sc = (int(x) for x in inner.split(","))
        return T.DecimalType(p, sc)
    if low.startswith("array<") and s.endswith(">"):
        return T.ArrayType(str_to_datatype(s[6:-1]))
    if low.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return T.MapType(str_to_datatype(k), str_to_datatype(v))
    if low.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top(s[7:-1]):
            if not part.strip():
                continue
            name, _, ftype = part.partition(":")
            fields.append(
                T.StructField(name.strip(), str_to_datatype(ftype.strip()))
            )
        return T.StructType(fields)
    raise ValueError(f"cannot parse type string: {type_str!r}")


def schema_to_dict(schema: T.StructType) -> dict[str, str]:
    """StructType -> {column: type-string}, the shape the reference built for
    its writer's dtype override map (`src/jobs/job.py:117-121`)."""
    return {f.name: datatype_to_str(f.dataType) for f in schema.fields}
