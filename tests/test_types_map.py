"""types_map round-trip tests — including the nested types the reference's
mapper crashed on (type_utils.py:63-72 called a nonexistent method)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spark_iceberg_schema_evolution_spark import types_map


CASES = [
    (T.StringType(), "string"),
    (T.IntegerType(), "int"),
    (T.LongType(), "bigint"),
    (T.FloatType(), "float"),
    (T.DoubleType(), "double"),
    (T.BooleanType(), "boolean"),
    (T.TimestampType(), "timestamp"),
    (T.DateType(), "date"),
    (T.BinaryType(), "binary"),
    (T.DecimalType(12, 2), "decimal(12, 2)"),
    (T.ArrayType(T.IntegerType()), "array<int>"),
    (T.MapType(T.StringType(), T.DoubleType()), "map<string, double>"),
]


@pytest.mark.parametrize("dt,s", CASES)
def test_datatype_to_str(dt, s):
    assert types_map.datatype_to_str(dt) == s


@pytest.mark.parametrize("dt,s", CASES)
def test_round_trip(dt, s):
    assert types_map.str_to_datatype(types_map.datatype_to_str(dt)) == dt


def test_nested_struct_recurses():
    dt = T.StructType(
        [
            T.StructField("a", T.ArrayType(T.StructType([
                T.StructField("b", T.MapType(T.StringType(), T.LongType()))
            ]))),
        ]
    )
    s = types_map.datatype_to_str(dt)
    assert s == "struct<a: array<struct<b: map<string, bigint>>>>"


def test_unsupported_raises():
    with pytest.raises(ValueError):
        types_map.datatype_to_str(T.NullType())


def test_schema_to_dict():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    assert types_map.schema_to_dict(schema) == {
        "id": "bigint",
        "tags": "array<string>",
    }
