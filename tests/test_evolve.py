"""Schema-evolution operator tests, in the reference's literal-DF style
(`tests/unit/test_spark_utils.py:45-77` is the model: tiny DF, exact
collect() assertions), extended with the negative cases the reference lacked.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from spark_iceberg_schema_evolution_spark.operators import evolve


def test_align_schema_adds_typed_nulls(spark):
    df = spark.createDataFrame([("1", "John"), ("2", "Jane")], ["id", "name"])
    target = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.IntegerType()),
        ]
    )
    out = evolve.align_schema(df, target)
    assert out.columns == ["id", "name", "age"]
    assert dict(out.dtypes)["age"] == "int"
    rows = sorted(out.collect(), key=lambda r: r.id)
    assert [tuple(r) for r in rows] == [("1", "John", None), ("2", "Jane", None)]


def test_align_schema_casts_and_keeps_extras(spark):
    df = spark.createDataFrame([("1", "x", True)], ["id", "name", "extra"])
    target = T.StructType([T.StructField("id", T.LongType())])
    out = evolve.align_schema(df, target)
    assert out.columns == ["id", "name", "extra"]
    assert dict(out.dtypes)["id"] == "bigint"
    assert out.collect()[0].id == 1


def test_align_schema_bad_cast_yields_null(spark):
    # legacy-cast semantics under ANSI: failure -> NULL, not error
    df = spark.createDataFrame([("not-a-number",)], ["v"])
    target = T.StructType([T.StructField("v", T.IntegerType())])
    assert evolve.align_schema(df, target).collect()[0].v is None


def test_compare_schemas():
    a = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("x", T.StringType()),
        ]
    )
    b = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("y", T.StringType()),
        ]
    )
    d = evolve.compare_schemas(a, b)
    assert d.missing_in_left == {"y"}
    assert d.missing_in_right == {"x"}
    assert set(d.type_conflicts) == {"id"}
    assert not d.compatible
    assert evolve.compare_schemas(a, a).identical


def test_normalize_names_and_collision(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["Customer Id", "First-Name", "Zip (Code)"])
    out = evolve.normalize_names(df)
    assert out.columns == ["customer_id", "first_name", "zip_code"]

    df2 = spark.createDataFrame([(1, 2)], ["A B", "a_b"])
    with pytest.raises(ValueError, match="collision"):
        evolve.normalize_names(df2)


def test_with_ingest_ts_first_column(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    out = evolve.with_ingest_ts(df, ts)
    assert out.columns == ["created_at", "x"]
    assert out.collect()[0].created_at == ts


def test_fill_defaults(spark):
    df = spark.createDataFrame(
        [(None, None, None, None)],
        T.StructType(
            [
                T.StructField("s", T.StringType()),
                T.StructField("b", T.BooleanType()),
                T.StructField("i", T.LongType()),
                T.StructField("d", T.DoubleType()),
            ]
        ),
    )
    r = evolve.fill_defaults(df).collect()[0]
    assert (r.s, r.b, r.i, r.d) == ("Unknown", False, 0, None)


def test_union_evolving_first_file_wins(spark):
    df1 = spark.createDataFrame([(1, "a")], ["id", "x"])
    df2 = spark.createDataFrame([("2", 5.0)], ["id", "y"])  # id string -> cast to long
    out = evolve.union_evolving([df1, df2])
    assert set(out.columns) == {"id", "x", "y"}
    assert dict(out.dtypes)["id"] == "bigint"
    rows = {r.id: r for r in out.collect()}
    assert rows[1].x == "a" and rows[1].y is None
    assert rows[2].x is None and rows[2].y == 5.0


def test_coerce_to_types(spark):
    df = spark.createDataFrame([("1", "2.5")], ["a", "b"])
    out = evolve.coerce_to_types(
        df, {"a": T.IntegerType(), "b": T.DoubleType()}
    )
    assert dict(out.dtypes) == {"a": "int", "b": "double"}
    assert tuple(out.collect()[0]) == (1, 2.5)
