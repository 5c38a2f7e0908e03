"""Co-located bucketed join: the write_bucketed/bucketed_cojoin pair
must produce a sort-merge join with NO Exchange on either side — the
whole point of paying the bucketed write."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.relational import (
    bucketed_cojoin,
    write_bucketed,
)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_cojoin_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "tbj_left", ["k"], 8, str(tmp_path / "l"))
    write_bucketed(right, "tbj_right", ["k"], 8, str(tmp_path / "r"))
    try:
        out = bucketed_cojoin(spark, "tbj_left", "tbj_right", ["k"])
        plan = _physical_plan(out)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it is still a correct join
        got = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("a") + F.col("b")).alias("s"),
        ).collect()[0]
        assert got.n == 5_000
        assert got.s == sum(i * 2 + i * 3 for i in range(5_000))
    finally:
        spark.sql("DROP TABLE IF EXISTS tbj_left")
        spark.sql("DROP TABLE IF EXISTS tbj_right")


def test_bucketed_cojoin_sorted_buckets_skip_sort(spark, tmp_path):
    """SORTED BY buckets written as one file per bucket let the SMJ read
    pre-sorted input: no Sort node above the scans either."""
    left = spark.range(0, 2_000).repartition(1).select(
        F.col("id").alias("k"), F.lit(1).alias("a")
    )
    right = spark.range(0, 2_000).repartition(1).select(
        F.col("id").alias("k"), F.lit(2).alias("b")
    )
    write_bucketed(left, "tbs_left", ["k"], 4, str(tmp_path / "l"))
    write_bucketed(right, "tbs_right", ["k"], 4, str(tmp_path / "r"))
    try:
        out = bucketed_cojoin(spark, "tbs_left", "tbs_right", ["k"])
        plan = _physical_plan(out)
        assert "Exchange" not in plan, plan
        assert out.count() == 2_000
    finally:
        spark.sql("DROP TABLE IF EXISTS tbs_left")
        spark.sql("DROP TABLE IF EXISTS tbs_right")
