"""Incremental materialized rollup maintenance (operators/rollup.py):
delta-driven refresh equals from-scratch recompute across the whole DML
surface, with the crash-consistency guard and validation paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.rollup import refresh_rollup
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def _expected(src):
    return {
        (r.k,): (r.n, r.s)
        for r in src.read()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _got(dst):
    return {
        (r.k,): (r.n_rows, r.sum_v) for r in dst.read().collect()
    }


def test_rollup_tracks_source_through_dml(spark, catalog):
    catalog.create_namespace("db")
    src = catalog.table("db", "src")
    dst = catalog.table("db", "roll")
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    src.create(df.schema)
    src.append(df)
    refresh_rollup(src, dst, ["k"], ["v"])
    assert _got(dst) == _expected(src)
    # append-only delta
    src.append(
        spark.range(100, 150).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("v")
        )
    )
    refresh_rollup(src, dst, ["k"], ["v"])
    assert _got(dst) == _expected(src)
    # delete shrinks groups
    src.delete_where("v % 3 = 0")
    refresh_rollup(src, dst, ["k"], ["v"])
    assert _got(dst) == _expected(src)
    # update = D + I through diff()
    src.update_where("k = 2", {"v": "v + 1000"})
    refresh_rollup(src, dst, ["k"], ["v"])
    assert _got(dst) == _expected(src)
    # a group emptied entirely disappears from the rollup
    src.delete_where("k = 5")
    refresh_rollup(src, dst, ["k"], ["v"])
    got = _got(dst)
    assert got == _expected(src) and (5,) not in got
    # no-op refresh: source unmoved -> same rollup version
    v1 = dst._load().version
    assert refresh_rollup(src, dst, ["k"], ["v"]) == v1


def test_rollup_refresh_cost_is_delta_keyed(spark, catalog):
    """The IVM contract: a refresh after one small append merges a
    delta aggregate, it does not re-aggregate the source (checked
    structurally: the delta frame diff() produces holds only the new
    batch's rows)."""
    catalog.create_namespace("db")
    src = catalog.table("db", "srcd")
    df = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    src.create(df.schema)
    src.append(df)
    v0 = src._load().version
    src.append(
        spark.createDataFrame([(1, 7)], "k LONG, v LONG")
    )
    d = src.diff(v0)
    assert d.count() == 1  # the delta sees one row, not 1001


def test_rollup_out_of_sync_guard_and_rebuild(spark, catalog):
    catalog.create_namespace("db")
    src = catalog.table("db", "srcg")
    dst = catalog.table("db", "rollg")
    df = spark.range(20).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    src.create(df.schema)
    src.append(df)
    refresh_rollup(src, dst, ["k"], ["v"])
    # a foreign write to the rollup breaks the bookmark pairing
    dst.append(
        spark.createDataFrame(
            [(99, 1, 1)], "k LONG, n_rows LONG, sum_v LONG"
        )
    )
    src.append(spark.createDataFrame([(0, 5)], "k LONG, v LONG"))
    with pytest.raises(RuntimeError, match="out of sync"):
        refresh_rollup(src, dst, ["k"], ["v"])
    # rebuild adopts the table again
    refresh_rollup(src, dst, ["k"], ["v"], full_refresh=True)
    assert _got(dst) == _expected(src)
    refresh_rollup(src, dst, ["k"], ["v"])  # incremental works again


def test_rollup_validation(spark, catalog):
    catalog.create_namespace("db")
    src = catalog.table("db", "srcv")
    dst = catalog.table("db", "rollv")
    src.create(
        spark.createDataFrame([(1, 1)], "k LONG, v LONG").schema
    )
    src.append(spark.createDataFrame([(1, 1)], "k LONG, v LONG"))
    with pytest.raises(ValueError, match="group column"):
        refresh_rollup(src, dst, [], ["v"])
    refresh_rollup(src, dst, ["k"], ["v"])
    # NULL group keys refuse loudly instead of duplicating groups
    src.append(
        spark.createDataFrame(
            [(None, 9)], "k LONG, v LONG"
        )
    )
    with pytest.raises(Exception, match="NULL group key"):
        refresh_rollup(src, dst, ["k"], ["v"])
    # adopting a non-rollup table needs an explicit full_refresh
    plain = catalog.table("db", "plain")
    plain.create(dst._load().schema)
    plain.append(dst.read())
    plain.unset_property("rollup.source_version")
    with pytest.raises(ValueError, match="not a rollup"):
        refresh_rollup(src, plain, ["k"], ["v"])


def test_rollup_via_sql_call(spark, catalog):
    catalog.create_namespace("db")
    src = catalog.table("db", "csrc")
    df = spark.range(50).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    )
    src.create(df.schema)
    src.append(df)
    catalog.sql(
        "CALL lake.system.refresh_rollup('db.csrc', "
        "target => 'db.cdst', group_by => 'k', sum => 'v')"
    )
    dst = catalog.table("db", "cdst")
    assert _got(dst) == _expected(src)
    src.delete_where("v >= 40")
    catalog.sql(
        "CALL lake.system.refresh_rollup('db.csrc', "
        "target => 'db.cdst', group_by => 'k', sum => 'v')"
    )
    assert _got(dst) == _expected(src)
    with pytest.raises(ValueError, match="group_by"):
        catalog.sql(
            "CALL lake.system.refresh_rollup('db.csrc', "
            "target => 'db.cdst')"
        )


def test_metadata_only_source_commit_skips_rollup_rewrite(spark, catalog):
    catalog.create_namespace("db")
    src = catalog.table("db", "msrc")
    dst = catalog.table("db", "mdst")
    df = spark.range(30).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    src.create(df.schema)
    src.append(df)
    refresh_rollup(src, dst, ["k"], ["v"])
    v_before = dst._load().version
    # metadata-only source commits: rename + rename-back moves the
    # version without changing a row
    src.rename_column("v", "val")
    src.rename_column("val", "v")
    v = refresh_rollup(src, dst, ["k"], ["v"])
    assert v == v_before  # bookmark advanced, rollup untouched
    assert _got(dst) == _expected(src)
    # and the NEXT real change still refreshes incrementally
    src.append(spark.createDataFrame([(0, 100)], "k LONG, v LONG"))
    refresh_rollup(src, dst, ["k"], ["v"])
    assert _got(dst) == _expected(src)
