"""COPY INTO idempotent incremental file ingestion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.sources.copy_into import copy_into
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def _write_parquet(spark, path, lo, hi):
    spark.range(lo, hi).toDF("id").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_copy_into_exactly_once_and_incremental(spark, catalog, tmp_path):
    src = tmp_path / "landing"
    _write_parquet(spark, str(src / "f1"), 0, 10)
    r1 = copy_into(catalog, "db", "land", str(src))
    assert r1["loaded_files"] >= 1
    t = catalog.table("db", "land")
    assert t.read().count() == 10
    # rerun with nothing new: no commit, nothing loaded
    v = t._load().version
    r2 = copy_into(catalog, "db", "land", str(src))
    assert r2["loaded_files"] == 0 and t._load().version == v
    assert t.read().count() == 10
    # a new file lands: only it ingests
    _write_parquet(spark, str(src / "f2"), 10, 25)
    r3 = copy_into(catalog, "db", "land", str(src))
    assert r3["loaded_files"] >= 1
    assert {r.id for r in t.read().collect()} == set(range(25))
    # an in-place rewrite of f1's content re-ingests that file
    import time

    time.sleep(0.01)
    _write_parquet(spark, str(src / "f1"), 100, 105)
    copy_into(catalog, "db", "land", str(src))
    ids = [r.id for r in t.read().collect()]
    assert set(range(10, 25)) <= set(ids)
    assert set(range(100, 105)) <= set(ids)


def test_copy_into_csv_with_evolution(spark, catalog, tmp_path):
    src = tmp_path / "csvs"
    src.mkdir()
    (src / "a.csv").write_text("id,x\n1,a\n2,b\n")
    copy_into(catalog, "db", "ev", str(src), fmt="csv")
    (src / "b.csv").write_text("id,x,y\n3,c,1.5\n")
    copy_into(catalog, "db", "ev", str(src), fmt="csv")
    out = catalog.table("db", "ev").read()
    assert out.count() == 3
    assert "y" in out.columns  # schema evolved on the second load
    assert out.where(F.col("y").isNotNull()).count() == 1
    with pytest.raises(ValueError, match="format"):
        copy_into(catalog, "db", "ev", str(src), fmt="orc2")
