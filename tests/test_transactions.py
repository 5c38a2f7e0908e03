"""Multi-table transaction gates: atomicity, read-your-writes, abort,
conflict rollback, crash recovery (roll forward + roll back)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.tables import (
    LakehouseCatalog,
    LakehouseTable,
    TransactionAborted,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("x")
    )


def test_txn_two_table_atomic_commit(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    with cat.transaction() as txn:
        txn.write_evolving(_df(spark, 0, 10), "db", "a")
        txn.write_evolving(_df(spark, 10, 30), "db", "b")
        # nothing published while the txn is open
        assert not cat.table("db", "a").exists()
        assert not cat.table("db", "b").exists()
    assert cat.table("db", "a").read().count() == 10
    assert cat.table("db", "b").read().count() == 20
    assert not os.listdir(str(tmp_path / "wh" / "_txns"))


def test_txn_read_your_writes_and_chaining(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    with cat.transaction() as txn:
        txn.write_evolving(_df(spark, 0, 10), "db", "a")
        t = txn.table("db", "a")
        # staged state is visible to the txn's own handle
        assert t.read().count() == 10
        t.delete_where("id < 3")
        assert t.read().count() == 7
    t = cat.table("db", "a")
    assert t.read().count() == 7
    # the chain published as two snapshots with linked parents
    h = sorted(t.history(), key=lambda r: r["version"])
    # create (v0) + append (v1) + delete (v2), parents chained
    assert [r["version"] for r in h] == [0, 1, 2]
    assert [r["parent"] for r in h] == [None, 0, 1]


def test_txn_exception_aborts_everything(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.write_evolving(_df(spark, 0, 5), "db", "a")
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.table("db", "a").append(_df(spark, 5, 9))
            txn.write_evolving(_df(spark, 0, 3), "db", "b")
            raise RuntimeError("boom")
    assert cat.table("db", "a").read().count() == 5
    assert not cat.table("db", "b").exists()


def test_txn_conflict_rolls_back_published_tables(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.write_evolving(_df(spark, 0, 5), "db", "a")
    cat.write_evolving(_df(spark, 0, 5), "db", "b")
    txn = cat.transaction()
    txn.table("db", "a").append(_df(spark, 100, 104))
    txn.table("db", "b").append(_df(spark, 100, 106))
    # a foreign writer claims b's next version before we publish
    # (metadata-only commit: version claim without a batch write)
    cat.table("db", "b").rename_column("x", "y")
    with pytest.raises(TransactionAborted):
        txn.commit()
    # a was published first, then rolled back: still 5 rows, and only
    # the pre-txn versions (create + seed append)
    a = cat.table("db", "a")
    assert a.read().count() == 5
    assert len(a._versions()) == 2
    # b kept ONLY the foreign commit
    b = cat.table("db", "b")
    assert b.read().count() == 5
    assert "y" in b.read().columns
    # journal cleaned up
    assert not os.listdir(str(tmp_path / "wh" / "_txns"))
    # and a can still take normal commits afterwards
    a.append(_df(spark, 300, 302))
    assert a.read().count() == 7


def _interrupted_commit(spark, tmp_path, monkeypatch):
    """Run a two-table txn whose publish phase crashes after the first
    manifest — journal stays on disk, table a published, b missing."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.write_evolving(_df(spark, 0, 5), "db", "a")
    cat.write_evolving(_df(spark, 0, 5), "db", "b")
    txn = cat.transaction()
    txn.table("db", "a").append(_df(spark, 100, 104))
    txn.table("db", "b").append(_df(spark, 100, 106))
    real = LakehouseTable._publish_manifest
    calls = {"n": 0}

    def crashing(self, version, payload):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated crash mid-publish")
        return real(self, version, payload)

    monkeypatch.setattr(LakehouseTable, "_publish_manifest", crashing)
    with pytest.raises(KeyboardInterrupt):
        txn.commit()
    monkeypatch.setattr(LakehouseTable, "_publish_manifest", real)
    assert len(os.listdir(str(tmp_path / "wh" / "_txns"))) == 1
    return cat


def test_txn_crash_recovery_rolls_forward(spark, tmp_path, monkeypatch):
    cat = _interrupted_commit(spark, tmp_path, monkeypatch)
    report = cat.recover_transactions()
    assert report == {"rolled_forward": 1, "rolled_back": 0}
    assert cat.table("db", "a").read().count() == 9
    assert cat.table("db", "b").read().count() == 11
    assert not os.listdir(str(tmp_path / "wh" / "_txns"))
    # idempotent second pass
    assert cat.recover_transactions() == {
        "rolled_forward": 0, "rolled_back": 0,
    }


def test_txn_crash_recovery_rolls_back_on_foreign_claim(
    spark, tmp_path, monkeypatch
):
    cat = _interrupted_commit(spark, tmp_path, monkeypatch)
    # a foreign writer claims b's staged version while we were down
    # (metadata-only: version claim without a batch-dir write)
    cat.table("db", "b").rename_column("x", "y")
    report = cat.recover_transactions()
    assert report == {"rolled_forward": 0, "rolled_back": 1}
    # our half-published a manifest was removed; b kept the foreign one
    a = cat.table("db", "a")
    assert a.read().count() == 5
    assert len(a._versions()) == 2
    b = cat.table("db", "b")
    assert b.read().count() == 5
    assert "y" in b.read().columns
    assert not os.listdir(str(tmp_path / "wh" / "_txns"))
    # rolled-back orphan data dirs are gone: both tables take normal
    # commits at the freed version numbers
    a.append(_df(spark, 300, 302))
    b.append(
        _df(spark, 300, 302).select("id", F.col("x").alias("y"))
    )
    assert a.read().count() == 7
    assert b.read().count() == 7


def test_txn_sql_script_atomic(spark, tmp_path):
    """Multi-statement SQL through txn.sql(): DML routes to staged
    handles, interleaved SELECTs see staged state, everything
    publishes at exit."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.write_evolving(_df(spark, 0, 10), "db", "a")
    cat.write_evolving(_df(spark, 0, 10), "db", "b")
    with cat.transaction() as txn:
        txn.sql("DELETE FROM lake.db.a WHERE id < 4")
        txn.sql(
            "INSERT INTO lake.db.b SELECT id, x FROM lake.db.a "
            "WHERE id >= 8"
        )
        # read-your-writes across statements
        assert txn.sql(
            "SELECT COUNT(*) AS n FROM lake.db.a"
        ).first()["n"] == 6
        assert txn.sql(
            "SELECT COUNT(*) AS n FROM lake.db.b"
        ).first()["n"] == 12
        # nothing published yet
        assert cat.table("db", "a").read().count() == 10
        assert cat.table("db", "b").read().count() == 10
    assert cat.table("db", "a").read().count() == 6
    assert cat.table("db", "b").read().count() == 12


def test_txn_sql_script_abort(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.write_evolving(_df(spark, 0, 10), "db", "a")
    with pytest.raises(RuntimeError, match="nope"):
        with cat.transaction() as txn:
            txn.sql("DELETE FROM lake.db.a WHERE id < 4")
            raise RuntimeError("nope")
    assert cat.table("db", "a").read().count() == 10
    # retry outside the txn works (orphans cleaned)
    cat.sql("DELETE FROM lake.db.a WHERE id < 4")
    assert cat.table("db", "a").read().count() == 6
