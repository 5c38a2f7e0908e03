"""Branches, tags, and write-audit-publish (Iceberg snapshot refs):
branch commits stay invisible to main until fast_forward publishes them;
tags pin immutable snapshots that expire_snapshots never drops."""

from __future__ import annotations

import pytest

from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def _ids(t, **kw):
    return sorted(r.id for r in t.read(**kw).collect())


def _mk(spark, catalog, name, n=4):
    catalog.write_evolving(
        spark.createDataFrame([(i, i * 10) for i in range(n)], ["id", "v"]),
        "db", name,
    )
    return catalog.table("db", name)


def test_wap_branch_commits_invisible_until_publish(spark, catalog):
    t = _mk(spark, catalog, "wap")
    t.create_branch("audit")
    b = t.branch("audit")
    # WRITE: stage on the branch
    b.append(spark.createDataFrame([(100, 1)], ["id", "v"]))
    b.delete_where("id = 0")
    # AUDIT: main untouched, branch sees staged state
    assert _ids(t) == [0, 1, 2, 3]
    assert _ids(b) == [1, 2, 3, 100]
    assert _ids(t, ref="audit") == [1, 2, 3, 100]
    # PUBLISH: atomic pointer move, no data rewritten
    t.fast_forward("main", "audit")
    assert _ids(t) == [1, 2, 3, 100]


def test_main_commits_after_branching_dont_leak_into_branch(spark, catalog):
    t = _mk(spark, catalog, "iso")
    t.create_branch("dev")
    t.append(spark.createDataFrame([(50, 5)], ["id", "v"]))
    assert _ids(t) == [0, 1, 2, 3, 50]
    assert _ids(t.branch("dev")) == [0, 1, 2, 3]


def test_version_numbers_stay_globally_unique(spark, catalog):
    t = _mk(spark, catalog, "uniq")
    t.create_branch("b1")
    b = t.branch("b1")
    vb = b.append(spark.createDataFrame([(10, 1)], ["id", "v"]))
    vm = t.append(spark.createDataFrame([(20, 2)], ["id", "v"]))
    assert vb != vm  # a main commit can't overwrite a branch snapshot
    assert _ids(t) == [0, 1, 2, 3, 20]
    assert _ids(b) == [0, 1, 2, 3, 10]


def test_branch_supports_full_dml_and_evolution(spark, catalog):
    t = _mk(spark, catalog, "dml")
    t.create_branch("audit")
    b = t.branch("audit")
    b.merge_into(
        spark.createDataFrame([(1, 111, "x")], ["id", "v", "note"]),
        on=["id"], evolve=True,
    )
    b.update_where("id = 2", {"v": "v + 1"})
    assert [f.name for f in t._load().schema.fields] == ["id", "v"]
    rows = {r.id: (r.v, r.note) for r in b.read().collect()}
    assert rows[1] == (111, "x") and rows[2] == (21, None)
    t.fast_forward("main", "audit")
    assert {f.name for f in t._load().schema.fields} == {"id", "v", "note"}


def test_tag_pins_snapshot_and_survives_expiry(spark, catalog):
    t = _mk(spark, catalog, "tag")
    t.create_tag("rel-1")
    for i in range(6):
        t.append(spark.createDataFrame([(100 + i, 0)], ["id", "v"]))
    t.expire_snapshots(keep_last=2)
    assert _ids(t, ref="rel-1") == [0, 1, 2, 3]  # tag still readable
    assert len(_ids(t)) == 10


def test_ref_name_collisions_and_unknown_refs(spark, catalog):
    t = _mk(spark, catalog, "err")
    t.create_branch("x")
    with pytest.raises(ValueError, match="exists"):
        t.create_tag("x")
    with pytest.raises(ValueError, match="no such"):
        t.branch("nope")
    with pytest.raises(ValueError, match="no such"):
        t.read(ref="nope")
    with pytest.raises(ValueError, match="cannot drop main"):
        t.drop_branch("main")


def test_drop_branch_keeps_data_until_expiry(spark, catalog):
    t = _mk(spark, catalog, "drop")
    t.create_branch("tmp")
    b = t.branch("tmp")
    b.append(spark.createDataFrame([(10, 1)], ["id", "v"]))
    t.drop_branch("tmp")
    assert "tmp" not in t.refs()["branches"]
    assert _ids(t) == [0, 1, 2, 3]


def test_refs_listing(spark, catalog):
    t = _mk(spark, catalog, "ls")
    assert t.refs() == {"branches": {"main": 1}, "tags": {}}
    t.create_branch("a")
    t.create_tag("v1")
    r = t.refs()
    assert r["branches"] == {"main": 1, "a": 1} and r["tags"] == {"v1": 1}


def test_stream_lakehouse_appends_incremental(spark, catalog, tmp_path):
    from spark_iceberg_schema_evolution_spark.streaming.windows import (
        stream_lakehouse_appends,
    )

    t = _mk(spark, catalog, "stream", n=10)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            stream_lakehouse_appends(t)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out_dir)

    assert drain().count() == 10
    t.append(spark.createDataFrame([(100, 1), (101, 2)], ["id", "v"]))
    # restarted from the same checkpoint: only the new batch arrives
    out = drain()
    assert out.count() == 12  # 10 + exactly the 2 new rows, no re-reads
    assert sorted(r.id for r in out.collect()) == sorted(
        list(range(10)) + [100, 101]
    )


def test_stream_lakehouse_appends_refuses_renames_and_deletes(
    spark, catalog
):
    from spark_iceberg_schema_evolution_spark.streaming.windows import (
        stream_lakehouse_appends,
    )

    t = _mk(spark, catalog, "refuse")
    t.delete_where("id = 1", mode="mor", keys=["id"])
    with pytest.raises(ValueError, match="merge-on-read"):
        stream_lakehouse_appends(t)
    t.compact()
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="rename-free"):
        stream_lakehouse_appends(t)
