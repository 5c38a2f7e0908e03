"""Per-file bloom-filter index: Spark/driver hash parity, point-lookup
file pruning where min/max stats structurally cannot prune, soundness
guards (renames, widening), and correctness equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.hashing import (
    bloom_positions,
    spark_hash,
)
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "warehouse"))


def test_double_hash_parity_with_spark(spark):
    """hashing.bloom_positions must replicate F.hash(v) / F.hash(v, v)
    exactly — a mismatch would silently skip live files."""
    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)]
    longs = [0, -1, 2**63 - 1, -(2**63), 10**15]
    strs = ["", "a", "doc-55", "päivää", "x" * 100]
    rows = spark.createDataFrame(
        [(i, ints[i], longs[i % len(longs)], strs[i % len(strs)]) for i in range(len(ints))],
        "idx INT, i INT, l BIGINT, s STRING",
    ).select(
        "idx",
        F.hash("i").alias("hi"),
        F.hash("i", "i").alias("hii"),
        F.hash("l").alias("hl"),
        F.hash("l", "l").alias("hll"),
        F.hash("s").alias("hs"),
        F.hash("s", "s").alias("hss"),
    ).collect()
    for r in rows:
        i, l, s = ints[r.idx], longs[r.idx % len(longs)], strs[r.idx % len(strs)]
        assert spark_hash(i, "int") == r.hi
        assert spark_hash(i, "int", r.hi) == r.hii
        assert spark_hash(l, "bigint") == r.hl
        assert spark_hash(l, "bigint", r.hl) == r.hll
        assert spark_hash(s, "string") == r.hs
        assert spark_hash(s, "string", r.hs) == r.hss
        # positions are pmod of the double-hash chain
        m, k = 1 << 10, 5
        pos = bloom_positions(i, "int", m, k)
        assert all(0 <= p < m for p in pos) and len(pos) == k


def test_bloom_prunes_interleaved_point_lookup(spark, catalog):
    """Three batches with fully overlapping id ranges (ids = 0,1,2 mod 3
    interleaved): min/max stats keep every file for any point lookup,
    the bloom index keeps exactly the one file holding the id."""
    def shuffled(resid):
        # pseudo-random order so every output FILE spans ~the full id
        # range: footer min/max stats then cannot prune a point lookup
        ids = sorted(
            range(resid, 3000, 3),
            key=lambda x: (x * 2654435761) % 4096,
        )
        return spark.createDataFrame(
            [(i, f"r{i}") for i in ids], ["id", "v"]
        )

    catalog.write_evolving(shuffled(0), "db", "bl")
    t = catalog.table("db", "bl")
    t.append(shuffled(1))
    t.append(shuffled(2))
    before = t.plan_scan([("id", "=", 1501)])  # 1501 % 3 == 1: batch 2
    assert before["files_scanned"] == before["files_total"]  # stats can't help
    t.build_bloom_index("id", m_bits=1 << 14)
    after = t.plan_scan([("id", "=", 1501)])
    assert after["files_total"] == before["files_total"]
    assert after["files_scanned"] < before["files_scanned"]
    # correctness: the pruned read equals the full-scan filter
    got = t.read_where([("id", "=", 1501)]).collect()
    assert [(r.id, r.v) for r in got] == [(1501, "r1501")]
    # absent id: bloom proves no file holds it -> zero files planned and
    # the no-op DML gate goes metadata-only
    none = t.plan_scan([("id", "=", 1500001)])
    assert none["files_scanned"] == 0
    v = t._load().version
    orig_scan = t._scan
    t._scan = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("bloom-proven no-op DML must not scan")
    )
    try:
        assert t.delete_where("id = 1500001") == v
    finally:
        t._scan = orig_scan
    # IN-list: only the listed ids' files survive
    plan_in = t.plan_scan([("id", "in", [1501, 1500001])])
    assert plan_in["files_scanned"] == after["files_scanned"]


def test_bloom_string_column_and_new_batches_unindexed(spark, catalog):
    def shuffled(resid):
        ids = sorted(
            range(resid, 500, 2),
            key=lambda x: (x * 2654435761) % 4096,
        )
        return spark.createDataFrame(
            [(f"doc-{i:04d}", i) for i in ids], ["doc", "n"]
        )

    catalog.write_evolving(shuffled(0), "db", "bs")
    t = catalog.table("db", "bs")
    t.append(shuffled(1))
    t.build_bloom_index("doc")
    hit = t.plan_scan([("doc", "=", "doc-0077")])
    assert hit["files_scanned"] == 1
    # a post-index append has no bloom: its files always survive (the
    # new doc sorts INSIDE the existing lexicographic range, so stats
    # alone could not have kept only it)
    t.append(spark.createDataFrame([("doc-0200x", 9999)], ["doc", "n"]))
    hit2 = t.plan_scan([("doc", "=", "doc-0200x")])
    # every OLD batch bloom-prunes away; only the unindexed new batch
    # (tiny, 1-2 files) survives
    assert hit2["batches_scanned"] == 1
    assert hit2["files_scanned"] <= 2
    assert t.read_where([("doc", "=", "doc-0200x")]).count() == 1


def test_bloom_disabled_by_rename_and_widening(spark, catalog):
    """Soundness guards: a rename or type widening after the build must
    disable the index (names may alias / hashes change), never misprune."""
    # even ids in ONE file spanning [0, 198] (coalesce pins the layout
    # at any core count — at local[32] the default split fragments 100
    # rows into ~3-row files whose narrow [min, max] spans let footer
    # stats prune legitimately, which is not what this test gates): an
    # odd probe sits inside the file's [min, max], so only the bloom
    # can prune
    ids = sorted(range(0, 200, 2), key=lambda x: (x * 2654435761) % 256)
    catalog.write_evolving(
        spark.createDataFrame(
            [(i, i) for i in ids], "a INT, b INT"
        ).coalesce(1),
        "db", "bg",
    )
    t = catalog.table("db", "bg")
    t.build_bloom_index("a")
    assert t.plan_scan([("a", "=", 51)])["files_scanned"] == 0
    t.rename_column("b", "c")
    # rename epoch moved: the index stands down (conservative)
    assert (
        t.plan_scan([("a", "=", 51)])["files_scanned"]
        == t.plan_scan([])["files_scanned"]
    )
    # rebuild under the new epoch, then widen the indexed column: the
    # recorded type no longer matches -> disabled again
    t.build_bloom_index("a")
    assert t.plan_scan([("a", "=", 51)])["files_scanned"] == 0
    t.widen_column_type("a", "bigint")
    assert (
        t.plan_scan([("a", "=", 51)])["files_scanned"]
        == t.plan_scan([])["files_scanned"]
    )


def test_bloom_rejects_bad_columns(spark, catalog):
    catalog.write_evolving(
        spark.createDataFrame([(1, 1.5)], "id INT, x DOUBLE"), "db", "be"
    )
    t = catalog.table("db", "be")
    with pytest.raises(ValueError, match="no such column"):
        t.build_bloom_index("nope")
    with pytest.raises(ValueError, match="int/bigint/string"):
        t.build_bloom_index("x")
    with pytest.raises(ValueError, match="multiple of 64"):
        t.build_bloom_index("id", m_bits=100)


def test_bloom_incremental_indexes_only_new_batches(spark, catalog):
    catalog.write_evolving(
        spark.createDataFrame([(i, i) for i in range(100)], ["id", "v"]),
        "db", "binc",
    )
    t = catalog.table("db", "binc")
    t.build_bloom_index("id")
    ref0 = t._load().batches[0]["blooms"]["id"]
    t.append(spark.createDataFrame([(1000 + i, i) for i in range(50)], ["id", "v"]))
    t.build_bloom_index("id")  # incremental default
    snap = t._load()
    assert snap.batches[0]["blooms"]["id"] == ref0  # untouched sidecar
    assert "id" in (snap.batches[1].get("blooms") or {})  # new batch indexed
    assert t.plan_scan([("id", "=", 1049)])["files_scanned"] >= 1
    assert t.read_where([("id", "=", 1049)]).count() == 1
    # full rebuild replaces every sidecar
    t.build_bloom_index("id", incremental=False)
    assert t._load().batches[0]["blooms"]["id"] != ref0
