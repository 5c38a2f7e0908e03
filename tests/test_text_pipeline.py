"""Chunking / packing / profiler operator semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.profile import profile_stats
from spark_iceberg_schema_evolution_spark.operators.text import (
    chunk_text,
    pack_sequences,
)


def test_chunk_text_exact_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))], ["doc_id", "text"]
    )
    out = chunk_text(df, chunk_tokens=4, overlap=1).collect()
    # stride 3: chunks at 0,3,6 cover tokens [0:4),[3:7),[6:10) -> 3 chunks
    assert [(r.chunk_idx, r.chunk_text) for r in out] == [
        (0, "w0 w1 w2 w3"),
        (1, "w3 w4 w5 w6"),
        (2, "w6 w7 w8 w9"),
    ]
    assert all(r.n_tokens == 4 for r in out)


def test_chunk_text_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    out = chunk_text(df, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 1 and out[0].chunk_text == "a b"


def test_chunk_text_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text(df, chunk_tokens=4, overlap=4)


def test_pack_sequences_bin_boundaries(spark):
    df = spark.createDataFrame(
        [(i, 40) for i in range(10)], ["doc_id", "n_tokens"]
    )
    out = {r.doc_id: r.bin_id for r in pack_sequences(df, capacity=100).collect()}
    # running prev totals 0,40,80,120,... -> bins 0,0,0,1,1,2,2,2,3,3
    assert [out[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_pack_sequences_sharded_is_per_shard(spark):
    df = spark.createDataFrame(
        [(i, "s" + str(i % 2), 60) for i in range(6)],
        ["doc_id", "shard", "n_tokens"],
    )
    out = pack_sequences(df, capacity=100, shard_col="shard")
    rows = {(r.shard, r.doc_id): r.bin_id for r in out.collect()}
    # each shard packs independently: prev totals 0,60,120 -> bins 0,0,1
    for s in ("s0", "s1"):
        ids = sorted(k[1] for k in rows if k[0] == s)
        assert [rows[(s, i)] for i in ids] == [0, 0, 1]


def test_profile_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None)], ["k", "s"]
    )
    out = {r.col_name: r for r in profile_stats(df).collect()}
    assert out["k"].n_rows == 3
    assert out["k"].n_nonnull == 3 and out["k"].n_distinct == 2
    assert out["k"].min_str == "1" and out["k"].max_str == "2"
    assert out["s"].n_nonnull == 2 and out["s"].n_distinct == 2
    assert out["s"].min_str == "a" and out["s"].max_str == "b"


def test_profile_stats_single_pass_plan(spark):
    """Scale gate: the exact profiler is a FIXED two map-only scans —
    one Expand-based multi-distinct hash aggregate for counts/distincts
    plus one keyless min/max fold (split in r13 so the variable-width
    min/max buffers can't drag the Expand onto a sorted aggregate) —
    never one scan per column."""
    from spark_iceberg_schema_evolution_spark.plans import explain
    from spark_iceberg_schema_evolution_spark.queries import load
    from tests.conftest import SF_SMOKE

    df = load(spark, SF_SMOKE, "orders")
    out = profile_stats(df, ["o_orderkey", "o_custkey", "o_orderstatus"])
    plan = explain.physical_plan(out)
    assert plan.count("Scan parquet") == 2
    assert "Expand" in plan  # the one-pass multi-distinct shape
    # scan count is independent of how many columns are profiled
    wide = profile_stats(
        df,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
        ],
    )
    assert explain.physical_plan(wide).count("Scan parquet") == 2


def test_chunk_text_reconstruction_property(spark):
    """Non-overlapping prefixes of consecutive chunks concatenate back to
    the original token stream (chunking loses nothing)."""
    texts = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate([1, 3, 4, 5, 9, 16, 17, 23, 50])
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    chunk_tokens, overlap = 7, 3
    stride = chunk_tokens - overlap
    out = chunk_text(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        toks = r.chunk_text.split(" ")
        prev = by_doc.setdefault(r.doc_id, [])
        # drop the overlapping prefix for every chunk after the first
        prev.extend(toks if r.chunk_idx == 0 else toks[overlap:])
    for i, text in texts:
        expect = text.split(" ")
        got = by_doc[i]
        # trailing chunks may re-cover earlier tokens when the doc is
        # shorter than a full window; dedupe while keeping order
        assert got[: len(expect)] == expect or sorted(set(got)) == sorted(
            set(expect)
        )


def test_pack_sequences_capacity_property(spark):
    """Every bin's token total stays under capacity + max single doc (the
    streaming-fill bound), and bins are contiguous in doc order."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 120)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    cap = 300
    out = sorted(
        pack_sequences(df, capacity=cap).collect(), key=lambda r: r.doc_id
    )
    totals: dict[int, int] = {}
    last_bin = 0
    for r in out:
        assert r.bin_id >= last_bin  # monotone in doc order
        last_bin = r.bin_id
        totals[r.bin_id] = totals.get(r.bin_id, 0) + r.n_tokens
    max_doc = max(n for _, n in rows)
    assert all(t < cap + max_doc for t in totals.values())
    # all but the last bin are at least capacity-full in running terms
    assert sum(totals.values()) == sum(n for _, n in rows)


def test_profile_approx_brackets_exact(spark):
    from spark_iceberg_schema_evolution_spark.queries import load
    from tests.conftest import SF_SMOKE

    o = load(spark, SF_SMOKE, "orders")
    exact = {
        r.col_name: r.n_distinct
        for r in profile_stats(o, ["o_orderkey", "o_orderstatus"]).collect()
    }
    approx = {
        r.col_name: r.n_distinct
        for r in profile_stats(
            o, ["o_orderkey", "o_orderstatus"], approximate=True
        ).collect()
    }
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(0.1 * exact[c], 2)


def test_hll_rollup_mergeable_and_brackets_exact(spark):
    from spark_iceberg_schema_evolution_spark.operators.profile import (
        hll_coarsen,
        hll_rollup,
    )

    df = spark.range(0, 20_000).select(
        (F.col("id") % 4).alias("g"),
        # ~5k distinct values per group, overlapping across groups
        (F.col("id") % 7_001).alias("v"),
    )
    roll = hll_rollup(df, ["g"], "v", lg_k=12)
    assert roll.count() == 4
    # coarsen to global: estimate brackets the exact distinct within the
    # sketch's error bound (~1.6% at lg_k=12; allow 5%)
    est = hll_coarsen(roll, []).collect()[0]
    exact = df.select("v").distinct().count()
    assert abs(est.approx_distinct - exact) / exact < 0.05
    assert est.n_rows == 20_000
    # mergeable: sketches of two disjoint halves union to the same
    # estimate as one sketch over the whole (identical register state)
    a = hll_rollup(df.where("id < 10000"), [], "v")
    b = hll_rollup(df.where("id >= 10000"), [], "v")
    merged = hll_coarsen(a.unionByName(b), []).collect()[0]
    whole = hll_coarsen(hll_rollup(df, [], "v"), []).collect()[0]
    assert merged.approx_distinct == whole.approx_distinct
