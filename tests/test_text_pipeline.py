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
    """Scale gate: the exact profiler is ONE scan (a single Expand-based
    multi-distinct aggregate), not one scan per column."""
    from spark_iceberg_schema_evolution_spark.plans import explain
    from spark_iceberg_schema_evolution_spark.queries import load
    from tests.conftest import SF_SMOKE

    df = load(spark, SF_SMOKE, "orders")
    out = profile_stats(df, ["o_orderkey", "o_custkey", "o_orderstatus"])
    plan = explain.physical_plan(out)
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the one-pass multi-distinct shape
