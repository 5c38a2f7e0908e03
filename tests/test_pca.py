"""PCA fit/project property gates: exact numpy replica, variance
ordering, deterministic signs, ANN composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.similarity import (
    pca_fit,
    pca_project,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pca_projection_matches_numpy(spark):
    e = _emb(spark).limit(200).cache()
    model = pca_fit(e, "embedding", k=6, max_fit_rows=200)
    rows = (
        pca_project(e, model, "embedding", "pca")
        .select("vec_id", "embedding", "pca")
        .collect()
    )
    mean = np.asarray(model["mean"])
    V = np.asarray(model["components"])
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = (x - mean) @ V.T
        got = np.asarray(r["pca"])
        assert got.shape == (6,)
        assert np.allclose(got, want, atol=1e-9)
    e.unpersist()


def test_pca_variance_ordering_and_evr(spark):
    e = _emb(spark)
    model = pca_fit(e, "embedding", k=8, max_fit_rows=500)
    evr = model["explained_variance_ratio"]
    assert len(evr) == 8
    assert all(a >= b - 1e-12 for a, b in zip(evr, evr[1:]))
    assert 0 < sum(evr) <= 1 + 1e-9
    # empirical variance of projected coords matches the EVR ordering
    proj = pca_project(e, model, "embedding", "pca")
    agg = proj.select(
        *[
            F.variance(F.element_at("pca", i + 1)).alias(f"v{i}")
            for i in range(8)
        ]
    ).first()
    vs = [agg[f"v{i}"] for i in range(8)]
    assert all(a >= b - 1e-9 for a, b in zip(vs, vs[1:]))


def test_pca_deterministic_across_fits(spark):
    e = _emb(spark)
    m1 = pca_fit(e, "embedding", k=4, max_fit_rows=300)
    m2 = pca_fit(e, "embedding", k=4, max_fit_rows=300)
    assert m1 == m2
    # sign convention: each component's largest-|x| entry is positive
    for comp in m1["components"]:
        c = np.asarray(comp)
        assert c[np.abs(c).argmax()] > 0


def test_pca_validation(spark):
    e = _emb(spark)
    with pytest.raises(ValueError):
        pca_fit(e, "embedding", k=0)
    with pytest.raises(ValueError):
        pca_fit(e.limit(3), "embedding", k=5, max_fit_rows=3)


def test_pca_feeds_ann(spark):
    """Reduced vectors compose with the exact top-k path: on data with
    real low-dimensional structure (3 separated clusters in 32-dim),
    top-k neighbors in 4-dim PCA space stay within the query's cluster.
    (The parquet embeddings are isotropic noise — no projection could
    preserve their neighborhoods; structure is what PCA keeps.)"""
    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        cosine_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(3, 32) * 6.0
    rows = []
    for i in range(150):
        c = i % 3
        rows.append(
            (i, c, (centers[c] + rng.randn(32) * 0.5).tolist())
        )
    e = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    ).cache()
    model = pca_fit(e, "embedding", k=4, max_fit_rows=150)
    assert sum(model["explained_variance_ratio"]) > 0.8
    red = pca_project(e, model, "embedding", "pca").select(
        "vec_id", "cluster", F.col("pca").alias("embedding")
    ).cache()
    qs = red.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(red.select("vec_id", "embedding"), qs, k=10)
    joined = topk.join(
        red.select("vec_id", "cluster"), "vec_id"
    ).join(
        red.select(
            F.col("vec_id").alias("query_id"),
            F.col("cluster").alias("qcluster"),
        ),
        "query_id",
    )
    n_bad = joined.where(F.col("cluster") != F.col("qcluster")).count()
    assert n_bad == 0, n_bad
    e.unpersist()
    red.unpersist()
