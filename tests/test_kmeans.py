"""K-means clustering gates: exact replica of the full-corpus Lloyd
refinement vs a pure-numpy reference (same sample init, same update
rule, same tiebreak), inertia monotonicity, assignment determinism,
validation raises."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.similarity import (
    _collect_fit_sample,
    _kmeans_np,
    as_double,
    kmeans_assign,
    kmeans_fit,
)


def _mk(spark, n=120, dim=6, seed=0):
    rng = np.random.RandomState(seed)
    # 3 separated blobs + noise so clusters are non-trivial
    X = np.concatenate(
        [
            rng.normal(0.0, 0.4, size=(n // 3, dim)),
            rng.normal(4.0, 0.4, size=(n // 3, dim)),
            rng.normal(-4.0, 0.4, size=(n - 2 * (n // 3), dim)),
        ]
    )
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        X,
    )


def _ref_refine(X_full, init, n_iter):
    """Pure-numpy Lloyd refinement with the operator's conventions:
    first-argmin tiebreak, empty clusters keep previous centroid."""
    C = np.asarray(init, dtype=np.float64)
    for _ in range(n_iter):
        d = ((X_full[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        nxt = C.copy()
        for j in range(C.shape[0]):
            pts = X_full[a == j]
            if len(pts):
                nxt[j] = pts.mean(axis=0)
        C = nxt
    d = ((X_full[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return C, d.argmin(axis=1), d.min(axis=1).sum()


def test_kmeans_refinement_matches_numpy(spark):
    df, X = _mk(spark)
    k, n_iter, seed = 4, 3, 7
    # white-box: replicate the operator's own sample init
    c = df.select(as_double(F.col("embedding")).alias("__cv"))
    init = _kmeans_np(_collect_fit_sample(c.limit(100_000)), k, seed)
    want_C, want_a, want_inertia = _ref_refine(X, init, n_iter)

    model = kmeans_fit(df, k=k, n_iter=n_iter, seed=seed)
    got_C = np.asarray([v for _, v in model["centroids"]])
    assert got_C.shape == want_C.shape
    assert np.abs(got_C - want_C).max() < 1e-9
    assert model["inertia"] == pytest.approx(want_inertia, rel=1e-9)

    got = kmeans_assign(df, model, dist_col="d2").orderBy("vec_id").collect()
    for r in got:
        assert r["cluster"] == want_a[r["vec_id"]]
        want_d = ((X[r["vec_id"]] - want_C[r["cluster"]]) ** 2).sum()
        assert r["d2"] == pytest.approx(want_d, rel=1e-9)


def test_kmeans_inertia_non_increasing(spark):
    df, _ = _mk(spark, seed=3)
    inertias = [
        kmeans_fit(df, k=4, n_iter=i, seed=11)["inertia"] for i in (0, 1, 4)
    ]
    assert inertias[0] >= inertias[1] - 1e-9
    assert inertias[1] >= inertias[2] - 1e-9


def test_kmeans_refit_deterministic(spark):
    df, _ = _mk(spark, seed=5)
    m1 = kmeans_fit(df, k=3, n_iter=2, seed=9)
    m2 = kmeans_fit(df, k=3, n_iter=2, seed=9)
    assert m1["centroids"] == m2["centroids"]
    assert m1["inertia"] == m2["inertia"]


def test_kmeans_validation_raises(spark):
    df, _ = _mk(spark, n=12)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, n_iter=-1)


def test_kmeans_separated_blobs_recovered(spark):
    """With k == number of well-separated blobs the refined model must
    put each blob in its own cluster (purity 1.0)."""
    df, X = _mk(spark, n=90, seed=8)
    model = kmeans_fit(df, k=3, n_iter=5, seed=4)
    got = kmeans_assign(df, model).orderBy("vec_id").collect()
    blob = {r["vec_id"]: r["vec_id"] * 3 // 90 for r in got}
    by_blob = {}
    for r in got:
        by_blob.setdefault(blob[r["vec_id"]], set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def _mk_labeled(spark, n=120, dim=6, seed=1):
    rng = np.random.RandomState(seed)
    X = rng.normal(0.0, 1.0, size=(n, dim))
    true_w = rng.normal(0.0, 1.0, size=dim)
    y = (X @ true_w + 0.3 > 0).astype(float)
    rows = [
        (i, [float(v) for v in X[i]], float(y[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label double"
    )
    return df, X, y


def _ref_logreg(X, y, n_iter, lr, l2=0.0):
    import numpy as np

    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(n_iter):
        z = X @ w + b
        err = 1.0 / (1.0 + np.exp(-z)) - y
        w = w - lr * ((X * err[:, None]).mean(axis=0) + l2 * w)
        b = b - lr * err.mean()
    z = X @ w + b
    loss = (np.maximum(z, 0) + np.log1p(np.exp(-np.abs(z))) - y * z).mean()
    return w, b, loss


def test_logreg_fit_matches_numpy(spark):
    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        logreg_fit,
    )

    df, X, y = _mk_labeled(spark)
    model = logreg_fit(df, "label", n_iter=40, lr=0.5, l2=0.01)
    want_w, want_b, want_loss = _ref_logreg(X, y, 40, 0.5, 0.01)
    assert np.abs(np.asarray(model["weights"]) - want_w).max() < 1e-9
    assert model["bias"] == pytest.approx(want_b, abs=1e-9)
    assert model["loss"] == pytest.approx(want_loss, rel=1e-9)
    assert model["n_train"] == 120 and model["n_skipped"] == 0


def test_logreg_fit_learns_planted_separation(spark):
    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        linear_classifier_score,
        logreg_fit,
    )

    df, X, y = _mk_labeled(spark, n=200, seed=2)
    m = logreg_fit(df, "label", n_iter=60, lr=1.0)
    short = logreg_fit(df, "label", n_iter=2, lr=1.0)
    assert m["loss"] < short["loss"]  # training actually descends
    scored = linear_classifier_score(
        df, m["weights"], m["bias"]
    ).select("vec_id", "clf_score").collect()
    acc = np.mean(
        [
            (r["clf_score"] >= 0.5) == bool(y[r["vec_id"]])
            for r in scored
        ]
    )
    assert acc >= 0.95


def test_logreg_fit_skips_and_raises(spark):
    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        logreg_fit,
    )

    df, _, _ = _mk_labeled(spark, n=30)
    extra = spark.createDataFrame(
        [
            (100, None, 1.0),           # null vector
            (101, [1.0, 2.0], 0.0),     # wrong length
            (102, [0.0] * 6, None),     # null label
        ],
        "vec_id long, embedding array<double>, label double",
    )
    m = logreg_fit(df.unionByName(extra), "label", n_iter=3)
    assert m["n_train"] == 30 and m["n_skipped"] == 3
    bad = spark.createDataFrame(
        [(0, [0.0] * 6, 2.0)],
        "vec_id long, embedding array<double>, label double",
    )
    with pytest.raises(ValueError):
        logreg_fit(df.unionByName(bad), "label", n_iter=1)
    with pytest.raises(ValueError):
        logreg_fit(df, "label", n_iter=0)
    with pytest.raises(ValueError):
        logreg_fit(df, "label", lr=0.0)
