"""Evaluation & drift statistics operators (operators/stats.py + the
text.py collocation/divergence pair): hand-computable fixtures with known
closed-form answers, plus invariants (probability rows sum to 1e6, TV
symmetry/identity, AUC of a perfect ranker = 1)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_iceberg_schema_evolution_spark.operators.stats import (
    ab_welch,
    autocorr_lag,
    calibration_bins,
    classifier_eval,
    cusum_changepoint,
    event_transitions,
)
from spark_iceberg_schema_evolution_spark.operators.text import (
    corpus_divergence,
    pmi_collocations,
)


# --- classifier_eval ------------------------------------------------------


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(i, 1 if i >= 10 else 0) for i in range(20)], "s int, y int"
    )
    row = classifier_eval(df, "s", "y").first()
    assert row.n_pos == 10 and row.n_neg == 10
    assert row.auc_r == 1.0
    # threshold 10 classifies perfectly -> F1 = 1
    assert row.best_thr == 10
    assert row.best_f1_ppm == 1_000_000
    assert row.tp == 10 and row.fp == 0


def test_auc_random_is_half_and_ties(spark):
    # every score shared by one pos and one neg -> AUC exactly 0.5
    rows = [(s, 1) for s in range(5)] + [(s, 0) for s in range(5)]
    df = spark.createDataFrame(rows, "s int, y int")
    row = classifier_eval(df, "s", "y").first()
    assert row.auc_r == 0.5
    # hand-check: U2 = sum over scores: 1*(2*cum_below + 1), cum 0..4
    assert row.u2 == sum(2 * c + 1 for c in range(5))


def test_auc_hand_example(spark):
    # scores: pos {3, 2}, neg {1, 2} -> pairs: (3>1)+(3>2)+(2>1)+(2==2)*.5
    # U = 3.5 of 4 -> AUC = 0.875
    df = spark.createDataFrame(
        [(3, 1), (2, 1), (1, 0), (2, 0)], "s int, y int"
    )
    row = classifier_eval(df, "s", "y").first()
    assert row.u2 == 7  # 2U
    assert row.auc_r == 0.875


def test_calibration_bins(spark):
    df = spark.createDataFrame(
        [(5, 0), (7, 1), (15, 1), (17, 1)], "s int, y int"
    )
    out = {
        r.bin: (r.n, r.n_pos, r.pos_rate_r)
        for r in calibration_bins(df, "s", "y", 10).collect()
    }
    assert out == {0: (2, 1, 0.5), 1: (2, 2, 1.0)}


# --- ab_welch -------------------------------------------------------------


def test_ab_welch_known_groups(spark):
    # arm 0: [10, 20, 30]; arm 1: [20, 30, 40] -> means 20 / 30,
    # both sample variances 100 -> t = 10 / sqrt(100/3 + 100/3)
    rows = [("seg", 0, 10, 0), ("seg", 0, 20, 0), ("seg", 0, 30, 1),
            ("seg", 1, 20, 0), ("seg", 1, 30, 1), ("seg", 1, 40, 1)]
    df = spark.createDataFrame(rows, "seg string, g int, x int, conv int")
    row = ab_welch(df, "seg", "g", "x", "conv").first()
    assert row.n0 == 3 and row.n1 == 3
    assert row.mean0_r == 20.0 and row.mean1_r == 30.0
    assert row.welch_t_r == round(10 / (200 / 3) ** 0.5, 4)
    assert row.c1 == 2
    # Wilson bounds for 2/3 at z=1.96 (textbook values)
    assert 0.20 < row.wilson_lo_r < 0.31
    assert 0.90 < row.wilson_hi_r < 0.96
    assert row.wilson_lo_r < 2 / 3 < row.wilson_hi_r


def test_ab_welch_degenerate_arms_null_not_artifact(spark):
    # one-row treatment arm: no sample variance -> t NULL, not a
    # divide-by-zero artifact; empty treatment arm -> Wilson NULL too.
    rows = [("one1", 0, 10, 0), ("one1", 0, 20, 0), ("one1", 1, 15, 1),
            ("no1", 0, 10, 0), ("no1", 0, 20, 1)]
    df = spark.createDataFrame(rows, "seg string, g int, x int, conv int")
    out = {r.seg: r for r in ab_welch(df, "seg", "g", "x", "conv").collect()}
    one1 = out["one1"]
    assert one1.n1 == 1 and one1.welch_t_r is None
    assert one1.mean1_r == 15.0  # mean of 1 row is still defined
    assert one1.wilson_lo_r is not None  # n1 >= 1: Wilson defined
    no1 = out["no1"]
    assert no1.n1 == 0
    assert no1.welch_t_r is None
    assert no1.mean1_r is None
    assert no1.wilson_lo_r is None and no1.wilson_hi_r is None
    assert no1.mean0_r == 15.0  # control arm unaffected


# --- bivariate_stats --------------------------------------------------------


def test_bivariate_stats_exact_line(spark):
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        bivariate_stats,
    )

    # y = 3x + 2 exactly -> corr 1, r2 1, slope 3, icept 2
    rows = [("g", x, 3 * x + 2) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    row = bivariate_stats(df, ["g"], "x", "y").first()
    assert row.n == 5
    assert abs(row.corr - 1.0) < 1e-12
    assert abs(row.slope - 3.0) < 1e-12
    assert abs(row.icept - 2.0) < 1e-12
    assert abs(row.r2 - 1.0) < 1e-12
    # covar_samp of x=[1..5], y=3x+2: cov = 3 * var(x) = 3 * 2.5
    assert abs(row.covar_samp - 7.5) < 1e-12


def test_bivariate_stats_zero_variance_null(spark):
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        bivariate_stats,
    )

    rows = [("g", 4, y) for y in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    row = bivariate_stats(df, ["g"], "x", "y").first()
    assert row.corr is None and row.slope is None
    assert row.icept is None and row.r2 is None
    assert row.covar_samp == 0.0  # defined (x constant -> cxy = 0)


def test_bivariate_stats_matches_native_corr(spark):
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        bivariate_stats,
    )

    rows = [("g", x, (x * 7) % 11 + x) for x in range(1, 40)]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    row = bivariate_stats(df, ["g"], "x", "y").first()
    native = df.agg(
        F.corr("x", "y").alias("c"),
        F.covar_samp("x", "y").alias("cv"),
        F.expr("regr_slope(y, x)").alias("sl"),
        F.expr("regr_intercept(y, x)").alias("ic"),
        F.expr("regr_r2(y, x)").alias("r2"),
    ).first()
    assert abs(row.corr - native.c) < 1e-9
    assert abs(row.covar_samp - native.cv) < 1e-9
    assert abs(row.slope - native.sl) < 1e-9
    assert abs(row.icept - native.ic) < 1e-9
    assert abs(row.r2 - native.r2) < 1e-9


# --- event_transitions ----------------------------------------------------


def test_event_transitions_counts_and_ppm(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "k int, t int, s string")
    out = event_transitions(df, ["k"], "t", "s", "t")
    got = {
        (r.prev_state, r.curr_state): (r.n, r.p_ppm)
        for r in out.collect()
    }
    assert got == {
        ("a", "b"): (2, 666666),
        ("a", "a"): (1, 333333),
        ("b", "a"): (1, 1_000_000),
    }
    # per-prev probabilities sum to 1e6 up to div truncation (< #rows)
    sums = (
        out.groupBy("prev_state").agg(F.sum("p_ppm").alias("p"))
        .collect()
    )
    assert all(1_000_000 - 2 <= r.p <= 1_000_000 for r in sums)


# --- cusum_changepoint ----------------------------------------------------


def test_cusum_flat_series_zero_drift(spark):
    df = spark.createDataFrame(
        [(1, t, 5) for t in range(10)], "k int, t int, x int"
    )
    row = cusum_changepoint(df, ["k"], "t", "x", "t").first()
    assert row.d_max == 0 and row.drift_r == 0.0
    assert row.cp_index == 1  # ties -> smallest index


def test_cusum_detects_level_shift(spark):
    # 10 zeros then 10 tens: drift peaks exactly at the shift point
    vals = [0] * 10 + [10] * 10
    df = spark.createDataFrame(
        [(1, t, v) for t, v in enumerate(vals)], "k int, t int, x int"
    )
    row = cusum_changepoint(df, ["k"], "t", "x", "t").first()
    assert row.cp_index == 10  # last pre-shift observation (i is 1-based)
    # D at i=10: |20*0 - 10*100| = 1000; drift_r = 1000/400
    assert row.d_max == 1000
    assert row.drift_r == 2.5


# --- autocorr_lag ---------------------------------------------------------


def test_autocorr_linear_series_is_one(spark):
    df = spark.createDataFrame(
        [(1, t, 3 * t + 7) for t in range(20)], "k int, t int, x int"
    )
    row = autocorr_lag(df, ["k"], "t", "x", "t").first()
    assert row.n == 19
    assert row.autocorr_r == 1.0


def test_autocorr_alternating_is_minus_one(spark):
    df = spark.createDataFrame(
        [(1, t, 1 if t % 2 else -1) for t in range(20)],
        "k int, t int, x int",
    )
    row = autocorr_lag(df, ["k"], "t", "x", "t").first()
    assert row.autocorr_r == -1.0


def test_autocorr_constant_series_null_and_min_pairs(spark):
    rows = [(1, t, 5) for t in range(20)] + [(2, t, t) for t in range(5)]
    df = spark.createDataFrame(rows, "k int, t int, x int")
    out = autocorr_lag(df, ["k"], "t", "x", "t", min_pairs=10).collect()
    assert len(out) == 1  # key 2 dropped (4 pairs < 10)
    assert out[0].k == 1 and out[0].autocorr_r is None


# --- pmi_collocations -----------------------------------------------------


def test_pmi_lift_hand_example(spark):
    # corpus: "x y" 3 times, "x z" 1, "w z" 1 -> N=5 bigrams
    docs = ["x y"] * 3 + ["x z", "w z"]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = {
        r.bigram: r
        for r in pmi_collocations(df, min_count=1).collect()
    }
    # c(x y)=3, c_a(x)=4, c_b(y)=3 -> lift = 5*3/(4*3) = 1.25
    assert out["x y"].lift_ppm == 1_250_000
    assert out["x y"].c_ab == 3
    # c(w z)=1, c_a(w)=1, c_b(z)=2 -> lift = 5/(1*2) = 2.5
    assert out["w z"].lift_ppm == 2_500_000


def test_pmi_min_count_prunes_but_n_stays_global(spark):
    docs = ["x y"] * 3 + ["x z", "w z"]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = pmi_collocations(df, min_count=2).collect()
    assert [r.bigram for r in out] == ["x y"]
    # N must still be 5 (pre-filter): lift unchanged vs min_count=1
    assert out[0].lift_ppm == 1_250_000


# --- corpus_divergence ----------------------------------------------------


def test_tv_identical_splits_zero(spark):
    rows = [(i, "a b c") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, text string")
    row = corpus_divergence(df, F.col("id") % 2).first()
    assert row.tv_r == 0.0
    assert row.n_a == row.n_b == 15
    assert row.vocab == row.n_common == 3


def test_tv_disjoint_splits_one(spark):
    rows = [(0, "a a b"), (1, "c d e")]
    df = spark.createDataFrame(rows, "id long, text string")
    row = corpus_divergence(df, F.col("id") % 2).first()
    assert row.tv_r == 1.0
    assert row.n_common == 0 and row.vocab == 5


def test_tv_hand_value_and_symmetry(spark):
    # split A tokens: a a b   split B: a b b b
    rows = [(0, "a a b"), (1, "a b b b")]
    df = spark.createDataFrame(rows, "id long, text string")
    row = corpus_divergence(df, F.col("id") % 2).first()
    # |2*4-1*3| + |1*4-3*3| = 5+5 = 10; tv = 10/(2*3*4)
    assert row.tv_r == round(10 / 24, 4)
    flipped = corpus_divergence(df, 1 - F.col("id") % 2).first()
    assert flipped.tv_r == row.tv_r


# --- determinism under repartitioning ------------------------------------


@pytest.mark.parametrize("parts", [1, 7])
def test_partitioning_invariance(spark, parts):
    rows = [(i % 4, i, (i * 37) % 100, i % 2, f"s{i%3} t{i%5}")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "k int, t int, x int, g int, text string"
    ).repartition(parts)
    a = classifier_eval(df, "x", "g").first()
    assert a.u2 == classifier_eval(df.repartition(3), "x", "g").first().u2
    c = cusum_changepoint(df, ["k"], "t", "x", "t").orderBy("k").collect()
    c2 = (
        cusum_changepoint(df.repartition(5), ["k"], "t", "x", "t")
        .orderBy("k")
        .collect()
    )
    assert c == c2


# --- rank_fusion ----------------------------------------------------------


def test_rrf_hand_values_and_missing_contributes_zero(spark):
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        rank_fusion,
    )

    rows = [(1, 100, 1), (2, 90, 9), (3, 80, 2)]
    df = spark.createDataFrame(rows, "id int, s1 int, s2 int")
    out = rank_fusion(
        df,
        ["id"],
        [
            ("s1", F.desc("s1")),
            ("s2", F.desc("s2")),
        ],
        k=60,
        top_n=2,
    )
    got = {r.id: r for r in out.collect()}
    # s1 top-2: ids 1,2 (ranks 1,2); s2 top-2: ids 2,3 (ranks 1,2)
    assert got[1].r_s1 == 1 and got[1].r_s2 is None
    assert got[2].r_s1 == 2 and got[2].r_s2 == 1
    assert got[1].rrf_r == round(1 / 61, 6)
    assert got[2].rrf_r == round(1 / 62 + 1 / 61, 6)
    assert got[3].rrf_r == round(1 / 62, 6)


# --- basket_rules ---------------------------------------------------------


def test_basket_rules_hand_example(spark):
    # baskets: b1={x,y}, b2={x,y}, b3={x,z}, b4={y}; n_baskets=4
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "y"),
            (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "b int, item string")
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        basket_rules,
    )

    out = {
        (r.item_a, r.item_b): r
        for r in basket_rules(df, ["b"], "item", min_pair_support=1)
        .collect()
    }
    xy = out[("x", "y")]
    # c_xy=2 (set semantics: duplicate y in b2 counts once), c_x=3, c_y=3
    assert xy.c_ab == 2 and xy.c_a == 3 and xy.c_b == 3
    assert xy.support_ppm == 2 * 1000000 // 4
    assert xy.conf_ab_ppm == 2 * 1000000 // 3
    # lift = 2*4/(3*3) = 8/9
    assert xy.lift_ppm == 8 * 1000000 // 9
    xz = out[("x", "z")]
    assert xz.c_ab == 1 and xz.conf_ba_ppm == 1000000


def test_basket_rules_hot_basket_guard(spark):
    rows = [(1, f"i{j}") for j in range(20)]
    df = spark.createDataFrame(rows, "b int, item string")
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        basket_rules,
    )

    with pytest.raises(ValueError, match="distinct items"):
        basket_rules(df, ["b"], "item", max_basket_items=10)


# --- interval_coverage ----------------------------------------------------


def test_interval_coverage_union_and_depth(spark):
    from spark_iceberg_schema_evolution_spark.operators.relational import (
        interval_coverage,
    )

    # key 1: [0,10) [5,15) overlap -> covered 15, depth 2
    # key 2: [0,5) [5,10) touching -> covered 10, depth 1 (half-open)
    # key 3: [0,5) [20,25) disjoint -> covered 10, depth 1
    rows = [(1, 0, 10), (1, 5, 15), (2, 0, 5), (2, 5, 10),
            (3, 0, 5), (3, 20, 25)]
    df = spark.createDataFrame(rows, "k int, s long, e long")
    got = {
        r.k: r
        for r in interval_coverage(df, ["k"], "s", "e").collect()
    }
    assert (got[1].covered, got[1].max_concurrency) == (15, 2)
    assert (got[2].covered, got[2].max_concurrency) == (10, 1)
    assert (got[3].covered, got[3].max_concurrency) == (10, 1)
    assert all(got[k].n_intervals == 2 for k in (1, 2, 3))


def test_interval_coverage_identical_intervals(spark):
    rows = [(1, 0, 10), (1, 0, 10), (1, 0, 10)]
    df = spark.createDataFrame(rows, "k int, s long, e long")
    r = interval_coverage_import()(df, ["k"], "s", "e").first()
    assert r.covered == 10 and r.max_concurrency == 3


def interval_coverage_import():
    from spark_iceberg_schema_evolution_spark.operators.relational import (
        interval_coverage,
    )

    return interval_coverage


# --- period_over_period ---------------------------------------------------


def test_period_over_period_deltas(spark):
    from spark_iceberg_schema_evolution_spark.operators.relational import (
        period_over_period,
    )

    rows = [("2024-01", 100), ("2024-01", 100), ("2024-02", 300),
            ("2024-03", 150)]
    df = spark.createDataFrame(rows, "p string, v int")
    out = {
        r.period: r
        for r in period_over_period(df, "p", "v").collect()
    }
    assert out["2024-01"].prev is None
    assert out["2024-01"].pct_change_ppm is None
    assert out["2024-02"].delta == 100
    assert out["2024-02"].pct_change_ppm == 500000
    # negative delta truncates toward zero on both engines
    assert out["2024-03"].delta == -150
    assert out["2024-03"].pct_change_ppm == -500000


def test_isotonic_hand_case_and_monotonicity(spark):
    """PAV hand case: bin means (1.0, 0.0) must pool to 0.5; the full
    value vector is non-decreasing; weighted pooling preserves the
    pooled blocks' weighted mean."""
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        isotonic_apply,
        isotonic_fit,
    )

    rows = [
        # bin 0 (scores ~0.05): 2 positives  -> mean 1.0
        (0.05, 1), (0.06, 1),
        # bin 9 (scores ~0.95): 2 negatives -> mean 0.0
        (0.95, 0), (0.96, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    m = isotonic_fit(df, "score", "label", n_bins=10)
    assert m["n_fit"] == 4
    # the decreasing pair pools into one block with mean 0.5
    assert all(v == 0.5 for v in m["values"])
    vals = m["values"]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    out = {
        r["score"]: r["calibrated"]
        for r in isotonic_apply(df, m, "score").collect()
    }
    assert all(v == 0.5 for v in out.values())


def test_isotonic_monotone_input_is_identityish(spark):
    """Already-monotone bin means survive PAV unpooled, and
    calibration equals each bin's observed positive rate."""
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        isotonic_apply,
        isotonic_fit,
    )

    rows = []
    # bin i of 5 gets positive rate i/4
    for i in range(5):
        for j in range(8):
            rows.append((i / 5 + 0.01, 1 if j < 2 * i else 0))
    df = spark.createDataFrame(rows, "score double, label int")
    m = isotonic_fit(df, "score", "label", n_bins=5)
    occupied = [m["values"][i] for i in range(5)]
    assert occupied == [0.0, 0.25, 0.5, 0.75, 1.0]
    got = isotonic_apply(df, m, "score").collect()
    for r in got:
        b = int(r["score"] * 5)
        assert r["calibrated"] == occupied[b]


def test_isotonic_improves_brier_and_validates(spark):
    """On planted noisy-but-monotone data, calibrated scores have a
    lower Brier score than the raw (systematically overconfident)
    scores; NULL/out-of-range handling and raises."""
    import numpy as np

    from spark_iceberg_schema_evolution_spark.operators.stats import (
        isotonic_apply,
        isotonic_fit,
    )

    rng = np.random.RandomState(5)
    raw = rng.uniform(0, 1, size=400)
    # true probability is sqrt(score): raw scores are mis-calibrated
    y = (rng.uniform(0, 1, size=400) < np.sqrt(raw)).astype(int)
    rows = [(float(raw[i]), int(y[i])) for i in range(400)]
    df = spark.createDataFrame(rows, "score double, label int")
    m = isotonic_fit(df, "score", "label", n_bins=20)
    got = isotonic_apply(df, m, "score").collect()
    brier_raw = np.mean([(r["score"] - r["label"]) ** 2 for r in got])
    brier_cal = np.mean(
        [(r["calibrated"] - r["label"]) ** 2 for r in got]
    )
    assert brier_cal < brier_raw
    vals = m["values"]
    assert all(a <= b for a, b in zip(vals, vals[1:]))

    # NULL score calibrates to NULL; skipped rows counted
    extra = spark.createDataFrame(
        [(None, 1), (0.5, None)], "score double, label int"
    )
    m2 = isotonic_fit(df.unionByName(extra), "score", "label", n_bins=20)
    assert m2["n_skipped"] == 2
    out = isotonic_apply(extra, m2, "score").collect()
    assert out[0]["calibrated"] is None

    import pytest as _p
    with _p.raises(ValueError):
        isotonic_fit(df, "score", "label", n_bins=1)
    with _p.raises(ValueError):
        isotonic_fit(
            spark.createDataFrame([(1.5, 1)], "score double, label int"),
            "score",
            "label",
        )


def test_poisson_bootstrap_deterministic_and_exact_replica(spark):
    """The interval is hash-deterministic (two runs identical) and the
    replicate means match a python replay computing weights from the
    SAME Spark hash uniforms (inverse-CDF convention pinned)."""
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators.stats import (
        _POISSON1_CDF,
        poisson_bootstrap,
    )

    rows = [(i, float(10 + (i % 7))) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x double")
    a = poisson_bootstrap(df, "x", "id", n_replicates=40).first()
    b = poisson_bootstrap(df, "x", "id", n_replicates=40).first()
    assert (a["boot_lo"], a["boot_hi"]) == (b["boot_lo"], b["boot_hi"])
    assert a["n"] == 50

    # python replay from Spark's own uniforms
    unis = {
        (r["id"], rep): r[f"u{rep}"]
        for rep in range(40)
        for r in df.select(
            "id",
            *[
                (F.xxhash64("id", F.lit(rr)) / F.lit(2.0 ** 64) + 0.5)
                .alias(f"u{rr}")
                for rr in range(40)
            ],
        ).collect()
    }
    means = []
    for rep in range(40):
        sx = sw = 0.0
        for i, x in rows:
            u = unis[(i, rep)]
            w = sum(1 for c in _POISSON1_CDF if c <= u)
            sx += w * x
            sw += w
        means.append(sx / sw)
    means.sort()
    # operator indices: lo = max(1, floor(40*0.025)) = 1 -> means[0];
    # hi = min(40, floor(40*0.975)+1) = 40 -> means[39]
    import math
    assert math.floor(40 * 0.975) + 1 == 40
    assert a["boot_lo"] == means[0]
    assert a["boot_hi"] == means[39]


def test_poisson_bootstrap_covers_and_shrinks(spark):
    """The 95% interval contains the true mean on well-behaved data,
    and a 16x larger sample gives a ~4x narrower interval."""
    import numpy as np

    from spark_iceberg_schema_evolution_spark.operators.stats import (
        poisson_bootstrap,
    )

    rng = np.random.RandomState(3)

    def ival(n):
        rows = [(i, float(v)) for i, v in enumerate(rng.normal(5, 2, n))]
        df = spark.createDataFrame(rows, "id long, x double")
        r = poisson_bootstrap(df, "x", "id", n_replicates=80).first()
        return r["boot_lo"], r["mean"], r["boot_hi"]

    lo, mean, hi = ival(400)
    assert lo < 5.0 < hi or abs(mean - 5.0) < 0.3  # sane coverage
    assert lo < mean < hi
    lo2, _, hi2 = ival(6400)
    assert (hi2 - lo2) < (hi - lo)

    import pytest as _p
    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with _p.raises(ValueError):
        poisson_bootstrap(df, "x", "id", n_replicates=5)
    with _p.raises(ValueError):
        poisson_bootstrap(df, "x", "id", ci=0.4)


def test_poisson_bootstrap_groups_and_nulls(spark):
    from spark_iceberg_schema_evolution_spark.operators.stats import (
        poisson_bootstrap,
    )

    rows = [(i, "a" if i % 2 else "b", float(i % 5)) for i in range(40)]
    rows.append((100, "a", None))
    df = spark.createDataFrame(rows, "id long, g string, x double")
    got = {
        r["g"]: r
        for r in poisson_bootstrap(
            df, "x", "id", n_replicates=40, group_cols=["g"]
        ).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["a"]["n"] == 20  # the NULL row is excluded
    for g in ("a", "b"):
        assert got[g]["boot_lo"] <= got[g]["mean"] <= got[g]["boot_hi"]
