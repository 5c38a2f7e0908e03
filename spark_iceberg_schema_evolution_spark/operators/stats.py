"""Evaluation & drift statistics — the measurement half of a training-data
pipeline (reference parity: none; these extend SURVEY.md §2.B's
training-data family with the operators that EVALUATE what the curation
operators produce).

Every operator here is formulated so the heavy math happens in exact
integer arithmetic (counts, scaled-integer "cents" measures, cross-
multiplied rank sums) and only the final, single division/sqrt happens in
double — making results bit-identical across engines and across shuffle
orders (integer sums are order-independent; IEEE-754 requires correctly
rounded /, *, sqrt, so a fixed-shape final expression over exact-integer
inputs is deterministic). No collect()s, no UDFs: everything is hash
aggregates and keyed windows that scale with the usual Spark levers
(AQE, shuffle partitions).

Scale notes are per-operator; the common pattern is that per-key state is
O(distinct scores / states / tokens), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "classifier_eval",
    "calibration_bins",
    "ab_welch",
    "bivariate_stats",
    "event_transitions",
    "cusum_changepoint",
    "autocorr_lag",
    "rank_fusion",
    "basket_rules",
]


def classifier_eval(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact classifier evaluation: ROC-AUC by rank-sum plus the best-F1
    operating point, in ONE pass over a grouped-by-score frame.

    ``label_col`` must be 0/1 int; ``score_col`` should be integral (or
    pre-quantized — AUC only consumes the ordering, so quantizing to any
    monotone integer grid preserves it up to tie granularity).

    AUC via the Mann-Whitney U statistic with the standard tie
    correction, kept exact by scaling by 2:

        2U = sum over distinct scores s of  n_pos(s) * (2 * N_below(s)
                                            + n_neg(s))
        AUC = 2U / (2 * P * N)

    where N_below(s) counts negatives with score strictly below s. Every
    term is an integer; the one double division is the last step.

    The F1 sweep reuses the same grouped frame cumulated from the top
    (predict positive when score >= t):  F1(t) = 2*TP / (P + TP + FP),
    compared across thresholds in exact parts-per-million integer space
    (``2*TP*1_000_000 div (P+TP+FP)``) with the smallest threshold
    winning ties — no float argmax.

    Scale: the grouped frame has one row per DISTINCT score, so the two
    ordered windows run over a frame that is tiny relative to the input
    (quantized scores at 100 TB are still only ~1e4-1e6 distinct values);
    the only row-scale work is the initial hash aggregate. Returns one
    row: n_pos, n_neg, u2, auc_r, best_thr, best_f1_ppm, tp, fp.
    """
    lbl = F.col(label_col).cast("long")
    g = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(lbl).alias("np"),
            F.sum(F.lit(1) - lbl).alias("nn"),
        )
    )
    w_below = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    w_top = W.orderBy(F.desc("s")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = g.select(
        "s",
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w_below), F.lit(0)).alias("cum_nn"),
        F.sum("np").over(w_top).alias("tp"),
        F.sum("nn").over(w_top).alias("fp"),
    )
    totals = c.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cum_nn") + F.col("nn"))).alias(
            "u2"
        ),
    )
    best = (
        c.crossJoin(F.broadcast(totals.select("n_pos")))
        .select(
            F.col("s").alias("best_thr"),
            "tp",
            "fp",
            F.expr(
                "(2 * tp * 1000000) div (n_pos + tp + fp)"
            ).alias("best_f1_ppm"),
        )
        .orderBy(F.desc("best_f1_ppm"), F.asc("best_thr"))
        .limit(1)
    )
    return totals.crossJoin(F.broadcast(best)).select(
        "n_pos",
        "n_neg",
        "u2",
        F.round(
            F.col("u2")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg")),
            4,
        ).alias("auc_r"),
        "best_thr",
        "best_f1_ppm",
        "tp",
        "fp",
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int,
) -> DataFrame:
    """Reliability-diagram data: fixed-width score bins vs observed
    positive rate. Integer bin ids (``score div width``) keep binning
    exact; the rate is the one rounded double. One hash aggregate."""
    lbl = F.col(label_col).cast("long")
    return (
        df.groupBy(
            F.expr(f"{score_col} div {bin_width}").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lbl).alias("n_pos"),
        )
        .select(
            "bin",
            (F.col("bin") * bin_width).alias("bin_lo"),
            "n",
            "n_pos",
            F.round(
                F.col("n_pos").cast("double") / F.col("n"), 4
            ).alias("pos_rate_r"),
        )
    )


def ab_welch(
    df: DataFrame,
    segment_col: str,
    group_col: str,
    metric_int_col: str,
    conversion_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Per-segment A/B experiment readout: Welch's t statistic on an
    exact-integer metric plus Wilson score intervals for the conversion
    rate of the treatment arm — ONE hash aggregate per segment, both
    arms folded via conditional sums (no self-join, no pivot shuffle).

    ``group_col`` is the 0/1 treatment flag, ``metric_int_col`` an
    integer (cents-scaled) measure, ``conversion_col`` a 0/1 flag.
    Moments (n, sum x, sum x^2) are exact integers per arm; mean /
    variance / t / Wilson bounds are fixed-shape double expressions over
    them, so the output is engine- and partitioning-independent. Sum of
    squares of cents-scale metrics stays within int64 to ~1e10 rows per
    segment; beyond that, pre-aggregate per sub-key first.

    Welch: t = (m1 - m0) / sqrt(v1/n1 + v0/n0) with sample variances
    v = (sxx - sx*sx/n) / (n-1).  Wilson (treatment arm): the standard
    z^2-corrected interval.
    """
    grp = F.col(group_col).cast("long")
    x = F.col(metric_int_col).cast("long")
    conv = F.col(conversion_col).cast("long")
    agg = df.groupBy(segment_col).agg(
        F.sum(grp).alias("n1"),
        F.sum(1 - grp).alias("n0"),
        F.sum(grp * x).alias("sx1"),
        F.sum((1 - grp) * x).alias("sx0"),
        F.sum(grp * x * x).alias("sxx1"),
        F.sum((1 - grp) * x * x).alias("sxx0"),
        F.sum(grp * conv).alias("c1"),
    )
    return welch_readout(agg, segment_col, z=z)


def bivariate_stats(
    df: DataFrame,
    key_cols: list[str],
    x_int_col: str,
    y_int_col: str,
) -> DataFrame:
    """Bivariate statistics family — Pearson correlation, sample
    covariance and the OLS regression of y on x (slope, intercept, R^2)
    — per group in ONE hash aggregate over exact int64 moments.

    Unlike the native ``corr``/``covar_samp``/``regr_*`` aggregates,
    whose streaming co-moment updates are accumulation-order-dependent
    in the last ulp (and therefore partition-count- and engine-
    dependent), this folds (n, Sx, Sy, Sxy, Sxx, Syy) as integer sums —
    order-independent — and assembles the readout with a fixed-shape
    double expression (the :func:`ab_welch` discipline):

        cxy = Sxy - Sx*Sy/n ;  cxx = Sxx - Sx^2/n ;  cyy = Syy - Sy^2/n
        corr = cxy / sqrt(cxx*cyy) ;  covar_samp = cxy/(n-1)
        slope = cxy/cxx ;  icept = Sy/n - slope*(Sx/n) ;  r2 = cxy^2/(cxx*cyy)

    Inputs must already be integral (pre-quantized); int64 holds Sxx to
    ~8e8 rows per group at 1e5-magnitude x. int64→double conversion is
    correctly rounded on every engine, so the readout is bit-identical
    regardless of magnitude. Zero-variance groups return NULL for the
    undefined statistics instead of a division artifact."""
    x = F.col(x_int_col).cast("long")
    y = F.col(y_int_col).cast("long")
    m = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cxy = F.col("sxy").cast("double") - sx * sy / nd
    cxx = F.col("sxx").cast("double") - sx * sx / nd
    cyy = F.col("syy").cast("double") - sy * sy / nd
    pos = (cxx > 0) & (cyy > 0)
    return m.select(
        *key_cols,
        "n",
        F.when(pos, cxy / F.sqrt(cxx * cyy)).alias("corr"),
        F.when(F.col("n") > 1, cxy / (nd - 1.0)).alias("covar_samp"),
        F.when(cxx > 0, cxy / cxx).alias("slope"),
        F.when(cxx > 0, sy / nd - cxy / cxx * (sx / nd)).alias("icept"),
        F.when(pos, cxy * cxy / (cxx * cyy)).alias("r2"),
    )


def welch_readout(
    agg: DataFrame, segment_col: str, z: float = 1.96
) -> DataFrame:
    """Assemble the :func:`ab_welch` output columns from a frame of
    per-segment integer moments (n1, n0, sx1, sx0, sxx1, sxx0, c1).

    Split out so INCREMENTALLY maintained moments produce the identical
    readout: the moment sums are commutative monoids, so a rollup table
    updated batch-by-batch (``rollup.refresh_rollup`` over per-row
    products) lands on exactly the same integers as the one-shot
    aggregate — and this fixed-shape double expression then lands on
    exactly the same t statistic and Wilson bounds, bit for bit.

    Degenerate segments are guarded explicitly: an arm with n < 2 has
    no sample variance, so the Welch t is NULL (not a divide-by-zero
    artifact); an empty arm NULLs its mean, and an empty treatment arm
    NULLs the Wilson bounds — a segment that can't support the readout
    can't masquerade as a valid one."""

    def mean(sx: str, n: str) -> Column:
        return F.col(sx).cast("double") / F.col(n)

    def var(sxx: str, sx: str, n: str) -> Column:
        nd = F.col(n).cast("double")
        sxd = F.col(sx).cast("double")
        return (F.col(sxx).cast("double") - sxd * sxd / nd) / (nd - 1)

    m1, m0 = mean("sx1", "n1"), mean("sx0", "n0")
    v1, v0 = var("sxx1", "sx1", "n1"), var("sxx0", "sx0", "n0")
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    t = (m1 - m0) / F.sqrt(v1 / n1d + v0 / n0d)
    phat = F.col("c1").cast("double") / n1d
    z2 = z * z
    denom = 1.0 + z2 / n1d
    center = (phat + z2 / (2.0 * n1d)) / denom
    half = (
        z
        * F.sqrt(phat * (1.0 - phat) / n1d + z2 / (4.0 * n1d * n1d))
        / denom
    )
    has0 = F.col("n0") >= 1
    has1 = F.col("n1") >= 1
    both2 = (F.col("n0") >= 2) & (F.col("n1") >= 2)
    return agg.select(
        segment_col,
        "n0",
        "n1",
        F.when(has0, F.round(m0, 4)).alias("mean0_r"),
        F.when(has1, F.round(m1, 4)).alias("mean1_r"),
        F.when(both2, F.round(t, 4)).alias("welch_t_r"),
        "c1",
        F.when(has1, F.round(center - half, 4)).alias("wilson_lo_r"),
        F.when(has1, F.round(center + half, 4)).alias("wilson_hi_r"),
    )


def event_transitions(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: lag the state within each key's time order, count
    (prev -> curr) pairs corpus-wide, and attach exact parts-per-million
    transition probabilities (``n * 1_000_000 div row_total``).

    Two shuffles, both necessary: the keyed lag window, then the global
    (prev, curr) aggregate; the per-prev row totals ride a window over
    the already-aggregated matrix (state-cardinality^2 rows, trivially
    small) instead of a third shuffle. Scale: per-key window state is
    one row; the matrix is O(|states|^2) regardless of input size."""
    w = W.partitionBy(*key_cols).orderBy(ts_col, tiebreak)
    pairs = (
        df.select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("curr_state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "curr_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_prev = W.partitionBy("prev_state")
    return pairs.select(
        "prev_state",
        "curr_state",
        "n",
        F.sum("n").over(w_prev).alias("n_from_prev"),
        F.expr("(n * 1000000) div sum(n) over (partition by prev_state)")
        .alias("p_ppm"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_int_col: str,
    tiebreak: str,
) -> DataFrame:
    """Exact CUSUM-style changepoint statistic per key: the maximum
    absolute deviation of the running sum from its straight line to the
    total,

        D = max_i | n * S_i - i * S_n |        (all integers)

    which is n times the classic ``max |S_i - i * mean|`` drift statistic
    — the level-shift changepoint estimator. The argmax index (smallest i
    on ties) is the estimated changepoint. Everything before the final
    normalization is int64 (safe while n * |S_n| < 9e18 per key; at
    cents scale that is ~1e7 observations per key — pre-bucket longer
    series first).

    One shuffle: the per-key ordered window computes i and S_i, the
    unordered same-key window supplies n and S_n without re-shuffling
    (same partitioning), and the final per-key aggregate reuses the
    window's hash partitioning under AQE."""
    x = F.col(value_int_col).cast("long")
    w_ord = (
        W.partitionBy(*key_cols)
        .orderBy(ts_col, tiebreak)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(*key_cols)
    staged = df.select(
        *key_cols,
        F.row_number()
        .over(W.partitionBy(*key_cols).orderBy(ts_col, tiebreak))
        .alias("i"),
        F.sum(x).over(w_ord).alias("s_i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(x).over(w_all).alias("s_n"),
    ).withColumn(
        "d",
        F.abs(
            F.col("n") * F.col("s_i") - F.col("i") * F.col("s_n")
        ),
    )
    with_max = staged.withColumn("d_max", F.max("d").over(w_all))
    return (
        with_max.groupBy(*key_cols)
        .agg(
            F.first("n").alias("n_obs"),
            F.first("d_max").alias("d_max"),
            F.min(
                F.when(F.col("d") == F.col("d_max"), F.col("i"))
            ).alias("cp_index"),
        )
        .select(
            *key_cols,
            "n_obs",
            "cp_index",
            "d_max",
            F.round(
                F.col("d_max").cast("double")
                / (F.col("n_obs").cast("double") * F.col("n_obs")),
                4,
            ).alias("drift_r"),
        )
    )


def autocorr_lag(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_int_col: str,
    tiebreak: str,
    lag: int = 1,
    min_pairs: int = 10,
) -> DataFrame:
    """Per-key lag-k autocorrelation from exact integer moments: pair
    each observation with its lag-k predecessor in time order, then fold
    (n, Sx, Sy, Sxy, Sxx, Syy) as int64 sums and assemble Pearson r with
    fixed-shape double math:

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    The two variance terms are computed exactly in int64 (safe to ~2e5
    cents-scale observations per key; the doc for :func:`ab_welch`'s
    double fallback applies beyond), converted exactly to double
    (< 2^53), multiplied once, sqrt'd once — deterministic across
    engines. Keys with a zero-variance side return NULL r.

    One keyed-window shuffle; the moment aggregate reuses the window's
    partitioning. Unlike ``corr()``, whose streaming co-moment updates
    are accumulation-order-dependent in the last ulp, this is exact."""
    x = F.col(value_int_col).cast("long")
    w = W.partitionBy(*key_cols).orderBy(ts_col, tiebreak)
    pairs = df.select(
        *key_cols,
        F.lag(x, lag).over(w).alias("xv"),
        x.alias("yv"),
    ).where(F.col("xv").isNotNull())
    m = pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    a = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    b = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (a > 0) & (b > 0),
        F.round(
            num.cast("double")
            / F.sqrt(a.cast("double") * b.cast("double")),
            4,
        ),
    )
    return m.where(F.col("n") >= min_pairs).select(
        *key_cols, "n", r.alias("autocorr_r")
    )


def rank_fusion(
    df: DataFrame,
    id_cols: list[str],
    signals: list[tuple[str, Column | list[Column]]],
    k: int = 60,
    top_n: int = 200,
) -> DataFrame:
    """Reciprocal-rank fusion of multiple ranking signals (the standard
    parameter-free ensemble for quality scores / retrieval runs):

        rrf(d) = sum over signals s of  1 / (k + rank_s(d))

    with absent-from-a-list contributing 0. Each signal is (name,
    ordering Column or list of Columns); ranks are row_number over that
    ordering, so the caller's ordering MUST embed a unique tiebreak
    (pass ``[F.desc(signal), F.asc(id)]``) for determinism.

    Scale path: a corpus-global rank is the one-partition window trap,
    so each signal first takes its top_n rows via TakeOrdered (fully
    distributed), and only that bounded candidate frame gets the
    single-partition row_number — O(top_n * signals) window work no
    matter the corpus size. Candidate lists merge by full outer join on
    the ids (broadcast-sized). The fused score is a fixed-shape sum of
    1/(k+r) doubles in declared signal order — deterministic across
    engines."""
    fused = None
    for name, ordering in signals:
        order_cols = (
            list(ordering) if isinstance(ordering, (list, tuple))
            else [ordering]
        )
        ranked = (
            df.orderBy(*order_cols)
            .limit(top_n)
            .select(
                *id_cols,
                F.row_number()
                .over(W.orderBy(*order_cols))
                .alias(f"r_{name}"),
            )
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, id_cols, "full_outer")
        )
    score = None
    for name, _ in signals:
        term = F.coalesce(
            1.0 / (F.lit(k) + F.col(f"r_{name}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return fused.select(
        *id_cols,
        *[f"r_{name}" for name, _ in signals],
        F.round(score, 6).alias("rrf_r"),
    )


def basket_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_pair_support: int = 5,
    max_basket_items: int = 100,
) -> DataFrame:
    """Association rules over item co-occurrence in baskets (market-
    basket / event-type affinity): for unordered item pairs {a, b}
    sharing a basket, exact ppm support, both-direction confidence, and
    cross-multiplied lift:

        support  = c_ab * 1e6 div n_baskets
        conf a>b = c_ab * 1e6 div c_a          (and b>a symmetrically)
        lift     = c_ab * n_baskets * 1e6 div (c_a * c_b)   (DECIMAL38)

    Pair generation is a basket-keyed self equi-join of the DISTINCT
    (basket, item) frame with ``a < b`` — co-location by basket key, no
    cross product; ``max_basket_items`` guards the quadratic blowup of
    pathological hot baskets (raises, like fuzzy_join's block guard).
    Item supports count baskets CONTAINING the item (set semantics).
    Scale: one distinct + one self-join shuffle on basket keys, then an
    item-pair aggregate; supports join broadcast (item vocabulary is
    small)."""
    items = df.select(
        *basket_cols, F.col(item_col).alias("item")
    ).distinct()
    sizes = items.groupBy(*basket_cols).agg(
        F.count(F.lit(1)).alias("bsize")
    )
    oversized = sizes.where(F.col("bsize") > max_basket_items)
    if oversized.limit(1).count() > 0:
        raise ValueError(
            f"basket with > {max_basket_items} distinct items; raise "
            "max_basket_items or pre-filter the item domain"
        )
    n_baskets = sizes.agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    supp = items.groupBy("item").agg(F.count(F.lit(1)).alias("c_i"))
    a = items.select(*basket_cols, F.col("item").alias("ia"))
    b = items.select(*basket_cols, F.col("item").alias("ib"))
    pairs = (
        a.join(b, basket_cols)
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_pair_support)
    )
    return (
        pairs.crossJoin(F.broadcast(n_baskets))
        .join(
            F.broadcast(
                supp.select(
                    F.col("item").alias("ia"), F.col("c_i").alias("c_a")
                )
            ),
            "ia",
        )
        .join(
            F.broadcast(
                supp.select(
                    F.col("item").alias("ib"), F.col("c_i").alias("c_b")
                )
            ),
            "ib",
        )
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            "c_ab",
            "c_a",
            "c_b",
            F.expr("(c_ab * 1000000) div n_baskets").alias(
                "support_ppm"
            ),
            F.expr("(c_ab * 1000000) div c_a").alias("conf_ab_ppm"),
            F.expr("(c_ab * 1000000) div c_b").alias("conf_ba_ppm"),
            F.expr(
                "CAST((CAST(c_ab AS DECIMAL(38,0)) * n_baskets"
                " * 1000000) div (CAST(c_a AS DECIMAL(38,0)) * c_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 1000,
) -> dict:
    """Isotonic (PAV) calibration of classifier scores in [0, 1] — the
    post-hoc step between a trained quality head
    (``similarity.logreg_fit``) and a threshold decision: maps raw
    scores to empirically calibrated probabilities under the one
    assumption that calibration is monotone (Zadrozny & Elkan 2002;
    what sklearn's ``IsotonicRegression`` does, here fit distributedly).

    Scale shape: the corpus pays ONE hash aggregate — scores bucket
    into ``n_bins`` fixed-width bins, each bin reduces to (n, n_pos) —
    and the pool-adjacent-violators pass runs driver-side over the
    bounded bin list (planning metadata, the k-means-update class).
    Returns a literal model dict: ``bin_edges`` implicit via
    ``n_bins``, ``values`` = calibrated probability per bin
    (non-decreasing by construction), ``n_fit`` rows used. Rows with
    NULL score/label are excluded and counted in ``n_skipped``; scores
    outside [0, 1] raise."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    ok = s.isNotNull() & y.isNotNull()
    oob = df.where(
        ok & ((s < 0) | (s > 1))
    ).limit(1).count()
    if oob:
        raise ValueError("scores must lie in [0, 1]")
    binned = (
        df.where(ok)
        .groupBy(
            F.least(
                F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
            ).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("n_pos"))
        .orderBy("bin")
        .collect()
    )
    n_skipped = df.where(~ok).count()
    if not binned:
        raise ValueError("no usable (score, label) rows")
    # PAV over occupied bins: pool adjacent blocks while the weighted
    # mean sequence decreases
    blocks = [
        [r["bin"], r["bin"], float(r["n_pos"]), float(r["n"])]
        for r in binned
    ]
    out: list = []
    for blk in blocks:
        out.append(blk)
        while len(out) > 1 and (
            out[-2][2] * out[-1][3] > out[-1][2] * out[-2][3]
        ):  # mean(prev) > mean(last) -> pool
            b = out.pop()
            out[-1][1] = b[1]
            out[-1][2] += b[2]
            out[-1][3] += b[3]
    # expand to a per-bin value vector; empty bins take the value of
    # the covering/preceding block (step function, right-continuous)
    values = [None] * n_bins
    for lo, hi, pos, n in out:
        v = pos / n
        for i in range(lo, hi + 1):
            values[i] = v
    last = None
    for i in range(n_bins):
        if values[i] is None:
            values[i] = last if last is not None else 0.0
        last = values[i]
    return {
        "n_bins": n_bins,
        "values": values,
        "n_fit": int(sum(r["n"] for r in binned)),
        "n_skipped": int(n_skipped),
    }


def isotonic_apply(
    df: DataFrame,
    model: dict,
    score_col: str,
    out_col: str = "calibrated",
) -> DataFrame:
    """Apply an :func:`isotonic_fit` model: bin lookup against the
    plan-literal value vector — a zero-shuffle pure-JVM map (the
    kmeans_assign / linear_classifier_score apply discipline). NULL or
    out-of-[0,1] scores calibrate to NULL."""
    n_bins = model["n_bins"]
    vals = F.array(*[F.lit(float(v)) for v in model["values"]])
    s = F.col(score_col).cast("double")
    idx = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    ok = s.isNotNull() & (s >= 0) & (s <= 1)
    return df.withColumn(
        out_col, F.when(ok, F.element_at(vals, idx + 1))
    )


# Poisson(1) CDF breakpoints P(X <= k), k = 0..9: a replicate weight is
# the count of breakpoints <= u for a hash-uniform u — inverse-CDF
# sampling as a pure plan literal (P(X <= 9) leaves ~1e-10 mass).
_POISSON1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988805587020,
    0.9999998874797402,
]


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    ci: float = 0.95,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Error bars for a mean at corpus scale in ONE scan: the Poisson
    bootstrap (the resampling scheme production A/B systems use when
    the data cannot be materialized per-replicate — each row joins
    replicate r with weight ~ Poisson(1), independent across
    replicates, so each weighted mean is a bootstrap draw). Returns
    per group: ``mean`` (unweighted), ``boot_lo``/``boot_hi`` (the
    ``ci`` percentile interval over replicate means), ``n``.

    Fully deterministic and engine-portable: replicate weights come
    from inverse-CDF sampling of a hash uniform
    (``xxhash64(id, r)``), with the Poisson(1) CDF shipped as plan
    literals — re-running, re-partitioning, or growing the cluster
    never changes the interval (no ``rand()``, which would break all
    three). Scale shape: one hash aggregate computing
    ``2 * n_replicates`` conditional sums (map-side combine); the
    replicate-mean array sorts INSIDE the row (``sort_array`` over an
    n_replicates-length array — bounded), so no second pass and no
    driver-side percentile. NULL values are excluded row-wise."""
    if n_replicates < 10:
        raise ValueError(f"n_replicates must be >= 10: {n_replicates}")
    if not 0.5 < ci < 1.0:
        raise ValueError(f"ci must be in (0.5, 1): {ci}")
    x = F.col(value_col).cast("double")
    ok = x.isNotNull()
    cdf = F.array(*[F.lit(c) for c in _POISSON1_CDF])

    def weight(r: int) -> F.Column:
        # uniform in [0, 1) from the signed 64-bit hash
        u = (
            F.xxhash64(F.col(id_col), F.lit(r)) / F.lit(2.0 ** 64)
            + F.lit(0.5)
        )
        return F.size(F.filter(cdf, lambda b: b <= u))

    aggs = [
        F.count(F.when(ok, 1)).alias("n"),
        F.avg(F.when(ok, x)).alias("mean"),
    ]
    for r in range(n_replicates):
        w = F.when(ok, weight(r)).otherwise(F.lit(0))
        aggs.append(F.sum(w * x).alias(f"__sx{r}"))
        aggs.append(F.sum(w).alias(f"__sw{r}"))
    grouped = df.groupBy(*(group_cols or [])).agg(*aggs)
    # a replicate with total weight 0 (only possible for tiny groups,
    # P ~ e^-n) yields a NULL mean: drop it and index the surviving
    # draws dynamically, so small groups degrade to wider-but-valid
    # intervals instead of NULL bounds
    means = F.sort_array(
        F.filter(
            F.array(
                *[
                    F.col(f"__sx{r}")
                    / F.nullif(
                        F.col(f"__sw{r}").cast("double"), F.lit(0.0)
                    )
                    for r in range(n_replicates)
                ]
            ),
            lambda m: m.isNotNull(),
        )
    )
    alpha = (1.0 - ci) / 2.0
    m = F.size(means)
    lo_i = F.greatest(F.lit(1), F.floor(m * alpha).cast("int"))
    hi_i = F.least(m, F.floor(m * (1.0 - alpha)).cast("int") + 1)
    keep = (group_cols or []) + ["n", "mean"]
    return grouped.select(
        *keep,
        F.when(m > 0, F.element_at(means, lo_i)).alias("boot_lo"),
        F.when(m > 0, F.element_at(means, hi_i)).alias("boot_hi"),
    )
