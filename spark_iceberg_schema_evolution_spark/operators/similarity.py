"""Similarity search over embedding columns (`array<float>`).

North-star extension: brute-force cosine top-k as the exact baseline, and
a random-hyperplane LSH-bucketed variant as the scale path (candidates
from matching signature buckets only, then exact re-rank).

Scale notes:
- Dot products run inside the ``aggregate``/``zip_with`` HOFs —
  whole-stage-codegen JVM loops, no Python in the hot path.
- ``cosine_topk`` broadcasts the (small) query set; the corpus is never
  shuffled — score then per-query top-k via window.
- ``lsh_topk`` computes per-row bit signatures from deterministic seeded
  hyperplanes; the corpus shuffles once on the signature prefix-bucket.
"""

from __future__ import annotations

import math

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via module globals)

from pyspark.sql import Column, DataFrame, Window as Wnd, functions as F

# nearest-centroid assignment switches from the plan-literal HOF argmin
# to the Arrow/BLAS path above this many literals (num_centroids * dim):
# HOF lambdas are interpreted per element, so a sqrt(n)-scale coarse
# quantizer (1024 cells x 64 dims = 65k literals) made the corpus
# encode the dominant cost of the r13 1M-vector probe — while one
# matmul per Arrow batch does the same assignment at memory bandwidth.
# Small quantizers (every registry face / pytest fixture) keep the
# zero-python literal path and its bit-stable plan.
_ASSIGN_LITERAL_BUDGET = 16_384


def _nearest_centroid_col(cents: list[list[float]], vcol: Column) -> Column:
    """int index of the L2-nearest centroid to ``vcol``.

    Literal-HOF argmin (codegen, zero python) for small models; above
    ``_ASSIGN_LITERAL_BUDGET`` literals, an Arrow-batched pandas_udf
    whose body is ONE BLAS matmul per batch — the FAISS assignment
    shape. The centroid matrix ships to executors once inside the UDF
    closure instead of being re-inlined into every expression tree.
    Ties break to the lowest cell id on both paths (struct (d, c) min
    vs numpy first-occurrence argmin)."""
    k, dim = len(cents), len(cents[0])
    if k * dim < _ASSIGN_LITERAL_BUDGET:  # strict: boundary -> Arrow
        lit = _centroid_literal(list(enumerate(cents)))

        # bind the (possibly computed) vector expression once per row:
        # referenced inside the per-centroid lambda it would re-evaluate
        # k times (HOF lambdas are interpreted — see dedup.bind_once)
        def dists_of(v: Column) -> Column:
            return F.transform(
                lit,
                lambda s: F.struct(
                    fold_sum(
                        F.zip_with(
                            v, s["v"], lambda a, b: (a - b) * (a - b)
                        )
                    ).alias("d"),
                    s["c"].alias("c"),
                ),
            )

        return F.array_min(
            F.get(F.transform(F.array(vcol), dists_of), 0)
        )["c"]

    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    c_sq = (C ** 2).sum(axis=1)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        import numpy as np  # executor-side

        X = np.stack(v.to_numpy())
        # ||x-c||^2 ordering: the ||x||^2 term is constant per row
        d = X @ C.T
        d *= -2.0
        d += c_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return assign(vcol)


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum (element order, engine-independent)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column) -> Column:
    return F.sqrt(fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize an array column (NULL-safe: zero vector -> NULL)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n))


def avg_pool(arrs: Column) -> Column:
    """Element-wise mean of an array-of-arrays column (e.g. after
    collect_list): zip_with fold divided by count."""
    n = F.size(arrs)
    summed = F.aggregate(
        arrs,
        F.transform(F.element_at(arrs, 1), lambda x: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    return F.transform(summed, lambda x: x / n)


def linear_classifier_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "clf_score",
) -> DataFrame:
    """Apply a trained linear classifier head to an embedding column:
    ``sigmoid(w . x + b)`` — the model-based quality-filter shape
    (fastText-style language/quality models, the "educational value"
    classifiers of phi/FineWeb-Edu-style curation: train offline on a
    bounded labeled set, score the whole corpus with the frozen head).

    Scale shape: the weight vector ships as a plan-time literal array,
    so scoring is a zero-shuffle map inside whole-stage codegen — no
    broadcast join, no UDF, no model server. Rows with a NULL or
    wrong-length vector score NULL (never a fake 0.5). Compose with
    ``quantile_band_filter`` or a plain threshold for the keep
    decision."""
    w = F.expr(lit_double_array_sql(weights))
    z = dot(as_double(F.col(vec_col)), w) + F.lit(float(bias))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ok = F.col(vec_col).isNotNull() & (
        F.size(F.col(vec_col)) == len(weights)
    )
    return df.withColumn(out_col, F.when(ok, score))


def logreg_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    n_iter: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> dict:
    """TRAIN the linear quality classifier in the engine: full-batch
    logistic-regression gradient descent over an embedding column —
    the fit half of :func:`linear_classifier_score` (fastText/
    FineWeb-Edu-style curation trains a small head on a labeled set,
    then scores the whole corpus with the frozen weights; this keeps
    the training pass distributed instead of exporting to a notebook).

    Each step is ONE hash aggregate over the training frame: the
    current weights ride the plan as literals, the per-row error
    ``sigmoid(w.x + b) - y`` folds into per-dimension mean-gradient
    sums (``dim + 1`` avg aggregates, partial map-side combine), and
    the (dim+1)-row result collects as bounded planning metadata — the
    same class as the PageRank dangling-mass probe and the k-means
    update. No UDF, no driver-side feature matrix: the corpus never
    leaves the executors, so the labeled set may be arbitrarily large.
    Update rule: ``w -= lr * (mean_grad + l2 * w)``; the bias is
    unregularized (standard convention). A 1e-9 numpy replica pins the
    rule in tests/test_kmeans.py. Sized for LINEAR HEADS: per-step
    driver cost is Catalyst analysis of dim+1 aggregates (scales with
    dim, not rows) — right for the dim ≲ 1k quality-head regime this
    implements, wrong for deep-model training, which is out of scope.

    Rows with a NULL label or NULL/wrong-length vector are EXCLUDED
    from training and counted in ``n_skipped``; labels outside {0, 1}
    raise. Returns a literal model dict: ``weights``, ``bias``,
    ``loss`` (final mean softplus log-loss), ``n_train``,
    ``n_skipped`` — feed ``weights``/``bias`` straight to
    :func:`linear_classifier_score`."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1: {n_iter}")
    if lr <= 0:
        raise ValueError(f"lr must be > 0: {lr}")
    dim_row = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    if dim_row is None:
        raise ValueError("no non-null vectors to train on")
    dim = dim_row["d"]
    ok = (
        F.col(label_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) == dim)
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_train"),
        F.sum(
            F.when(
                F.col(label_col).isNotNull()
                & ~F.col(label_col).cast("double").isin(0.0, 1.0),
                1,
            ).otherwise(0)
        ).alias("n_bad_label"),
    ).first()
    if stats["n_bad_label"]:
        raise ValueError(
            f"{stats['n_bad_label']} labels outside {{0, 1}}"
        )
    if not stats["n_train"]:
        raise ValueError("no trainable rows (all NULL/wrong-length)")
    t = df.where(ok).select(
        F.col(label_col).cast("double").alias("__y"),
        as_double(F.col(vec_col)).alias("__x"),
    )
    w = [0.0] * dim
    b = 0.0
    for _ in range(n_iter):
        wlit = F.expr(lit_double_array_sql(w))
        z = dot(F.col("__x"), wlit) + F.lit(b)
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) - F.col("__y")
        row = t.agg(
            *[
                F.avg(err * F.element_at("__x", i + 1)).alias(f"g{i}")
                for i in range(dim)
            ],
            F.avg(err).alias("gb"),
        ).first()
        w = [
            w[i] - lr * (row[f"g{i}"] + l2 * w[i]) for i in range(dim)
        ]
        b = b - lr * row["gb"]
    wlit = F.expr(lit_double_array_sql(w))
    z = dot(F.col("__x"), wlit) + F.lit(b)
    # stable softplus log-loss: log(1+e^z) - y*z == max(z,0) +
    # log1p(e^-|z|) - y*z
    loss = t.agg(
        F.avg(
            F.greatest(z, F.lit(0.0))
            + F.log1p(F.exp(-F.abs(z)))
            - F.col("__y") * z
        ).alias("l")
    ).first()["l"]
    return {
        "weights": w,
        "bias": b,
        "loss": float(loss),
        "n_train": int(stats["n_train"]),
        "n_skipped": int(stats["n_all"] - stats["n_train"]),
        "dim": dim,
        "n_iter": n_iter,
        "lr": lr,
        "l2": l2,
    }


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998) of a per-query candidate list: greedily pick
    ``argmax  lambda * relevance - (1 - lambda) * max cosine to the
    already-picked set`` until ``k`` results — the standard RAG-retrieval
    re-rank that stops near-duplicate passages from crowding out
    coverage.

    Scale shape: ``candidates`` is an ANN top-N per query (tens of rows
    per group by construction), so the inherently sequential greedy
    argmax runs per query group in ``applyInPandas`` — the justified
    Pandas-UDF case (no DataFrame composition expresses a loop whose
    step depends on the picked set). Everything corpus-sized stays in
    the join that fetches candidate vectors; the Python stage only ever
    sees k-ish rows per query. Deterministic: candidates sort by
    (score desc, id asc) before the greedy pass, ties pick the first."""
    import pandas as pd

    joined = candidates.select(query_id, corpus_id, score_col).join(
        corpus.select(
            F.col(corpus_id), as_double(F.col(vec_col)).alias("__v")
        ),
        corpus_id,
    )
    out_schema = (
        joined.select(query_id, corpus_id, score_col)
        .withColumn("mmr_rank", F.lit(1))
        .schema
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            [score_col, corpus_id], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        max_sim = np.zeros(n)
        picked: list[int] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            mmr = lambda_ * rel - (1 - lambda_) * max_sim
            mmr[~avail] = -np.inf
            i = int(mmr.argmax())
            picked.append(i)
            avail[i] = False
            max_sim = np.maximum(max_sim, Vn @ Vn[i])
        sel = pdf.iloc[picked][[query_id, corpus_id, score_col]].copy()
        sel["mmr_rank"] = range(1, len(picked) + 1)
        return sel

    return joined.groupBy(query_id).applyInPandas(pick, out_schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k of corpus rows per query row.

    Queries are broadcast (they are small by construction); the corpus side
    streams through a map-only scoring stage, then one shuffle for the
    per-query top-k window. Ties broken by corpus id for determinism.
    """
    # per-row norms materialized once per side: cosine is dot/(nc*nq),
    # and evaluating each norm at its source row instead of inside the
    # per-(corpus x query) expression is the same fold over the same
    # array — bit-identical score, O(rows) folds instead of O(pairs)
    c = corpus.select(
        F.col(corpus_id),
        as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id),
        as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        (
            dot(F.col("__cv"), F.col("__qv"))
            / (F.col("__cn") * F.col("__qn"))
        ).alias("score"),
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans centroids partition
    the corpus; each query searches only its ``n_probe`` nearest cells,
    then exact cosine re-ranks. The coarse-quantizer scale path: at 100 TB
    the corpus is written clustered by cell (partition pruning does the
    candidate selection), and the centroid model is a tiny broadcast.

    Scale shape (round-2 rework of both round-1 flags):

    - ``KMeans.fit`` trains on a BOUNDED sample — ``fit_fraction`` (uniform
      seeded sample) and/or ``max_fit_rows`` (hard cap; plain ``limit``, so
      rows come from the first partitions — pass ``fit_fraction`` too when
      the corpus is sorted in a way that biases those). The fit never scans
      the full corpus.
    - Cell assignment is a zero-shuffle map: centroids become a plan-time
      literal ``array<struct<dist_expr, cell_id>>`` and ``array_min`` picks
      the argmin inside codegen (struct comparison = (dist, cell) — the
      cell id is the deterministic tie-break). No crossJoin, no explode, no
      window over an inflated corpus.
    - Only the (small) query side expands: ``array_sort`` + ``slice`` +
      ``explode`` yields the ``n_probe`` nearest cells per query.
    """
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec_col)).alias("__cv")
    )
    fit_df = c.sample(fit_fraction, seed=seed) if fit_fraction else c
    fit_df = fit_df.limit(max_fit_rows)
    centroids = list(
        enumerate(
            _kmeans_np(_collect_fit_sample(fit_df), num_centroids, seed)
        )
    )

    # plan-time literal: array<struct<v: array<double>, c: int>>
    cent_lit = _centroid_literal(centroids)

    def cell_dists(vcol: Column) -> Column:
        """array<struct<d: double, c: int>> — squared distance to every
        centroid; struct order makes min/sort = (nearest, lowest cell)."""
        return F.transform(
            cent_lit,
            lambda s: F.struct(
                fold_sum(
                    F.zip_with(vcol, s["v"], lambda a, b: (a - b) * (a - b))
                ).alias("d"),
                s["c"].alias("c"),
            ),
        )

    c_cells = c.withColumn(
        "__cell",
        _nearest_centroid_col(
            [vec for _, vec in centroids], F.col("__cv")
        ),
    )
    q = queries.select(
        F.col(query_id), as_double(F.col(vec_col)).alias("__qv")
    ).withColumn(
        # query norm once per query row (it rides the broadcast) instead
        # of one l2 fold per (corpus, query) pair — same expression over
        # the same value, so the score is bit-identical (r13; the
        # cosine() expansion below keeps the identical operand order)
        "__rqn", l2_norm(F.col("__qv"))
    )
    q_cells = q.withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(F.array_sort(cell_dists(F.col("__qv"))), 1, n_probe),
                lambda s: s["c"],
            )
        ),
    )

    scored = (
        c_cells.join(F.broadcast(q_cells), "__cell")
        .select(
            query_id,
            corpus_id,
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (l2_norm(F.col("__cv")) * F.col("__rqn"))
            ).alias("score"),
        )
        .dropDuplicates([query_id, corpus_id])
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def cosine_near_dups(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    max_bucket_size: int = 1000,
    return_drop_stats: bool = False,
):
    """Embedding-cosine near-duplicate pairs: candidates from shared
    hyperplane-LSH buckets (any of ``num_tables`` tables), verified with
    exact cosine >= ``threshold``. The dedup-by-embedding variant of the
    MinHash text pipeline: candidate generation is subquadratic; only
    bucket-mates pay the exact-cosine cost.

    ``max_bucket_size`` mirrors the text-LSH skew guard: a bucket holding
    b vectors costs b^2/2 pairs, so one degenerate bucket (e.g. the
    all-zeros signature a constant embedding region collapses into) would
    otherwise go quadratic. The drop is never silent: pass
    ``return_drop_stats=True`` to get ``(pairs, drops)``, where ``drops``
    is a one-row DataFrame ``(dropped_buckets, dropped_entries)`` —
    oversize (table, signature) buckets discarded and the vector
    memberships they held. A dropped hot bucket deletes recall for its
    members; at scale that count belongs in the run's metrics, not a
    docstring."""
    base = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    )
    with_sig = base.select(
        "*",
        # per-row norm, materialized once: the verify step's cosine is
        # dot/(na*nb); computing each norm here instead of inside the
        # per-pair expression is the same fold over the same array
        # (bit-identical result), evaluated O(rows) instead of O(pairs)
        l2_norm(F.col("__v")).alias("__norm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("__table"),
                        hyperplane_signature(
                            "__v", dim, num_planes, seed + 1000 * t
                        ).alias("__sig"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("__ts"),
    ).select(id_col, "__v", "__norm", "__ts.__table", "__ts.__sig")
    sizes = with_sig.groupBy("__table", "__sig").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # skew guard as a window count over the SAME (table, sig) hash
    # partitioning the self-join below needs — one reusable exchange
    # instead of an aggregate + semi-join pair (r13); `sizes` remains
    # for the drop-stats audit arm only (evaluated only when asked)
    guard_w = Wnd.partitionBy("__table", "__sig")
    with_sig = (
        with_sig.withColumn(
            "__bn", F.count(F.lit(1)).over(guard_w)
        )
        .where(F.col("__bn") <= max_bucket_size)
        .drop("__bn")
    )
    a = with_sig.alias("a")
    b = with_sig.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__sig") == F.col("b.__sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            # same expression tree as cosine(a, b) — dot / (|a| * |b|) —
            # with the norms read from the per-row column above
            (
                dot(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__norm") * F.col("b.__norm"))
            ).alias("cos"),
        )
        # threshold BEFORE the dedup exchange: a pair seen in k tables
        # carries k bit-identical rows (same vectors -> same dot/norms),
        # so filtering first shuffles only the pairs that survive — the
        # dedup's row bag per (id_a, id_b) is all-pass or all-fail,
        # making filter-then-dedup exactly dedup-then-filter (guide §2.3:
        # shuffle fewer bytes)
        .where(F.col("cos") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    if not return_drop_stats:
        return pairs
    drops = sizes.where(F.col("__n") > max_bucket_size).agg(
        F.count(F.lit(1)).alias("dropped_buckets"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("dropped_entries"),
    )
    return pairs, drops


def lit_double_array_sql(values) -> str:
    """SQL text for a literal ``array<double>``.

    ``F.array(*[F.lit(float(x)) for x in values])`` pays one py4j
    round-trip per element (~1 ms each on this box); parsing the same
    literal via one ``F.expr`` is a single round-trip for the whole
    array. ``repr(float)`` round-trips doubles exactly and Spark's
    parser resolves the decimal string to the nearest double, so the
    parsed literal VALUES are bit-identical to the ``F.lit`` tree's
    (pinned by test_r13_opts). Finite values only — callers hold model
    weights/centroids, where a NaN/Inf is a bug worth raising on."""
    parts = []
    for x in values:
        x = float(x)
        if not math.isfinite(x):
            raise ValueError(
                f"lit_double_array_sql: non-finite value {x!r}"
            )
        parts.append(f"{x!r}D")
    return "array(" + ",".join(parts) + ")"


def hyperplane_signature(
    vec: Column | str, dim: int, num_planes: int = 16, seed: int = 42
) -> Column:
    """Deterministic random-hyperplane bit signature as a long.

    Plane weights are pseudo-random in {-1,+1} derived from
    ``xxhash64(plane, dim_index, seed)`` — computed as literal arrays at
    plan time (no RNG at execution), so signatures are reproducible
    everywhere.

    Pass ``vec`` as a COLUMN NAME (string) where possible: that path
    assembles the whole signature as one ``F.expr`` parse —
    ~3 py4j round-trips instead of ~650 per (table, 8 planes, dim 64)
    signature, which was 3.2 s of pure DRIVER time per q115 run
    (measured r13; the two trees produce bit-identical signatures,
    pinned by test_hyperplane_signature_expr_equivalence). The Column
    arm keeps the original tree for callers holding a computed column.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.choice([-1.0, 1.0], size=(num_planes, dim))
    if isinstance(vec, str):
        # same expression tree as the Column arm below, parsed from SQL
        # text in one shot: ((0 + t0) + t1) + ... with
        # tp = CAST((aggregate(zip_with(vec, planes[p], *), 0.0, +) > 0)
        #           AS BIGINT) * 2^p  — integer folds are exact and the
        # double fold is the same left fold in the same element order
        sig_sql = "CAST(0 AS BIGINT)"
        for p in range(num_planes):
            arr = lit_double_array_sql(planes[p])
            d = (
                f"aggregate(zip_with(`{vec}`, {arr}, (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x)"
            )
            sig_sql = f"({sig_sql} + (CAST(({d} > 0) AS BIGINT) * {1 << p}))"
        return F.expr(sig_sql)
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = (dot(vec, w) > 0).cast("long")
        sig = sig + (bit * (1 << p))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's hyperplane
    signature bucket in ANY of ``num_tables`` independent tables (standard
    multi-table LSH — recall compounds across tables while each bucket
    stays small); exact cosine re-ranks the candidate union. Recall trades
    off against ``num_planes`` (bucket size) and ``num_tables``."""

    def with_sigs(df: DataFrame, vcol: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("__table"),
                            hyperplane_signature(
                                vcol, dim, num_planes, seed + 1000 * t
                            ).alias("__sig"),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("__ts"),
        ).select("*", "__ts.__table", "__ts.__sig").drop("__ts")

    c = with_sigs(
        corpus.select(F.col(corpus_id), as_double(F.col(vec_col)).alias("__cv")),
        "__cv",
    )
    q = with_sigs(
        queries.select(F.col(query_id), as_double(F.col(vec_col)).alias("__qv")),
        "__qv",
    ).withColumn("__rqn", l2_norm(F.col("__qv")))  # see ivf_topk (r13)
    scored = (
        c.join(F.broadcast(q), ["__table", "__sig"])
        .select(
            query_id,
            corpus_id,
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (l2_norm(F.col("__cv")) * F.col("__rqn"))
            ).alias("score"),
        )
        .dropDuplicates([query_id, corpus_id])
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """Product-quantization top-k (PQ + ADC + exact re-rank): the
    compressed-domain ANN complement to ``ivf_topk``'s pruning. Each
    vector is encoded as ``m`` sub-space codebook indices (``ksub``
    centroids per sub-space — at ksub<=256 that is one byte per
    sub-space, a dim*4/m-fold compression of the scan payload), scored
    against a query by table lookups, and the top ``k*refine``
    candidates re-ranked with exact cosine.

    Scale shape:
    - Codebooks fit on a BOUNDED sample (same ``fit_fraction`` /
      ``max_fit_rows`` discipline as ``ivf_topk``); m tiny KMeans models.
    - Encoding is a zero-shuffle map: codebooks are plan-time literals,
      each sub-space code an ``array_min`` argmin in codegen. The exact
      vector norm is captured once here, so cosine needs no full vector
      later.
    - ADC: the m x ksub lookup table is computed ONCE per query on the
      (small, broadcast) query side; each corpus row then pays m array
      lookups + adds — not a full D-dim dot product. Only fixed-width
      (qid, id, score) rows enter the top-k shuffle.
    - Re-rank: the k*refine survivors (tiny) broadcast back against the
      original vectors for exact cosine — at 100 TB this is the only
      stage that touches full vectors per query, and it touches
      ~k*refine of them.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec_col)).alias("__cv")
    )
    fit_df = c.sample(fit_fraction, seed=seed) if fit_fraction else c
    fit_df = fit_df.limit(max_fit_rows)

    codebooks = _fit_subspace_codebooks(
        _collect_fit_sample(fit_df), dim, m, ksub, seed
    )
    encoded = c.select(
        corpus_id,
        _pq_codes_col(codebooks, dim, F.col("__cv")).alias("__codes"),
        l2_norm(F.col("__cv")).alias("__xn"),
    )
    return _pq_score_topk(
        encoded, codebooks, dim, c, queries,
        k=k, refine=refine, corpus_id=corpus_id, query_id=query_id,
        vec_col=vec_col,
    )


def _pq_score_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    corpus_vecs: DataFrame,
    queries: DataFrame,
    k: int,
    refine: int,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    q_transform=None,
) -> DataFrame:
    """Shared PQ ADC scoring + exact re-rank: ``encoded`` carries
    (corpus_id, __codes, __xn) — from a fresh in-plan encode
    (:func:`pq_topk`) or from a MATERIALIZED index table
    (:func:`ann_index.ann_index_topk`); ``corpus_vecs`` carries
    (corpus_id, __cv) full vectors for the re-rank stage only.
    ``q_transform`` (Column -> Column, e.g. a PCA projection) maps the
    query into the space the codes were built in for the APPROXIMATE
    pass; the re-rank always runs on the untransformed vectors."""
    q = queries.select(
        F.col(query_id), as_double(F.col(vec_col)).alias("__qv")
    )
    qt = (
        q_transform(F.col("__qv")) if q_transform else F.col("__qv")
    )
    # per-query ADC lookup table, materialized once in the broadcast
    # relation (see _pq_lut_expr for the F.transform lambda-arity trap)
    q_lut = q.select(
        query_id,
        _pq_lut_expr(codebooks, dim, qt).alias("__lut"),
        l2_norm(qt).alias("__qn"),
    )

    adc_dot = fold_sum(
        F.zip_with(
            F.col("__lut"),
            F.col("__codes"),
            lambda lj, cj: F.element_at(lj, cj + 1),
        )
    )
    scored = encoded.crossJoin(F.broadcast(q_lut)).select(
        query_id,
        corpus_id,
        (adc_dot / (F.col("__qn") * F.col("__xn"))).alias("__adc"),
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("__adc").desc(), F.col(corpus_id).asc()
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k * refine)
        .select(query_id, corpus_id)
    )
    rerank = (
        corpus_vecs.join(F.broadcast(cand), corpus_id)
        .join(
            F.broadcast(q.withColumn("__rqn", l2_norm(F.col("__qv")))),
            query_id,
        )
        .select(
            query_id,
            corpus_id,
            # untransformed-query norm once per query row, not one l2
            # fold per re-rank pair; bit-identical (see ivf_topk, r13)
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (l2_norm(F.col("__cv")) * F.col("__rqn"))
            ).alias("score"),
        )
    )
    w2 = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return rerank.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


def _collect_fit_sample(fit_df: DataFrame, vec_col: str = "__cv"):
    """ONE Spark job collecting the (already driver-bounded) model-fit
    sample as an ndarray. Every KMeans-style fit in this module is
    capped by ``max_fit_rows`` regardless of corpus size, so a
    distributed fit would pay per-job cluster overheads to process data
    that fits in driver memory — the fits run in numpy instead, and at
    100 TB the fit stays fixed-cost while the corpus-sized stages
    (encode / assign) remain zero-shuffle literal-model maps."""
    import numpy as np

    rows = fit_df.select(vec_col).collect()
    if not rows:
        raise ValueError("model fit sample is empty")
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _fit_subspace_codebooks(
    X,
    dim: int,
    m: int,
    ksub: int,
    seed: int,
) -> list[list[list[float]]]:
    """Fit the m per-sub-space KMeans codebooks on the collected sample
    (see :func:`_collect_fit_sample`) — shared by pq_topk and
    ivfpq_topk. Replaces the previous m sequential MLlib jobs."""
    dsub = dim // m
    return [
        _kmeans_np(X[:, j * dsub:(j + 1) * dsub], ksub, seed + j)
        for j in range(m)
    ]


def _kmeans_np(X, k: int, seed: int, iters: int = 25):
    """Deterministic in-memory KMeans (k-means++ init, Lloyd's updates)
    for the driver-bounded codebook fits. Distances use the
    ||x||^2 + ||c||^2 - 2xC' expansion: O(n*k) memory, BLAS matmul."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = X.shape[0]
    k = min(k, n)
    # large fits (sqrt(n)-scale coarse quantizers: 1024 cells on a 100k
    # sample) switch the seeding/assignment arithmetic to the BLAS
    # expansion with in-place updates: the naive ((X - c)**2).sum(1)
    # seeding step allocates three X-sized temporaries per center —
    # ~150 GB of alloc/memset traffic at k=1024, measured as a
    # kernel-time-bound multi-minute stall in the r13 1M ANN probe.
    # Small fits keep the original expressions bit-for-bit (registry
    # faces and pytest fixtures never see the big branch).
    big = k * n >= 1_000_000
    xsq_flat = (X ** 2).sum(axis=1) if big else None

    def center_d2(c):
        if not big:
            return ((X - c) ** 2).sum(axis=1)
        d = X @ c
        d *= -2.0
        d += xsq_flat
        d += c @ c
        return np.maximum(d, 0.0)  # ulp guard: choice() needs p >= 0

    # k-means++ seeding
    centers = [X[rng.randint(n)]]
    d2 = center_d2(centers[0])
    for _ in range(1, k):
        tot = d2.sum()
        idx = rng.choice(n, p=d2 / tot) if tot > 0 else rng.randint(n)
        centers.append(X[idx])
        d2 = np.minimum(d2, center_d2(centers[-1]))
    C = np.asarray(centers)
    xsq = (X ** 2).sum(axis=1)[:, None]
    for _ in range(iters):
        if big:
            dists = X @ C.T
            dists *= -2.0
            dists += xsq
            dists += (C ** 2).sum(axis=1)[None, :]
        else:
            dists = xsq + (C ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = dists.argmin(axis=1)
        newC = np.vstack(
            [
                X[assign == i].mean(axis=0) if (assign == i).any() else C[i]
                for i in range(k)
            ]
        )
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return [[float(x) for x in ctr] for ctr in C]


def _pq_code_expr(
    codebooks: list[list[list[float]]], dim: int, vcol: Column
) -> Column:
    """array<int> PQ code for a vector column: per-sub-space argmin over
    plan-literal codebooks (zero-shuffle, codegen)."""
    m = len(codebooks)
    dsub = dim // m

    def code_for(j: int) -> Column:
        lit = _centroid_literal(list(enumerate(codebooks[j])))

        # bind the sub-vector slice ONCE per row: referenced inside the
        # per-centroid lambda it re-evaluates ksub times (HOF lambdas
        # are interpreted — dedup.bind_once; r14, same fix as the r13
        # shingle/centroid passes). Same expression over the same
        # value, so codes are bit-identical.
        def dists_of(sl: Column) -> Column:
            return F.transform(
                lit,
                lambda s: F.struct(
                    fold_sum(
                        F.zip_with(
                            sl, s["v"], lambda a, b: (a - b) * (a - b)
                        )
                    ).alias("d"),
                    s["c"].alias("c"),
                ),
            )

        return F.array_min(
            F.get(
                F.transform(
                    F.array(F.slice(vcol, j * dsub + 1, dsub)), dists_of
                ),
                0,
            )
        )["c"]

    return F.array(*[code_for(j) for j in range(m)])


def _pq_lut_expr(
    codebooks: list[list[list[float]]], dim: int, qcol: Column
) -> Column:
    """array<array<double>> ADC lookup table for a query column:
    lut[j][c] = dot(q_sub_j, codebook_j[c]). Single-arg lambdas via a
    factory — a two-parameter lambda would make F.transform pass the
    element index as the second argument, shadowing j."""
    m = len(codebooks)
    dsub = dim // m

    def lut_for(j: int) -> Column:
        cents = F.expr(
            "array("
            + ",".join(
                lit_double_array_sql(vec) for vec in codebooks[j]
            )
            + ")"
        )

        # bind the query sub-slice once per row (not once per centroid
        # — see _pq_code_expr; r14): bit-identical dot products
        def luts_of(sl: Column) -> Column:
            return F.transform(cents, lambda ctr: dot(sl, ctr))

        return F.get(
            F.transform(
                F.array(F.slice(qcol, j * dsub + 1, dsub)), luts_of
            ),
            0,
        )

    return F.array(*[lut_for(j) for j in range(m)])


def _pq_codes_col(
    codebooks: list[list[list[float]]], dim: int, vcol: Column
) -> Column:
    """array<int> PQ code for a vector column — the encode twin of
    :func:`_nearest_centroid_col`: plan-literal per-sub-space argmin
    (codegen-adjacent HOFs, zero python) for small codebooks, and an
    Arrow-batched pandas_udf doing m BLAS matmuls per batch above
    ``_ASSIGN_LITERAL_BUDGET`` total literals (m * ksub * dsub). At
    FAISS-resolution codebooks (m=16, ksub=256) the literal form is a
    16k-literal expression interpreted per row — corpus-encode becomes
    the pipeline bottleneck exactly like the coarse assignment did.
    Ties break to the lowest code on both paths."""
    m = len(codebooks)
    dsub = dim // m
    n_lit = sum(len(cb) for cb in codebooks) * dsub
    # strict <: FAISS-resolution m=16/ksub=256/dsub=4 lands EXACTLY on
    # 16384, and the literal path at that size measured ~25+ min for a
    # 1M-row encode (r13 probe) — the boundary belongs to the Arrow arm
    if n_lit < _ASSIGN_LITERAL_BUDGET:
        return _pq_code_expr(codebooks, dim, vcol)

    import numpy as np

    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    sqs = [(cb ** 2).sum(axis=1) for cb in cbs]

    @F.pandas_udf("array<int>")
    def codes(v: pd.Series) -> pd.Series:
        import numpy as np  # executor-side

        X = np.stack(v.to_numpy())
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            d = S @ cbs[j].T
            d *= -2.0
            d += sqs[j][None, :]
            out[:, j] = d.argmin(axis=1)
        return pd.Series(list(out))

    return codes(vcol)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """IVF-PQ top-k — the classical large-scale ANN pairing: an IVF
    coarse quantizer prunes the corpus to ``n_probe`` cells per query,
    PQ codes + per-query ADC tables score ONLY those cell members with
    m table lookups per row, and the top ``k*refine`` survivors re-rank
    with exact cosine. At 100 TB this is the index you actually ship:
    the scan touches n_probe/num_centroids of the corpus AND reads
    one-byte-per-sub-space codes instead of full vectors; full vectors
    surface only for the k*refine re-rank fetch.

    RESIDUAL encoding (r12, the FAISS IVFPQ design): the PQ codebooks
    are fitted on, and the codes store, ``x - centroid(cell(x))`` —
    not the raw vector. Raw-vector PQ spends its entire codebook
    budget on the corpus' GLOBAL spread, so once the coarse quantizer
    has already explained that spread, ADC cannot rank vectors inside
    a cell: the r12 1M-vector probe measured recall@10 collapsing to
    0.04-0.2 on clustered data however deep the exact re-rank pool.
    With residual codes the budget covers only the within-cell spread.
    Scoring uses ``dot(q, x) = dot(q, centroid) + dot(q, residual)``:
    the first term is exact per probed cell (n_probe values per
    query), the second is the ADC lookup over residual codebooks, and
    the stored exact ``|x|`` normalizes to cosine. The corpus-side
    residual materializes behind its own projection (the r10
    CollapseProject discipline — inlining it into the m*ksub argmin
    expressions would re-evaluate it per reference).

    Same bounded-sample fit, plan-literal models, and zero-shuffle
    encode discipline as ``ivf_topk``/``pq_topk``; only fixed-width
    (qid, id, adc) rows enter the top-k shuffle. Above the literal
    budget the cell/code assignments run as Arrow-batched BLAS matmuls
    (:func:`_nearest_centroid_col` / :func:`_pq_codes_col`) — the
    FAISS assignment shape.

    MEASURED 1M-VECTOR OPERATING ENVELOPE (r13 probe,
    tools/probe_r12_ann.py, 64-dim, 1024 cells = sqrt(n)-scale,
    n_probe=32; recall@10 vs exact cosine):

    - manifold-structured embeddings (sub-clustered, the shape real
      text/image encoders produce): ksub=256 (8-bit codes, the FAISS
      default) + refine=32 -> 0.977; the cheaper ksub=32 (5-bit)
      codes need refine=128 for 0.951 (refine curve 0.35/0.72/0.87/
      0.95 at 8/32/64/128 — ADC resolution, not cell coverage, is
      the limiter: n_probe 16 vs 32 changed nothing).
    - structureless embeddings (isotropic within-cluster noise — no
      sub-manifold for the codebooks to exploit): recall@10 is
      re-rank-pool-bound — 0.197 at refine=32, 0.561 at refine=128
      even with 8-bit codes; >=0.9 needs the pool to approach the
      probed cells' population, i.e. "re-rank the whole cell", at
      which point PQ buys nothing over IVF + exact re-rank. This is
      a property of the math (FAISS behaves identically), not of
      this implementation. For such corpora use the SQ8 index
      (per-dimension quantization preserves within-cell ordering) or
      ``ivf_topk`` with exact scoring.

    Defaults stay fixture-scale; at 1M+ pass num_centroids ~
    sqrt(n), n_probe 16-32, ksub=256, refine>=32."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec_col)).alias("__cv")
    )
    fit_df = c.sample(fit_fraction, seed=seed) if fit_fraction else c
    fit_df = fit_df.limit(max_fit_rows)

    # ONE sample collect feeds BOTH fits (coarse quantizer + RESIDUAL
    # codebooks — the sample is assigned to its nearest centroid and
    # the codebooks see what the coarse quantizer left unexplained)
    X = _collect_fit_sample(fit_df)
    cents = _kmeans_np(X, num_centroids, seed)
    C = np.asarray(cents)
    d2 = (
        (X ** 2).sum(axis=1)[:, None]
        + (C ** 2).sum(axis=1)[None, :]
        - 2.0 * (X @ C.T)
    )
    codebooks = _fit_subspace_codebooks(
        X - C[d2.argmin(axis=1)], dim, m, ksub, seed + 7
    )
    centroids = list(enumerate(cents))
    cent_lit = _centroid_literal(centroids)
    cent_vecs = F.expr(
        "array("
        + ",".join(lit_double_array_sql(vec) for _, vec in centroids)
        + ")"
    )

    def cell_dists(vcol: Column) -> Column:
        return F.transform(
            cent_lit,
            lambda s: F.struct(
                fold_sum(
                    F.zip_with(vcol, s["v"], lambda a, b: (a - b) * (a - b))
                ).alias("d"),
                s["c"].alias("c"),
            ),
        )

    def residual(vcol: Column, cell: Column) -> Column:
        return F.zip_with(
            vcol,
            F.element_at(cent_vecs, cell + 1),
            lambda a, b: a - b,
        )

    encoded = (
        c.select(
            corpus_id,
            "__cv",
            _nearest_centroid_col(cents, F.col("__cv")).alias("__cell"),
        )
        .select(  # projection boundary: __res computed ONCE per row
            corpus_id,
            "__cell",
            "__cv",
            residual(F.col("__cv"), F.col("__cell")).alias("__res"),
        )
        .select(
            corpus_id,
            "__cell",
            _pq_codes_col(codebooks, dim, F.col("__res")).alias("__codes"),
            l2_norm(F.col("__cv")).alias("__xn"),
        )
    )

    q = queries.select(
        F.col(query_id), as_double(F.col(vec_col)).alias("__qv")
    )
    # the LUT uses the RAW query: dot(q, x) = dot(q, centroid) +
    # dot(q, residual), so lut[j][c] = dot(q_sub_j, residual_cb_j[c]).
    # Residualizing the QUERY here (the L2 habit — valid for
    # ||q-c-r||^2) is WRONG for the dot/cosine decomposition: it
    # injects a -dot(centroid, residual_x) error per corpus row,
    # larger than the within-cell signal (measured: recall stuck at
    # ~0.1 however many cells/probes until this line was fixed).
    q_probe = (
        q.select(
            query_id,
            "__qv",
            l2_norm(F.col("__qv")).alias("__qn"),
            F.explode(
                F.transform(
                    F.slice(
                        F.array_sort(cell_dists(F.col("__qv"))),
                        1,
                        n_probe,
                    ),
                    lambda s: s["c"],
                )
            ).alias("__cell"),
        )
        .select(  # queries x n_probe rows: per-cell exact term + LUT
            query_id,
            "__qn",
            "__cell",
            dot(
                F.col("__qv"), F.element_at(cent_vecs, F.col("__cell") + 1)
            ).alias("__dot_qc"),
            _pq_lut_expr(codebooks, dim, F.col("__qv")).alias("__lut"),
        )
    )

    adc_dot = fold_sum(
        F.zip_with(
            F.col("__lut"),
            F.col("__codes"),
            lambda lj, cj: F.element_at(lj, cj + 1),
        )
    )
    scored = encoded.join(F.broadcast(q_probe), "__cell").select(
        query_id,
        corpus_id,
        (
            (F.col("__dot_qc") + adc_dot)
            / (F.col("__qn") * F.col("__xn"))
        ).alias("__adc"),
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("__adc").desc(), F.col(corpus_id).asc()
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k * refine)
        .select(query_id, corpus_id)
    )
    rerank = (
        c.join(F.broadcast(cand), corpus_id)
        .join(
            F.broadcast(q.withColumn("__rqn", l2_norm(F.col("__qv")))),
            query_id,
        )
        .select(
            query_id,
            corpus_id,
            # see ivf_topk (r13): per-query norm rides the broadcast
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (l2_norm(F.col("__cv")) * F.col("__rqn"))
            ).alias("score"),
        )
    )
    w2 = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return rerank.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


def cluster_balanced_sample(
    df: DataFrame,
    per_cluster: int,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "42",
    centroids: list | None = None,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """Diversity-balanced corpus sampling: coarse-cluster the embedding
    space, then keep ``per_cluster`` documents per cluster by a
    deterministic md5 rank — the "cluster then uniform quota" recipe
    (SemDeDup-adjacent) that stops a corpus sample from collapsing onto
    its dominant modes.

    ``centroids`` (list of (cluster_id, vector)) reuses a pre-fit
    model — the production shape: fit once on a bounded sample, ship
    the tiny model everywhere, keep every epoch's sample reproducible.
    Without it, KMeans fits on a bounded sample exactly like ivf_topk;
    note the fit's sample follows partition order, so only the pre-fit
    path is invariant under re-partitioning (the fit path is
    rerun-deterministic on stable input layout).

    Scale shape: cell assignment is the zero-shuffle literal-centroid
    argmin (inside codegen, no join); the quota is one shuffle on the
    cluster id with a rank window that compiles to WindowGroupLimit
    (O(per_cluster) memory per cluster, skew-safe). The md5 rank is
    content-independent and engine-portable, so the drawn sample
    survives re-partitioning and is reproducible outside Spark."""
    if per_cluster < 1:
        raise ValueError("per_cluster must be >= 1")
    if centroids is None:
        c = df.select(as_double(F.col(vec_col)).alias("__cv"))
        fit_df = c.sample(fit_fraction, seed=42) if fit_fraction else c
        fit_df = fit_df.limit(max_fit_rows)
        centroids = list(
            enumerate(_kmeans_np(_collect_fit_sample(fit_df), num_centroids, 42))
        )
    cent_lit = _centroid_literal(centroids)
    v = as_double(F.col(vec_col))
    dists = F.transform(
        cent_lit,
        lambda s: F.struct(
            fold_sum(
                F.zip_with(v, s["v"], lambda a, b: (a - b) * (a - b))
            ).alias("d"),
            s["c"].alias("c"),
        ),
    )
    assigned = df.withColumn("cluster", F.array_min(dists)["c"])
    key = F.md5(
        F.concat(
            F.lit(f"{seed}:"), F.col(id_col).cast("string")
        ).cast("binary")
    )
    w = Wnd.partitionBy("cluster").orderBy(key.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= per_cluster)
        .drop("__rk")
    )


def sq8_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantize an embedding column to int8 (SQ8): per-vector
    affine codes ``c_i = round((x_i - lo) / scale) - 128`` with the
    (lo, scale) pair kept alongside — a 4x scan-payload cut with ~0.4%
    per-dimension error, the lighter sibling of PQ (no codebook fit, no
    training pass; decode is exact-affine, so re-ranking can run on
    decoded values without fetching originals).

    Zero-shuffle map in codegen; returns (id, sq8_codes, sq8_lo,
    sq8_scale). Constant vectors get scale 0 and decode exactly."""
    v = as_double(F.col(vec_col))
    lo = F.array_min(v)
    hi = F.array_max(v)
    scale = F.when(hi > lo, (hi - lo) / F.lit(255.0)).otherwise(F.lit(0.0))
    codes = F.transform(
        v,
        lambda x: F.when(
            scale > 0, F.round((x - lo) / scale).cast("int") - 128
        )
        .otherwise(F.lit(-128))
        .cast("tinyint"),
    )
    return df.select(
        F.col(id_col),
        codes.alias("sq8_codes"),
        lo.alias("sq8_lo"),
        scale.alias("sq8_scale"),
    )


def sq8_topk(
    encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    q_transform=None,
) -> DataFrame:
    """Top-k cosine over SQ8-compressed vectors with exact re-rank: the
    approximate pass decodes codes on the fly inside ``zip_with``
    (``x_i ≈ lo + (c_i + 128) * scale``) against the full-precision
    broadcast query — the corpus scan reads 1 byte/dim instead of 4 —
    then the top ``k*refine`` survivors re-rank with exact cosine
    against the original vectors (the only stage touching them,
    ~k*refine rows per query). Same shape as pq_topk's ADC path but
    with an affine decode instead of codebook lookups — no fit stage
    at all. ``q_transform`` (Column -> Column) maps the query into the
    codes' space for the approximate pass only (PCA-backed indexes);
    re-rank stays in the original space."""
    qv = as_double(F.col(vec_col))
    qt = q_transform(qv) if q_transform else qv
    q = queries.select(
        F.col(query_id), qv.alias("__qv"),
        qt.alias("__qt"),
        l2_norm(qt).alias("__qn"),
    )
    dec = F.zip_with(
        F.col("sq8_codes"),
        F.col("__qt"),
        lambda c, qv: qv
        * (F.col("sq8_lo") + (c.cast("double") + 128.0) * F.col("sq8_scale")),
    )
    xdec = F.transform(
        F.col("sq8_codes"),
        lambda c: F.col("sq8_lo")
        + (c.cast("double") + 128.0) * F.col("sq8_scale"),
    )
    scored = encoded.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        (fold_sum(dec) / (F.col("__qn") * l2_norm(xdec))).alias("__approx"),
    )
    w = Wnd.partitionBy(query_id).orderBy(
        F.col("__approx").desc(), F.col(corpus_id).asc()
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k * refine)
        .select(query_id, corpus_id)
    )
    c = corpus.select(
        F.col(corpus_id), as_double(F.col(vec_col)).alias("__cv")
    )
    rerank = (
        c.join(F.broadcast(cand), corpus_id)
        .join(
            F.broadcast(q.withColumn("__rqn", l2_norm(F.col("__qv")))),
            query_id,
        )
        .select(
            query_id,
            corpus_id,
            # see ivf_topk (r13): per-query norm rides the broadcast
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (l2_norm(F.col("__cv")) * F.col("__rqn"))
            ).alias("score"),
        )
    )
    w2 = Wnd.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id).asc()
    )
    return rerank.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# K-means document clustering (sample init + full-corpus Lloyd refinement)
# ---------------------------------------------------------------------------


def _centroid_literal(centroids: list) -> Column:
    """(cluster_id, vector) list -> the plan-literal struct array the
    zero-shuffle argmin assignment transforms over.

    Parsed as ONE ``F.expr`` (r13): the per-element ``F.lit`` tree paid
    k*dim py4j round-trips per build — ~0.5 s for k=8, dim=64, and
    kmeans_fit rebuilds it every Lloyd sweep. Literal values are
    bit-identical to the ``F.lit`` form (repr round-trip; pinned by
    test_r13_opts)."""
    return F.expr(
        "array("
        + ",".join(
            f"named_struct('v', {lit_double_array_sql(vec)}, 'c', {int(i)})"
            for i, vec in centroids
        )
        + ")"
    )


def _assign_expr(centroids: list, v: Column) -> Column:
    """argmin-distance struct (d, c) over literal centroids — struct
    min orders lexicographically, so ties break to the SMALLEST cluster
    id (pinned against the numpy replica's first-argmin)."""
    dists = F.transform(
        _centroid_literal(centroids),
        lambda s: F.struct(
            fold_sum(
                F.zip_with(v, s["v"], lambda a, b: (a - b) * (a - b))
            ).alias("d"),
            s["c"].alias("c"),
        ),
    )
    return F.array_min(dists)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    fit_fraction: float | None = None,
    max_fit_rows: int = 100_000,
) -> dict:
    """Document clustering for corpus curation (topic mixture control,
    SemDeDup-style pruning, diversity quotas): k-means fit as a
    two-stage pipeline — k-means++ init + Lloyd's on a DRIVER-BOUNDED
    sample (the ivf_topk discipline: fixed cost at any corpus size),
    then ``n_iter`` Lloyd refinement sweeps over the FULL corpus as
    DataFrame ops, so the final centroids reflect all 100 TB, not the
    sample.

    Each refinement sweep: assignment is the zero-shuffle
    literal-centroid argmin (pure JVM, inside codegen — no join, no
    UDF); the update is ONE hash aggregate (groupBy cluster ->
    per-dimension avg + count), whose k-row result collects to the
    driver (bounded planning metadata, same class as the PageRank
    dangling-mass probe). Clusters that go empty keep their previous
    centroid (the standard Lloyd convention; pinned in tests). Total
    cost: n_iter corpus passes, each a map + one keyed shuffle of
    k*dim doubles per partition (partial aggregation).

    Returns a plain-literal model dict (``centroids`` as
    (cluster_id, vector) pairs, ``dim``, ``k``, ``inertia`` of the
    final assignment) — shippable, persistable, reusable by
    :func:`kmeans_assign` / :func:`cluster_balanced_sample`'s
    ``centroids=`` hook. Exact 1e-9 numpy-replica parity pinned in
    tests/test_kmeans.py."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0: {n_iter}")
    c = df.select(as_double(F.col(vec_col)).alias("__cv"))
    fit_df = c.sample(fit_fraction, seed=seed) if fit_fraction else c
    fit_df = fit_df.limit(max_fit_rows)
    X = _collect_fit_sample(fit_df)
    dim = X.shape[1]
    cents = [list(map(float, v)) for v in _kmeans_np(X, k, seed)]
    for _ in range(n_iter):
        pairs = list(enumerate(cents))
        assigned = c.select(
            _assign_expr(pairs, F.col("__cv"))["c"].alias("__cl"), "__cv"
        )
        rows = (
            assigned.groupBy("__cl")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.array(
                    *[
                        F.avg(F.element_at("__cv", i + 1))
                        for i in range(dim)
                    ]
                ).alias("__mean"),
            )
            .collect()
        )
        means = {r["__cl"]: list(map(float, r["__mean"])) for r in rows}
        cents = [means.get(i, cents[i]) for i in range(len(cents))]
    pairs = list(enumerate(cents))
    inertia = c.select(
        F.sum(_assign_expr(pairs, F.col("__cv"))["d"]).alias("i")
    ).first()["i"]
    return {
        "centroids": pairs,
        "dim": dim,
        "k": len(pairs),
        "n_iter": n_iter,
        "inertia": float(inertia) if inertia is not None else 0.0,
    }


def kmeans_assign(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Assign every row to its nearest model centroid — a zero-shuffle
    pure-JVM map over the plan-literal centroids (the encode half of
    the fit/apply split: fit once on a bounded budget, apply at full
    corpus width with no join and no Python). ``dist_col`` optionally
    surfaces the squared distance (outlier scoring / soft quality
    band)."""
    a = _assign_expr(model["centroids"], as_double(F.col(vec_col)))
    out = df.withColumn(out_col, a["c"])
    if dist_col:
        out = out.withColumn(dist_col, a["d"])
    return out


# ---------------------------------------------------------------------------
# PCA dimensionality reduction
# ---------------------------------------------------------------------------


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    max_fit_rows: int = 100_000,
) -> dict:
    """Fit a PCA basis for embedding reduction (the pre-reduction step
    production ANN stacks run before IVF/PQ — e.g. FAISS's OPQ/PCA
    pre-transforms): numpy SVD on a driver-bounded sample (the
    ``_collect_fit_sample`` discipline — fixed cost at any corpus
    size), deterministic component signs (largest-|loading| coordinate
    made positive, the sklearn convention).

    Returns a plain-literal model dict: ``mean`` (d), ``components``
    (k x d, rows = principal axes), ``explained_variance_ratio`` (k).
    Like the PQ codebooks, the model ships to executors as literals —
    projection is a zero-shuffle map."""
    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    X = _collect_fit_sample(
        df.select(as_double(F.col(vec_col)).alias("__cv")).limit(
            max_fit_rows
        )
    )
    d = X.shape[1]
    if k > min(d, X.shape[0]):
        raise ValueError(
            f"k={k} exceeds min(dim={d}, fit_rows={X.shape[0]})"
        )
    mean = X.mean(axis=0)
    Xc = X - mean
    # SVD of the centered sample: rows of Vt are the principal axes
    _, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    comps = Vt[:k]
    # deterministic signs: make each component's largest-|x| entry positive
    signs = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    var = (s**2) / max(X.shape[0] - 1, 1)
    total_var = Xc.var(axis=0, ddof=1).sum() if X.shape[0] > 1 else 1.0
    evr = var[:k] / total_var if total_var > 0 else np.zeros(k)
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance_ratio": [float(x) for x in evr],
    }


def pca_expr(model: dict, vec: Column) -> Column:
    """``(x - mean) @ V.T`` as a pure-JVM Column expression — the mean
    and each component are literal arrays, each output coordinate one
    ``zip_with`` dot fold. Used by :func:`pca_project` (corpus map) and
    as the ``q_transform`` hook for PCA-backed ANN indexes (query-side
    reduction inside the approximate pass)."""
    mean_lit = F.expr(lit_double_array_sql(model["mean"]))
    centered = F.zip_with(as_double(vec), mean_lit, lambda a, b: a - b)
    coords = [
        fold_sum(
            F.zip_with(
                centered,
                F.expr(lit_double_array_sql(comp)),
                lambda a, b: a * b,
            )
        )
        for comp in model["components"]
    ]
    return F.array(*coords)


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis: zero-shuffle map
    over :func:`pca_expr`. At 100 TB this is a map-only pass like
    sq8/pq encoding; no UDF."""
    return df.withColumn(out_col, pca_expr(model, F.col(vec_col)))
