"""Text-analysis operators for training-data pipelines.

North-star extension: token counting, quality scoring, language-ID
heuristic, and document fingerprinting — all built-in-function
compositions (JVM-side); nothing collects to the driver.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via module globals)
from pyspark.sql import Column, DataFrame, Window as W, functions as F

from spark_iceberg_schema_evolution_spark.operators.dedup import (
    bind_once,
    normalized_words,
)

# Tiny per-language marker sets for the n-gram/stopword heuristic. The
# point is the *operator shape* (argmax over per-language hit counts), not
# linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "zai", "you"],
}


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(normalized_words(text_col))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish token estimate: word-piece segments produced by splitting on
    whitespace AND on 4-char boundaries within long words (a cheap,
    deterministic stand-in for subword tokenizers)."""
    words = normalized_words(text_col)
    pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int"),
    )
    return pieces


def char_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_computed": F.length(t),
            "n_tokens": token_count(text_col),
            "n_distinct_tokens": F.size(
                F.array_distinct(normalized_words(text_col))
            ),
            "punct_ratio": (
                F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
                / F.greatest(F.length(t), F.lit(1))
            ),
        }
    )


def stopword_ratio(
    text_col: str = "text", stopwords: list[str] | None = None
) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    words = normalized_words(text_col)
    hits = F.size(
        F.filter(words, lambda w: w.isin(*sw))
    )
    return hits / F.greatest(F.size(words), F.lit(1))


def quality_score(text_col: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + type-token ratio. The formula is intentionally simple and
    SQL-replicable (the oracle recomputes it verbatim)."""
    words = normalized_words(text_col)
    n = F.size(words)
    ttr = F.size(F.array_distinct(words)) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 10) & (n <= 1000), 1.0).otherwise(0.5)
    sw = stopword_ratio(text_col)
    return F.round(
        (len_ok * 0.4 + F.least(sw * 4, F.lit(1.0)) * 0.2 + ttr * 0.4), 6
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    words = F.array_distinct(normalized_words(text_col))
    return {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id(text_col: str = "text") -> Column:
    """Argmax language over marker-hit counts; deterministic tiebreak by
    language code order; 'und' when nothing matches."""
    scores = lang_scores(text_col)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(scores):  # later code wins ties only if strictly greater
        s = scores[lang]
        take = s > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, s).otherwise(best_n)
    return best


def fingerprint(text_col: str = "text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (robust to token reordering; the rolling-hash analogue for
    shingle-level fingerprints lives in dedup.shingles + xxhash64)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(normalized_words(text_col))), " ")
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's token stream into fixed-size overlapping
    chunks (the RAG/pretraining windowing step): chunk i covers tokens
    [i*stride, i*stride + chunk_tokens), stride = chunk_tokens - overlap.
    Per-row ``sequence``+``transform``+``posexplode`` — JVM-side, no
    shuffle, parallel in the scan. Returns (id, chunk_idx, chunk_text,
    n_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    # bind the word array once per row: the slice lambda would otherwise
    # re-tokenize the whole document per chunk (see dedup.bind_once)
    def build(words: Column) -> Column:
        n = F.size(words)
        # number of chunks: ceil(max(n - overlap, 1) / stride)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"),
            F.lit(1),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(words, i * stride + 1, chunk_tokens), " "
            ),
        )

    chunks = bind_once(normalized_words(text_col), build)
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).withColumn(
        "n_tokens",
        F.size(F.split(F.col("chunk_text"), r"\s+")),
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-capacity token bins (training-batch
    sequence packing), deterministically: docs order by ``id_col`` within
    a shard, a running token total accumulates, and a doc lands in bin
    ``floor(previous_total / capacity)`` — the streaming-fill packing that
    one window pass expresses exactly (first-fit bin packing is inherently
    sequential; this is its scalable, shardable form).

    ``shard_col`` bounds the window partition (100 TB discipline: a global
    ORDER BY window is a single reducer — always shard in production;
    None is for small/test corpora)."""
    part = [shard_col] if shard_col else []
    w = (
        W.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(token_count_col).over(w)
    prev_total = running - F.col(token_count_col)
    out_cols = ([shard_col] if shard_col else []) + [id_col, token_count_col]
    return df.select(
        *out_cols,
        F.floor(prev_total / capacity).cast("long").alias("bin_id"),
        (running - prev_total).alias("__sz"),
    ).drop("__sz")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment for a training corpus:
    bucket each document by an md5 hex-prefix of its id (+ optional salt)
    against cumulative-weight thresholds.

    The properties a 100 TB pipeline needs: map-only (no shuffle, no
    sample pass), content-independent (re-running, re-partitioning, or
    appending to the corpus never moves an existing doc between splits),
    and engine-portable (md5 hex is identical everywhere, so the split is
    reproducible outside Spark — the reason this is not xxhash64)."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if len(weights) < 2:
        raise ValueError("need at least two split labels")
    total = sum(weights.values())
    bucket = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(salt)
            ).cast("binary")
        ),
        1,
        4,
    )
    items = list(weights.items())
    expr = None
    cum = 0
    for label, wgt in items[:-1]:
        cum += wgt
        thr = format(int(65536 * cum / total), "04x")
        cond = bucket < F.lit(thr)
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    return df.withColumn(
        "split", expr.otherwise(F.lit(items[-1][0]))
    )


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Train/val/test assignment that can never separate duplicates:
    every member of a duplicate cluster receives the SAME split, so a
    document and its (near-)copy cannot sit in train and test at once —
    the evaluation-leakage failure mode plain per-document hashing has
    (hash_split over a corpus with duplicates leaks by construction:
    two copies of one text hash to their own ids).

    Cluster identity: with ``pairs`` (a near-dup pair list from
    MinHash-LSH / cosine near-dups), clusters come from
    :func:`~spark_iceberg_schema_evolution_spark.operators.dedup.connected_components`
    and unpaired docs are their own cluster; without, exact-text
    clusters (md5). The split key is the cluster's representative (min
    member id), routed through hash_split's md5 bucketing — so the
    assignment stays content-independent, reproducible, and stable
    under appends, and the only cost over hash_split is the cluster
    attribution join (one id-keyed shuffle; the md5 grouping shuffles
    fixed-width hashes, never text)."""
    if pairs is not None:
        from spark_iceberg_schema_evolution_spark.operators.dedup import (
            connected_components,
        )

        comp = connected_components(pairs)
        rep = df.join(comp, on=df[id_col] == comp["id"], how="left").select(
            df["*"],
            F.coalesce(comp["cluster_id"], df[id_col]).alias("__rep"),
        )
    else:
        groups = (
            df.select(F.col(id_col), F.md5(text_col).alias("__h"))
            .groupBy("__h")
            .agg(F.min(id_col).alias("__rep"))
        )
        rep = df.withColumn("__h", F.md5(text_col)).join(
            groups, "__h"
        ).drop("__h")
    out = hash_split(rep, id_col="__rep", weights=weights, salt=salt)
    return out.drop("__rep")


def weighted_resample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "w1",
    default_weight: float = 1.0,
) -> DataFrame:
    """DoReMi-style deterministic domain reweighting for a training mix:
    each document is kept ``floor(w)`` times plus one more with
    probability ``frac(w)``, where ``w`` is its domain's target weight —
    ``w < 1`` downsamples, ``w > 1`` upsamples with repetition, ``w = 0``
    drops the domain. Output rows carry ``copy_idx`` (1-based) so
    downstream shuffling/packing can treat copies as distinct examples.

    The keep/extra-copy decision is the md5 hex prefix of ``seed:id``
    against a precomputed threshold (granularity 1/65536): map-only (no
    shuffle, no sampling pass), content-independent (appending docs never
    flips an existing doc's copy count), and engine-portable — the same
    property set as ``hash_split``, which a 100 TB pipeline needs to make
    the mix reproducible and incrementally maintainable. Fractions are
    exact in units of 1/65536.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be >= 0")
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{seed}:"), F.col(id_col).cast("string")
            ).cast("binary")
        ),
        1,
        4,
    )

    def n_copies(w: float) -> F.Column:
        base, thr = resample_threshold(w)
        extra = F.when(bucket < F.lit(thr), 1).otherwise(0)
        return F.lit(base) + extra

    expr = None
    for dom, w in weights.items():
        cond = F.col(domain_col) == dom
        expr = (
            F.when(cond, n_copies(w))
            if expr is None
            else expr.when(cond, n_copies(w))
        )
    copies = expr.otherwise(n_copies(default_weight))
    return (
        df.withColumn("__copies", copies)
        .where(F.col("__copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.expr("sequence(1, __copies)"))
        )
        .drop("__copies")
    )


def resample_threshold(w: float) -> tuple[int, str]:
    """(floor(w), 4-hex-digit threshold for frac(w)) — shared with oracle
    SQL generation so both engines draw identical copy counts."""
    base = int(w)
    return base, format(int(65536 * (w - base)), "04x")


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus bigram frequencies (the n=2 slice of distributed n-gram LM
    counting): tokenize -> adjacent-pair arrays inside codegen (no UDF)
    -> explode -> one hash-aggregate shuffle. ``top_k`` adds a
    deterministic (count desc, bigram asc) TakeOrdered instead of a full
    sort."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(F.col("__w")) >= 2,
        F.expr(
            "transform(sequence(1, size(__w) - 1), "
            "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        df.select(words.alias("__w"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k:
        out = out.orderBy(F.desc("n"), F.asc("bigram")).limit(top_k)
    return out


def stratified_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-stratum sample (e.g. a balanced per-language
    eval subcorpus): rank rows inside each stratum by the md5 hex of
    their id and keep the first k.

    Unlike ``df.sampleBy``, the selection is exact-k, reproducible across
    engines/re-runs, and stable under appends for the docs already chosen
    BELOW the k-boundary (hash order is content-independent). One window
    shuffle on the stratum key; change ``salt`` to draw a fresh sample."""
    order = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")
    )
    w = W.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# PII patterns shared by engine and oracles: RE2/Java-regex common subset
# (no lookaround), so Spark and DuckDB apply the IDENTICAL expression.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_LONG_NUMBER_RE = r"[0-9][0-9 \-]{5,}[0-9]"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Training-corpus PII scrub: emails -> ``<EMAIL>``, long digit runs
    (phone/card shaped, 7+ digits allowing space/dash separators) ->
    ``<NUMBER>``. Two regexp_replace passes, map-only, JVM-side; the
    patterns deliberately use the RE2-compatible subset so external
    audits (DuckDB, grep) can re-apply them byte-for-byte."""
    out = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_LONG_NUMBER_RE,
        "<NUMBER>",
    )
    return df.withColumn(out_col or text_col, out)


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 10,
    line_sep: str = "\n",
) -> DataFrame:
    """C4-style boilerplate removal: a LINE that appears in more than
    ``max_doc_freq`` distinct documents (headers, footers, cookie
    banners) is dropped from every document.

    Shape: explode distinct lines per doc -> one aggregate shuffle for
    document frequency -> the (small) frequent-line set joins back as a
    BROADCAST filter inside array_join(filter(...)) — the full corpus is
    never shuffled, only its distinct frequent lines move. Returns
    (id, text) with lines order-preserved."""
    lines = F.split(F.col(text_col), line_sep)
    per_doc = df.select(
        F.col(id_col), F.explode(F.array_distinct(lines)).alias("__line")
    )
    frequent = (
        per_doc.groupBy("__line")
        .agg(F.count_distinct(id_col).alias("__df"))
        .where(F.col("__df") > max_doc_freq)
        .select("__line")
    )
    from pyspark.sql.functions import broadcast

    ban = broadcast(
        frequent.agg(
            F.collect_set("__line").alias("__banned")
        )
    )
    return (
        df.crossJoin(ban)
        .select(
            F.col(id_col),
            F.array_join(
                F.filter(
                    F.split(F.col(text_col), line_sep),
                    lambda ln: ~F.array_contains(
                        F.coalesce(
                            F.col("__banned"),
                            F.array().cast("array<string>"),
                        ),
                        ln,
                    ),
                ),
                line_sep,
            ).alias(text_col),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-word ratio,
    top-word fraction, and top-bigram fraction — the classic filters for
    degenerate/repetitive text in a pretraining corpus.

    Two hash-aggregate passes keyed by (doc, token): both get map-side
    partial aggregation, and the (doc_id, token) grain is near-unique so
    neither shuffle skews no matter how large one document's vocabulary
    is. No UDF anywhere. Docs shorter than 2 words report NULL
    top_bigram_frac (no bigrams exist — callers treat NULL as pass)."""
    words = normalized_words(text_col)
    bigrams = F.when(
        F.size(F.col("__w")) >= 2,
        F.expr(
            "transform(sequence(1, size(__w) - 1), "
            "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    toks = df.select(F.col(id_col), words.alias("__w"))
    uni = (
        toks.select(id_col, F.explode("__w").alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_words"),
            F.max("__n").alias("__top_w"),
            F.count(F.lit(1)).alias("__n_distinct"),
        )
    )
    bg = (
        toks.select(id_col, F.explode(bigrams).alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col)
        .agg(
            F.max("__n").alias("__top_b"),
            F.sum("__n").alias("__n_bg"),
        )
    )
    return uni.join(bg, id_col, "left").select(
        id_col,
        "n_words",
        F.col("__n_distinct").alias("n_distinct"),
        F.col("__top_w").alias("top_word_n"),
        F.col("__n_bg").alias("n_bigrams"),
        F.col("__top_b").alias("top_bigram_n"),
        (F.col("__n_distinct") / F.col("n_words")).alias("distinct_ratio"),
        (F.col("__top_w") / F.col("n_words")).alias("top_word_frac"),
        (F.col("__top_b") / F.col("__n_bg")).alias("top_bigram_frac"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "",
) -> DataFrame:
    """Deterministic global shuffle for training-data serving: every row
    gets a ``shard`` and a ``shard_pos`` such that reading shards in
    order of (shard, shard_pos) is a reproducible pseudo-random permutation
    of the corpus — each trainer rank streams exactly one shard
    sequentially.

    The permutation key is md5(seed:id): content-independent,
    engine-portable, and uniform, so the n_shards sorts it drives are
    skew-free and run in parallel (one row_number window PER SHARD — no
    global single-partition sort, the thing that would not survive
    100 TB). Shards come from the key's 4-hex prefix against
    cumulative thresholds (same scheme as ``hash_split``), so the
    assignment is reproducible in any engine with md5."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast(
            "binary"
        )
    )
    prefix = F.substring(key, 1, 4)
    expr = None
    for s in range(n_shards - 1):
        thr = format(int(65536 * (s + 1) / n_shards), "04x")
        cond = prefix < F.lit(thr)
        expr = (
            F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
        )
    shard = (
        expr.otherwise(F.lit(n_shards - 1)) if expr is not None else F.lit(0)
    ).cast("int")
    out = df.withColumn("__k", key).withColumn("shard", shard)
    w = W.partitionBy("shard").orderBy(F.col("__k"), F.col(id_col))
    return out.withColumn(
        "shard_pos", F.row_number().over(w) - 1
    ).drop("__k")


def deterministic_sample(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic uniform sample of ``n`` rows: rank the corpus by
    md5(seed:id) and take the first ``n`` — the reproducible
    TABLESAMPLE a curation pipeline wants for eval carve-outs and
    ablations (Spark's ``sample()`` is neither exactly-n nor stable
    across partitioning changes; this is both, and engine-portable —
    any system with md5 draws the identical sample).

    Scale shape: compiles to TakeOrderedAndProject — a size-n heap per
    partition then an n-row merge on the driver side of the exchange,
    never a global sort. Content-independent (keys on the id), so the
    sample is stable under re-encoding or re-sharding of the payload.
    Different ``seed`` values draw independent samples."""
    if n < 1:
        raise ValueError("n must be >= 1")
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast(
            "binary"
        )
    )
    return (
        df.withColumn("__k", key)
        .orderBy(F.col("__k"), F.col(id_col))
        .limit(n)
        .drop("__k")
    )


def pps_systematic_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    seed: str = "",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — systematic
    PPS (probability-proportional-to-size, the classic survey-sampling
    design): order the rows by an md5 permutation of their ids, walk
    the integer cumulative weight, and select every row whose weight
    span covers one of ``n`` equally-spaced sample points
    ``(U + j*W) / n`` for ``j = 0..n-1``, where the fractional start
    ``U = md5_60bit(seed) mod W`` is derived from the seed (r11, per
    VERDICT r10 #6 — the pre-r11 grid was anchored at the group total
    W, so the md5-order-last row was always selected; the seed-derived
    start removes that one-row deterministic bias). Inclusion
    probability is EXACTLY ``n * w_i / W`` for rows with
    ``w_i <= W/n`` over the start draw (up to the ~2^-60 modulo bias
    of the 60-bit seed hash and the md5 id permutation), and the
    start is a driver-side Python constant embedded as a literal, so
    cross-engine bit-exact replay is preserved: every engine computes
    the identical integer test. Randomness comes from BOTH the md5
    permutation of ids and the seed-derived start; different ``seed``
    values draw independent permutations AND starts.
    Heavier rows are selected with certainty; a row spanning several
    boundaries is emitted once, so a group with such rows can yield
    fewer than ``n`` — the standard systematic-PPS behavior,
    documented not hidden. The curation use:
    "sample 100k documents with probability proportional to quality
    weight" reproducibly, on any engine.

    Why not Efraimidis-Spirakis exponential keys: ``-ln(u)/w`` ranks
    via a TRANSCENDENTAL whose last-ulp behavior is libm-dependent —
    exactly the cross-engine float fence the tier-1 oracle discipline
    bans. Systematic PPS needs integer adds and integer division only,
    so the selected row SET is bit-exact on every engine. Weights must
    be positive integers (quantize upstream: cents, chars, tokens);
    rows with NULL or non-positive weight are excluded.
    ``W * (n + 1)`` must fit int64 (~9e18) — at 1e12 total weight
    that allows n up to ~9e6.

    Scale shape — the cumulative walk DECOMPOSES, so there is no
    single-reducer global sort: rows shard by a contiguous RANGE of
    the md5 key space (``n_shards`` ranges; a range prefix is
    order-compatible with the global (key, id) order), per-shard
    exclusive prefix offsets are computed by a window over the BOUNDED
    totals frame (n_shards rows per group — never collected, broadcast
    back as a BroadcastHashJoin build side), and each shard walks its
    own window starting at the exclusive prefix sum of the shards
    before it. The per-shard
    cumulative + offset IS the global cumulative, integer-exactly, so
    the result is provably identical to the one-window form for every
    ``n_shards`` (equality-tested) — while the sort is bounded at
    rows/shard. ``group_cols`` partitions the whole design per group
    (shards then subdivide each group). Different ``seed`` values draw
    independent samples."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    gcols = list(group_cols or [])
    # seed-derived fractional start: a 60-bit integer computed driver-
    # side (python hashlib, not a Spark expression) and embedded as a
    # literal — both the engine and any SQL oracle replay the identical
    # integer, so no cross-engine hex-conversion primitive is needed.
    # Per group it lands as U = u60 mod W in [0, W).
    import hashlib as _hashlib

    u60 = int(
        _hashlib.md5(f"{seed}:start".encode()).hexdigest()[:15], 16
    )
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast(
            "binary"
        )
    )
    out = (
        df.withColumn("__w", F.col(weight_col).cast("long"))
        .where(F.col("__w") > 0)
        .withColumn("__k", key)
    )
    # contiguous key-range shard: the first 4 hex chars scale into
    # [0, n_shards) — ordering by (shard, key, id) == (key, id)
    out = out.withColumn(
        "__shard",
        F.expr(
            f"(CAST(conv(substring(__k, 1, 4), 16, 10) AS BIGINT) "
            f"* CAST({int(n_shards)} AS BIGINT)) div 65536"
        ),
    )
    # per-(group, shard) totals -> exclusive prefix offsets + group
    # totals, computed over the tiny totals frame and broadcast back
    totals = out.groupBy(*gcols, "__shard").agg(
        F.sum("__w").alias("__st")
    )
    woff = (
        W.partitionBy(*gcols)
        .orderBy("__shard")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy(*gcols).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offsets = totals.select(
        *gcols,
        "__shard",
        (F.sum("__st").over(woff) - F.col("__st")).alias("__off"),
        F.sum("__st").over(wtot).alias("__tot"),
    )
    out = out.join(F.broadcast(offsets), gcols + ["__shard"])
    wcum = (
        W.partitionBy(*gcols, "__shard")
        .orderBy("__k", id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = out.withColumn(
        "__cum", F.sum("__w").over(wcum) + F.col("__off")
    )
    n_lit = int(n)
    # row selected iff its weight span (cum-w, cum] covers a sample
    # point (U + j*W)/n, 0 <= j < n, with U = u60 mod W. Integer-exact:
    # a point is covered iff some multiple of W lies in
    # [n*(cum-w) - U, n*cum - U - 1]; counting multiples via floor
    # division after shifting both ends by +W keeps every operand
    # positive (Spark/ANSI `div` truncates toward zero, which equals
    # floor only for non-negative operands).
    sel = F.expr(
        f"(__cum * CAST({n_lit} AS BIGINT) - ({u60} % __tot) - 1 + __tot)"
        f" div __tot "
        f"> ((__cum - __w) * CAST({n_lit} AS BIGINT) - ({u60} % __tot)"
        f" - 1 + __tot) div __tot"
    )
    return out.where(sel).drop(
        "__w", "__k", "__shard", "__off", "__cum", "__tot"
    )


def domain_budget_select(
    df: DataFrame,
    p_bp: int,
    weight_col: str,
    quality_col: str,
    domain_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Per-domain budget (top-p / nucleus) selection: within each
    domain keep the HIGHEST-quality rows until they account for
    ``p_bp`` basis points (1/100 of a percent) of the domain's total
    weight; the row that crosses the boundary is included (nucleus
    semantics — the kept mass is >= the budget, never silently under).
    The mixture-building primitive between stratified counts and
    DoReMi rate resampling: "keep the best 30% of each domain's token
    mass" is ``p_bp=3000, weight=token_count, quality=lm_score``.

    Integer-exact by construction (the tier-1 oracle discipline): the
    keep test is the cross-multiplication ``cum_before * 10000 <
    p_bp * W`` over integer cumulative weights — no percentage double
    is ever formed, so every engine selects the identical row set.
    Ordering is (quality DESC, id ASC): ties across the boundary
    resolve deterministically. Weights must be positive integers; NULL
    / non-positive weights are excluded. ``W * 10000`` must fit int64.

    Scale shape — the cumulative walk DECOMPOSES like
    :func:`pps_systematic_sample`'s, so a HOT domain (one source
    holding half the corpus — the realistic web-crawl shape) is not a
    single-reducer sort: rows shard by per-domain quality-quantile
    ranges (``percentile_approx`` boundaries, a bounded broadcast
    frame; all rows of equal quality share a shard, and every row in
    shard s outranks every row in shard s+1, so (shard, quality DESC,
    id) IS the per-domain order), per-(domain, shard) exclusive
    prefix offsets come from a window over the bounded totals frame,
    and each shard walks its own window starting at its offset. The
    per-shard cumulative + offset equals the one-window cumulative
    integer-exactly for every ``n_shards`` (equality-tested), while
    the sort is bounded at ~rows/shard per task. The boundary values
    only pick the decomposition, never the result, so
    ``percentile_approx``'s approximation cannot change the selected
    set. Degenerate case: a domain whose quality is one constant
    collapses to a single shard — the pre-round-10 plan. NULL-quality
    rows sort last (desc_nulls_last), i.e. the final shard. A NULL
    domain is its own domain in BOTH plans — never silently dropped:
    the sharded path routes NULL-domain rows through the one-window
    plan and unions them back (a NULL domain is ONE domain — one
    window partition — so the shard decomposition buys it nothing),
    keeping plain fixed-width string keys for the non-NULL bulk. The
    r11 form instead wrapped EVERY key in a one-field struct
    (null-safe struct equality) and paid a measured 2.28x same-box
    constant on the two aggregates, two broadcast joins, and the
    window for the rare-NULL case; the split prices NULL handling at
    the NULL rows only, and parquet null-count stats prune the
    NULL-branch scan to files that actually hold NULLs.
    ``n_shards=1`` reproduces the single-window plan exactly; a
    non-numeric quality column (``percentile_approx`` can't bound it)
    falls back to it too."""
    if not 0 <= p_bp <= 10_000:
        raise ValueError(f"p_bp must be in [0, 10000]: {p_bp}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    out = df.withColumn("__w", F.col(weight_col).cast("long")).where(
        F.col("__w") > 0
    )
    qcol, icol = F.col(quality_col), F.col(id_col)
    qtype = dict(df.dtypes).get(quality_col, "")
    q_numeric = qtype in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or qtype.startswith("decimal")

    def one_window(rows: DataFrame) -> DataFrame:
        wcum = (
            W.partitionBy(domain_col)
            .orderBy(qcol.desc(), icol.asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        wall = W.partitionBy(domain_col).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        rows = rows.withColumn(
            "__cum", F.sum("__w").over(wcum)
        ).withColumn("__tot", F.sum("__w").over(wall))
        keep = (F.col("__cum") - F.col("__w")) * F.lit(10_000) < F.lit(
            int(p_bp)
        ) * F.col("__tot")
        return rows.where(keep).drop("__w", "__cum", "__tot")

    if n_shards == 1 or not q_numeric:
        return one_window(out)
    # NULL split: plain equi-joins below drop NULL keys (NULL != NULL
    # in join equality), so the NULL-domain sliver takes the one-window
    # plan — it is a single domain, hence a single window partition the
    # decomposition could not improve — and unions back at the end.
    nulls = out.where(F.col(domain_col).isNull())
    bulk = out.where(F.col(domain_col).isNotNull())
    # per-domain quality boundaries: ascending n_shards-1 quantiles.
    # shard = #boundaries >= quality, so the highest-quality rows land
    # in shard 0 and equal qualities never split across shards; NULL
    # quality (sorted last under desc_nulls_last) takes the last shard.
    fracs = [i / n_shards for i in range(1, n_shards)]
    bounds = bulk.groupBy(domain_col).agg(
        F.percentile_approx(
            qcol, F.array(*[F.lit(f) for f in fracs])
        ).alias("__bnds")
    )
    bulk = bulk.join(F.broadcast(bounds), domain_col)
    shard = F.when(
        qcol.isNull(), F.lit(n_shards - 1)
    ).otherwise(
        F.size(F.filter("__bnds", lambda b: b >= qcol))
    )
    bulk = bulk.withColumn("__shard", shard).drop("__bnds")
    totals = bulk.groupBy(domain_col, "__shard").agg(
        F.sum("__w").alias("__st")
    )
    woff = (
        W.partitionBy(domain_col)
        .orderBy("__shard")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy(domain_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offsets = totals.select(
        domain_col,
        "__shard",
        (F.sum("__st").over(woff) - F.col("__st")).alias("__off"),
        F.sum("__st").over(wtot).alias("__tot"),
    )
    bulk = bulk.join(F.broadcast(offsets), [domain_col, "__shard"])
    wcum = (
        W.partitionBy(domain_col, "__shard")
        .orderBy(qcol.desc(), icol.asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bulk = bulk.withColumn(
        "__cum", F.sum("__w").over(wcum) + F.col("__off")
    )
    keep = (F.col("__cum") - F.col("__w")) * F.lit(10_000) < F.lit(
        int(p_bp)
    ) * F.col("__tot")
    kept_bulk = bulk.where(keep).drop(
        "__w", "__shard", "__off", "__cum", "__tot"
    )
    return kept_bulk.unionByName(one_window(nulls))


def token_budget_batches(
    df: DataFrame,
    budget: int,
    tokens_col: Column | str | None = None,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "",
) -> DataFrame:
    """Micro-batch assembly under a token budget: shard the corpus with
    the :func:`shuffle_shards` permutation, then bin each shard's
    running token total into batches of ``<= budget`` tokens —
    ``(shard, batch_id, batch_pos)`` is the exact read order a data
    loader replays, rank-parallel and reproducible in any engine.

    Binning is cumulative-sum based: a batch is the run of documents
    whose running total lands in the same ``budget``-sized window, so a
    document straddling a boundary tips into the next batch's window
    and a batch can overflow by at most that one document (the
    industry-standard approximation — exact greedy reset is inherently
    sequential and would serialize the corpus). Oversized single
    documents (> budget) get a batch of their own rather than erroring:
    filter upstream with chunk_text if that matters.

    Scale shape: one window per shard (the shuffle_shards exchange is
    reused — cumsum runs over the SAME partitioning, no second
    shuffle), no global sort, no driver-side state."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = (
        token_count()
        if tokens_col is None
        else (F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col)
    )
    out = shuffle_shards(df, id_col=id_col, n_shards=n_shards, seed=seed)
    out = out.withColumn("__t", toks.cast("long"))
    w = (
        W.partitionBy("shard")
        .orderBy("shard_pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = out.withColumn("__cum", F.sum("__t").over(w))
    batch = ((F.col("__cum") - 1) / F.lit(budget)).cast("long")
    out = out.withColumn("batch_id", batch)
    wp = W.partitionBy("shard", "batch_id").orderBy("shard_pos")
    return (
        out.withColumn("batch_pos", F.row_number().over(wp) - 1)
        .drop("__t", "__cum")
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    sep_re: str | None = None,
) -> DataFrame:
    """Corpus-level exact paragraph dedup, keep-first (the CCNet/Dolma
    step that precedes document-level dedup): every paragraph whose
    normalized form (lower + trim) repeats ANYWHERE in the corpus is
    dropped except its first occurrence in (id, position) order. Distinct
    from :func:`remove_boilerplate_lines` (a doc-frequency BAN list that
    drops all occurrences): dedup keeps exactly one.

    Scale shape — paragraph TEXT never shuffles: the explode carries
    only (id, pos, md5) fixed-width keys into the winner-pick window
    shuffle, losers compact to per-doc drop-position sets, and the text
    is rebuilt map-side by an indexed ``filter(...)`` over the original
    split. The corpus pays exactly ONE payload shuffle (the id join
    against its drop set — not broadcastable: a boilerplate-heavy corpus
    can have drops in most docs), vs. the naive explode-filter-reagg
    that moves full paragraph text through two shuffles. Empty
    paragraphs participate (the corpus's first empty survives, the rest
    drop — CCNet behavior).

    ``sep`` is used literally for rebuilding; splitting uses ``sep_re``
    if given (else ``sep`` escaped), so multi-char separators with regex
    metacharacters are safe."""
    import re as _re

    pattern = sep_re if sep_re is not None else _re.escape(sep)
    parts = F.split(F.col(text_col), pattern)
    paras = df.select(
        F.col(id_col),
        F.posexplode(parts).alias("__pos", "__p"),
    ).select(
        id_col,
        "__pos",
        F.md5(F.lower(F.trim(F.col("__p")))).alias("__h"),
    )
    w = W.partitionBy("__h").orderBy(F.col(id_col), F.col("__pos"))
    losers = (
        paras.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__drop"))
    )
    passthrough = [c for c in df.columns if c != text_col]
    rebuilt = F.array_join(
        F.filter(
            parts,
            lambda x, i: ~F.array_contains(
                F.coalesce(F.col("__drop"), F.array().cast("array<int>")),
                i,
            ),
        ),
        sep,
    ).alias(text_col)
    return df.join(losers, on=id_col, how="left").select(
        *passthrough, rebuilt
    )


def quantile_band_filter(
    df: DataFrame,
    score_col: str,
    lo_q: float = 0.0,
    hi_q: float = 1.0,
    approximate: bool = False,
) -> DataFrame:
    """Keep rows whose ``score_col`` lies inside the corpus's
    [lo_q, hi_q] percentile band — the quality-score tail trim a
    curation pipeline runs after scoring (drop the shortest/garbage tail
    and the longest/outlier tail in one pass).

    Default is exact ``percentile`` (linear interpolation, matching ANSI
    PERCENTILE_CONT / DuckDB quantile_cont) so the cut is reproducible
    across engines. Exact percentile buffers a value->count map per
    partition, so it is safe when the score has bounded cardinality
    (lengths, integer scores — the common case) but NOT for
    high-cardinality continuous scores at 100 TB; pass
    ``approximate=True`` there to swap in ``approx_percentile``
    (fixed-size sketch, same profile_stats trade — deterministic for a
    fixed input, but not oracle-exact across engines). Either way the
    cost shape is one partial-aggregated pass (tiny shuffle:
    per-partition digests only), thresholds broadcast back via a 1-row
    cross join, then a map-only filter; the corpus itself never
    shuffles."""
    from pyspark.sql.functions import broadcast

    fn = "approx_percentile" if approximate else "percentile"
    bounds = broadcast(
        df.agg(
            F.expr(f"{fn}({score_col}, {lo_q})").alias("__lo"),
            F.expr(f"{fn}({score_col}, {hi_q})").alias("__hi"),
        )
    )
    return (
        df.crossJoin(bounds)
        .where(
            (F.col(score_col) >= F.col("__lo"))
            & (F.col(score_col) <= F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def mix_corpora(
    df: DataFrame,
    target_fracs: dict[str, float],
    total_tokens: float,
    domain_col: str = "source",
    tokens_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Training-mixture builder: solve the per-domain epoch rates that
    hit a target token composition, then apply the deterministic
    :func:`weighted_resample`. ``target_fracs[d]`` is domain *d*'s share
    of a ``total_tokens`` budget; its rate is
    ``total_tokens * frac / domain_tokens`` — above 1 the domain repeats
    (epochs), below 1 it subsamples. Domains not in the target are
    dropped (weight 0), matching how a curated mix treats unlisted
    sources.

    The only driver-side step is the per-domain token-count aggregate
    (bounded by the domain count, like partition planning); the resample
    itself stays map-only, so the mix is reproducible and append-stable
    at any corpus size. Rates inherit the resampler's exact-1/65536
    fractional draws: the realized token share converges to the target
    with relative error O(1/sqrt(docs per domain)).

    The rate arithmetic is plain double ops on (token-sum, frac, budget)
    in a fixed order, so an external auditor (the q121 oracle) can
    reproduce the exact copy decisions from the raw data alone."""
    if any(f < 0 for f in target_fracs.values()):
        raise ValueError("target fractions must be >= 0")
    tot = sum(target_fracs.values())
    if not 0.999 <= tot <= 1.001:
        raise ValueError(f"target fractions must sum to 1, got {tot}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    weights = {}
    for dom, frac in target_fracs.items():
        tok = counts.get(dom)
        if not tok:
            raise ValueError(
                f"target domain {dom!r} has no tokens in the corpus"
            )
        weights[dom] = (total_tokens * frac) / tok
    return weighted_resample(
        df,
        weights,
        domain_col=domain_col,
        id_col=id_col,
        seed=seed,
        default_weight=0.0,
    )


def search_terms(
    df: DataFrame,
    terms: list[str],
    mode: str = "all",
    text_col: str = "text",
) -> DataFrame:
    """Keyword search over a corpus WITHOUT a pre-built index: keep
    documents containing all (``mode="all"``) or any (``mode="any"``)
    of the query terms under the corpus tokenization
    (dedup.normalized_words — lowercase, whitespace split), adding a
    ``score`` column with the total query-term frequency.

    Scale shape: map-only — the token array, the intersect, and the
    score all evaluate inside the scan's codegen stage; zero shuffles,
    zero UDFs. For repeated interactive lookups over a frozen corpus,
    build_term_index + search_index amortizes the scan."""
    if not terms:
        raise ValueError("need at least one search term")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be all|any: {mode}")
    qset = sorted({t.lower() for t in terms})
    toks = normalized_words(text_col)
    lits = F.array(*[F.lit(t) for t in qset])
    n_hit = F.size(F.array_intersect(toks, lits))
    keep = n_hit == len(qset) if mode == "all" else n_hit >= 1
    score = F.size(F.filter(toks, lambda t: t.isin(*qset)))
    return df.where(keep).withColumn("score", score)


def search_terms_bm25(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked keyword search (Robertson/Lucene idf form):

        score = sum_t  ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
                       * tf_t * (k1 + 1)
                       / (tf_t + k1 * (1 - b + b * dl / avgdl))

    over the query terms, under the corpus tokenization
    (``normalized_words``). Returns matching rows (>= 1 query-term hit)
    with a ``score`` column; ``search_terms`` is the boolean/raw-tf
    variant, this is the ranked-retrieval one.

    Scale shape: ONE map-only pass computes each document's length and
    its per-query-term tf as fixed-width columns (no posting explode —
    the query list is a literal); one global aggregate folds N / avgdl /
    df_t into a single stats row that broadcasts back (1-row
    BroadcastNestedLoopJoin, the module's compute-scalar-apply-map-side
    pattern); scoring is codegen arithmetic. Two passes over the corpus
    total, nothing keyed by term ever shuffles."""
    if not terms:
        raise ValueError("need at least one search term")
    qset = sorted({t.lower() for t in terms})
    toks = F.filter(normalized_words(text_col), lambda t: t != "")

    # bind the token array once per row (dedup.bind_once): __dl and each
    # per-term tf previously re-ran the tokenizer — 1 + len(qset)
    # evaluations per row
    def build(tk):
        def tf_of(term: str):
            # single-arg lambda via a factory: a defaulted second
            # parameter would make F.filter pass the element INDEX into
            # it (the _pq_lut_expr trap)
            return F.size(F.filter(tk, lambda t: t == F.lit(term)))

        return F.struct(
            F.size(tk).alias("dl"),
            *[tf_of(q).alias(f"tf{i}") for i, q in enumerate(qset)],
        )

    per = df.select(
        "*", bind_once(toks, build).alias("__tfs")
    ).select(
        *df.columns,
        F.col("__tfs.dl").alias("__dl"),
        *[
            F.col(f"__tfs.tf{i}").alias(f"__tf{i}")
            for i in range(len(qset))
        ],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias(
            "__avgdl"
        ),
        *[
            F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0)).alias(
                f"__df{i}"
            )
            for i in range(len(qset))
        ],
    )
    score = None
    for i in range(len(qset)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        part = (
            idf
            * (tf * F.lit(k1 + 1))
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            )
        )
        score = part if score is None else score + part
    hit = None
    for i in range(len(qset)):
        h = F.col(f"__tf{i}") > 0
        hit = h if hit is None else hit | h
    out = (
        per.crossJoin(F.broadcast(stats))
        .where(hit)
        .withColumn("score", score)
    )
    drop = (
        ["__dl", "__n", "__avgdl"]
        + [f"__tf{i}" for i in range(len(qset))]
        + [f"__df{i}" for i in range(len(qset))]
    )
    return out.drop(*drop)


def build_term_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index as a DataFrame: one posting row per (term, doc)
    with the term frequency. Postings stay distributed — materialize
    them to a lakehouse table bucketed by ``term``
    (``bucket_by=("term", n)``) and every term lookup plans one file
    per batch via the hidden bucket transform."""
    return (
        df.select(
            F.col(id_col),
            F.explode(normalized_words(text_col)).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_index(
    index_df: DataFrame,
    terms: list[str],
    mode: str = "all",
    id_col: str = "doc_id",
) -> DataFrame:
    """Evaluate a keyword query against a build_term_index posting set:
    returns (id, score) for matching documents. One shuffle on the doc
    id over ONLY the query terms' postings (the IN-list prunes
    term-bucketed storage to a few files); equivalent to search_terms
    on the original corpus."""
    if not terms:
        raise ValueError("need at least one search term")
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be all|any: {mode}")
    qset = sorted({t.lower() for t in terms})
    hits = index_df.where(F.col("term").isin(*qset))
    agg = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_terms"),
        F.sum("tf").alias("score"),
    )
    need = len(qset) if mode == "all" else 1
    return agg.where(F.col("__n_terms") >= need).drop("__n_terms")


def score_bigram_logprob(
    df: DataFrame,
    counts: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet-style statistical quality score without the KenLM binary:
    the mean add-alpha-smoothed bigram log-probability of each document
    under a corpus bigram LM — ``ln((c(w1 w2)+a) / (c(w1 ·)+a·V))``
    averaged over the document's bigrams. Low scores = statistically
    surprising text (boilerplate soup, mojibake, keyword stuffing);
    CCNet buckets the corpus by exactly this kind of LM score and
    keeps/weights buckets (arXiv:1911.00359 §3.3 — theirs is a 5-gram
    KenLM; the operator shape is what transfers: score against corpus
    counts, then filter with quantile_band_filter).

    ``counts`` scores against a FOREIGN model (bigram_counts output of a
    reference corpus — the actual CCNet recipe, where Wikipedia is the
    model and the crawl is scored); unseen bigrams/contexts degrade to
    the smoothed floor. Default: self-scored (model = the input corpus).

    Scale shape: every stage is a keyed hash aggregate or a keyed join —
    counts (1 shuffle), context totals derived FROM the counts (tiny),
    doc-bigram join on the bigram key (the LM lookup; counts side is
    pre-aggregated so hot bigrams are single rows, no skew
    amplification), context join, per-doc aggregate, and an id-keyed
    join back so bigram-less docs keep a NULL score. No UDFs, no
    driver-side model."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0: {alpha}")
    model = counts if counts is not None else bigram_counts(df, text_col)
    ctx = model.groupBy(
        F.substring_index(F.col("bigram"), " ", 1).alias("__w1")
    ).agg(F.sum("n").alias("__cw1"))
    vocab = model.select(
        F.substring_index(F.col("bigram"), " ", 1).alias("t")
    ).union(
        model.select(F.substring_index(F.col("bigram"), " ", -1))
    ).agg(F.countDistinct("t").alias("__v"))
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(F.col("__w")) >= 2,
        F.expr(
            "transform(sequence(1, size(__w) - 1), "
            "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = (
        df.select(F.col(id_col), words.alias("__w"))
        .select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .withColumn(
            "__w1", F.substring_index(F.col("bigram"), " ", 1)
        )
    )
    scored = (
        pairs.join(model, "bigram", "left")
        .join(ctx, "__w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                / (
                    F.coalesce(F.col("__cw1"), F.lit(0))
                    + F.lit(alpha) * F.col("__v")
                )
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.avg("__lp").alias("logprob_avg"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    return df.join(scored, id_col, "left").withColumn(
        "n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0))
    )


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Deterministic text hygiene (the CCNet/Dolma pre-tokenization
    cleanup, minus codec-dependent Unicode normalization): strip C0/C1
    control characters (tab/newline treated as whitespace, not
    stripped), collapse every whitespace run to a single space, trim,
    and optionally lowercase. Pure JVM regex — map-only, RE2-subset
    rules so the oracle replays them byte-identically."""
    c = F.col(text_col)
    c = F.regexp_replace(
        c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""
    )
    c = F.regexp_replace(c, "\\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(text_col, c)


def percentile_normalize(
    df: DataFrame,
    col: str,
    by: list[str],
    out_col: str = "pct_rank",
) -> DataFrame:
    """Rank-based feature normalization: per-group ``percent_rank`` of a
    numeric column onto [0, 1] — the scale-free transform for
    heavy-tailed quality signals (doc length, LM score, link counts)
    before band filtering or mixing; equal values share a rank, so the
    output is deterministic without a tiebreak.

    ``by`` is required: a global percentile would sort the corpus into
    ONE window partition (the classic Window-without-PARTITION-BY scale
    trap). Per-group it is one shuffle on the group keys with a
    streaming sorted window; for a corpus-global normalization use
    quantile_band_filter's approx-quantile thresholds instead."""
    if not by:
        raise ValueError(
            "percentile_normalize needs group keys; a global window "
            "would funnel the corpus into one partition — use "
            "quantile_band_filter for corpus-global cuts"
        )
    from pyspark.sql import Window as _W

    w = _W.partitionBy(*by).orderBy(F.col(col).asc())
    return df.withColumn(out_col, F.percent_rank().over(w))


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Collocation (phrase) mining by exact pointwise-mutual-information
    lift: for each adjacent word pair, how much more often it occurs
    than independence predicts,

        lift = N_bigrams * c(a,b) / (c(a) * c(b))     (= e^PMI)

    reported in exact parts-per-million integer space so the ranking is
    reproducible across engines — log() is monotone, so ranking by lift
    IS ranking by PMI, without the last-ulp libm variance of ln.

    Plan shape: two aggregates over the token stream (unigram counts,
    bigram counts), then the bigram side joins its two unigram legs
    broadcast (vocabulary is tiny relative to the corpus — Heaps' law —
    and min_count trims the tail before the join). N counts ALL bigrams
    (pre-min_count), as PMI requires. The
    product c(a,b) * N * 1e6 runs in DECIMAL(38,0) so the operator
    survives corpora where int64 would overflow (> ~1e9 bigrams), then
    integer-divides back to a BIGINT ppm score."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = df.select(words.alias("__w"))
    uni = (
        toks.select(F.explode("__w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bigrams = F.when(
        F.size(F.col("__w")) >= 2,
        F.expr(
            "transform(sequence(1, size(__w) - 1), "
            "i -> struct(element_at(__w, i) as wa, "
            "element_at(__w, i + 1) as wb))"
        ),
    ).otherwise(F.array().cast("array<struct<wa:string,wb:string>>"))
    bi_all = (
        toks.select(F.explode(bigrams).alias("b"))
        .select("b.wa", "b.wb")
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_total = bi_all.agg(F.sum("c_ab").alias("n_bi"))
    bi = bi_all.where(F.col("c_ab") >= min_count)
    # min_count prunes bi BEFORE the joins; uni stays whole (its counts
    # are denominators). Both legs broadcast: vocab << corpus.
    out = (
        bi.crossJoin(F.broadcast(n_total))
        .join(
            F.broadcast(uni.select(F.col("w").alias("wa"),
                                   F.col("c_w").alias("c_a"))),
            "wa",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("wb"),
                                   F.col("c_w").alias("c_b"))),
            "wb",
        )
        .select(
            F.concat_ws(" ", "wa", "wb").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "CAST((CAST(c_ab AS DECIMAL(38,0)) * n_bi * 1000000)"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    if top_k:
        out = out.orderBy(F.desc("lift_ppm"), F.asc("bigram")).limit(top_k)
    return out


def corpus_divergence(
    df: DataFrame,
    split_col: Column,
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpus splits as exact total-
    variation distance over the token distribution:

        TV = (1/2) * sum_w | p_a(w) - p_b(w) |
           = sum_w | c_a(w)*n_b - c_b(w)*n_a |  /  (2 * n_a * n_b)

    The numerator is an exact int64 sum (cross-multiplied counts — no
    per-token division, no float accumulation; safe while token totals
    stay under ~1e9 per split, promote to DECIMAL beyond), the one
    double division is the last step. ``split_col`` must be a 0/1 int
    expression (time slice, source, train/eval split).

    Plan shape: ONE tokenize + hash aggregate producing per-token counts
    for BOTH splits via conditional sums (no join of two vocabularies —
    the zero-fill outer join is folded into the aggregate), then a
    broadcast of the 1-row totals. Returns one row: n_a, n_b, vocab,
    n_common, tv_r."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = df.select(
        split_col.cast("long").alias("grp"), words.alias("__w")
    ).select("grp", F.explode("__w").alias("w"))
    counts = toks.groupBy("w").agg(
        F.sum(1 - F.col("grp")).alias("c_a"),
        F.sum("grp").alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(
                ((F.col("c_a") > 0) & (F.col("c_b") > 0)).cast("long")
            ).alias("n_common"),
            F.sum(
                F.abs(
                    F.col("c_a") * F.col("n_b")
                    - F.col("c_b") * F.col("n_a")
                )
            ).alias("tv_num"),
        )
        .select(
            "n_a",
            "n_b",
            "vocab",
            "n_common",
            F.round(
                F.col("tv_num").cast("double")
                / (2.0 * F.col("n_a").cast("double") * F.col("n_b")),
                4,
            ).alias("tv_r"),
        )
    )


def compression_stats(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Compression-ratio quality signal (the zlib-entropy heuristic of
    C4/RefinedWeb-class curation: highly repetitive or templated text
    compresses far below prose, near-random noise barely compresses —
    both tails are drop candidates). Adds ``raw_bytes`` (UTF-8 octet
    length, JVM-side), ``zlib_bytes`` (DEFLATE output size at
    ``level``), and ``compression_ratio`` (zlib/raw, NULL for NULL or
    empty text).

    Scale shape: the ONLY Python work is ``len(zlib.compress(...))``
    per row in an Arrow-batched pandas UDF — there is no JVM built-in
    for DEFLATE, so this is the honest vectorized slow path (map-only,
    no shuffle, composes with ``quantile_band_filter`` or a plain
    band cut for the keep decision). Byte counts are deterministic for
    a fixed zlib (CPython bundles its own), pinned bit-exact against
    ``zlib.compress`` in tests."""
    from pyspark.sql.types import LongType

    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be in [0, 9]: {level}")

    @F.pandas_udf(LongType())
    def zbytes(texts: pd.Series) -> pd.Series:
        import zlib

        return pd.Series(
            [
                len(zlib.compress(t.encode("utf-8"), level))
                if t is not None
                else None
                for t in texts
            ],
            dtype="Int64",
        )

    raw = F.octet_length(F.col(text_col))
    out = df.withColumn("raw_bytes", raw).withColumn(
        "zlib_bytes",
        F.when(raw > 0, zbytes(F.col(text_col))),
    )
    return out.withColumn(
        "compression_ratio",
        F.when(
            F.col("raw_bytes") > 0,
            F.round(
                F.col("zlib_bytes").cast("double") / F.col("raw_bytes"),
                6,
            ),
        ),
    )


def hashed_features(
    df: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    signed: bool = True,
    l2_normalize: bool = False,
) -> DataFrame:
    """Feature-hashing vectorizer (Weinberger 2009, the fastText input
    layer): each word hashes to one of ``dim`` slots (xxhash64 pmod),
    with an independent hash bit as the +/-1 sign that keeps collision
    noise zero-mean. Returns (id, features array<double>) — the bridge
    that lets :func:`..similarity.logreg_fit` /
    :func:`..similarity.kmeans_fit` train on RAW TEXT with no external
    embedding model, entirely in-engine.

    Scale shape: explode words -> ONE (id, slot) hash aggregate ->
    ONE id aggregate assembling the dense vector from a slot map
    (map_from_entries + a sequence transform — pure JVM, no UDF); two
    keyed shuffles total, counts are integers so the vector is
    engine-exact (pinned against a pure-python replica in
    tests/test_text.py). Docs with no tokens get the zero vector.
    ``l2_normalize`` divides by the vector norm (zero vectors stay
    zero)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1: {dim}")
    words = normalized_words(text_col)
    base = df.select(F.col(id_col), F.explode_outer(words).alias("__w"))
    h = F.xxhash64(F.col("__w"))
    slot = F.pmod(h, F.lit(dim)).cast("int")
    sign = (
        F.when(F.pmod(F.xxhash64(F.col("__w"), F.lit(1)), 2) == 0, 1)
        .otherwise(-1)
        if signed
        else F.lit(1)
    )
    slots = (
        # explicit empty-string drop: F.split keeps a trailing ""
        # token for empty/whitespace text (limit -1 semantics)
        base.where(F.col("__w").isNotNull() & (F.col("__w") != ""))
        .groupBy(id_col, slot.alias("__slot"))
        .agg(F.sum(sign).alias("__v"))
    )
    assembled = (
        slots.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__slot", "__v"))
            ).alias("__m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("int")), F.lit(0)
                ).cast("double"),
            ).alias("features"),
        )
    )
    out = df.select(id_col).join(assembled, id_col, "left").select(
        id_col,
        F.coalesce(
            "features",
            F.array(*[F.lit(0.0) for _ in range(dim)]),
        ).alias("features"),
    )
    if l2_normalize:
        norm = F.sqrt(
            F.aggregate(
                "features", F.lit(0.0), lambda a, x: a + x * x
            )
        )
        out = out.withColumn(
            "features",
            F.when(norm > 0, F.transform("features", lambda x: x / norm))
            .otherwise(F.col("features")),
        )
    return out


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance scoring (Data Selection via Importance
    Resampling, arXiv:2302.03169): score every raw-corpus document by
    how target-like its hashed n-gram feature distribution is, so a
    downstream sampler can resample raw data toward the target domain
    (the published recipe for picking pre-training data that matches a
    trusted corpus, e.g. Wikipedia).

    Features are the paper's hashed bag of unigrams+bigrams; the bucket
    is the first two hex chars of md5(gram) -- 256 buckets, stable
    across engines and cluster sizes (no JVM-hash seed dependence, and
    the DuckDB oracle can replay it byte-for-byte). Per-bucket
    add-alpha bag-of-words models are fit on the target and raw
    corpora; each document's score is the mean per-gram log-likelihood
    ratio  ln p_target(bucket) - ln p_raw(bucket)  over its gram
    instances (sum and gram count also returned, so callers can use the
    paper's unnormalized LLR).

    Scale shape: two 256-row model aggregates (one shuffle each over
    exploded grams, map-side combined), a broadcast join of the 256-row
    log-ratio table onto the exploded raw grams, and one per-doc
    aggregate keyed by ``id_col`` -- no driver-side model, no UDFs; the
    model tables are O(256) regardless of corpus size, so at 100 TB
    the only data-sized shuffles are the two gram aggregations and the
    doc-keyed score reduce.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0: {alpha}")

    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        base = df.select(
            *([F.col(id_col)] if keep_id else []), words.alias("__w")
        )
        bigrams = F.when(
            F.size("__w") >= 2,
            F.expr(
                "transform(sequence(1, size(__w) - 1), i -> "
                "concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(F.concat(F.col("__w"), bigrams)).alias("__gram"),
        ).select(
            *([F.col(id_col)] if keep_id else []),
            F.substring(F.md5("__gram"), 1, 2).alias("__bucket"),
        )

    n_buckets = 256
    tgt = grams(target, keep_id=False).groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__nt")
    )
    rawc = grams(raw, keep_id=False).groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__nr")
    )
    tgt_tot = tgt.agg(F.coalesce(F.sum("__nt"), F.lit(0)).alias("__tt"))
    raw_tot = rawc.agg(F.sum("__nr").alias("__rt"))
    # every scoring gram comes from `raw`, so the raw-count table covers
    # the full bucket domain; target-absent buckets degrade to the
    # smoothed alpha floor
    lr = (
        rawc.join(tgt, "__bucket", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "__bucket",
            (
                F.log(
                    (F.coalesce("__nt", F.lit(0)) + F.lit(alpha))
                    / (F.col("__tt") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.col("__nr") + F.lit(alpha))
                    / (F.col("__rt") + F.lit(alpha * n_buckets))
                )
            ).alias("__logratio"),
        )
    )
    scored = (
        grams(raw, keep_id=True)
        .join(F.broadcast(lr), "__bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__logratio").alias("llr_sum"),
            F.avg("__logratio").alias("llr_avg"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return raw.select(id_col).join(scored, id_col, "left").select(
        id_col,
        "llr_sum",
        "llr_avg",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
    )


def encoding_anomalies(
    df: DataFrame,
    text_col: str = "text",
    flag_ratio: float = 0.001,
) -> DataFrame:
    """Encoding-anomaly detector (the Dolma/RefinedWeb 'broken decode'
    quality gate): per-document counts of the three classic corruption
    signatures -- U+FFFD replacement characters (a decoder already gave
    up), bare C0 control characters (binary junk in text; tab/CR/LF
    excluded), and UTF-8-read-as-Latin-1 mojibake digraphs (the A-tilde
    / A-circumflex / 'a-circumflex euro' lead sequences followed by a
    Latin-1-supplement continuation char, the byte-level fingerprint of
    double-encoding) -- plus the anomaly ratio over the character count
    and a keep/flag verdict. Detection only: ``clean_text`` is the
    mutating sibling; this one scores so the pipeline can DROP
    documents whose corruption is load-bearing rather than cosmetic.

    Map-only JVM regex (RE2-compatible patterns, literal character
    classes -- the DuckDB oracle replays them unchanged); no shuffles,
    no UDFs, scales linearly with no skew surface.
    """
    c = F.col(text_col)
    n_repl = F.regexp_count(c, F.lit("�"))
    n_ctl = F.regexp_count(
        c, F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    )
    n_moji = F.regexp_count(
        c,
        F.lit("Ã[¡-¿]|Â[¡-¿]|â€"),
    )
    n_anom = (n_repl + n_ctl + n_moji).cast("long")
    ratio = n_anom / F.greatest(F.length(c), F.lit(1))
    return df.select(
        "*",
        n_repl.cast("long").alias("n_replacement"),
        n_ctl.cast("long").alias("n_control"),
        n_moji.cast("long").alias("n_mojibake"),
        ratio.alias("anomaly_ratio"),
        (n_anom > 0).alias("is_suspect"),
        (ratio <= F.lit(flag_ratio)).alias("keep"),
    )
