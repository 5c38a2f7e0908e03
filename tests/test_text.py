"""Text-analysis operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators import text

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_counts_match_python(spark):
    rows = (
        _docs(spark)
        .where("doc_id < 20")
        .select("doc_id", "text", text.token_count().alias("n"))
        .collect()
    )
    for r in rows:
        assert r.n == len(r.text.strip().lower().split())


def test_bpe_ish_token_count_bounds(spark):
    rows = (
        _docs(spark)
        .where("doc_id < 20")
        .select(
            text.token_count().alias("n"),
            text.bpe_ish_token_count().alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert r.b >= r.n  # subword pieces never fewer than words


def test_char_stats_columns(spark):
    out = text.char_stats(_docs(spark).where("doc_id < 5"))
    r = out.collect()[0]
    assert r.n_chars_computed == r.n_chars  # matches the dataset's column
    assert 0 <= r.punct_ratio <= 1
    assert r.n_distinct_tokens <= r.n_tokens


def test_quality_score_range(spark):
    rows = (
        _docs(spark)
        .select(text.quality_score().alias("q"))
        .agg(F.min("q"), F.max("q"))
        .collect()[0]
    )
    assert 0.0 <= rows[0] and rows[1] <= 1.0


def test_lang_id_deterministic_and_total(spark):
    out1 = _docs(spark).select(text.lang_id().alias("p")).collect()
    out2 = _docs(spark).select(text.lang_id().alias("p")).collect()
    assert [r.p for r in out1] == [r.p for r in out2]
    assert all(r.p in (*text.LANG_MARKERS, "und") for r in out1)


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta")],
        ["id", "text"],
    )
    fps = {r.id: r.fp for r in df.select("id", text.fingerprint().alias("fp")).collect()}
    assert fps[1] == fps[2]  # reordering does not change the fingerprint
    assert fps[1] != fps[3]


def test_hash_split_deterministic_and_complete(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import hash_split

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], ["doc_id", "text"]
    )
    a = hash_split(df, weights={"train": 90, "val": 5, "test": 5})
    b = hash_split(
        df.repartition(7), weights={"train": 90, "val": 5, "test": 5}
    )
    # identical assignment regardless of partitioning
    assert sorted(map(tuple, a.select("doc_id", "split").collect())) == sorted(
        map(tuple, b.select("doc_id", "split").collect())
    )
    counts = {
        r.split: r.n
        for r in a.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1600  # ~90% of 2000
    assert 20 < counts["val"] + counts["test"] < 400
    # salt moves docs between splits
    c = hash_split(df, weights={"train": 90, "val": 5, "test": 5}, salt="2")
    moved = (
        a.select("doc_id", "split")
        .join(
            c.select("doc_id", F.col("split").alias("split2")), "doc_id"
        )
        .where("split != split2")
        .count()
    )
    assert moved > 0


def test_bigram_counts_edges(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import bigram_counts

    df = spark.createDataFrame(
        [("a b a b c",), ("single",), ("a b",)], ["text"]
    )
    got = {r.bigram: r.n for r in bigram_counts(df).collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1}


def test_stratified_sample_exact_k_and_stable(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)],
        ["doc_id", "lang"],
    )
    got = stratified_sample(df, "lang", k=5, id_col="doc_id")
    counts = {
        r.lang: r.n
        for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"en": 5, "de": 5, "fr": 5}
    # repartitioning does not change the selection
    again = stratified_sample(df.repartition(11), "lang", 5, "doc_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )
    # a stratum smaller than k yields all its rows
    tiny = spark.createDataFrame([(1, "xx")], ["doc_id", "lang"])
    assert stratified_sample(tiny, "lang", 5).count() == 1


def test_redact_pii(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@corp.example.org today"),
            (2, "call 415-555-0199 or 0800 123 4567 now"),
            (3, "clean text with year 2024 and room 42"),
        ],
        ["id", "text"],
    )
    got = {r.id: r.text for r in redact_pii(df).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "call <NUMBER> or <NUMBER> now"
    assert got[3] == "clean text with year 2024 and room 42"  # short digits kept


def test_remove_boilerplate_lines(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        remove_boilerplate_lines,
    )

    rows = [(i, f"COMMON HEADER\nunique body {i}\nCOMMON FOOTER") for i in range(20)]
    rows.append((99, "unique body 99\nrare line"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(df, max_doc_freq=5).collect()
    }
    assert out[0] == "unique body 0"
    assert out[99] == "unique body 99\nrare line"  # rare lines survive
    # nothing banned when threshold is high: text unchanged
    out2 = {
        r.doc_id: r.text
        for r in remove_boilerplate_lines(df, max_doc_freq=100).collect()
    }
    assert out2[0] == "COMMON HEADER\nunique body 0\nCOMMON FOOTER"


def test_bigram_logprob_self_scored(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        score_bigram_logprob,
    )
    import math

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in score_bigram_logprob(docs).collect()}
    # model: c(a b)=2, c(b c)=2, c(c a)=1; ctx: a->2, b->2, c->1;
    # vocab = {a, b, c} = 3 (model vocab — 'solo' never enters a bigram)
    a = 0.4
    lp_ab = math.log((2 + a) / (2 + a * 3))
    lp_bc = math.log((2 + a) / (2 + a * 3))
    lp_ca = math.log((1 + a) / (1 + a * 3))
    exp1 = (2 * lp_ab + lp_bc + lp_ca) / 4
    assert abs(out[1].logprob_avg - exp1) < 1e-12
    assert out[1].n_bigrams == 4
    assert abs(out[2].logprob_avg - lp_bc) < 1e-12
    # a bigram-less doc keeps a NULL score, zero bigrams
    assert out[3].logprob_avg is None and out[3].n_bigrams == 0


def test_bigram_logprob_foreign_model(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        bigram_counts,
        score_bigram_logprob,
    )
    import math

    model_corpus = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], ["doc_id", "text"]
    )
    model = bigram_counts(model_corpus)
    crawl = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zx qy vw")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in score_bigram_logprob(crawl, counts=model).collect()
    }
    # in-model text scores high; out-of-vocab text hits the smoothed
    # floor ln(a / (0 + a*V)) = ln(1/V)
    a, v = 0.4, 4  # model vocab: the, cat, sat, ran
    floor = math.log(a / (a * v))
    assert out[11].logprob_avg == pytest.approx(floor)
    assert out[10].logprob_avg > out[11].logprob_avg
    with pytest.raises(ValueError, match="alpha"):
        score_bigram_logprob(crawl, alpha=0.0)


def test_clean_text_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "\x07hello\x00   world\t\tagain \x1f"),
            (2, "  already clean  "),
            (3, "UPPER case"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in text.clean_text(docs).collect()}
    assert out[1] == "hello world again"
    assert out[2] == "already clean"
    low = {
        r.doc_id: r.text
        for r in text.clean_text(docs, lowercase=True).collect()
    }
    assert low[3] == "upper case"


def test_leakage_free_split_exact_clusters(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        hash_split,
        leakage_free_split,
    )

    df = spark.createDataFrame(
        [(i, f"text {i % 50}") for i in range(200)], ["doc_id", "text"]
    )  # 4 copies of each of 50 texts
    out = leakage_free_split(
        df, weights={"train": 2, "val": 1, "test": 1}
    )
    rows = out.collect()
    assert len(rows) == 200
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, set()).add(r.split)
    # every duplicate cluster lands in exactly one split
    assert all(len(s) == 1 for s in by_text.values())
    # and a plain per-doc hash_split DOES leak on this corpus
    leaky = hash_split(df, weights={"train": 2, "val": 1, "test": 1})
    by_text2 = {}
    for r in leaky.collect():
        by_text2.setdefault(r.text, set()).add(r.split)
    assert any(len(s) > 1 for s in by_text2.values())


def test_leakage_free_split_with_near_dup_pairs(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        leakage_free_split,
    )

    df = spark.createDataFrame(
        [(i, f"unique text number {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    # near-dup chain 0-1-2 plus pair 7-8: clusters {0,1,2}, {7,8}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 8)], ["id_a", "id_b"]
    )
    out = leakage_free_split(df, pairs=pairs)
    s = {r.doc_id: r.split for r in out.collect()}
    assert s[0] == s[1] == s[2]
    assert s[7] == s[8]
    assert len(s) == 10


def test_compression_stats_bit_exact_and_bands(spark):
    """zlib_bytes must equal CPython's zlib.compress output length
    bit-exactly; repetitive text lands a lower ratio than prose, which
    lands lower than incompressible noise; empty/NULL text -> NULLs."""
    import zlib

    from spark_iceberg_schema_evolution_spark.operators.text import (
        compression_stats,
    )

    rep = "spam " * 200
    prose = (
        "The quick brown fox jumps over the lazy dog while the engine "
        "compacts manifests and rewrites partitions near the river, "
        "then a second sentence introduces fresh vocabulary about "
        "catalogs, snapshots, branches and deterministic sampling."
    )
    import hashlib

    noise = "".join(
        chr(33 + b % 94)
        for i in range(20)
        for b in hashlib.sha256(str(i).encode()).digest()
    )
    rows = [(1, rep), (2, prose), (3, noise), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["raw_bytes"], r["zlib_bytes"], r["compression_ratio"]
        )
        for r in compression_stats(df).collect()
    }
    for i, t in rows[:3]:
        want = len(zlib.compress(t.encode("utf-8"), 6))
        assert got[i][0] == len(t.encode("utf-8"))
        assert got[i][1] == want
        assert got[i][2] == round(want / len(t.encode("utf-8")), 6)
    assert got[4] == (0, None, None)
    assert got[5] == (None, None, None)
    assert got[1][2] < got[2][2] < got[3][2]

    import pytest as _p
    with _p.raises(ValueError):
        compression_stats(df, level=11)


def test_hashed_features_matches_replica_and_zero_doc(spark):
    """Vector assembly is engine-exact: replicate with Spark's own
    per-word (slot, sign) mapping + python accumulation; empty docs
    get the zero vector; l2 normalization unit-norms non-zero rows."""
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators.text import (
        hashed_features,
    )

    dim = 16
    docs = [
        (1, "the cat sat on the mat"),
        (2, "cat cat cat"),
        (3, ""),
        (4, "completely different words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    words = sorted(
        {w for _, t in docs for w in t.lower().split() if w}
    )
    wmap = {
        r["w"]: (r["slot"], r["sign"])
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select(
            "w",
            F.pmod(F.xxhash64("w"), F.lit(dim)).cast("int").alias("slot"),
            F.when(
                F.pmod(F.xxhash64("w", F.lit(1)), 2) == 0, 1
            ).otherwise(-1).alias("sign"),
        )
        .collect()
    }
    want = {}
    for i, t in docs:
        v = [0.0] * dim
        for w in t.lower().split():
            s, sg = wmap[w]
            v[s] += sg
        want[i] = v
    got = {
        r["doc_id"]: list(r["features"])
        for r in hashed_features(df, dim=dim).collect()
    }
    assert got == want
    assert got[3] == [0.0] * dim

    import math

    normed = {
        r["doc_id"]: list(r["features"])
        for r in hashed_features(df, dim=dim, l2_normalize=True).collect()
    }
    for i in (1, 2, 4):
        assert math.isclose(
            sum(x * x for x in normed[i]), 1.0, rel_tol=1e-9
        )
    assert normed[3] == [0.0] * dim

    import pytest as _p
    with _p.raises(ValueError):
        hashed_features(df, dim=0)


def test_hashed_features_train_text_classifier_end_to_end(spark):
    """The raw-text classifier composition: hashed_features ->
    logreg_fit separates a planted keyword class perfectly — no
    external embedding model anywhere."""
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators.similarity import (
        linear_classifier_score,
        logreg_fit,
    )
    from spark_iceberg_schema_evolution_spark.operators.text import (
        hashed_features,
    )

    rows = []
    for i in range(60):
        if i % 2:
            rows.append((i, f"buy cheap pills now offer {i} click", 1.0))
        else:
            rows.append((i, f"the engine compacts manifests {i} daily", 0.0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    feats = hashed_features(df, dim=64).join(
        df.select("doc_id", "label"), "doc_id"
    )
    m = logreg_fit(feats, "label", vec_col="features", n_iter=40, lr=1.0)
    scored = linear_classifier_score(
        feats, m["weights"], m["bias"], vec_col="features"
    )
    got = scored.select(
        ((F.col("clf_score") >= 0.5).cast("double") == F.col("label"))
        .cast("int")
        .alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert got == 1.0
