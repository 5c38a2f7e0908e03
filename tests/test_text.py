"""Text-analysis operator tests."""

from __future__ import annotations

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
