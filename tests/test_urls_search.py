"""URL curation (normalize/domain/blocklist/per-domain cap) and
keyword search (map-only scan + inverted index) operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.text import (
    build_term_index,
    search_index,
    search_terms,
)
from spark_iceberg_schema_evolution_spark.operators.urls import (
    cap_per_domain,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_host,
)
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


def _norm(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], ["u"])
        .select(normalize_url("u").alias("n"))
        .first()
        .n
    )


@pytest.mark.parametrize(
    "raw,expect",
    [
        # fragment + tracking params + www + trailing slash
        (
            "HTTPS://WWW.Example.COM/Path/?utm_source=x&id=1#frag",
            "https://example.com/Path?id=1",
        ),
        # scheme/host lowercase only — path case preserved
        ("HTTP://HOST.org/KeepCase", "http://host.org/KeepCase"),
        # default ports dropped, non-default kept
        ("http://h.com:80/a", "http://h.com/a"),
        ("https://h.com:443/a", "https://h.com/a"),
        ("http://h.com:8080/a", "http://h.com:8080/a"),
        # tracker chains collapse in either order
        (
            "http://h.com/p?utm_medium=b&utm_source=a&id=1",
            "http://h.com/p?id=1",
        ),
        ("http://h.com/p?utm_source=a&utm_content=b", "http://h.com/p"),
        # root slash off; bare host unchanged
        ("http://h.com/", "http://h.com"),
        ("http://h.com", "http://h.com"),
        # non-URL strings pass through
        ("not a url", "not a url"),
    ],
)
def test_normalize_url(spark, raw, expect):
    assert _norm(spark, raw) == expect


def test_host_and_registered_domain(spark):
    rows = (
        spark.createDataFrame(
            [
                ("https://www.news.example.co.uk:443/x",),
                ("http://a.b.example.com/y",),
                ("http://user@sub.site.org:8080/z",),
            ],
            ["u"],
        )
        .select(
            url_host("u").alias("h"),
            registered_domain("u").alias("d"),
        )
        .collect()
    )
    assert [(r.h, r.d) for r in rows] == [
        ("www.news.example.co.uk", "example.co.uk"),
        ("a.b.example.com", "example.com"),
        ("sub.site.org", "site.org"),
    ]


def test_blocklist_and_cap(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://spam.com/a", 100),
            (2, "http://spam.com/b", 90),
            (3, "http://ok.com/1", 80),
            (4, "http://ok.com/2", 70),
            (5, "http://ok.com/3", 60),
            (6, "http://sub.ok.com/4", 50),
            (7, "http://other.net/x", 40),
        ],
        ["doc_id", "url", "quality"],
    )
    kept = filter_blocked_domains(docs, ["SPAM.com"], "url")
    assert {r.doc_id for r in kept.collect()} == {3, 4, 5, 6, 7}
    capped = cap_per_domain(
        kept,
        cap=2,
        url_col="url",
        order_by=[F.desc("quality"), F.asc("doc_id")],
    )
    # ok.com (incl. the subdomain) capped to its 2 best; other.net kept
    assert {r.doc_id for r in capped.collect()} == {3, 4, 7}
    with pytest.raises(ValueError, match="order_by"):
        cap_per_domain(docs, cap=2, url_col="url")
    with pytest.raises(ValueError, match="cap"):
        cap_per_domain(docs, cap=0, url_col="url", order_by=[F.col("doc_id")])


def test_big_blocklist_uses_anti_join(spark):
    docs = spark.createDataFrame(
        [(1, "http://bad0.com/x"), (2, "http://fine.org/y")],
        ["doc_id", "url"],
    )
    big = [f"bad{i}.com" for i in range(1500)]
    out = filter_blocked_domains(docs, big, "url")
    assert [r.doc_id for r in out.collect()] == [2]
    assert "__dom" not in out.columns


def test_search_terms_modes(spark):
    docs = spark.createDataFrame(
        [
            (1, "the merge window opened and the merge closed"),
            (2, "a window without the other word"),
            (3, "nothing relevant here"),
        ],
        ["doc_id", "text"],
    )
    both = search_terms(docs, ["merge", "window"], mode="all")
    assert [(r.doc_id, r.score) for r in both.collect()] == [(1, 3)]
    any_ = search_terms(docs, ["MERGE", "window"], mode="any")
    assert {(r.doc_id, r.score) for r in any_.collect()} == {(1, 3), (2, 1)}
    with pytest.raises(ValueError, match="mode"):
        search_terms(docs, ["x"], mode="fuzzy")
    with pytest.raises(ValueError, match="at least one"):
        search_terms(docs, [])


def test_index_search_equals_scan_search(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(500)
    )
    terms = ["merge", "window"]
    scan = {
        (r.doc_id, r.score)
        for r in search_terms(docs, terms, mode="all")
        .select("doc_id", "score")
        .collect()
    }
    idx = build_term_index(docs)
    via_index = {
        (r.doc_id, r.score)
        for r in search_index(idx, terms, mode="all").collect()
    }
    assert scan == via_index and scan


def test_index_on_term_bucketed_table_prunes(spark, tmp_path):
    """The composition the module docstrings promise: postings stored
    term-bucketed -> a term lookup plans one file per batch."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    idx = build_term_index(docs)
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("db")
    t = cat.table("db", "postings")
    t.create(idx.schema, bucket_by=("term", 8))
    t.append(idx)
    plan = t.plan_scan([("term", "=", "merge")])
    assert plan["files_scanned"] == 1 and plan["files_total"] == 8
    postings = t.read_where([("term", "=", "merge")])
    expect = idx.where(F.col("term") == "merge")
    assert {
        (r.doc_id, r.tf) for r in postings.collect()
    } == {(r.doc_id, r.tf) for r in expect.collect()}


def test_search_plan_is_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = search_terms(docs, ["merge"], mode="any")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
