"""URL curation operators for web-scale training corpora.

RefinedWeb/CCNet-style URL hygiene: canonicalize crawl URLs so that
exact URL dedup actually dedups (tracking params, fragments, default
ports, and www. aliases all collapse), extract host/registered domain,
drop blocklisted domains, and cap documents-per-domain so no single
site dominates the training mixture.

Everything is built-in-expression only (JVM regex, no Python in the
row path): at 100 TB these run map-only except the per-domain cap,
which shuffles once on the domain key and uses a rank window that
Spark compiles to WindowGroupLimit (per-partition top-k, no global
sort).

No reference analogue (the reference has no text pipeline); the shapes
follow the public RefinedWeb (arXiv:2306.01116) and CCNet
(arXiv:1911.00359) curation recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# query params that never change page content — the usual tracker set
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref", "mc_cid", "mc_eid",
)

# minimal two-level public-suffix set for the registered-domain
# heuristic; a production run swaps in the full public-suffix list
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "com.br", "co.jp", "co.in",
    "com.cn", "co.kr", "com.mx",
)


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, strip ``#fragment``, strip
    the tracking params in TRACKING_PARAMS (and a then-empty ``?``),
    drop default ports (:80 http / :443 https), drop a leading ``www.``
    and a trailing ``/`` on the path. Pure expression composition —
    whole-stage-codegen keeps this in the scan stage."""
    c = F.col(url) if isinstance(url, str) else url
    # Known simplification: the scheme://authority lowercase (step 2)
    # also lowercases any userinfo (user@host). RFC 3986 makes userinfo
    # case-sensitive, but crawl-dedup canonicalization treats URL-embedded
    # credentials as junk anyway; the ruleset stays internally consistent.
    # 1. fragment off
    c = F.regexp_replace(c, r"#.*$", "")
    # 2. scheme+host lowercased (group 1 = scheme://host[:port])
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][\w+.-]*://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][\w+.-]*://[^/?#]*", ""),
    )
    # 3. tracking params off (leading ? or & kept on the NEXT param by
    #    re-writing the separator), then a dangling ?/& off
    for p in TRACKING_PARAMS:
        c = F.regexp_replace(c, r"([?&])" + p + r"=[^&#]*&", "$1")
        c = F.regexp_replace(c, r"[?&]" + p + r"=[^&#]*$", "")
    # 4. default ports off (no lookaheads: RE2-compatible so the DuckDB
    #    oracle can run the byte-identical ruleset)
    c = F.regexp_replace(c, r"^(http://[^/:?#]*):80($|[/?#].*)", "$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:?#]*):443($|[/?#].*)", "$1$2")
    # 5. www. off
    c = F.regexp_replace(c, r"^(https?://)www\.", "$1")
    # 6. trailing slash off the path (kept params survive)
    c = F.regexp_replace(c, r"^(https?://[^?#]*[^/?#])/(\?.*)?$", "$1$2")
    c = F.regexp_replace(c, r"^(https?://[^/?#]+)/$", "$1")
    return c


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port, no credentials) of a URL."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(
        c, r"^[a-zA-Z][\w+.-]*://(?:[^@/]*@)?([^/:?#]+)", 1
    )
    return F.lower(host)


def registered_domain(url: Column | str) -> Column:
    """eTLD+1 heuristic: last two host labels, or last THREE when the
    last two are a known two-level public suffix (co.uk and friends).
    The suffix set is a literal IN-list — constant-folded, no join."""
    host = url_host(url)
    no_www = F.regexp_replace(host, r"^www\.", "")
    last2 = F.regexp_extract(no_www, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(no_www, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(
        last2.isin(*TWO_LEVEL_SUFFIXES) & (last3 != F.lit("")), last3
    ).otherwise(last2)


def filter_blocked_domains(
    df: DataFrame, blocklist: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. The blocklist
    ships as a literal IN-list for small lists (constant-folded into the
    scan filter); a production-size list (millions of entries) should
    use the broadcast anti-join variant below instead."""
    if not blocklist:
        return df
    dom = registered_domain(F.col(url_col))
    if len(blocklist) <= 1000:
        return df.where(~dom.isin(*[b.lower() for b in blocklist]))
    block_df = df.sparkSession.createDataFrame(
        [(b.lower(),) for b in blocklist], ["__blocked_domain"]
    )
    return (
        df.withColumn("__dom", dom)
        .join(
            F.broadcast(block_df),
            F.col("__dom") == F.col("__blocked_domain"),
            "left_anti",
        )
        .drop("__dom")
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    order_by: list | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered domain — the
    anti-domination guard every web-corpus mixture applies. Ordering
    within a domain is the caller's quality ranking (default: the input
    ``order_by`` must be deterministic for a reproducible corpus).

    Scale shape: ONE shuffle on the domain key; the rank window
    compiles to WindowGroupLimit, so each partition keeps a bounded
    top-``cap`` heap per key — skewed mega-domains cost memory O(cap),
    not O(domain size)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1: {cap}")
    if not order_by:
        raise ValueError(
            "cap_per_domain needs a deterministic order_by ranking"
        )
    dom = registered_domain(F.col(url_col))
    w = W.partitionBy(dom).orderBy(*order_by)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= cap)
        .drop("__rank")
    )
