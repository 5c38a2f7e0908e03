"""Declared query corpus — the engine's coverage surface (SURVEY.md §2.B).

Each entry pairs a Spark implementation (DataFrame API or spark.sql) with an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. Conventions
that make cross-engine value-hashes match:

- Every aggregate/computed column is aliased identically on both sides.
- Money/measure sums go through exact scaled-integer (cents) arithmetic
  (data has <=2 decimal digits) — never raw double sums, whose accumulation
  order differs across engines/partitions, and never Spark decimal products,
  which measured pathologically slow in this build.
- AVGs are computed as exact-integer SUM cast to double, divided by COUNT in
  double (double division is deterministic), then ROUNDed.
- Array folds run element-order-sequential on both sides (Spark
  ``aggregate`` HOF; duckdb ``list_reduce`` with a prepended init).
- Raw timestamps are surfaced as epoch microseconds (Spark ``unix_micros``,
  duckdb ``epoch_us``) or formatted strings; dates as strings.
- Queries whose output is row-limited carry a total ORDER BY with an
  explicit unique tiebreak and explicit NULLS FIRST/LAST.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one testdata table (columnar, pushdown-eligible)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with ``ts`` normalized to a microsecond timestamp.

    The parquet column is TIMESTAMP(NANOS); the session reads it as a
    nanos-since-epoch long (``spark.sql.legacy.parquet.nanosAsLong``) and
    this helper floor-divides to microseconds — the same truncation duckdb
    applies converting TIMESTAMP_NS to epoch microseconds. Integer ``div``,
    not ``/``: epoch-nanos (~1.7e18) exceeds double's 2^53 exact range.
    """
    ev = load(spark, sf_dir, "events")
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names or TABLES:
        if n == "events":
            load_events(spark, sf_dir).createOrReplaceTempView(n)
        else:
            load(spark, sf_dir, n).createOrReplaceTempView(n)


# --- cross-engine numeric helpers (see module docstring) -------------------
#
# Money/measure columns in the testdata carry exactly 2 decimal digits, so
# scaled-integer (cents) arithmetic is exact, shuffle-order-independent, and
# ~10x faster than Spark decimal expressions (decimal multiply measured
# pathologically slow in this build: 54-67s for one product over 600k rows
# vs 5.6s in bigint). DuckDB mirrors the same formulation.


def cents(col: F.Column) -> F.Column:
    """2-decimal double -> exact integer hundredths."""
    return F.round(col * 100).cast("long")


def dsum(col: F.Column) -> F.Column:
    """Exact money sum -> double dollars; order-independent (integer sum)."""
    return F.sum(cents(col)).cast("double") / 100


def davg(col: F.Column, n: F.Column | None = None) -> F.Column:
    """Exact-sum / count in double, rounded to 4."""
    cnt = n if n is not None else F.count(col)
    return F.round(F.sum(cents(col)).cast("double") / 100 / cnt, 4)


ORACLE_DSUM = "CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS DOUBLE) / 100"
ORACLE_DAVG = (
    "ROUND(CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*), 4)"
)


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => Tier-2 (rows-only check by the driver)
    tier: int = 1


REGISTRY: dict[str, Query] = {}


def q(name: str, oracle: str | None = None, tier: int = 1):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, tier)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------


@q(
    "q01_scan_counts",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@q(
    "q03_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events ORDER BY event_id LIMIT 100
    """,
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Project / filter
# ---------------------------------------------------------------------------


@q(
    "q04_filter_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS rev,
           CASE WHEN l_tax > 0.04 THEN 'hi' ELSE 'lo' END AS tax_band
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      AND l_returnflag IN ('R', 'A')
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    return (
        li.where(
            ship.between(F.lit("1996-01-01"), F.lit("1996-12-31"))
            & F.col("l_returnflag").isin("R", "A")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("rev"),
            F.when(F.col("l_tax") > 0.04, "hi").otherwise("lo").alias("tax_band"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@q(
    "q05_join_inner_agg",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {ORACLE_DSUM.format(c='o_totalprice')} AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@q(
    "q12_tpch_q1",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty_c) AS DOUBLE) / 100 AS sum_qty,
           CAST(SUM(price_c) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000 AS sum_disc_price,
           CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000 AS sum_charge,
           ROUND(CAST(SUM(qty_c) AS DOUBLE) / 100 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / 100 / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(disc_c) AS DOUBLE) / 100 / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape. Exact scaled-integer arithmetic (see module header):
    cents products stay in int64 (price_c * 100 * 100 <= ~1e11 per row;
    sums spill past int64 only beyond ~1e7x this scale — at that point the
    sum column moves to decimal while the per-row math stays integer)."""
    li = load(spark, sf, "lineitem")
    qty_c = cents(F.col("l_quantity"))
    price_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.col("l_discount"))
    tax_c = cents(F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)).cast("double") / 10000).alias(
                "sum_disc_price"
            ),
            (
                F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double")
                / 1000000
            ).alias("sum_charge"),
            F.round(F.sum(qty_c).cast("double") / 100 / n, 4).alias("avg_qty"),
            F.round(F.sum(price_c).cast("double") / 100 / n, 4).alias("avg_price"),
            F.round(F.sum(disc_c).cast("double") / 100 / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: query.spark_fn for name, query in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: query.oracle
        for name, query in REGISTRY.items()
        if query.oracle is not None
    }
