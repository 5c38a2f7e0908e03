"""Single-pass column statistics profiler.

North-star utility (train-data pipelines audit every ingest batch): per
column, the row count, non-null count, distinct count, and min/max — all
computed in ONE scan. The exact-distinct form plans one Expand +
two-phase aggregate (N distinct columns -> N-way row expansion, still a
single pass over the data); ``approximate=True`` swaps in
``approx_count_distinct`` (HLL, no expansion) — the 100 TB default.

Output is long-format: one row per profiled column, min/max cast to
string so heterogeneous column types coexist in one result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """One row per column of ``cols`` (default: all) with
    (col_name, n_rows, n_nonnull, n_distinct, min_str, max_str)."""
    cols = list(cols or df.columns)
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approximate
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__{c}__n"),
            distinct(c).alias(f"__{c}__d"),
            F.min(c).cast("string").alias(f"__{c}__min"),
            F.max(c).cast("string").alias(f"__{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__{c}__n").alias("n_nonnull"),
                F.col(f"__{c}__d").alias("n_distinct"),
                F.col(f"__{c}__min").alias("min_str"),
                F.col(f"__{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.col("__total").alias("n_rows"), F.explode(per_col).alias("s"))
        .select("s.col_name", "n_rows", "s.n_nonnull", "s.n_distinct",
                "s.min_str", "s.max_str")
    )
