"""Round-5 scale probe: read amplification under a STACKED delete-file
backlog, and the cost/benefit of `compact_deletes` (the delete-file
maintenance threshold, reference parity with
optimize_rewrite_delete_file_threshold=2 — spark_utils.py:170).

A MOR CDC sink commits one delete file per micro-batch. Every read
applies the whole backlog (broadcast anti-joins), so read cost grows
with the stack until maintenance folds it. This probe measures the
curve at 0 / 10 / 30 / 50 stacked equality-delete files on a 2M-row
table, then folds with compact_deletes and re-measures — the numbers
behind the `--max-delete-files` default.

Synthetic data (spark.range) — measures the ENGINE's scaling shape, not
parquet read speed. Prints one human-readable line per probe.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return dt, out


def main() -> None:
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    n = 2_000_000
    cat = LakehouseCatalog(spark, tempfile.mkdtemp(prefix="probe-r5-"))
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).alias("v"),
        F.lit(0).alias("rev"),
    )
    timed("append 2M rows", lambda: cat.write_evolving(df, "db", "big"))
    t = cat.table("db", "big")

    def read_agg():
        return t.read().agg(F.sum("v"), F.sum("rev")).collect()

    base, _ = timed("read+agg, 0 delete files", read_agg)

    # micro-batch shaped merges: 1k-row upserts, each commits one
    # equality-delete file + one tiny data batch (the MOR CDC shape)
    def one_merge(i: int) -> None:
        src = spark.range(i * 1000, i * 1000 + 1000).select(
            F.col("id"), (F.col("id") % 1000).alias("v"),
            F.lit(i).alias("rev"),
        )
        t.merge_into(src, on=["id"], mode="mor")

    stacked = {}
    k = 0
    for target in (10, 30, 50):
        t0 = time.time()
        n_m = target - k
        while k < target:
            k += 1
            one_merge(k)
        print(
            f"merges {target - n_m + 1}..{target}: "
            f"{(time.time() - t0) / n_m:.2f}s/merge", flush=True
        )
        stacked[target], _ = timed(
            f"read+agg, {target} stacked delete files", read_agg
        )

    rows_before = t.row_count()
    fold, _ = timed(
        "compact_deletes (fold 50 delete files)",
        lambda: t.compact_deletes(),
    )
    after, _ = timed("read+agg, post-fold", read_agg)
    assert t.row_count() == rows_before, "fold changed the row count"
    assert not t._load().deletes

    print(
        f"amplification vs clean read: "
        f"10={stacked[10] / base:.2f}x 30={stacked[30] / base:.2f}x "
        f"50={stacked[50] / base:.2f}x post-fold={after / base:.2f}x"
    )


if __name__ == "__main__":
    main()
