"""Round-4 10x scale probe: position-delete read overhead, metadata-only
COUNT(*) under pos deletes, no-op DML short-circuit, and weighted
resampling throughput at ~10x the bench scale.

Synthetic data (spark.range) — measures the ENGINE's scaling shape, not
parquet read speed. Prints one human-readable line per probe.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.text import (  # noqa: E402
    weighted_resample,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f}s")
    return out


def main() -> None:
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    n = 6_000_000
    cat = LakehouseCatalog(spark, tempfile.mkdtemp(prefix="probe-r4-"))
    df = spark.range(n).select(
        F.col("id"),
        F.xxhash64("id").alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    timed("append 6M rows", lambda: cat.write_evolving(df, "db", "big"))
    t = cat.table("db", "big")

    # --- read baseline, then position-delete 0.1% by arbitrary predicate ---
    timed(
        "full read+agg, no deletes",
        lambda: t.read().agg(F.sum("v")).collect(),
    )
    timed(
        "MOR pos-delete 0.1% (arbitrary predicate, keyless)",
        lambda: t.delete_where("v = 500", mode="mor"),
    )
    timed(
        "full read+agg UNDER pos delete (broadcast anti-join overhead)",
        lambda: t.read().agg(F.sum("v")).collect(),
    )
    timed(
        "row_count under pos deletes (metadata + delete files only)",
        t.row_count,
    )

    # --- no-op DML short-circuit on the 6M-row table ------------------------
    timed(
        "no-op DELETE, out-of-bounds predicate (stats gate)",
        lambda: t.delete_where("v > 100000"),
    )
    timed(
        "no-op MOR UPDATE, out-of-bounds predicate (stats gate)",
        lambda: t.update_where("v = -1", {"k": F.lit(0)}, mode="mor"),
    )

    # --- weighted resampling at 6M docs (map-only) --------------------------
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 8).cast("string")).alias(
            "source"
        ),
    )
    weights = {f"src{i}": w for i, w in enumerate(
        [2.5, 2.0, 1.5, 1.0, 0.75, 0.5, 0.25, 0.0]
    )}
    timed(
        "weighted_resample 6M docs, 8 domains (count copies)",
        lambda: weighted_resample(docs, weights).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
