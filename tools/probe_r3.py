"""Round-3 10x scale probe: data skipping, sorted compaction, MERGE
clauses, and deep connected components at ~10x the bench scale.

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
    print(f"{label}: {time.time() - t0:.2f}s")
    return out


def main() -> None:
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    n = 6_000_000
    cat = LakehouseCatalog(spark, tempfile.mkdtemp(prefix="probe-r3-"))

    # --- sorted compaction + file skipping at 6M rows -----------------------
    for s in range(3):
        df = (
            spark.range(s, n, 3)
            .select(
                # scramble ids so append batches fully overlap
                F.xxhash64("id").alias("k"),
                (F.col("id") % 1000).alias("v"),
            )
        )
        timed(f"append {s} (2M rows)", lambda d=df: cat.write_evolving(d, "db", "big"))
    t = cat.table("db", "big")
    timed(
        "compact(sort_by=k, 32 files)",
        lambda: t.compact(sort_by=["k"], target_files=32),
    )
    lo, hi = -(2**62), -(2**62) + 2**57  # ~ 1/32 of the key space
    plan = t.plan_scan([("k", ">=", lo), ("k", "<", hi)])
    print(f"plan_scan: {plan}")
    timed(
        "read_where narrow range",
        lambda: t.read_where([("k", ">=", lo), ("k", "<", hi)])
        .agg(F.count("*"), F.sum("v"))
        .collect(),
    )
    timed(
        "full-scan same filter",
        lambda: t.read()
        .where((F.col("k") >= lo) & (F.col("k") < hi))
        .agg(F.count("*"), F.sum("v"))
        .collect(),
    )

    # --- MERGE clause arms at 6M target / 600k source -----------------------
    src = spark.range(0, n, 10).select(
        F.xxhash64("id").alias("k"),
        (F.col("id") % 1000 + 10_000).alias("v"),
        F.when(F.col("id") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    timed(
        "merge 600k src into 6M target (update+delete arms)",
        lambda: t.merge_into(
            src,
            on=["k"],
            matched_update={"v": "s.v"},
            matched_condition="s.op = 'U'",
            matched_delete_where="s.op = 'D'",
        ),
    )
    print(f"rows after merge: {t.read().count()}")

    # --- deep connected components (50k-edge chain) -------------------------
    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.range(50_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels = timed(
        "connected_components 50k-hop chain",
        lambda: connected_components(chain).agg(
            F.countDistinct("cluster_id")
        ).collect(),
    )
    print(f"clusters (expect 1): {labels[0][0]}")
    spark.stop()


if __name__ == "__main__":
    main()
