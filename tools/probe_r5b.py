"""Round-5 second-half scale probe: the new event-analytics operators
at 10x events (1M rows = 10 user-shifted copies of sf0.1), plus the
interval join at a 10x pair load. Usage: python tools/probe_r5b.py"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.relational import (  # noqa: E402
    cohort_retention,
    funnel,
    gapfill_locf,
    interval_overlap_join,
)
from spark_iceberg_schema_evolution_spark.queries import load_events  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def timed(label, df):
    t0 = time.time()
    df.select(F.sum(F.hash(*df.columns))).collect()
    t1 = time.time()
    df.select(F.sum(F.hash(*df.columns))).collect()
    print(f"{label}: cold {t1 - t0:.2f}s warm {time.time() - t1:.2f}s")


def main():
    spark = get_spark()
    base = load_events(spark, "/root/testdata/sf0.1")
    ten = None
    for i in range(10):
        c = base.select(
            (F.col("user_id") + i * 1000).alias("user_id"),
            "ts", "event_type", "value",
        )
        ten = c if ten is None else ten.unionByName(c)
    ten = ten.repartition(32).persist()
    n = ten.count()
    print(f"events 10x: {n} rows")
    timed("funnel 3-step", funnel(ten, ["view", "click", "purchase"],
                                  within_seconds=7 * 86400))
    timed("gapfill 1h locf",
          gapfill_locf(ten, "ts", ["user_id"], 3600, "value"))
    timed("cohort day", cohort_retention(ten, granularity="day"))
    iv = spark.range(500_000).select(
        F.col("id"), (F.col("id") % 64).alias("k"),
        ((F.col("id") * 7) % 100_000).alias("s"),
        ((F.col("id") * 7) % 100_000 + F.col("id") % 50 + 1).alias("e"),
    )
    iv2 = spark.range(500_000).select(
        F.col("id"), (F.col("id") % 64).alias("k"),
        ((F.col("id") * 13) % 100_000).alias("s"),
        ((F.col("id") * 13) % 100_000 + F.col("id") % 40 + 1).alias("e"),
    )
    timed("interval join 500k x 500k",
          interval_overlap_join(iv, iv2, ["k"], ("s", "e"), ("s", "e"),
                                bucket_width=256))
    spark.stop()


if __name__ == "__main__":
    main()
