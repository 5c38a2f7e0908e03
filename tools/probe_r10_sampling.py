"""Round-10 weighted-sampling scale probe.

The two round-9 curation primitives carry scale claims that were argued
from the plan shape but never measured:

- pps_systematic_sample: the cumulative-weight walk decomposes across
  md5 key-range shards (no single-reducer global sort). If that holds,
  wall clock grows ~linearly in rows and is flat-ish in n_shards; if it
  secretly serialized, 100M rows would cliff.
- domain_budget_select: pre-round-10 it was one window sort-shuffle
  per domain key, so a skewed domain distribution (one domain holding
  ~50% of rows — the realistic web-crawl shape) serialized half the
  corpus onto one reducer. The probe plants exactly that and measures
  the single-window plan (n_shards=1, the old default) against the
  round-10 quantile-sharded decomposition (n_shards=32).

Each measurement is individually guarded: a crash (the first probe
run OOMed the whole JVM inside the 100M single-window sort under the
default 8g driver) records an error entry instead of losing the run.
Per-size results print incrementally; the final line is the full
JSON. Synthetic rows via spark.range + xxhash64 mixing (engine shape,
not parquet speed). Sizes default to 10M and 100M. Run with
ENGINE_DRIVER_MEMORY=48g.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.text import (  # noqa: E402
    domain_budget_select,
    pps_systematic_sample,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def synth(spark, n: int):
    """(doc_id, source, token_count, lm_score): 16 domains, one hot
    domain holding ~50% of rows, weights 1..10000 skewed-ish."""
    h = F.abs(F.xxhash64("id", F.lit(3)))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(h % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("d"), (h % 15).cast("string")))
        .alias("source"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 10_000 + 1).alias(
            "token_count"
        ),
        ((F.abs(F.xxhash64("id", F.lit(7))) % 1_000_000) / 1_000_000.0)
        .alias("lm_score"),
    )


def guarded(out: dict, key: str, fn) -> None:
    t0 = time.time()
    try:
        out[key] = fn()
        out[key]["sec"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001 — probe must survive any cliff
        out[key] = {
            "sec": round(time.time() - t0, 1),
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }


def run_size(spark, n: int) -> dict:
    docs = synth(spark, n).localCheckpoint(eager=True)
    out: dict = {"n_rows": n}

    for shards in (64, 256):
        guarded(
            out,
            f"pps_shards_{shards}",
            lambda shards=shards: {
                "selected": pps_systematic_sample(
                    docs,
                    n // 100,
                    "token_count",
                    seed="probe",
                    n_shards=shards,
                ).count(),
                "target": n // 100,
            },
        )

    def budget(shards: int) -> dict:
        kept = domain_budget_select(
            docs, 3000, "token_count", "lm_score", n_shards=shards
        )
        agg = kept.groupBy("source").count().collect()
        n_kept = sum(r["count"] for r in agg)
        hot = {r["source"]: r["count"] for r in agg}.get("hot", 0)
        return {
            "kept_rows": n_kept,
            "hot_domain_kept": hot,
            "kept_frac": round(n_kept / n, 4),
        }

    # one-window form (the pre-round-10 default) vs the sharded form
    guarded(out, "domain_budget_1shard", lambda: budget(1))
    guarded(out, "domain_budget_32shards", lambda: budget(32))
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    sizes = (
        [int(a) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else [10_000_000, 100_000_000]
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_size(spark, n) for n in sizes]
    out = {"probe": "r10_weighted_sampling", "sizes": results}
    if len(results) == 2:
        scale = results[1]["n_rows"] / results[0]["n_rows"]
        for key in ("pps_shards_64", "domain_budget_32shards"):
            a = results[0].get(key, {}).get("sec", 0)
            b = results[1].get(key, {}).get("sec", 0)
            if a > 0 and "error" not in results[0][key] | results[1][key]:
                out[f"{key}_growth_vs_linear"] = round(b / a / scale, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
