"""Round-13 scale probe for text.dsir_importance (the new q190 face).

The oracle face proves 500-doc exactness; this proves the 100 TB shape
claim: model tables stay O(256) rows at any corpus size, so cost is two
map-combined gram aggregates + one broadcast-join scoring pass + one
doc-keyed reduce — all linear, no driver-side model. Corpus: 64-word
docs, 20% from a 64-word "target-domain" vocabulary (small enough
that 256 hash buckets see a sharply non-uniform model), 80% from a
1M-word background pool; the target model fits on a 1/100 sample of
the target-domain docs. Gates per size:

  - separation: mean llr_avg of target-domain docs > background docs
    by a clear margin (the property the operator exists for)
  - wall clock per size printed the moment it completes (r10 lesson)

Run on an idle box: ENGINE_DRIVER_MEMORY=48g python tools/probe_r13_dsir.py [sizes...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.text import (  # noqa: E402
    dsir_importance,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def synth(spark, n: int):
    is_t = (F.col("id") % 5) == 0
    words = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.concat(
            F.lit("w"),
            F.when(
                is_t, F.abs(F.xxhash64(F.col("id"), j)) % 64
            )
            .otherwise(
                F.abs(F.xxhash64(F.col("id"), j, F.lit(7))) % 1_000_000
            )
            .cast("string"),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        is_t.alias("is_target_domain"),
        F.concat_ws(" ", words).alias("text"),
    )


def main() -> None:
    spark = get_spark()
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 5_000_000]
    for n in sizes:
        docs = synth(spark, n)
        target = docs.where(
            F.col("is_target_domain") & (F.col("doc_id") % 100 == 0)
        ).select("doc_id", "text")
        t0 = time.time()
        scored = dsir_importance(docs.select("doc_id", "text"), target)
        means = {
            r.is_target_domain: (r.m, r.cnt)
            for r in scored.join(
                docs.select("doc_id", "is_target_domain"), "doc_id"
            )
            .groupBy("is_target_domain")
            .agg(
                F.avg("llr_avg").alias("m"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        }
        t = time.time() - t0
        m_t, n_t = means[True]
        m_b, n_b = means[False]
        print(
            json.dumps(
                {
                    "probe": "dsir_scale",
                    "n_docs": n,
                    "t_s": round(t, 2),
                    "mean_llr_avg_target_domain": round(m_t, 4),
                    "mean_llr_avg_background": round(m_b, 4),
                    "separation_ok": m_t > m_b + 0.3,
                    "n_target_domain": n_t,
                    "n_background": n_b,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
