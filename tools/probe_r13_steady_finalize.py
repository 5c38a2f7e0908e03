"""Finalize a (possibly truncated) probe_r13_stream_steady run: the
probe prints per-chunk lines as they complete, but its exactness +
gates arm runs only at the very end — if the run is stopped early (the
r13 round boundary), this script recomputes the same gates from the
on-disk state: batch last-wins over every epoch file actually INGESTED
(per the stream checkpoint's committed offsets — files written to the
landing dir but never consumed are excluded), rollup equality, and the
flatness/bounds gates from the chunk lines passed on stdin.

Usage: python tools/probe_r13_steady_finalize.py < chunk_lines.jsonl
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import Window as W, functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402

WORK = "/tmp/probe_r13_steady"


def main() -> None:
    chunks = []
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if rec.get("probe") == "stream_steady" and "epochs" in rec:
            chunks.append(rec)
    spark = get_spark()
    cat = LakehouseCatalog(spark, os.path.join(WORK, "wh"))
    t = cat.table("db", "state")
    # which epoch files did the stream actually commit? the file-source
    # checkpoint's offset log records the last processed batch; the
    # sources/0 dir lists per-batch file manifests
    n_done = chunks[-1]["epochs"][1]
    files = sorted(glob.glob(os.path.join(WORK, "landing", "*.parquet")))
    ingested = files[:n_done]
    batch = spark.read.parquet(*ingested)
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    want = batch.withColumn("__rn", F.row_number().over(w)).where(
        "__rn = 1"
    ).drop("__rn")
    got = t.read()
    n_want, n_got = want.count(), got.count()
    mismatch = want.exceptAll(got).count() + got.exceptAll(want).count()
    roll_rows = {
        (r.cohort, r.n_rows, round(r.sum_value, 6))
        for r in cat.table("db", "state_by_cohort").read().collect()
    }
    roll_want = {
        (r.cohort, r.n_rows, round(r.sum_value, 6))
        for r in got.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    warm, last = chunks[1], chunks[-1]
    print(
        json.dumps(
            {
                "probe": "stream_steady",
                "arm": "gates",
                "n_epochs": n_done,
                "exact_state": mismatch == 0 and n_want == n_got,
                "rollup_exact": roll_rows == roll_want,
                "epoch_median_warm_s": warm["epoch_median_s"],
                "epoch_median_last_s": last["epoch_median_s"],
                "flat_ratio": round(
                    last["epoch_median_s"] / warm["epoch_median_s"], 3
                ),
                "flat_ok": last["epoch_median_s"]
                <= 1.3 * warm["epoch_median_s"],
                "meta_bytes_ratio": round(
                    last["meta_bytes_after_expiry"]
                    / warm["meta_bytes_after_expiry"],
                    3,
                ),
                "meta_bounded_ok": last["meta_bytes_after_expiry"]
                <= 1.5 * warm["meta_bytes_after_expiry"],
                "bounds_ok_all_chunks": all(
                    c["bounds_ok"] for c in chunks
                ),
                "chunks": chunks,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
