"""Round-11 streaming MOR upsert-sink scale probe (r10 VERDICT ask #7).

The batch curation path has 10M-100M probes (PROBES_r10); the
streaming MOR upsert + continuous rollup path had none. This probe
drives ``stream_upsert_to_lakehouse`` (streaming/windows.py) epoch by
epoch — one file dropped, one ``processAllAvailable`` run against the
SAME checkpoint, so every epoch is a real resumed micro-batch with
real exactly-once bookkeeping — and measures, per epoch:

  - wall-clock of the epoch (merge + optional backlog fold + optional
    rollup refresh)
  - live delete-file backlog before/after (max_delete_files=4 folds it
    inline; the probe records the trigger firing)
  - per-epoch cost growth as the corpus accumulates (epoch 3 vs epoch
    2 at the same batch size — a MOR merge must stay O(batch))

Epoch shapes at each size E:
  e1: E distinct keys (creates the table)
  e2..e6: per epoch, 40% of rows land on existing keys (~2.5 rows per
      touched key — exercising the last-wins change_ts dedup), 40% on
      fresh keys (~2.5 rows/key, net-new inserts), and 20% on ONE hot
      key (a planted bot: last-wins collapses them to one merge row,
      but the row_number window first sorts 0.2*E rows in a single
      task — the realistic skew cost, bounded by the EPOCH size,
      never the corpus; surfaced here). Six epochs so the MOR
      delete-file backlog actually crosses max_delete_files=4 and the
      inline compact_deletes fold fires mid-run.

Two arms per size: with and without the continuous rollup
(16-group sum), so the rollup fold cost is the arm difference.

Prints one JSON line per epoch the moment it completes (timeout/OOM
discipline, per verify-skill notes). Run idle with
ENGINE_DRIVER_MEMORY=48g:
  ENGINE_DRIVER_MEMORY=48g python tools/probe_r11_streaming.py 1000000 10000000
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.streaming import windows as SW  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402

MAX_DELETE_FILES = 4


def epoch_frame(spark, size: int, epoch: int):
    """Synthetic CDC epoch: see module docstring for the shape."""
    base = spark.range(size)
    if epoch == 1:
        keyed = base.select(
            F.col("id").alias("user_id"),
            F.lit(epoch).alias("epoch"),
        )
    else:
        frac = F.col("id") % 10
        prev_lo = (epoch - 2) * (size * 4 // 10)
        new_lo = size + (epoch - 2) * (size * 4 // 10)
        keyed = base.select(
            F.when(frac < 4, prev_lo + F.col("id") % (size * 4 // 10))
            .when(frac < 8, new_lo + F.col("id") % (size * 4 // 10))
            .otherwise(F.lit(-1))  # the hot key: 20% of the epoch
            .alias("user_id"),
            F.lit(epoch).alias("epoch"),
        )
    return keyed.select(
        "user_id",
        "epoch",
        F.timestamp_seconds(
            F.lit(1_700_000_000 + epoch * 3600) + F.col("user_id") % 60
        ).alias("ts"),
        (F.col("user_id") % 16).alias("cohort"),
        F.lit(1).alias("n"),
        (F.col("user_id") * 31 + epoch).alias("value"),
    )


def drop_epoch(spark, src: str, size: int, epoch: int) -> None:
    stage = os.path.join(src, "..", f"stage_e{epoch}")
    epoch_frame(spark, size, epoch).coalesce(4).write.mode(
        "overwrite"
    ).parquet(stage)
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(stage, "part-*.parquet")))
    ):
        shutil.copy(part, os.path.join(src, f"e{epoch}_{i}.parquet"))


def run_size(spark, size: int, rollup: bool) -> dict:
    work = tempfile.mkdtemp(prefix=f"probe-stream-{size}-")
    src = os.path.join(work, "feed")
    os.makedirs(src)
    cat = LakehouseCatalog(spark, os.path.join(work, "wh"))
    schema = (
        "user_id long, epoch int, ts timestamp, cohort long, "
        "n int, value long"
    )
    out: dict = {
        "rows_per_epoch": size,
        "rollup": rollup,
        "epochs": [],
    }
    for epoch in (1, 2, 3, 4, 5, 6):
        drop_epoch(spark, src, size, epoch)
        stream = (
            spark.readStream.schema(schema)
            # one trigger per epoch: all 4 files of the new drop
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
        )
        t = cat.table("db", "state")
        backlog_before = (
            len(t._load().deletes) if t.exists() else 0
        )
        t0 = time.time()
        SW.stream_upsert_to_lakehouse(
            stream,
            cat,
            "db",
            "state",
            on=["user_id"],
            checkpoint_dir=os.path.join(work, "ck"),
            output_mode="append",
            change_ts="ts",
            merge_mode="mor",
            max_delete_files=MAX_DELETE_FILES,
            rollup_table="cohort_counts" if rollup else None,
            rollup_group_cols=["cohort"] if rollup else None,
            rollup_sum_cols=["n"] if rollup else None,
        )
        sec = round(time.time() - t0, 1)
        t = cat.table("db", "state")
        rec = {
            "epoch": epoch,
            "sec": sec,
            "table_rows": t.row_count(),
            "delete_files_before": backlog_before,
            "delete_files_after": len(t._load().deletes),
        }
        out["epochs"].append(rec)
        print(
            json.dumps({"rows_per_epoch": size, "rollup": rollup, **rec}),
            flush=True,
        )
    # per-epoch growth as the corpus accumulates: last steady epoch vs
    # the first post-create epoch (both process the same batch volume)
    e2, e6 = out["epochs"][1]["sec"], out["epochs"][-1]["sec"]
    out["e6_over_e2"] = round(e6 / max(e2, 0.1), 2)
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    sizes = (
        [int(a) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else [1_000_000, 10_000_000]
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for size in sizes:
        for rollup in (False, True):
            try:
                results.append(run_size(spark, size, rollup))
            except Exception as e:  # record the failure, keep probing
                results.append(
                    {"rows_per_epoch": size, "rollup": rollup,
                     "error": f"{type(e).__name__}: {e}"[:400]}
                )
                print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"probe": "r11_streaming_upsert", "sizes": results}))
    spark.stop()


if __name__ == "__main__":
    main()
