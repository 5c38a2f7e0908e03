"""Round-13 streaming-sink steady-state probe (r12 VERDICT ask #3).

The r12 commit-count probe measured the UN-maintained degradation
(per-epoch commits took the sink's own MERGE from 39s to 575s by 873
batches) and each mitigation separately (max_batches inline scoped
compaction, max_delete_files, the O(1) commit_log, expiry). This probe
composes them: ONE long run — 1000+ micro-batch epochs through
``stream_upsert_to_lakehouse`` on a month-partitioned table with every
guard on —

    merge_mode="mor"            (O(batch) commits)
    max_batches=12              (inline scoped batch fold)
    max_delete_files=8          (inline delete fold)
    rollup_table + delta hints  (continuous aggregate per epoch)
    expire_snapshots per chunk  (the nightly maintenance bound)

and asserts the claim users actually need: UPTIME NEVER DEGRADES THE
SINK. Epochs arrive in chunks of 100 (the stream restarts from its
checkpoint between chunks, as a real deployment does across
maintenance windows); after each chunk the probe records

  - per-epoch wall clock from the main table's own commit timestamps
    (median + p90 of successive-commit deltas — gaps include the
    epoch's merge, rollup refresh, and any inline fold it triggered)
  - chunk wall clock (the coarse cross-check)
  - live batch / delete-file counts (must stay pinned at their caps)
  - metadata + data directory bytes after maintenance (must be
    bounded, not monotone)

and at the end verifies EXACTNESS: the table equals batch last-wins
over every epoch file ever fed, and the rollup equals a fresh groupBy
of the final state.

Gates emitted: median per-epoch of the last chunk vs the second chunk
(first is warmup) <= 1.3; metadata bytes last/second <= 1.5; bounds
hold at every chunk end.

Prints one JSON line per chunk the moment it completes (r10 lesson).
Run on an IDLE box with ENGINE_DRIVER_MEMORY=48g.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.streaming import windows as SW  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402

WORK = "/tmp/probe_r13_steady"
ROWS_PER_EPOCH = 10
N_USERS = 500
MAX_BATCHES = 12
MAX_DELETE_FILES = 8
KEEP_SNAPSHOTS = 64


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def epoch_rows(e: int):
    """10 rows; keys recur every ~71 epochs (heavy update traffic);
    the hot month advances every 334 epochs (3 months over 1k)."""
    month = 1 + e // 334
    ts = datetime.datetime(2024, month, 1, 0, 0) + datetime.timedelta(
        minutes=e
    )
    return [
        (
            (e * 7 + i) % N_USERS,
            ts,
            float(e),
            ((e * 7 + i) % N_USERS) % 16,
        )
        for i in range(ROWS_PER_EPOCH)
    ]


def write_epoch_file(spark, src: str, stage: str, e: int) -> None:
    df = spark.createDataFrame(
        epoch_rows(e), "user_id LONG, ts TIMESTAMP, value DOUBLE, cohort LONG"
    ).coalesce(1)
    out = os.path.join(stage, f"e{e}")
    df.write.mode("overwrite").parquet(out)
    shutil.copy(
        glob.glob(f"{out}/part-*.parquet")[0],
        os.path.join(src, f"epoch-{e:04d}.parquet"),
    )


def main() -> None:
    spark = get_spark()
    args = sys.argv[1:]
    n_epochs = int(args[0]) if args else 1000
    chunk = int(args[1]) if len(args) > 1 else 100
    shutil.rmtree(WORK, ignore_errors=True)
    src = os.path.join(WORK, "landing")
    stage = os.path.join(WORK, "stage")
    ckpt = os.path.join(WORK, "ckpt")
    os.makedirs(src)
    cat = LakehouseCatalog(spark, os.path.join(WORK, "wh"))
    cat.create_namespace("db")
    # pre-create month-partitioned: the sink's first-batch
    # write_evolving would otherwise create an unpartitioned table
    first = spark.createDataFrame(
        epoch_rows(0),
        "user_id LONG, ts TIMESTAMP, value DOUBLE, cohort LONG",
    )
    cat.table("db", "state").create(
        first.schema, partition_month_of="ts"
    )
    schema = first.schema

    chunk_stats = []
    done = 0
    while done < n_epochs:
        hi = min(done + chunk, n_epochs)
        for e in range(done, hi):
            write_epoch_file(spark, src, stage, e)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        SW.stream_upsert_to_lakehouse(
            stream,
            cat,
            "db",
            "state",
            on=["user_id"],
            checkpoint_dir=ckpt,
            change_ts="ts",
            merge_mode="mor",
            max_delete_files=MAX_DELETE_FILES,
            max_batches=MAX_BATCHES,
            rollup_table="state_by_cohort",
            rollup_group_cols=["cohort"],
            rollup_sum_cols=["value"],
        )
        t_chunk = time.time() - t0
        t = cat.table("db", "state")
        # per-epoch deltas from this chunk's commit timestamps (the
        # lineage is pre-expiry here, so the whole chunk is visible)
        hist = t.history()
        ts_us = sorted(
            h["committed_at_us"] for h in hist[-(hi - done):]
        )
        deltas = [
            (b - a) / 1e6 for a, b in zip(ts_us, ts_us[1:]) if b > a
        ]
        snap = t._load()
        rec = {
            "probe": "stream_steady",
            "epochs": [done, hi],
            "t_chunk_s": round(t_chunk, 2),
            "epoch_median_s": round(statistics.median(deltas), 3)
            if deltas
            else None,
            "epoch_p90_s": round(
                sorted(deltas)[int(0.9 * len(deltas))], 3
            )
            if deltas
            else None,
            "n_batches": len(snap.batches),
            "n_deletes": len(snap.deletes),
            "bounds_ok": len(snap.batches) <= MAX_BATCHES + 1
            and len(snap.deletes) <= MAX_DELETE_FILES + 1,
        }
        # nightly maintenance: expiry bounds metadata bytes; the
        # rollup table gets the same treatment (one commit per epoch)
        t.expire_snapshots(keep_last=KEEP_SNAPSHOTS)
        roll = cat.table("db", "state_by_cohort")
        if len(roll._load().batches) > MAX_BATCHES:
            roll.compact()
        roll.expire_snapshots(keep_last=KEEP_SNAPSHOTS)
        rec["meta_bytes_after_expiry"] = du(t.meta_dir)
        rec["data_bytes"] = du(t.data_dir)
        rec["rollup_meta_bytes"] = du(roll.meta_dir)
        emit(rec)
        chunk_stats.append(rec)
        done = hi

    # exactness: table == batch last-wins over every epoch file
    from pyspark.sql import Window as W

    t = cat.table("db", "state")
    batch = spark.read.parquet(src)
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
    warm, last = chunk_stats[1], chunk_stats[-1]
    emit(
        {
            "probe": "stream_steady",
            "arm": "gates",
            "n_epochs": n_epochs,
            "exact_state": mismatch == 0 and n_want == n_got,
            "rollup_exact": roll_rows == roll_want,
            "epoch_median_first100_s": warm["epoch_median_s"],
            "epoch_median_last100_s": last["epoch_median_s"],
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
                c["bounds_ok"] for c in chunk_stats
            ),
        }
    )


if __name__ == "__main__":
    main()
