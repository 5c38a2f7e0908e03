"""Round-12 filesystem-catalog commit-count scaling probe (r11 VERDICT
ask #4 / "What's missing" #1).

Every data-plane probe so far (1M-100M rows) ran against tables with a
handful of snapshots. A streaming CDC sink produces the OPPOSITE
shape: one commit per epoch plus delete-file and compaction commits —
thousands of snapshots after days of uptime. If `_load`, `plan_scan`
(a pruned read), `history()`, or the MERGE planning path is linear in
TOTAL snapshots, the streaming path degrades with uptime regardless of
epoch size (the reference pins vacuum_min_snapshots_to_keep for
exactly this reason, spark_utils.py:171).

This probe appends N tiny batches (one commit each, the epoch shape)
and at snapshot-count checkpoints measures, driver-side wall clock:

  - append latency (median of the last 11 commits before the mark)
  - _load() of the head snapshot
  - read-plan + metadata count of a month-pruned scan
  - history() (full ancestry walk)
  - version_as_of_timestamp + a time-travel read plan
  - one MERGE of a small batch
  - expire_snapshots(keep_last=32) at the END: the documented bound —
    after expiry the same measurements re-run to show the recovery

Prints one JSON line per measurement the moment it completes. Run on
an IDLE box.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402

WORK = "/tmp/probe_r12_catalog"


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def measure(tag: str, t, spark, n_snapshots: int) -> None:
    t0 = time.time()
    snap = t._load()
    t_load = time.time() - t0

    t0 = time.time()
    df = t.read(months=["2024-03"])
    n = df.count()
    t_pruned = time.time() - t0

    t0 = time.time()
    h = t.history()
    t_hist = time.time() - t0

    # time-travel to the middle LIVE version (after expiry the
    # ancestry's early half is gone — resolving into it is an error
    # by design, not a measurement)
    vs = t._versions()
    ts_mid = t._load(vs[len(vs) // 2]).committed_at_us
    t0 = time.time()
    v_mid = t.version_as_of_timestamp(ts_mid)
    t.read(version=v_mid).limit(1).count()
    t_travel = time.time() - t0

    t0 = time.time()
    batch = spark.range(5).select(
        (F.col("id") + 10_000_000).alias("k"),
        F.lit("2024-03-15 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).alias("v"),
    )
    t.merge_into(batch, on=["k"])
    t_merge = time.time() - t0

    emit({
        "probe": "catalog_commits",
        "mark": tag,
        "n_snapshots": n_snapshots,
        "history_len": len(h),
        "pruned_rows": n,
        "t_load_s": round(t_load, 4),
        "t_pruned_read_s": round(t_pruned, 3),
        "t_history_s": round(t_hist, 3),
        "t_time_travel_s": round(t_travel, 3),
        "t_merge_s": round(t_merge, 3),
        "head_manifest_bytes": _head_manifest_bytes(t, snap),
        "meta_dir_total_bytes": _meta_dir_bytes(t),
        "n_batches": len(snap.batches),
    })


def _head_manifest_bytes(t, snap) -> int:
    import os

    p = os.path.join(t.meta_dir, f"v{snap.version}.json")
    return os.path.getsize(p) if os.path.isfile(p) else -1


def _meta_dir_bytes(t) -> int:
    import os

    return sum(
        os.path.getsize(os.path.join(t.meta_dir, f))
        for f in os.listdir(t.meta_dir)
        if os.path.isfile(os.path.join(t.meta_dir, f))
    )


def main() -> None:
    spark = get_spark()
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    marks = sorted(
        {m for m in (200, 500, 1000, 2000, 5000, 10000) if m <= total}
    )
    shutil.rmtree(WORK, ignore_errors=True)
    cat = LakehouseCatalog(spark, WORK)
    cat.create_namespace("db")
    t = cat.table("db", "epochs")
    first = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit("2024-03-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(0).alias("v"),
    )
    t.create(first.schema, partition_month_of="ts")
    t.append(first)

    months = ["2024-01", "2024-02", "2024-03", "2024-04"]
    append_times: list[float] = []
    n_commits = 1
    for mark in marks:
        while n_commits < mark:
            m = months[n_commits % len(months)]
            batch = spark.range(10).select(
                (F.col("id") + n_commits * 10).alias("k"),
                F.lit(f"{m}-10 00:00:00").cast("timestamp").alias("ts"),
                F.lit(n_commits).alias("v"),
            )
            t0 = time.time()
            t.append(batch)
            append_times.append(time.time() - t0)
            n_commits += 1
        emit({
            "probe": "catalog_commits",
            "mark": f"append_latency@{mark}",
            "n_snapshots": n_commits,
            "append_median_last11_s": round(
                statistics.median(append_times[-11:]), 3
            ),
            "append_median_first11_s": round(
                statistics.median(append_times[:11]), 3
            ),
        })
        try:
            measure(f"at_{mark}", t, spark, n_commits)
            n_commits += 1  # the measure's merge commits once
        except Exception as e:  # noqa: BLE001
            emit({"probe": "catalog_commits", "mark": f"at_{mark}",
                  "error": repr(e)})

    # the documented bound: MAINTENANCE. A streaming table accretes
    # one tiny batch dir per epoch (the scan-cost driver) and one
    # manifest per commit (the metadata-bytes driver) — compact()
    # folds the batches, expire_snapshots() drops old manifests. The
    # recovery measurements show the bound the maintenance contract
    # provides.
    t0 = time.time()
    t.compact()
    emit({"probe": "catalog_commits", "mark": "compact",
          "t_compact_s": round(time.time() - t0, 2)})
    t0 = time.time()
    expired = t.expire_snapshots(keep_last=32)
    emit({"probe": "catalog_commits", "mark": "expire",
          "t_expire_s": round(time.time() - t0, 2),
          "n_expired": len(expired)})
    try:
        measure("after_compact_expire", t, spark, 32)
    except Exception as e:  # noqa: BLE001
        emit({"probe": "catalog_commits", "mark": "after_compact_expire",
              "error": repr(e)})


if __name__ == "__main__":
    main()
