"""Driver-only isolation of the commit-log lineage win (r12).

The main catalog probe measured ``history()`` at 8.2s and timestamp
time-travel RESOLUTION at minutes for a 1000-commit table under the
pre-r12 walk (every hop parses a manifest whose batches list is itself
O(commits) — quadratic). This probe isolates the metadata layer: it
fabricates N commits DIRECTLY through ``_commit`` (synthetic batches
lists shaped like the streaming sink's: one new batch entry per epoch,
all prior entries carried over) with zero executor work, then times
``history()`` and ``version_as_of_timestamp`` three ways:

  - with the commit log written by ``_commit`` (the r12 default)
  - with the log deleted (the pre-r12 manifest walk, still the
    fallback path — must give the identical answer, pinned in
    tests/test_tables.py)
  - after ``rebuild_commit_log`` (the expiry-hook backfill)

Run anywhere; it needs a SparkSession handle but never runs a job.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import types as T  # noqa: E402

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import (  # noqa: E402
    LakehouseTable,
    Snapshot,
)

WORK = "/tmp/probe_r12_history"


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def main() -> None:
    spark = get_spark()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    shutil.rmtree(WORK, ignore_errors=True)
    t = LakehouseTable(spark, os.path.join(WORK, "tbl"))
    schema = T.StructType([T.StructField("id", T.LongType())])
    batches: list[dict] = []
    t0 = time.time()
    for v in range(n):
        batches = batches + [{
            "path": os.path.join(t.data_dir, f"batch-{v}"),
            "months": None,
            "spec_col": None,
            "renames_at": 0,
            "seq": v,
            "stats": {},
            "file_stats": {},
            "file_rows": {"part-0.parquet": 10},
        }]
        t._commit(Snapshot(v, schema, list(batches), None))
    emit({"probe": "history", "mark": "fabricate", "n_commits": n,
          "t_s": round(time.time() - t0, 2),
          "head_manifest_bytes": os.path.getsize(
              os.path.join(t.meta_dir, f"v{n-1}.json"))})

    def time_lineage(tag: str) -> None:
        t1 = time.time()
        h = t.history()
        t_hist = time.time() - t1
        ts_mid = h[len(h) // 2]["committed_at_us"]
        t1 = time.time()
        v_mid = t.version_as_of_timestamp(ts_mid)
        t_resolve = time.time() - t1
        emit({"probe": "history", "mark": tag, "n_commits": n,
              "history_len": len(h), "resolved_mid": v_mid,
              "t_history_s": round(t_hist, 4),
              "t_ts_resolve_s": round(t_resolve, 4)})

    time_lineage("with_commit_log")
    log = t._commit_log_path
    os.remove(log)
    time_lineage("manifest_walk_fallback")
    t1 = time.time()
    t.rebuild_commit_log()
    emit({"probe": "history", "mark": "rebuild", "n_commits": n,
          "t_s": round(time.time() - t1, 2)})
    time_lineage("after_rebuild")
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
