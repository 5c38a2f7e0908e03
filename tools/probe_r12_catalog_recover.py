"""Recovery arm of the r12 commit-count probe, runnable against the
table tools/probe_r12_catalog.py leaves on disk (the main probe's
200/500/1000 curve is decisively super-linear — the 2000/10000 marks
would only re-prove it at hours of wall clock, so the curve run is cut
at 1000 and this script measures the maintenance bound from there):
compact() folds the accumulated per-epoch batch dirs, expire_snapshots
drops old manifests, and the same measurements re-run to show what the
documented maintenance contract (maintain_table --max-batches /
--keep-snapshots, or the streaming sink's new inline max_batches)
buys back."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402
from tools.probe_r12_catalog import WORK, emit, measure  # noqa: E402


def main() -> None:
    spark = get_spark()
    cat = LakehouseCatalog(spark, WORK)
    t = cat.table("db", "epochs")
    snap = t._load()
    emit({"probe": "catalog_commits", "mark": "recover_start",
          "n_snapshots": len(t._versions()),
          "n_batches": len(snap.batches)})
    t0 = time.time()
    t.compact()
    emit({"probe": "catalog_commits", "mark": "compact",
          "t_compact_s": round(time.time() - t0, 2),
          "n_batches_after": len(t._load().batches)})
    t0 = time.time()
    expired = t.expire_snapshots(keep_last=32)
    emit({"probe": "catalog_commits", "mark": "expire",
          "t_expire_s": round(time.time() - t0, 2),
          "n_expired": len(expired)})
    try:
        measure("after_compact_expire", t, spark, len(t._versions()))
    except Exception as e:  # noqa: BLE001
        emit({"probe": "catalog_commits", "mark": "after_compact_expire",
              "error": repr(e)})


if __name__ == "__main__":
    main()
