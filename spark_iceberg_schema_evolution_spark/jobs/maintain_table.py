"""Scheduled table-maintenance job — the engine-native replacement for
the reference's Athena OPTIMIZE / VACUUM property knobs
(`src/utils/spark/spark_utils.py:166-171`: optimize_rewrite_* thresholds,
vacuum_min_snapshots_to_keep).

    python -m spark_iceberg_schema_evolution_spark.jobs.maintain_table \
        --warehouse /tmp/wh --namespace db --table events \
        [--sort-by k1,k2 | --z-order x,y] [--target-files 32] \
        [--keep-snapshots 5] [--max-batches 8] [--max-delete-files 2]

Behavior:
- compacts when the live batch count exceeds ``--max-batches`` (the
  reference's rewrite "file threshold", applied to manifest batches),
  optionally with a sort/z-order rewrite so data skipping stays tight;
- otherwise folds MOR delete files into data files when their live
  count exceeds ``--max-delete-files`` (the reference's
  optimize_rewrite_delete_file_threshold=2) — a streaming CDC upsert in
  MOR mode ships one delete file per micro-batch, and each one stacks
  an anti-join onto every subsequent read until folded;
- expires snapshots beyond ``--keep-snapshots`` (vacuum), physically
  deleting unreferenced batch dirs;
- prints before/after planning metrics (batches, files, rows) — all
  manifest-derived, no data scan.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="maintain_table")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--namespace", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--sort-by", default=None, help="comma-separated")
    p.add_argument("--z-order", default=None, help="comma-separated")
    p.add_argument("--target-files", type=int, default=None)
    p.add_argument(
        "--keep-snapshots", type=int, default=None,
        help=(
            "snapshots to retain on expiry; default: the table's "
            "vacuum_min_snapshots_to_keep property, else 5"
        ),
    )
    p.add_argument(
        "--max-batches", type=int, default=None,
        help=(
            "compact only when live batches exceed this; default: the "
            "table's optimize_rewrite_data_file_threshold property, "
            "else 8"
        ),
    )
    p.add_argument(
        "--max-delete-files", type=int, default=None,
        help=(
            "fold MOR delete files into data files when the live "
            "delete-file count exceeds this; default: the table's "
            "optimize_rewrite_delete_file_threshold property, else 2 "
            "(the reference declares these knobs as TBLPROPERTIES, "
            "spark_utils.py:166-171; probe_r5 measures ~linear read "
            "amplification per stacked file)"
        ),
    )
    p.add_argument(
        "--max-snapshot-age-seconds", type=float, default=None,
        help=(
            "with --keep-snapshots, expire only snapshots older than "
            "this (Iceberg's older_than axis); default: the table's "
            "vacuum_max_snapshot_age_seconds property, else no age "
            "gate (pure count-based expiry)"
        ),
    )
    p.add_argument(
        "--remove-orphans", action="store_true",
        help=(
            "after expiry, reclaim files no remaining snapshot "
            "references (crashed writers, DML-dead partition files)"
        ),
    )
    p.add_argument(
        "--orphan-age-seconds", type=float, default=3 * 24 * 3600,
        help="minimum age before an unreferenced file is reclaimed",
    )
    p.add_argument(
        "--force", action="store_true",
        help="compact regardless of batch count",
    )
    p.add_argument(
        "--bloom-columns", default=None,
        help=(
            "comma-separated columns to (incrementally) bloom-index "
            "after maintenance — compaction rewrites batches, which "
            "drops their sidecars, so the nightly job re-indexes only "
            "the rewritten/new batches"
        ),
    )
    return p


def maintain(spark, args) -> dict:
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    cat = LakehouseCatalog(spark, args.warehouse)
    t = cat.table(args.namespace, args.table)
    # threshold resolution: explicit CLI flag > table property (the
    # reference's TBLPROPERTIES knobs, spark_utils.py:166-171) > default
    max_batches = (
        args.max_batches
        if args.max_batches is not None
        else t.int_property("optimize_rewrite_data_file_threshold", 8)
    )
    max_delete_files = (
        args.max_delete_files
        if args.max_delete_files is not None
        else t.int_property("optimize_rewrite_delete_file_threshold", 2)
    )
    keep_snapshots = (
        args.keep_snapshots
        if args.keep_snapshots is not None
        else t.int_property("vacuum_min_snapshots_to_keep", 5)
    )
    snap = t._load()
    report = {
        "batches_before": len(snap.batches),
        "files_before": len(t.files()),
        "delete_files_before": len(snap.deletes),
        "rows": t.row_count(),
        "compacted": False,
        "deletes_folded": False,
    }
    if args.force or len(snap.batches) > max_batches:
        sort_by = args.sort_by.split(",") if args.sort_by else None
        z_order = args.z_order.split(",") if args.z_order else None
        t.compact(
            sort_by=sort_by,
            z_order=z_order,
            target_files=args.target_files,
        )
        report["compacted"] = True
    elif t.should_compact_deletes(max_delete_files):
        # full compact above already clears delete files; this is the
        # cheaper delete-only fold for tables under the batch threshold
        t.compact_deletes()
        report["deletes_folded"] = True
    raw_age = (
        args.max_snapshot_age_seconds
        if args.max_snapshot_age_seconds is not None
        else t.properties().get("vacuum_max_snapshot_age_seconds")
    )
    dropped = t.expire_snapshots(
        keep_last=keep_snapshots,
        max_age_s=float(raw_age) if raw_age is not None else None,
    )
    report["snapshots_expired"] = len(dropped)
    if args.remove_orphans:
        report["orphans_removed"] = len(
            t.remove_orphan_files(older_than_s=args.orphan_age_seconds)
        )
    if args.bloom_columns:
        for c in args.bloom_columns.split(","):
            t.build_bloom_index(c.strip())
        report["bloom_columns"] = args.bloom_columns
    report["batches_after"] = len(t._load().batches)
    report["delete_files_after"] = len(t._load().deletes)
    report["files_after"] = len(t.files())
    report["rows_after"] = t.row_count()
    return report


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from spark_iceberg_schema_evolution_spark.session import get_spark

    spark = get_spark()
    report = maintain(spark, args)
    for k, v in report.items():
        print(f"{k}: {v}")
    if report["rows_after"] != report["rows"]:
        print("ERROR: row count changed during maintenance", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
