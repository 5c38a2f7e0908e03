"""Schema-evolving CSV ingest job — the engine's end-to-end demo binary.

Re-enacts the reference's only runnable program (`python src/jobs/job.py`,
/root/reference/src/jobs/job.py:29-138) Spark-first:

    discover *.csv -> per-file inferred scan -> [optional dev persist]
    -> align + unionByName (first-file-wins target schema)
    -> normalize column names -> inject ingest timestamp
    -> coerce to live table schema -> distributed lakehouse append
       (month(created_at) hidden partitioning)

Differences from the reference, by design (SURVEY §4): the sink is a
distributed write (never a driver-side pandas collect), the ingest
timestamp is an injected literal (not plan-time now()), and the
catalog/warehouse is any local or remote path instead of Glue/S3 — the
Iceberg-jar-backed twin lives in iceberg.py.

Usage:
    python -m spark_iceberg_schema_evolution_spark.jobs.ingest_csv \
        --input data/raw --warehouse /tmp/warehouse \
        --namespace db --table customers

    # generate a deterministic ragged-schema demo input first:
    python -m spark_iceberg_schema_evolution_spark.jobs.ingest_csv \
        --input /tmp/demo_raw --generate-demo-input 3 ...
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ingest_csv", description=__doc__.split("\n\n")[0]
    )
    p.add_argument("--input", required=True, help="directory holding *.csv")
    p.add_argument(
        "--warehouse", required=True, help="lakehouse warehouse root path"
    )
    p.add_argument("--namespace", default="db")
    p.add_argument("--table", required=True)
    p.add_argument(
        "--partition-month-of",
        default="created_at",
        help="timestamp column for the hidden month() partition transform "
        "('' disables partitioning)",
    )
    p.add_argument(
        "--ingest-ts",
        default=None,
        help="ISO timestamp for the created_at column (default: now; pass "
        "a fixed value for reproducible runs)",
    )
    p.add_argument(
        "--persist-inputs",
        action="store_true",
        help="persist per-file DataFrames DISK_ONLY while unioning "
        "(the reference's dev-only persist, job.py:51)",
    )
    p.add_argument(
        "--generate-demo-input",
        type=int,
        metavar="N_FILES",
        default=0,
        help="write N deterministic ragged-schema CSV files into --input "
        "before ingesting (demo mode)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from spark_iceberg_schema_evolution_spark.session import get_spark
    from spark_iceberg_schema_evolution_spark.sources.csv_evolving import (
        ingest_evolving_csvs,
    )
    from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog

    if args.generate_demo_input:
        from spark_iceberg_schema_evolution_spark.sources.fixtures import (
            generate_csv_files,
        )

        generate_csv_files(args.input, n_files=args.generate_demo_input)

    ingest_ts = (
        dt.datetime.fromisoformat(args.ingest_ts)
        if args.ingest_ts
        else dt.datetime.now()
    )
    spark = get_spark()
    catalog = LakehouseCatalog(spark, args.warehouse)
    version = ingest_evolving_csvs(
        spark,
        args.input,
        catalog,
        args.namespace,
        args.table,
        ingest_ts=ingest_ts,
        partition_month_of=args.partition_month_of or None,
        persist_inputs=args.persist_inputs,
    )
    table = catalog.table(args.namespace, args.table)
    df = table.read()
    print(
        f"committed snapshot v{version} of "
        f"{args.namespace}.{args.table}: {df.count()} rows, "
        f"schema [{', '.join(df.columns)}]"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
