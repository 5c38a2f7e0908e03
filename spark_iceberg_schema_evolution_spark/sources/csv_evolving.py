"""Schema-evolving CSV ingestion — the reference's batch job, Spark-first.

Replicates the dataflow of `src/jobs/job.py` (steps: discover -> scan with
inference -> align to first-file schema -> unionByName -> normalize names ->
ingest timestamp -> coerce to live table schema -> append), with the two
architectural fixes SURVEY §4 mandates:

- the sink is the distributed lakehouse append (tables.write_evolving), not
  a driver-side pandas collect (spark_utils.py:123);
- the ingest timestamp is injected, not evaluated at plan time (job.py:76).

``infer_schema=True`` mirrors the reference (job.py:47-48) including its
cost (an extra pass per file); production callers pass explicit schemas.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os

from pyspark.sql import DataFrame, SparkSession

from spark_iceberg_schema_evolution_spark.operators.evolve import (
    normalize_names,
    union_evolving,
    with_ingest_ts,
)
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog


def discover_csvs(input_dir: str) -> list[str]:
    """Glob `*.csv`, error when empty (reference job.py:29-37)."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.csv")))
    if not files:
        raise FileNotFoundError(f"no CSV files found under {input_dir}")
    return files


def read_csv_batches(
    spark: SparkSession, paths: list[str], infer_schema: bool = True
) -> list[DataFrame]:
    """One DataFrame per ragged file (reference job.py:40-51). Kept
    per-file (not one multi-file scan) because each file may carry a
    different column set — the whole point of the evolution family."""
    return [
        spark.read.csv(p, header=True, inferSchema=infer_schema) for p in paths
    ]


def cache_inputs(
    dfs: list[DataFrame], storage_level: str = "DISK_ONLY"
) -> list[DataFrame]:
    """Persist pass-through for multi-consumer inputs (reference R3,
    job.py:51,62 — persisted DISK_ONLY there, dev-only by its own comment).
    Returns the same DataFrames, persisted; call ``unpersist_inputs`` (or
    let the job end) to release."""
    from pyspark import StorageLevel

    level = getattr(StorageLevel, storage_level)
    return [df.persist(level) for df in dfs]


def unpersist_inputs(dfs: list[DataFrame]) -> None:
    for df in dfs:
        df.unpersist()


def ingest_evolving_csvs(
    spark: SparkSession,
    input_dir: str,
    catalog: LakehouseCatalog,
    namespace: str,
    table: str,
    ingest_ts: _dt.datetime,
    partition_month_of: str | None = "created_at",
    persist_inputs: bool = False,
) -> int:
    """The full reference job (§3.1) as one composable function:
    returns the committed snapshot version."""
    dfs = read_csv_batches(spark, discover_csvs(input_dir))
    if persist_inputs:  # reference job.py:51 (dev-only persist)
        cache_inputs(dfs)
    unioned = union_evolving(dfs)  # first-file-wins target (job.py:54-59)
    named = normalize_names(unioned)  # job.py:65-72 + collision check
    stamped = with_ingest_ts(named, ingest_ts)  # job.py:75-81, injected ts
    return catalog.write_evolving(
        stamped, namespace, table, partition_month_of=partition_month_of
    )
