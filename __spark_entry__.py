"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real corpus lives in ``spark_iceberg_schema_evolution_spark/queries.py``; this module just
adapts it to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any cwd; make the repo root
# importable so the engine package resolves.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from spark_iceberg_schema_evolution_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _q.REGISTRY["q12_tpch_q1"].spark_fn(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver may hand us a bare session; both confs are runtime-
        # settable. nanosAsLong is a no-op unless the parquet is
        # TIMESTAMP(NANOS) (the loader branches on the scanned dtype);
        # the UTC pin keeps NTZ->TIMESTAMP casts and date_format
        # tz-independent of the driver host.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # micros, not INT96: INT96 parquet carries no column stats, so
        # lakehouse timestamp skipping/gating would silently vanish on a
        # bare driver session
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        # manifest-planned scans hand Spark explicit file lists; below
        # this threshold listing stays on the driver instead of paying a
        # distributed listing job per scan construction (runtime-settable)
        spark.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096"
        )
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(q.spark_fn) for name, q in _q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
