from __future__ import annotations

import os

import pytest

from spark_iceberg_schema_evolution_spark.config import EngineConfig
from spark_iceberg_schema_evolution_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(
        app_name="engine-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    s = get_spark(cfg)
    yield s
    s.stop()
