"""Oracle corpus check at sf0.001 — mirrors the driver's t2 gate.

Every Tier-1 query runs on Spark and on duckdb over the same parquet
files; row count, column names, and an order-insensitive value hash must
match. (The driver runs the same comparison at sf0.01.)
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from spark_iceberg_schema_evolution_spark.queries import REGISTRY, TABLES
from tests.conftest import SF_SMOKE


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


TIER1 = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
TIER2 = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", TIER1)
def test_tier1_matches_oracle(spark, oracle, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_SMOKE)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = oracle.execute(q.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _hash(sdf.columns, s_rows) == _hash(d_cols, d_rows)


@pytest.mark.parametrize("name", TIER2)
def test_tier2_runs(spark, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_SMOKE)
    assert df.count() >= 0
