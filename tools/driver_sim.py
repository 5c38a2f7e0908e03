"""Simulate the correctness driver's exact path.

Differences from tools/check_correctness.py (the byte-identical local
checker): this one goes through ``__spark_entry__`` on a BARE SparkSession
(no engine session factory) and canonicalizes both sides as *pandas*
DataFrames — sort columns by name, sort rows, hash cell reprs — which is
the compare style that produced round-1's only divergences (DuckDB HUGEINT
-> float64, unhashable list cells).

Usage: python tools/driver_sim.py [sf_dir] [first_n] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(df: pd.DataFrame) -> str:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if pd.isna(v):
                h.update(b"NULL")
            elif isinstance(v, float):
                h.update(repr(round(v, 9)).encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    only = set(sys.argv[3:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs)[:first_n]
    if only:
        names = [n for n in names if n in only]

    n_pass = n_fail = n_t2 = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERR  {name}: spark-side {e!r}")
            n_fail += 1
            continue
        if name not in oracles:
            try:
                canon(sdf)  # driver canonicalizes tier-2 output too
            except Exception as e:
                print(f"ERR  {name}: tier-2 canon {e!r}")
                n_fail += 1
                continue
            print(f"T2   {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_t2 += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERR  {name}: oracle-side {e!r}")
            n_fail += 1
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(c.lower() for c in sdf.columns) == sorted(
            c.lower() for c in odf.columns
        )
        try:
            hash_ok = canon(sdf) == canon(odf)
        except Exception as e:
            print(f"ERR  {name}: canon {e!r}")
            n_fail += 1
            continue
        ok = rows_ok and schema_ok and hash_ok
        n_pass += ok
        n_fail += not ok
        tag = "PASS" if ok else "FAIL"
        extra = (
            ""
            if ok
            else f" rows={rows_ok} schema={schema_ok} hash={hash_ok}"
            f" ({len(sdf)} vs {len(odf)})"
        )
        print(f"{tag} {name}: rows={len(sdf)} ({time.time()-t0:.1f}s){extra}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_t2} tier-2")
    spark.stop()


if __name__ == "__main__":
    main()
