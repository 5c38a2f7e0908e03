"""Local replica of the driver's oracle check.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from spark_iceberg_schema_evolution_spark.queries import REGISTRY, TABLES  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_t2 = 0
    for name, query in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = query.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if query.oracle is None:
            print(f"T2   {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_t2 += 1
            continue
        try:
            res = con.execute(query.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={s_cols} duckdb={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            sh = value_hash(s_cols, s_rows)
            dh = value_hash(d_cols, d_rows)
            if sh != dh:
                problems.append(f"hash spark={sh} duckdb={dh}")
                # show first differing normalized rows for debugging
                so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sl = sorted("\x1f".join(norm_cell(r[i]) for i in so) for r in s_rows)
                dl = sorted("\x1f".join(norm_cell(r[i]) for i in do) for r in d_rows)
                for a, b in zip(sl, dl):
                    if a != b:
                        problems.append(f"  spark : {a[:220]}")
                        problems.append(f"  duckdb: {b[:220]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_t2} tier-2")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
