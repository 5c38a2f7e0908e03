"""Dump the r14-touched sub-plans (rollup refresh delta, broadcast merge)
to plans/r14/<name>_<tag>.txt. Run with tag=before in a worktree at the
round-start commit and tag=after on the optimized tree:

    python tools/dump_r14_plans.py after [outdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.rollup import (  # noqa: E402
    _delta_agg,
    refresh_rollup,
)
from spark_iceberg_schema_evolution_spark.queries import load  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402


def cents(c):
    return F.round(c * 100).cast("long")


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r14"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="dump_r14_")
    cat = LakehouseCatalog(spark, tmp)
    o = load(spark, sf_dir, "orders").where("o_custkey < 1500").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    cat.create_namespace("db")
    src = cat.table("db", "rsrc")
    dst = cat.table("db", "rdst")
    src.create(o.schema)
    src.append(o.where("o_orderkey < 3000"))
    refresh_rollup(src, dst, ["pri"], ["price_c"])
    src.append(o.where("o_orderkey >= 3000 AND o_orderkey < 6000"))
    refresh_rollup(src, dst, ["pri"], ["price_c"])
    src.delete_where("price_c > 20000000")
    refresh_rollup(src, dst, ["pri"], ["price_c"])
    src.update_where("pri = '1-URGENT'", {"price_c": "price_c + 1"})

    def dump(name, df):
        p = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print("wrote", p)

    # (1) the refresh's delta plan over a replayed UPDATE span
    last_src = int(dst.properties()["rollup.source_version"])
    src_v = src._load().version
    diff_fn = getattr(src, "diff_additive", src.diff)
    changes = diff_fn(last_src, src_v)
    dump("q130_refresh_delta", _delta_agg(changes, ["pri"], ["price_c"]))

    # (2) the broadcast MERGE plan (update+delete arms + insert)
    from spark_iceberg_schema_evolution_spark.tables import LakehouseTable

    delta = spark.createDataFrame(
        [("1-URGENT", 5, 500), ("9-NEW", 2, 70)],
        ["pri", "n_rows", "sum_price_c"],
    )
    target = dst.read()
    merged = LakehouseTable._apply_merge_clauses(
        target, delta, target.schema, ["pri"],
        {"n_rows": "t.n_rows + s.n_rows",
         "sum_price_c": "t.sum_price_c + s.sum_price_c"},
        None, "t.n_rows + s.n_rows = 0", True,
        source_broadcast=True,
    )
    dump("q130_merge_broadcast", merged)


if __name__ == "__main__":
    main()
