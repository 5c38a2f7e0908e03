"""Round-14 probe: q130's job count broken down BY PHASE.

Replicates q130_incremental_rollup's body with a job group per phase so
each commit/refresh's scheduled-job count is attributable. Job counts
are the load-stable signal on this host (see BASELINE.md discipline).

    SPARK_GRAFT_CPUS=32 python tools/probe_r14_q130.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.rollup import (  # noqa: E402
    refresh_rollup,
)
from spark_iceberg_schema_evolution_spark.queries import REGISTRY, load  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402


def cents(c):
    return F.round(c * 100).cast("long")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    st = sc.statusTracker()

    out = {}

    def phase(name):
        class _P:
            def __enter__(self):
                self.g = f"p-{name}-{time.time_ns()}"
                sc.setJobGroup(self.g, name)
                self.t0 = time.time()

            def __exit__(self, *a):
                dt = time.time() - self.t0
                sc.setJobGroup(None, None)
                jobs = len(st.getJobIdsForGroup(self.g))
                out[name] = {"jobs": jobs, "sec": round(dt, 3)}
                print(f"  {name}: jobs={jobs} {dt:.3f}s", file=sys.stderr)

        return _P()

    tmp = tempfile.mkdtemp(prefix="probe_q130_")
    cat = LakehouseCatalog(spark, tmp)
    o = load(spark, sf_dir, "orders").where("o_custkey < 1500").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    cat.create_namespace("db")
    src = cat.table("db", "rsrc")
    dst = cat.table("db", "rdst")
    with phase("01_create_append1"):
        src.create(o.schema)
        src.append(o.where("o_orderkey < 3000"))
    with phase("02_refresh_full"):
        refresh_rollup(src, dst, ["pri"], ["price_c"])
    with phase("03_append2"):
        src.append(o.where("o_orderkey >= 3000 AND o_orderkey < 6000"))
    with phase("04_refresh_append"):
        refresh_rollup(src, dst, ["pri"], ["price_c"])
    with phase("05_delete"):
        src.delete_where("price_c > 20000000")
    with phase("06_refresh_delete"):
        refresh_rollup(src, dst, ["pri"], ["price_c"])
    with phase("07_update"):
        src.update_where("pri = '1-URGENT'", {"price_c": "price_c + 1"})
    with phase("08_refresh_update"):
        refresh_rollup(src, dst, ["pri"], ["price_c"])
    with phase("09_final_read"):
        df = dst.read().orderBy("pri")
        df.select(F.sum(F.hash(*df.columns))).collect()
    total = sum(v["jobs"] for v in out.values())
    print(json.dumps({"phases": out, "total_jobs": total}, indent=1))


if __name__ == "__main__":
    main()
