"""Round-14 probe (VERDICT r13 #10): does disabling AQE around the
rollup refresh's DELTA-SIZED checkpoint action reduce scheduled jobs /
wall time? Alternating A/B inside one JVM, q130's update-refresh shape.

AQE materializes one job per query stage; a delta checkpoint whose
lineage holds 1-2 exchanges pays 2-3 jobs where a non-adaptive plan
pays 1. The counter-argument: AQE-off also loses partition coalescing
on the agg (32 tiny tasks at local[32]) and the delta's size is not
knowable before the action, so a production-size delta would lose skew
handling. This probe decides with numbers.

    SPARK_GRAFT_CPUS=32 python tools/probe_r14_aqe_scope.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import Observation, functions as F  # noqa: E402

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    st = sc.statusTracker()
    tmp = tempfile.mkdtemp(prefix="probe_aqe_")
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

    last_src = int(dst.properties()["rollup.source_version"])
    src_v = src._load().version
    out = {}
    for rep in range(3):
        for aqe in ("true", "false"):
            tag = f"aqe_{aqe}_rep{rep}"
            changes = src.diff_additive(last_src, src_v)
            delta = _delta_agg(changes, ["pri"], ["price_c"])
            zero = (F.col("n_rows") == 0) & (F.col("sum_price_c") == 0)
            obs = Observation()
            plan = delta.where(~zero).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            g = f"p-{tag}-{time.time_ns()}"
            old = spark.conf.get("spark.sql.adaptive.enabled")
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            sc.setJobGroup(g, tag)
            t0 = time.time()
            ck = plan.localCheckpoint(eager=True)
            n = obs.get["n"]
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            spark.conf.set("spark.sql.adaptive.enabled", old)
            out[tag] = {
                "sec": round(dt, 3),
                "jobs": len(st.getJobIdsForGroup(g)),
                "n_groups": n,
            }
            print(json.dumps({tag: out[tag]}), file=sys.stderr)
            from spark_iceberg_schema_evolution_spark.checkpoint import (
                unpersist_checkpoint,
            )

            unpersist_checkpoint(ck)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
