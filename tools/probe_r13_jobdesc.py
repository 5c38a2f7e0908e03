"""List every Spark job a registry query schedules, with stage names.

Uses a Py4J-registered SparkListener to capture job start events and
their callsites/descriptions — the per-job inventory behind the r13
job-count probe. Usage:

    SPARK_GRAFT_CPUS=32 python tools/probe_r13_jobdesc.py q130_incremental_rollup
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from spark_iceberg_schema_evolution_spark.queries import REGISTRY  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    q = REGISTRY[name]
    group = f"desc-{name}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    q.spark_fn(spark, sf_dir).select(
        F.sum(F.hash("*"))
    ) if False else None
    df = q.spark_fn(spark, sf_dir)
    df.select(F.sum(F.hash(*df.columns))).collect()
    dt = time.time() - t0
    sc.setJobGroup(None, None)
    st = sc.statusTracker()
    ids = sorted(st.getJobIdsForGroup(group))
    print(f"{name}: {dt:.3f}s, {len(ids)} jobs")
    jsc = sc._jsc.sc()
    for jid in ids:
        info = st.getJobInfo(jid)
        stages = list(info.stageIds) if info else []
        # pull the job's callsite from the AppStatusStore
        try:
            j = jsc.statusStore().job(jid)
            desc = j.name()
        except Exception:
            desc = "?"
        print(f"  job {jid}: stages={len(stages)} :: {desc[:110]}")


if __name__ == "__main__":
    main()
