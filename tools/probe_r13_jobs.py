"""Round-13 optimization probe: per-query Spark JOB inventory.

Runs named registry queries with the bench's exact consume under a job
group and reports wall seconds + the number of Spark jobs the run
scheduled (SparkStatusTracker.getJobIdsForGroup). On a host this noisy
the job COUNT is the stable signal — scheduler launches cost ~0.1-0.3 s
each at local[32], so a lifecycle query's floor is roughly
jobs x per-job latency, and removing a job is a win that survives any
host window.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/probe_r13_jobs.py q73_delete_update q130_incremental_rollup
    REPS=3 python tools/probe_r13_jobs.py q171_scd2_incremental
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from spark_iceberg_schema_evolution_spark.queries import REGISTRY  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = int(os.environ.get("REPS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    def consume(df) -> None:
        df.select(F.sum(F.hash(*df.columns))).collect()

    out = {}
    for name in names:
        q = REGISTRY[name]
        best_t, best_jobs = float("inf"), None
        for i in range(reps):
            group = f"probe-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            consume(q.spark_fn(spark, sf_dir))
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if dt < best_t:
                best_t, best_jobs = dt, jobs
            print(
                f"  {name} rep{i}: {dt:.3f}s jobs={jobs}", file=sys.stderr
            )
        out[name] = {"sec": round(best_t, 3), "jobs": best_jobs}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
