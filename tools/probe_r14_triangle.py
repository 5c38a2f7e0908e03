"""Round-14 probe (VERDICT r13 #9): degree-ordered triangle count vs
the id-ordered plan under AQE skew-join handling, at 1M edges on the
r9 skewed synthetic graph. Reports wall seconds, scheduled jobs, and
the result checksum (must be equal — the orientations are
output-identical by construction).

    SPARK_GRAFT_CPUS=32 python tools/probe_r14_triangle.py [n_edges]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.graph import (  # noqa: E402
    triangle_count,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    st = sc.statusTracker()
    n_nodes = max(1000, n_edges // 10)
    # same skewed shape as tools/probe_r9_graph.py: near-uniform src,
    # squared-uniform dst concentrates in-links on low ids (hot hubs)
    e = spark.range(n_edges).select(
        (F.abs(F.xxhash64("id")) % n_nodes).alias("src"),
        (
            F.pow((F.abs(F.xxhash64("id", F.lit(7))) % 1000) / 1000.0, 2.0)
            * n_nodes
        ).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    out = {"n_edges": n_edges, "n_nodes": n_nodes,
           "skew_join": True, "runs": {}}
    # alternating A/B, 2 reps each
    for rep in range(2):
        for ordered in (True, False):
            tag = f"{'degree' if ordered else 'id_aqe'}_rep{rep}"
            g = f"tri-{tag}-{time.time_ns()}"
            sc.setJobGroup(g, tag)
            t0 = time.time()
            df = triangle_count(e, order_by_degree=ordered)
            chk = df.select(
                F.sum(F.hash("node", "n_triangles"))
            ).collect()[0][0]
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            out["runs"][tag] = {
                "sec": round(dt, 2),
                "jobs": len(st.getJobIdsForGroup(g)),
                "checksum": chk,
            }
            print(json.dumps({tag: out["runs"][tag]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
