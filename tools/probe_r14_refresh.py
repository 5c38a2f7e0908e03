"""Round-14 probe: ONE rollup refresh's jobs, sub-step by sub-step.

Rebuilds the q130 scenario up to a chosen refresh, then runs that
refresh's internals (diff -> delta agg -> checkpoint -> merge ->
bookmark) under separate job groups.

    SPARK_GRAFT_CPUS=32 python tools/probe_r14_refresh.py [delete|update|append]
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
from spark_iceberg_schema_evolution_spark.tables import (  # noqa: E402
    MERGE_BROADCAST_ROWS,
    LakehouseCatalog,
)


def cents(c):
    return F.round(c * 100).cast("long")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "update"
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
                ids = sorted(st.getJobIdsForGroup(self.g))
                out[name] = {"jobs": len(ids), "sec": round(dt, 3)}
                for jid in ids:
                    info = st.getJobInfo(jid)
                    n_st = len(list(info.stageIds)) if info else 0
                    print(f"    [{name}] job {jid}: {n_st} stages",
                          file=sys.stderr)

        return _P()

    tmp = tempfile.mkdtemp(prefix="probe_refresh_")
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
    if which == "append":
        pass  # probe the append refresh itself
    else:
        refresh_rollup(src, dst, ["pri"], ["price_c"])
        src.delete_where("price_c > 20000000")
        if which == "update":
            refresh_rollup(src, dst, ["pri"], ["price_c"])
            src.update_where(
                "pri = '1-URGENT'", {"price_c": "price_c + 1"}
            )

    # ---- the refresh under test, inlined step by step ----
    group_cols, sum_cols = ["pri"], ["price_c"]
    props = dst.properties()
    last_src = int(props["rollup.source_version"])
    src_v = src._load().version
    with phase("a_diff_plan"):
        changes = src.diff(last_src, src_v)  # plan only: expect 0 jobs
    with phase("b_delta_checkpoint"):
        delta = _delta_agg(changes, group_cols, sum_cols)
        zero = F.col("n_rows") == 0
        for c in sum_cols:
            zero = zero & (F.col(f"sum_{c}") == 0)
        obs = Observation()
        delta = (
            delta.where(~zero)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_groups = obs.get["n"] or 0
    with phase("c_merge"):
        updates = {"n_rows": "t.n_rows + s.n_rows",
                   "sum_price_c": "t.sum_price_c + s.sum_price_c"}
        checked = delta  # skip the null-key raise wrapper: plan-identical
        v = dst.merge_into(
            checked,
            on=group_cols,
            matched_delete_where="t.n_rows + s.n_rows = 0",
            matched_update=updates,
            insert_unmatched=True,
            source_unique=True,
            source_broadcast=n_groups <= MERGE_BROADCAST_ROWS,
        )
    with phase("d_bookmark"):
        dst.set_properties(
            {"rollup.source_version": src_v, "rollup.target_version": v}
        )
    total = sum(v["jobs"] for v in out.values())
    print(json.dumps({"which": which, "phases": out,
                      "total_jobs": total}, indent=1))


if __name__ == "__main__":
    main()
