"""Round-11 alternating-JVM A/B of q115_semantic_dedup: r9 commit vs
HEAD (VERDICT r10 ask #4 — adjudicate the 1.52x local / 1.09x driver
split as host factor vs regression).

Protocol = BENCH_r08_ab: alternating fresh-JVM processes on an IDLE
box, 3 in-process runs per leg, min = warm. Each leg is a subprocess
whose sys.path points at ONE tree (HEAD = /root/repo, r9 = a git
worktree of the r9 commit), so the two legs never share bytecode or a
JVM. q12_tpch_q1 runs alongside as the unchanged-query host-factor
control.

Usage:  git worktree add /tmp/r9ab d1af218
        python tools/ab_q115_r11.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TREES = {"r9": "/tmp/r9ab", "head": "/root/repo"}
QUERIES = ["q12_tpch_q1", "q115_semantic_dedup"]

LEG = r"""
import json, sys, time
tree, sf = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from spark_iceberg_schema_evolution_spark.queries import REGISTRY
from spark_iceberg_schema_evolution_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in %(queries)s:
    times = []
    for _ in range(3):
        t0 = time.time()
        df = REGISTRY[name].spark_fn(spark, sf)
        df.select(F.sum(F.hash(*df.columns))).collect()
        times.append(round(time.time() - t0, 3))
    out[name] = times
print("LEGRESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def run_leg(tree: str) -> dict:
    code = LEG % {"queries": json.dumps(QUERIES)}
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c", code, tree, SF],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    for line in r.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(
        f"leg failed for {tree}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )


def main() -> None:
    runs: dict = {}
    # alternating: r9, head, r9, head — adjacent legs share host state
    for i in (1, 2):
        for label, tree in TREES.items():
            key = f"{label}_run{i}"
            runs[key] = run_leg(tree)
            print(json.dumps({key: runs[key]}), flush=True)
    mins = {
        label: {
            q: min(min(runs[f"{label}_run{i}"][q]) for i in (1, 2))
            for q in QUERIES
        }
        for label in TREES
    }
    verdict = {
        "protocol": "alternating r9/HEAD fresh JVMs, idle box, "
                    "3 in-process runs per leg, min = warm",
        "sf_dir": SF,
        "runs": runs,
        "min": mins,
        "q115_head_over_r9": round(
            mins["head"]["q115_semantic_dedup"]
            / mins["r9"]["q115_semantic_dedup"], 3
        ),
        "control_head_over_r9": round(
            mins["head"]["q12_tpch_q1"] / mins["r9"]["q12_tpch_q1"], 3
        ),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
