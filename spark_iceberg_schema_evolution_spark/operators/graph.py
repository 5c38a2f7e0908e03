"""Link-graph centrality for corpus curation: distributed PageRank.

Web-scale corpus curation ranks documents by the authority of their
source pages (the original PageRank use: Brin & Page 1998; modern
pipelines keep a per-host/per-URL authority score as a quality signal
beside the LM filters — see e.g. Common-Crawl-derived host graphs).
This module computes it with pure DataFrame ops — the power-iteration
loop the reference-class engines hand-roll, expressed as joins +
aggregates Catalyst can plan.

Scale shape at 100 TB:

* The edge frame is the big input; it is normalized ONCE before the
  loop (per-source weight shares) and checkpointed, so every iteration
  joins the node-sized rank frame against it on ``src`` and
  re-aggregates on ``dst`` — two keyed shuffles per iteration, the
  minimum the DataFrame API admits for a sparse matrix-vector product.
* Dangling mass (nodes with no out-edges) is a 1-ROW aggregate collect
  per iteration — bounded planning metadata, the same class as the CC
  fixpoint's convergence probe.
* Lineage is truncated per iteration with ``localCheckpoint`` (the
  ``dedup.dedup_clusters`` discipline) so n_iter joins don't nest into
  one unplannable tree.
* Update rule (uniform teleport + uniform dangling redistribution):
  ``r' = (1-d)/N + d * (A^T r + dangling_mass / N)`` — the standard
  formulation; a pure-numpy replica in tests/test_graph.py pins it to
  1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 15,
    damping: float = 0.85,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge list. Returns ``(node, rank)``
    with ranks summing to 1. Duplicate (src, dst) rows act as parallel
    edges (their weight adds); ``weight_col`` makes edges weighted.
    Deterministic up to float-sum order (tests pin 1e-9 vs numpy)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1: {n_iter}")
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    ).where(F.col("__w") > 0)
    # collapse parallel edges, then normalize to per-source shares
    e = e.groupBy("__s", "__d").agg(F.sum("__w").alias("__w"))
    out_w = e.groupBy("__s").agg(F.sum("__w").alias("__ow"))
    shares = (
        e.join(out_w, "__s")
        .select("__s", "__d", (F.col("__w") / F.col("__ow")).alias("__p"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select("__d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    dangling = nodes.join(
        shares.select(F.col("__s").alias("node")).distinct(),
        "node",
        "left_anti",
    ).localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(n_iter):
        d_mass = (
            dangling.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            ranks.join(shares, ranks["node"] == shares["__s"])
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
        )
        nxt = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.lit(d_mass / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = nxt
    return ranks
