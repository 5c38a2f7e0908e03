"""Round-12 ANN scale probe (r11 VERDICT ask #5 / "What's missing" #3).

The dedup, sampling, graph, BPE, and streaming paths all carry 1M-100M
probes; the ANN operators' 100 TB story (IVF cell pruning, 1-byte ADC
scans, bounded exact re-rank, sync incrementality) was argued from
plan shape only, with recall gates at pytest fixture scale. This probe
measures, at 1M (and optionally larger) planted-cluster vectors:

  - exact brute-force cosine top-10 (the ground truth AND the
    baseline the approximate path must beat)
  - ivfpq_topk end-to-end (fit + encode + probe + re-rank in one
    call): wall clock + recall@10 vs exact
  - the materialized-index lifecycle: build_ann_index on 90% of the
    corpus, sync_ann_index after 10% growth (must encode ONLY the
    missing ids — returned count is the witness), ann_index_topk
    query latency + recall@10 (amortized path: no per-query fit or
    corpus encode)

Vector model: 256 planted cluster centers (deterministic hash grid),
each vector = its center + ~N(0, sigma) hash-noise per component —
entirely JVM-side generation, no driver arrays. Queries are 100 held
-out vectors drawn the same way, so every query has true near
neighbors inside its cluster.

Gates (emitted, judged against): ivfpq recall@10 >= 0.9;
sync encodes exactly the missing 10%; index query beats exact.

Prints one JSON line per measurement the moment it completes. Run on
an IDLE box with ENGINE_DRIVER_MEMORY=48g.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.ann_index import (  # noqa: E402
    ann_index_topk,
    build_ann_index,
    sync_ann_index,
)
from spark_iceberg_schema_evolution_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivfpq_topk,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from spark_iceberg_schema_evolution_spark.tables import LakehouseCatalog  # noqa: E402

DIM = 64
K = 10
N_QUERIES = 100
N_CENTERS = 256
WORK = "/tmp/probe_r12_ann"


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def synth_vectors(spark, n: int, id_start: int = 0, id_col: str = "vec_id"):
    """center(id % 256) + per-vector log-spread noise, all JVM-side.

    The noise AMPLITUDE is log-uniform in [0.02, 0.6] per vector —
    not constant — so each query has a genuine neighborhood gradient
    (a few much-closer neighbors, then progressively farther cluster
    mates). A constant tight amplitude makes every cluster member an
    equidistant near-tie and recall@10 ill-posed: any 10 of ~200
    equally-close vectors is an equally-right answer, and no
    quantizer (or exact engine at a different float rounding) can
    reproduce one specific tie-break."""
    center = F.col("id") % N_CENTERS
    amp = (F.xxhash64(F.col("id"), F.lit(99)) % 1000) / 1000.0
    scale = F.lit(0.02) * F.pow(F.lit(30.0), amp)
    comp = lambda j: (  # noqa: E731
        ((F.xxhash64(center, F.lit(j)) % 1000) / 500.0 - 1.0)
        + ((F.xxhash64(F.col("id"), F.lit(j), F.lit(7)) % 2001 - 1000)
           / 1000.0) * scale
    )
    vec = F.array(*[comp(j) for j in range(DIM)])
    return spark.range(id_start, id_start + n).select(
        F.col("id").alias(id_col), vec.alias("embedding")
    )


def synth_vectors_hier(
    spark, n: int, id_start: int = 0, id_col: str = "vec_id"
):
    """Manifold-structured variant: center + SUB-center (32 per
    cluster, 0.2 scale) + tiny isotropic noise (0.02). True neighbors
    share a sub-center and sit 10x closer than cluster mates — the
    shape real embeddings have (semantic neighborhoods separated by
    gaps larger than PQ's quantization error). The flat generator
    above is the ADVERSARIAL regime: isotropic within-cluster noise
    has no structure a product quantizer can exploit, so ADC ordering
    inside a cluster degenerates toward random and recall@k decays
    with cluster size unless the exact re-rank pool scales with it —
    a property of the math (FAISS behaves identically), measured and
    documented rather than hidden by a friendly generator."""
    center = F.col("id") % N_CENTERS
    sub = F.col("id") % (N_CENTERS * 32)
    comp = lambda j: (  # noqa: E731
        ((F.xxhash64(center, F.lit(j)) % 1000) / 500.0 - 1.0)
        + ((F.xxhash64(sub, F.lit(j), F.lit(3)) % 2001 - 1000) / 1000.0)
        * 0.2
        + ((F.xxhash64(F.col("id"), F.lit(j), F.lit(7)) % 2001 - 1000)
           / 1000.0) * 0.02
    )
    vec = F.array(*[comp(j) for j in range(DIM)])
    return spark.range(id_start, id_start + n).select(
        F.col("id").alias(id_col), vec.alias("embedding")
    )


def recall_at_k(got, truth, query_id="query_id", corpus_id="vec_id"):
    g = got.select(query_id, corpus_id)
    t = truth.select(query_id, corpus_id)
    hit = g.join(t, [query_id, corpus_id], "left_semi").count()
    denom = t.count()
    return round(hit / denom, 4)


def main() -> None:
    spark = get_spark()
    args = sys.argv[1:]
    hier = "hier" in args
    noindex = "noindex" in args  # skip the (unchanged) lifecycle arms
    onlyindex = "onlyindex" in args  # skip the ivfpq end-to-end legs
    gen = synth_vectors_hier if hier else synth_vectors
    sizes = [int(x) for x in args if x.isdigit()] or [1000000]
    for n in sizes:
        path = f"{WORK}/vecs_{n}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        gen(spark, n).write.mode("overwrite").parquet(path)
        corpus = spark.read.parquet(path)
        emit({"probe": "ann", "arm": "gen", "n": n,
              "dist": "hier" if hier else "flat",
              "t_s": round(time.time() - t0, 2)})
        queries = gen(
            spark, N_QUERIES, id_start=n + 17, id_col="query_id"
        ).localCheckpoint(eager=True)

        t0 = time.time()
        truth = cosine_topk(corpus, queries, k=K).localCheckpoint(
            eager=True
        )
        t_exact = time.time() - t0
        emit({"probe": "ann", "arm": "exact_bruteforce", "n": n,
              "t_s": round(t_exact, 2), "rows": truth.count()})

        # operating point: FAISS guidance is ncentroids ~ 4*sqrt(n) —
        # the first r12 runs used 64 cells over 256 planted clusters
        # (4 clusters per cell), so even residual codes carried the
        # unexplained inter-cluster spread and ADC could not rank
        # within a cell. NCENT/NPROBE env vars override for the A/B.
        import os as _os

        ncent = int(_os.environ.get("NCENT", "64"))
        nprobe = int(_os.environ.get("NPROBE", "8"))
        refines = tuple(
            int(x) for x in _os.environ.get("REFINE", "8,32").split(",")
        )
        m_pq = int(_os.environ.get("M", "16"))
        ksub = int(_os.environ.get("KSUB", "32"))
        if onlyindex:
            refines = ()
        for refine in refines:
            try:
                t0 = time.time()
                got = ivfpq_topk(
                    corpus, queries, dim=DIM, k=K,
                    num_centroids=ncent, n_probe=nprobe, m=m_pq,
                    ksub=ksub, refine=refine,
                ).localCheckpoint(eager=True)
                t_ivfpq = time.time() - t0
                emit({"probe": "ann",
                      "arm": f"ivfpq_end_to_end_refine{refine}",
                      "n": n, "ncent": ncent, "nprobe": nprobe,
                      "m": m_pq, "ksub": ksub,
                      "t_s": round(t_ivfpq, 2),
                      "recall_at_10": recall_at_k(got, truth),
                      "speedup_vs_exact": round(t_exact / t_ivfpq, 2)})
            except Exception as e:  # noqa: BLE001
                emit({"probe": "ann", "arm": f"ivfpq_refine{refine}",
                      "n": n, "ncent": ncent, "error": repr(e)})

        # materialized-index lifecycle: build on 90%, grow 10%, sync
        if noindex:
            shutil.rmtree(path, ignore_errors=True)
            continue
        try:
            import os as _os

            kind = _os.environ.get("KIND", "pq")
            shutil.rmtree(f"{WORK}/wh_{n}", ignore_errors=True)
            cat = LakehouseCatalog(spark, f"{WORK}/wh_{n}")
            cat.create_namespace("db")
            base = corpus.where(F.col("vec_id") % 10 != 0)
            t0 = time.time()
            n_built = build_ann_index(
                cat, "db", "ix", base, dim=DIM, kind=kind, m=16, ksub=32
            )
            t_build = time.time() - t0
            emit({"probe": "ann", "arm": "index_build_90pct", "n": n,
                  "t_s": round(t_build, 2), "rows_encoded": n_built})
            t0 = time.time()
            n_sync = sync_ann_index(cat, "db", "ix", corpus)
            t_sync = time.time() - t0
            emit({"probe": "ann", "arm": "index_sync_10pct", "n": n,
                  "t_s": round(t_sync, 2), "rows_encoded": n_sync,
                  "expected_missing": corpus.count() - n_built,
                  "sync_encoded_only_missing":
                      n_sync == corpus.count() - n_built})
            t0 = time.time()
            got2 = ann_index_topk(
                cat, "db", "ix", queries, corpus, k=K, refine=32
            ).localCheckpoint(eager=True)
            t_q = time.time() - t0
            emit({"probe": "ann", "arm": "index_query", "n": n,
                  "t_s": round(t_q, 2),
                  "recall_at_10": recall_at_k(got2, truth),
                  "speedup_vs_exact": round(t_exact / t_q, 2)})
            # idempotent replay: a second sync encodes nothing
            assert sync_ann_index(cat, "db", "ix", corpus) == 0
            emit({"probe": "ann", "arm": "sync_replay_noop", "n": n,
                  "ok": True})
        except Exception as e:  # noqa: BLE001
            emit({"probe": "ann", "arm": "index_lifecycle", "n": n,
                  "error": repr(e)})
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(f"{WORK}/wh_{n}", ignore_errors=True)


if __name__ == "__main__":
    main()
