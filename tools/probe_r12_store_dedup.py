"""Round-12 store-backed batch near-dedup A/B (r11 VERDICT ask #3).

PROBES_r11 left the SIGNATURE SCAN as the dominant near-dedup stage
(~56% of clean 10M-doc pipeline wall clock) — and it is pure recompute
whenever a materialized signature store exists (the incremental path
already maintains one; the batch path re-signed the corpus from raw
text on every run). This probe A/Bs the new store-backed composition
(`dedup.batch_near_dedup(sigs=...)` — signs only store-missing docs)
against the from-scratch run on the SAME materialized corpus parquet:

  - fresh arm:  batch_near_dedup(docs)            [signs everything]
  - store arm:  batch_near_dedup(docs, sigs=store) [signs nothing]
  - store+gap:  store covering 90% of docs         [signs the 10% gap]

Exact-equality witness per arm (the r10/r11 persist-rejection
template): verified-pair count + order-insensitive pair checksum, and
kept-corpus count + id checksum — merge only what matches bit-for-bit.

Corpus: the r10/r11 probe shape (groups of 3 near-dups, 64-word
templates, one variant word each, 1% planted boilerplate) so numbers
compare directly with PROBES_r10/PROBES_r11.

Prints one JSON line per measurement the moment it completes
(timeout/OOM discipline). Run on an IDLE box with
ENGINE_DRIVER_MEMORY=48g.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.dedup import (  # noqa: E402
    batch_near_dedup,
    minhash_signature,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402
from tools.probe_r11_verify import synth_docs  # noqa: E402

THRESHOLD = 0.7
NUM_HASHES = 32
NUM_BANDS = 8
WORK = "/tmp/probe_r12_store"


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def witness(kept, pairs, id_col="doc_id") -> dict:
    p = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("id_a", "id_b", "n_common", "n_a", "n_b").cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).first()
    k = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(id_col).cast("decimal(38,0)")).alias("h"),
    ).first()
    return {
        "pairs_n": p["n"],
        "pairs_h": str(p["h"]),
        "kept_n": k["n"],
        "kept_h": str(k["h"]),
    }


def run_arm(spark, docs, label: str, n: int, sigs=None) -> dict:
    t0 = time.time()
    kept, pairs = batch_near_dedup(
        docs,
        threshold=THRESHOLD,
        num_hashes=NUM_HASHES,
        num_bands=NUM_BANDS,
        sigs=sigs,
        return_pairs=True,
    )
    t_call = time.time() - t0  # sign (or not) + band + verify, eager
    t0 = time.time()
    w = witness(kept, pairs)
    t_consume = time.time() - t0  # CC + anti-join + checksums
    rec = {
        "probe": "store_dedup",
        "arm": label,
        "n_docs": n,
        "t_sign_band_verify_s": round(t_call, 2),
        "t_cluster_consume_s": round(t_consume, 2),
        "t_total_s": round(t_call + t_consume, 2),
        **w,
    }
    emit(rec)
    return rec


def main() -> None:
    spark = get_spark()
    sizes = [int(x) for x in (sys.argv[1:] or ["1000000", "10000000"])]
    for n in sizes:
        path = f"{WORK}/docs_{n}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        synth_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        emit({"probe": "store_dedup", "arm": "gen", "n_docs": n,
              "t_s": round(time.time() - t0, 2)})

        try:
            fresh = run_arm(spark, docs, "fresh", n)
        except Exception as e:  # noqa: BLE001
            emit({"probe": "store_dedup", "arm": "fresh", "n_docs": n,
                  "error": repr(e)})
            continue

        # materialize the signature store once (the amortized cost a
        # real pipeline pays at ingest, not per dedup run)
        spath = f"{WORK}/sigs_{n}"
        t0 = time.time()
        minhash_signature(docs, num_hashes=NUM_HASHES).write.mode(
            "overwrite"
        ).parquet(spath)
        emit({"probe": "store_dedup", "arm": "store_build", "n_docs": n,
              "t_s": round(time.time() - t0, 2)})
        store = spark.read.parquet(spath)

        for label, sigs in (
            ("store_full", store),
            ("store_90pct", store.where(F.col("doc_id") % 10 != 0)),
        ):
            try:
                got = run_arm(spark, docs, label, n, sigs=sigs)
                same = all(
                    got[k] == fresh[k]
                    for k in ("pairs_n", "pairs_h", "kept_n", "kept_h")
                )
                emit({"probe": "store_dedup", "arm": f"{label}_equal",
                      "n_docs": n, "identical_to_fresh": same,
                      "speedup_vs_fresh": round(
                          fresh["t_total_s"] / max(got["t_total_s"], 1e-9),
                          3,
                      )})
            except Exception as e:  # noqa: BLE001
                emit({"probe": "store_dedup", "arm": label, "n_docs": n,
                      "error": repr(e)})
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(spath, ignore_errors=True)


if __name__ == "__main__":
    main()
