"""Round-10 near-dedup scale probe (r9 VERDICT ask #5).

Exercises the full MinHash -> LSH banding -> exact-Jaccard verify ->
connected-components pipeline on synthetic corpora at two sizes (default
1M and 10M docs) with a PLANTED hot band — 1% of docs share one
identical boilerplate text, so every band hashes them into one
degenerate bucket of n/100 members. Without the bucket guard that one
bucket alone would emit (n/100)^2/2 candidate pairs (5e9 at 10M docs);
the probe verifies the guard drops it, the drop is surfaced in the
stats frame, and end-to-end wall-clock grows ~linearly between the two
sizes.

Measured per size:
  - band-bucket size distribution (p50 / p99 / max, buckets over the
    guard threshold) from the banding relation itself
  - candidate-pair count + verify-join fan-out (pairs per doc)
  - guard trigger counts (dropped_buckets, dropped_entries)
  - per-stage wall clock: signatures, LSH pairs, exact-Jaccard verify,
    connected components
  - cluster count from CC over verified pairs (threshold 0.7)

Corpus shape: docs come in groups of 3 sharing a 64-word template with
one group-variant word each at positions 0/10/20 (a variant word at
position p rewrites the <=5 shingles covering p, so within-group
shingle Jaccard is 50/70=0.714 (both variants mid-doc) to 55/65=0.846
(one variant at position 0) — above the 0.7 verify threshold, and the
8-band x 4-row S-curve admits them at P>=0.91); every 100th doc is the
constant boilerplate. Synthetic via spark.range + xxhash64 mixing — measures the
ENGINE's shape, not parquet read speed. Prints one JSON line; the
driver records it in PROBES_r10.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.dedup import (  # noqa: E402
    _band_hashes,
    connected_components,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402

NUM_HASHES = 32
NUM_BANDS = 8
MAX_BUCKET = 1000
THRESHOLD = 0.7


def synth_docs(spark, n: int):
    """Groups of 3 near-dup docs + 1% planted identical boilerplate."""
    tpl = F.expr("id div 3")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.concat(
            F.lit("w"),
            F.when(
                # one variant word per group member, position varies
                j == (F.col("id") % 3) * 10,
                F.abs(F.xxhash64(F.col("id"), j)) % 1_000_000,
            ).otherwise(
                F.abs(F.xxhash64(tpl, j, F.lit(11))) % 1_000_000
            ).cast("string"),
        ),
    )
    boiler = F.lit(" ".join(f"b{i}" for i in range(64)))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 == 0, boiler)
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )


def run_size(spark, n: int) -> dict:
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    out: dict = {"n_docs": n}

    t0 = time.time()
    sigs = minhash_signature(docs, num_hashes=NUM_HASHES).localCheckpoint(
        eager=True
    )
    out["sig_sec"] = round(time.time() - t0, 1)

    # bucket-size distribution straight off the banding relation
    t0 = time.time()
    bands = _band_hashes(sigs, "doc_id", NUM_BANDS, NUM_HASHES // NUM_BANDS)
    dist = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.expr("percentile_approx(sz, 0.5)").alias("p50"),
            F.expr("percentile_approx(sz, 0.99)").alias("p99"),
            F.max("sz").alias("max"),
            F.sum((F.col("sz") > MAX_BUCKET).cast("long")).alias(
                "over_guard"
            ),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )
    out["bucket_sizes"] = {
        "p50": dist["p50"],
        "p99": dist["p99"],
        "max": dist["max"],
        "over_guard": dist["over_guard"],
        "n_buckets": dist["n_buckets"],
        "dist_sec": round(time.time() - t0, 1),
    }

    t0 = time.time()
    pairs, drops = lsh_candidate_pairs(
        sigs,
        num_bands=NUM_BANDS,
        max_bucket_size=MAX_BUCKET,
        sig_len=NUM_HASHES,
        return_drop_stats=True,
    )
    pairs = pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()
    drow = drops.first()
    out["lsh"] = {
        "sec": round(time.time() - t0, 1),
        "n_pairs": n_pairs,
        "pairs_per_doc": round(n_pairs / n, 3),
        "dropped_buckets": drow["dropped_buckets"],
        "dropped_entries": drow["dropped_entries"],
    }

    t0 = time.time()
    verified = (
        jaccard_pairs(docs, pairs)
        .where(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_verified = verified.count()
    out["verify"] = {
        "sec": round(time.time() - t0, 1),
        "n_verified": n_verified,
        "survival": round(n_verified / max(1, n_pairs), 3),
    }

    t0 = time.time()
    cc = connected_components(verified)
    out["cc"] = {
        "sec": round(time.time() - t0, 1),
        "n_clustered_docs": cc.count(),
        "n_clusters": cc.select("cluster_id").distinct().count(),
    }
    out["total_sec"] = round(
        out["sig_sec"]
        + out["lsh"]["sec"]
        + out["verify"]["sec"]
        + out["cc"]["sec"],
        1,
    )
    # incremental flush: a crash at the next size must not lose this one
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    sizes = (
        [int(a) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else [1_000_000, 10_000_000]
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_size(spark, n) for n in sizes]
    out = {"probe": "r10_near_dedup", "sizes": results}
    if len(results) == 2 and results[0]["total_sec"] > 0:
        ratio = results[1]["total_sec"] / results[0]["total_sec"]
        scale = results[1]["n_docs"] / results[0]["n_docs"]
        # growth_vs_linear == 1.0 means perfectly linear scaling
        out["growth_vs_linear"] = round(ratio / scale, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
