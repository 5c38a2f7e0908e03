"""Round-11 verify-stage A/B probe (r10 VERDICT ask #5).

The r10 probe left the exact-Jaccard VERIFY stage as the dominant
near-dedup cost (62% of pipeline wall clock at 10M docs, PROBES_r10).
Two candidate optimizations, each measured against the round-10
verify form on the SAME synthetic corpus and pair list, with
exact-result equality asserted (count + order-insensitive pair/value
checksum), per the r10 persist-rejection template — merge only what
wins:

A. one-shingle-pass verify (EXACT, now the default jaccard_pairs
   candidate path): the r10 form joined the pair list against two
   aliased copies of the per-doc shingle-set projection, so the
   normalize->shingle->hash pipeline ran TWICE over the FULL corpus
   (no pruning; ReuseExchange cannot help — the projection sits above
   the reusable shuffle, verified in-plan). The r11 form explodes each
   pair into its two member ids (2-row Generate per pair), semi-join
   prunes the corpus to member ids, computes the shingle pipeline
   ONCE, joins once, and reassembles pairs with a groupBy.

B. signature-agreement prefilter (PROBABILISTIC, opt-in
   dedup.signature_prefilter, never in tier-1 faces): drop candidate
   pairs whose signature-estimated Jaccard is > 3 sigma below the
   threshold before exact verify. Two candidate sources measured,
   because they have OPPOSITE shapes:
     - LSH-sourced candidates (lsh_arm): admission already conditions
       on signature agreement (a band match = 4 agreeing positions),
       so admitted-but-false pairs have upward-biased estimates and
       mostly sit ABOVE the cut — the filter is structurally weak
       here; the arm quantifies that honestly (expect kept_frac ~ 1).
     - blocking-sourced candidates (block_arm): pairs from a metadata
       blocker (same URL stem / title / group id — simulated as
       same-group pairs), whose Jaccard distribution is unconstrained
       and mostly low — the filter's real use, expect most pairs
       skipped and verify time to drop accordingly.
   Both arms report missed-true-pair count vs the unfiltered exact
   verify (bound: Phi(-3) ~= 1.3e-3 per true pair at the threshold).

Corpus: the r10 probe's shape (groups of 3 near-dups, 64-word
templates, one variant word each, within-group Jaccard 0.714-0.846 +
1% planted boilerplate) so numbers compare directly; the low-survival
variant rewrites 4 spread template positions per member (~20 of 60
shingles differ per adjacent pair -> within-group Jaccard around
(60-20)/(60+20) = 0.5, below the 0.7 gate but well inside LSH's
admission S-curve tail at 8x4 banding), yielding candidates that
exact verify mostly rejects — the shape where a prefilter can win.

Prints one JSON line per measurement the moment it completes
(timeout/OOM discipline). Run on an IDLE box with
ENGINE_DRIVER_MEMORY=48g.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from spark_iceberg_schema_evolution_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    normalized_words,
    shingles,
    signature_prefilter,
)
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402

NUM_HASHES = 32
NUM_BANDS = 8
MAX_BUCKET = 1000
THRESHOLD = 0.7


def synth_docs(spark, n: int, variant_positions: int = 1):
    """r10 probe corpus: groups of 3 near-dup docs + 1% boilerplate.
    variant_positions=1 reproduces the r10 high-survival corpus
    (within-group J 0.714-0.846); larger values push within-group
    Jaccard below the threshold for the low-survival variant."""
    tpl = F.expr("id div 3")
    member = F.col("id") % 3

    def word(j):
        # member-variant word at `variant_positions` spread positions
        is_variant = F.lit(False)
        for v in range(variant_positions):
            is_variant = is_variant | (j == (member * 10 + v * 5) % 64)
        return F.concat(
            F.lit("w"),
            F.when(
                is_variant,
                F.abs(F.xxhash64(F.col("id"), j)) % 1_000_000,
            )
            .otherwise(F.abs(F.xxhash64(tpl, j, F.lit(11))) % 1_000_000)
            .cast("string"),
        )

    words = F.transform(F.sequence(F.lit(0), F.lit(63)), word)
    boiler = F.lit(" ".join(f"b{i}" for i in range(64)))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 == 0, boiler)
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )


def jaccard_pairs_r10(df, pairs, id_col="doc_id", text_col="text",
                      shingle_size=5):
    """Verbatim replica of the ROUND-10 candidate-path verify (the A/B
    baseline): two aliased joins against the full-corpus shingle-set
    projection — the shingle pipeline evaluates once per join side."""
    sh_sets = df.select(
        F.col(id_col),
        F.array_sort(
            F.transform(
                shingles(normalized_words(text_col), shingle_size),
                lambda s: F.xxhash64(s),
            )
        ).alias("__sh"),
    )
    p = pairs.select("id_a", "id_b")
    joined = p.join(
        sh_sets.select(
            F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")
        ),
        "id_a",
    ).join(
        sh_sets.select(
            F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")
        ),
        "id_b",
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sh_a", "__sh_b")).alias("n_common"),
            F.size("__sh_a").alias("n_a"),
            F.size("__sh_b").alias("n_b"),
        )
        .where(F.col("n_common") >= 1)
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least("n_a", "n_b"),
        )
    )


def checksum(verified) -> dict:
    """Order-insensitive exact-equality witness: count + sum of a
    64-bit hash over (id_a, id_b, n_common, n_a, n_b)."""
    row = verified.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: an int64 hash sum overflows under ANSI
        F.sum(
            F.xxhash64("id_a", "id_b", "n_common", "n_a", "n_b").cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).first()
    return {"n": row["n"], "h": str(row["h"] or 0)}


def run_ab(spark, n: int) -> dict:
    out: dict = {"n_docs": n, "corpus": "r10-shape (survival ~1)"}
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    sigs = minhash_signature(docs, num_hashes=NUM_HASHES).localCheckpoint(
        eager=True
    )
    pairs = lsh_candidate_pairs(
        sigs, num_bands=NUM_BANDS, max_bucket_size=MAX_BUCKET,
        sig_len=NUM_HASHES,
    ).localCheckpoint(eager=True)
    out["n_pairs"] = pairs.count()

    for name, fn in (
        ("r10_two_join", jaccard_pairs_r10),
        ("r11_one_pass", jaccard_pairs),
    ):
        t0 = time.time()
        cs = checksum(fn(docs, pairs))
        out[name] = {"sec": round(time.time() - t0, 1), **cs}
        print(json.dumps({name: out[name], "n_docs": n}), flush=True)
    out["equal"] = (
        out["r10_two_join"]["n"] == out["r11_one_pass"]["n"]
        and out["r10_two_join"]["h"] == out["r11_one_pass"]["h"]
    )
    return out


def _prefilter_arm(spark, docs, sigs, pairs, label: str) -> dict:
    out: dict = {"arm": label, "n_pairs": pairs.count()}
    t0 = time.time()
    base = (
        jaccard_pairs(docs, pairs)
        .where(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    out["exact_only"] = {
        "sec": round(time.time() - t0, 1),
        "n_verified": base.count(),
    }
    print(json.dumps({label: {"exact_only": out["exact_only"]}}),
          flush=True)

    t0 = time.time()
    # (r12: the cut now derives from the actual signature arrays; the
    # num_hashes parameter is gone and missing-sig pairs pass through)
    kept_pairs = signature_prefilter(
        pairs, sigs, THRESHOLD
    ).localCheckpoint(eager=True)
    n_kept = kept_pairs.count()
    filt = (
        jaccard_pairs(docs, kept_pairs)
        .where(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    out["prefiltered"] = {
        "sec": round(time.time() - t0, 1),
        "pairs_after_filter": n_kept,
        "filter_kept_frac": round(n_kept / max(1, out["n_pairs"]), 4),
        "n_verified": filt.count(),
        # true pairs the filter cost us (bound: ~1.3e-3 per true pair)
        "missed_true_pairs": base.join(
            filt, ["id_a", "id_b"], "left_anti"
        ).count(),
    }
    print(json.dumps({label: {"prefiltered": out["prefiltered"]}}),
          flush=True)
    return out


def run_prefilter(spark, n: int) -> dict:
    # 7 variant positions/member -> ~min(60, 35) differing shingles per
    # within-group pair -> Jaccard ~ (60-35)/(60+35) = 0.26: far below
    # the 0.7 gate, the false-candidate shape a metadata blocker emits
    docs = synth_docs(spark, n, variant_positions=7).localCheckpoint(
        eager=True
    )
    sigs = minhash_signature(docs, num_hashes=NUM_HASHES).localCheckpoint(
        eager=True
    )
    # arm 1: LSH-sourced candidates (structurally high-agreement)
    lsh_pairs = lsh_candidate_pairs(
        sigs, num_bands=NUM_BANDS, max_bucket_size=MAX_BUCKET,
        sig_len=NUM_HASHES,
    ).localCheckpoint(eager=True)
    # arm 2: blocking-sourced candidates — all within-group pairs
    # ((3k,3k+1),(3k,3k+2),(3k+1,3k+2)), the same-URL-stem simulant
    g = spark.range(n // 3)
    block_pairs = (
        g.select((F.col("id") * 3).alias("id_a"),
                 (F.col("id") * 3 + 1).alias("id_b"))
        .union(g.select((F.col("id") * 3).alias("id_a"),
                        (F.col("id") * 3 + 2).alias("id_b")))
        .union(g.select((F.col("id") * 3 + 1).alias("id_a"),
                        (F.col("id") * 3 + 2).alias("id_b")))
        .where(F.col("id_b") < n)
        .localCheckpoint(eager=True)
    )
    return {
        "n_docs": n,
        "corpus": "low-jaccard groups (7 variant positions/member)",
        "arms": [
            _prefilter_arm(spark, docs, sigs, lsh_pairs, "lsh_arm"),
            _prefilter_arm(spark, docs, sigs, block_pairs, "block_arm"),
        ],
    }


def main() -> None:
    sizes = (
        [int(a) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else [1_000_000]
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {
        "probe": "r11_verify_ab",
        "ab": [run_ab(spark, n) for n in sizes],
        "prefilter": [run_prefilter(spark, n) for n in sizes],
    }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
