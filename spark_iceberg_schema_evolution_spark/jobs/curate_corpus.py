"""Training-corpus curation job — the LLM-data pipeline end to end.

Composes the engine's data-pipeline operators into the flow a 100 TB
pretraining corpus actually runs:

    documents parquet
      -> PII redaction          (email/number masking, map-only)
      -> boilerplate removal    (line doc-frequency > cap dropped
                                 corpus-wide, banned set broadcast)
      -> paragraph dedup        (optional: corpus-level keep-first,
                                 text never enters the dedup shuffles)
      -> exact dedup            (md5 keep-one, fixed-width shuffle keys)
      -> near-dedup             (MinHash -> LSH bands -> exact-Jaccard
                                 verify on candidates -> connected
                                 components -> keep cluster minimum)
      -> quality filter         (heuristic score >= threshold, lang-id,
                                 optional exact-percentile length band)
      -> mixture resample       (optional: source token-share targets
                                 solved to epoch rates, copies re-keyed)
      -> chunking               (fixed-size overlapping token windows)
      -> sequence packing       (fixed-capacity bins, sharded by lang)
      -> train/val/test split   (md5 bucket thresholds, deterministic)
      -> curated parquet (one dir per stage for auditability)

Every stage is a declarative DataFrame transform from operators/ — no
driver-side data paths; the job only orchestrates and prints stage
counts (aggregates, metadata-bounded).

Usage:
    python -m spark_iceberg_schema_evolution_spark.jobs.curate_corpus \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated [--jaccard 0.8] [--min-quality 0.5] \
        [--chunk-tokens 512] [--overlap 64] [--pack-capacity 4096]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="curate_corpus")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--chunk-tokens", type=int, default=512)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--pack-capacity", type=int, default=4096)
    p.add_argument(
        "--minhash-bands", type=int, default=8,
        help="LSH bands over a 32-hash signature",
    )
    p.add_argument(
        "--sigs-in", default=None,
        help="MinHash signature store (parquet dir written by a prior "
        "--sigs-out run, with its _minhash_props.json sidecar): the "
        "near-dedup stage signs only store-missing docs instead of "
        "re-signing the corpus (the sig scan was ~56% of 10M-doc "
        "pipeline wall clock, PROBES_r11)",
    )
    p.add_argument(
        "--sigs-out", default=None,
        help="write the corpus MinHash signatures + parameter sidecar "
        "here for the next run's --sigs-in",
    )
    p.add_argument(
        "--boilerplate-df", type=int, default=0,
        help="drop lines appearing in more than this many docs "
        "(0 = stage off)",
    )
    p.add_argument("--no-redact", action="store_true")
    p.add_argument(
        "--paragraph-dedup", action="store_true",
        help="corpus-level keep-first paragraph dedup before doc dedup",
    )
    p.add_argument(
        "--clean-text", action="store_true",
        help="control-char strip + whitespace collapse before anything",
    )
    p.add_argument(
        "--decontaminate", default=None,
        help="benchmark parquet path; docs overlapping it beyond "
        "--max-overlap drop after the quality stage",
    )
    p.add_argument(
        "--max-overlap", type=float, default=0.1,
        help="max benchmark shingle-overlap fraction kept (graded "
        "policy; 0 = any-hit drop)",
    )
    p.add_argument(
        "--quality-band", default=None,
        help="lo,hi percentile trim on doc length, e.g. 0.05,0.99 "
        "(exact percentile; off by default)",
    )
    p.add_argument(
        "--mix", default=None,
        help="target token shares per source, e.g. 'src0=0.5,src1=0.5' "
        "(requires --mix-tokens; resamples the post-quality corpus)",
    )
    p.add_argument("--mix-tokens", type=float, default=None)
    p.add_argument(
        "--tokenizer-merges", type=int, default=0,
        help="learn this many BPE merges from the post-quality corpus "
        "and write the merge table (0 = stage off)",
    )
    p.add_argument(
        "--cluster-quota", type=int, default=0,
        help="keep at most this many docs per embedding cluster "
        "(k-means diversity quota; 0 = stage off; requires "
        "--embeddings)",
    )
    p.add_argument(
        "--embeddings", default=None,
        help="parquet with (doc id, embedding) for --cluster-quota",
    )
    p.add_argument(
        "--embeddings-id", default="doc_id",
        help="id column name in the --embeddings parquet",
    )
    p.add_argument(
        "--clusters", type=int, default=16,
        help="k for the --cluster-quota k-means fit",
    )
    p.add_argument(
        "--cluster-refine", type=int, default=2,
        help="full-corpus Lloyd refinement sweeps for --cluster-quota",
    )
    p.add_argument(
        "--domain-budget-bp", type=int, default=0,
        help="per-source nucleus trim: keep each source's highest-"
        "quality docs until this many basis points of its token mass "
        "is covered (0 = stage off)",
    )
    p.add_argument(
        "--pps-sample-n", type=int, default=0,
        help="systematic-PPS downsample: keep ~n docs with probability "
        "proportional to token count (0 = stage off)",
    )
    return p


_SIG_SIDECAR = "_minhash_props.json"


def _write_sig_store(
    sigs, path: str, num_hashes: int, num_bands: int
) -> None:
    """Parquet signature store + parameter sidecar — the filesystem
    twin of ``reconcile_signature_store``'s table properties. The
    sidecar lands AFTER the parquet commit and ``_read_sig_store``
    refuses a store without it, so a half-written store can never
    band (the leading underscore keeps Spark's directory scan from
    reading it as data, like ``_SUCCESS``)."""
    import json
    import os

    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        sig_store_props,
    )

    sigs.write.mode("overwrite").parquet(path)
    with open(os.path.join(path, _SIG_SIDECAR), "w") as f:
        json.dump(sig_store_props(num_hashes, num_bands), f)


def _read_sig_store(spark, path: str, num_hashes: int, num_bands: int):
    """-> (sigs_df, scheme). Refuses a sidecar-less store (its
    signatures may predate the hash-once scheme — banding them finds
    nothing, silently) and a parameter-mismatched one (same class of
    silent no-op the table-property guard closes)."""
    import json
    import os

    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        sig_store_props,
    )

    side = os.path.join(path, _SIG_SIDECAR)
    if not os.path.exists(side):
        raise ValueError(
            f"signature store {path} has no {_SIG_SIDECAR} sidecar; "
            "its signatures may predate the hash-once scheme and "
            "cannot safely band against fresh ones — rebuild it with "
            "--sigs-out"
        )
    with open(side) as f:
        props = json.load(f)
    want = sig_store_props(num_hashes, num_bands)
    bad = {
        k: (props.get(k), v) for k, v in want.items()
        if props.get(k) != v
    }
    if bad:
        raise ValueError(
            f"signature store {path} was built with different MinHash "
            f"parameters: {bad} (stored != requested); rebuild it or "
            "match the parameters"
        )
    return spark.read.parquet(path), props["minhash.scheme"]


def curate(spark, args) -> dict:
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators import dedup
    from spark_iceberg_schema_evolution_spark.operators.text import (
        chunk_text,
        dedup_paragraphs,
        hash_split,
        lang_id,
        mix_corpora,
        pack_sequences,
        quality_score,
        quantile_band_filter,
        redact_pii,
        remove_boilerplate_lines,
        token_count,
    )

    docs = spark.read.parquet(args.input)
    counts = {"input": docs.count()}

    # 0. scrub: text hygiene + PII masking (map-only) + optional
    # boilerplate lines
    if args.clean_text:
        from spark_iceberg_schema_evolution_spark.operators.text import (
            clean_text,
        )

        docs = clean_text(docs)
    if not args.no_redact:
        docs = redact_pii(docs)
    if args.boilerplate_df:
        other = [c for c in docs.columns if c not in ("doc_id", "text")]
        cleaned = remove_boilerplate_lines(
            docs, max_doc_freq=args.boilerplate_df
        )
        docs = (
            cleaned.join(docs.select("doc_id", *other), "doc_id")
            if other
            else cleaned
        )
    if args.paragraph_dedup:
        # corpus-level keep-first paragraph dedup BEFORE doc-level dedup:
        # repeated boilerplate paragraphs would otherwise make distinct
        # docs look like near-duplicates of each other
        docs = dedup_paragraphs(docs, sep="\n")
    if (
        not args.no_redact
        or args.boilerplate_df
        or args.paragraph_dedup
        or args.clean_text
    ):
        docs.write.mode("overwrite").parquet(f"{args.output}/00_scrubbed")
        docs = spark.read.parquet(f"{args.output}/00_scrubbed")
        counts["after_scrub"] = docs.count()

    # 1. exact dedup
    exact = dedup.exact_dedup(docs)
    exact.write.mode("overwrite").parquet(f"{args.output}/01_exact_dedup")
    exact = spark.read.parquet(f"{args.output}/01_exact_dedup")
    counts["after_exact_dedup"] = exact.count()

    # 2. near dedup: sign (store-backed when --sigs-in: only
    # store-missing docs are signed) -> LSH candidates -> exact-Jaccard
    # verify -> cluster -> keep cluster min
    sigs_in = scheme_in = None
    if args.sigs_in:
        sigs_in, scheme_in = _read_sig_store(
            spark, args.sigs_in, 32, args.minhash_bands
        )
    if args.sigs_out:
        # materialize this corpus' signatures (reusing --sigs-in rows)
        # and re-read: the near-dedup below consumes the WRITTEN store
        # and signs nothing, and the next run starts from it
        _write_sig_store(
            dedup.corpus_signatures(
                exact, num_hashes=32, sigs=sigs_in, sigs_scheme=scheme_in
            ),
            args.sigs_out,
            32,
            args.minhash_bands,
        )
        sigs_in, scheme_in = _read_sig_store(
            spark, args.sigs_out, 32, args.minhash_bands
        )
    near = dedup.batch_near_dedup(
        exact,
        threshold=args.jaccard,
        num_hashes=32,
        num_bands=args.minhash_bands,
        sigs=sigs_in,
        sigs_scheme=scheme_in,
    )
    near.write.mode("overwrite").parquet(f"{args.output}/02_near_dedup")
    near = spark.read.parquet(f"{args.output}/02_near_dedup")
    counts["after_near_dedup"] = near.count()

    # 3. quality + language
    scored = near.withColumn("quality", quality_score()).withColumn(
        "lang_detected", lang_id()
    )
    kept = scored.where(F.col("quality") >= args.min_quality)
    if args.quality_band:
        lo, hi = (float(x) for x in args.quality_band.split(","))
        kept = quantile_band_filter(
            kept.withColumn("__len", F.length("text")), "__len", lo, hi
        ).drop("__len")
    if args.decontaminate:
        # graded contamination policy: drop docs whose benchmark
        # shingle-overlap fraction exceeds the threshold (0 = any hit)
        from spark_iceberg_schema_evolution_spark.operators.dedup import (
            contamination_stats,
        )

        bench = spark.read.parquet(args.decontaminate)
        stats = contamination_stats(kept, bench)
        kept = stats.where(
            F.coalesce(F.col("overlap_frac"), F.lit(0.0))
            <= args.max_overlap
        ).drop("n_shingles", "n_overlap", "overlap_frac")
    kept.write.mode("overwrite").parquet(f"{args.output}/03_quality")
    kept = spark.read.parquet(f"{args.output}/03_quality")
    counts["after_quality"] = kept.count()

    # 3a. optional tokenizer-vocabulary induction on the CURATED corpus
    # (train the tokenizer on what the model will actually see — after
    # dedup + quality, before mixture inflation duplicates tokens)
    if args.tokenizer_merges:
        from spark_iceberg_schema_evolution_spark.operators.bpe import (
            bpe_learn,
            merges_to_df,
        )

        merges = bpe_learn(
            kept, "text", num_merges=args.tokenizer_merges
        )
        merges_to_df(spark, merges).write.mode("overwrite").parquet(
            f"{args.output}/03a_tokenizer_merges"
        )
        counts["tokenizer_merges"] = len(merges)

    # 3a2. optional embedding-diversity quota: cluster the curated
    # corpus in embedding space (k-means: bounded-sample init +
    # full-corpus Lloyd refinement) and keep a fixed per-cluster quota
    # by deterministic md5 rank — stops the mixture from collapsing
    # onto its dominant modes. Runs BEFORE the mixture stage (mixture
    # re-keys doc_id, which would break the embeddings join). Docs
    # without an embedding pass through (the semantic_dedup
    # convention).
    if args.cluster_quota:
        if not args.embeddings:
            raise ValueError("--cluster-quota requires --embeddings")
        from spark_iceberg_schema_evolution_spark.operators.similarity import (  # noqa: E501
            cluster_balanced_sample,
            kmeans_fit,
        )

        emb = spark.read.parquet(args.embeddings).select(
            F.col(args.embeddings_id).alias("doc_id"), "embedding"
        )
        with_emb = kept.select("doc_id").join(emb, "doc_id")
        model = kmeans_fit(
            with_emb,
            "embedding",
            k=args.clusters,
            n_iter=args.cluster_refine,
            seed=42,
        )
        keep_ids = cluster_balanced_sample(
            with_emb,
            args.cluster_quota,
            id_col="doc_id",
            vec_col="embedding",
            centroids=model["centroids"],
        ).select("doc_id")
        no_emb = kept.select("doc_id").join(
            emb.select("doc_id"), "doc_id", "left_anti"
        )
        kept = kept.join(keep_ids.unionByName(no_emb), "doc_id")
        kept.write.mode("overwrite").parquet(f"{args.output}/03c_diverse")
        kept = spark.read.parquet(f"{args.output}/03c_diverse")
        counts["after_cluster_quota"] = kept.count()

    # 3a3. optional per-domain nucleus budget: keep each source's
    # highest-quality docs until --domain-budget-bp of its token mass
    # is covered (integer cross-multiplied — engine-exact). Quality is
    # the stage-3 score already on the frame; weight is the token
    # estimate. Runs before the mixture (which re-keys doc_id).
    if args.domain_budget_bp:
        from spark_iceberg_schema_evolution_spark.operators.text import (
            domain_budget_select,
        )

        kept = domain_budget_select(
            kept.withColumn("__tok", token_count().cast("long")),
            args.domain_budget_bp,
            "__tok",
            "quality",
            domain_col="source",
            id_col="doc_id",
        ).drop("__tok")
        kept.write.mode("overwrite").parquet(
            f"{args.output}/03d_domain_budget"
        )
        kept = spark.read.parquet(f"{args.output}/03d_domain_budget")
        counts["after_domain_budget"] = kept.count()

    # 3a4. optional corpus-wide weighted downsample: systematic PPS
    # with probability proportional to token count (deterministic,
    # integer-exact, key-range sharded — no global sort).
    if args.pps_sample_n:
        from spark_iceberg_schema_evolution_spark.operators.text import (
            pps_systematic_sample,
        )

        kept = pps_systematic_sample(
            kept.withColumn("__tok", token_count().cast("long")),
            args.pps_sample_n,
            "__tok",
            id_col="doc_id",
        ).drop("__tok")
        kept.write.mode("overwrite").parquet(
            f"{args.output}/03e_pps_sample"
        )
        kept = spark.read.parquet(f"{args.output}/03e_pps_sample")
        counts["after_pps_sample"] = kept.count()

    # 3b. optional training-mixture resample by source token shares
    if args.mix:
        if args.mix_tokens is None:
            raise ValueError("--mix requires --mix-tokens")
        fracs = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.mix.split(","))
        }
        # copies become distinct downstream examples: re-key doc_id so
        # chunking/packing/splitting never collide two copies
        kept = (
            mix_corpora(
                kept.withColumn("__tok", token_count()),
                fracs,
                total_tokens=args.mix_tokens,
                tokens_col="__tok",
            )
            .withColumn(
                "doc_id",
                F.concat_ws("#", F.col("doc_id"), F.col("copy_idx")),
            )
            .drop("__tok", "copy_idx")
        )
        kept.write.mode("overwrite").parquet(f"{args.output}/03b_mixed")
        kept = spark.read.parquet(f"{args.output}/03b_mixed")
        counts["after_mix"] = kept.count()

    # 4. chunking
    chunks = chunk_text(
        kept, chunk_tokens=args.chunk_tokens, overlap=args.overlap
    )
    chunks.write.mode("overwrite").parquet(f"{args.output}/04_chunks")
    chunks = spark.read.parquet(f"{args.output}/04_chunks")
    counts["chunks"] = chunks.count()

    # 5. packing (shard by detected language of the parent doc)
    chunk_meta = chunks.join(
        kept.select("doc_id", "lang_detected"), "doc_id"
    ).select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("chunk_id"),
        F.col("lang_detected").alias("shard"),
        F.col("n_tokens"),
    )
    packed = pack_sequences(
        chunk_meta,
        capacity=args.pack_capacity,
        id_col="chunk_id",
        shard_col="shard",
    )
    packed.write.mode("overwrite").parquet(f"{args.output}/05_packed")
    counts["bins"] = (
        spark.read.parquet(f"{args.output}/05_packed")
        .select("shard", "bin_id")
        .distinct()
        .count()
    )

    # 6. deterministic split over the surviving documents
    split = hash_split(kept.select("doc_id"), id_col="doc_id")
    split.write.mode("overwrite").parquet(f"{args.output}/06_split")
    for r in (
        spark.read.parquet(f"{args.output}/06_split")
        .groupBy("split")
        .count()
        .collect()
    ):
        counts[f"split_{r['split']}"] = r["count"]
    return counts


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from spark_iceberg_schema_evolution_spark.session import get_spark

    spark = get_spark()
    counts = curate(spark, args)
    for stage, n in counts.items():
        print(f"{stage}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
