"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints the full metric JSON line first, then — because a tail-capture of
stdout truncated the full line in round 6 (only 66/83 queries reached the
driver, and the total was lost) — a compact, tail-capture-proof summary as
the FINAL line, and writes the full dict to BENCH_full.json beside this
file:

  {"metric": "headline_queries_wall_clock", "value": <total sec>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>}
  {"metric": "headline_queries_wall_clock", "value": <total sec>,
   "unit": "sec", "sf": <sf>, "n_queries": N, "queries_sha256_12":
   "<hash of the full queries dict>", "full_json": "<path>"}

Consumers should parse the LAST parseable JSON line; the hash ties it to
the on-disk full dict.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_iceberg_schema_evolution_spark.queries import REGISTRY  # noqa: E402
from spark_iceberg_schema_evolution_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_scan_counts",
    "q04_filter_case",
    "q05_join_inner_agg",
    "q06_join_broadcast",
    "q11_asof_join",
    "q12_tpch_q1",
    "q13_count_distinct",
    "q18_window_topk",
    "q22_topk_revenue",
    "q27_date_funcs",
    "q34_tumbling_hour",
    "q36_dedup_exact",
    "q37_ngram_jaccard",
    "q38_cosine_topk",
    "q40_embedding_norms",
    "q45_evolving_ingest",
    "q49_stream_tumbling",
    # round-2 operators (no r01 baseline entries; tracked from this round)
    "q68_scd2_dimension",
    "q70_profile_stats",
    "q71_text_chunking",
    "q72_sequence_packing",
    "q73_delete_update",
    "q74_dedup_clusters",
    # round-3 window families (extras + new lifecycle ops)
    "q75_incremental_changes",
    "q76_group_by_all_qualify",
    "q78_unpivot",
    "q79_percentile_cont",
    "q82_ignore_nulls_stringagg",
    "q85_salted_join_equivalence",
    "q87_rename_drop_evolution",
    "q88_jsonl_scan",
    "q89_merge_clauses",
    "q90_type_widening",
    "q91_data_skipping",
    "q92_sorted_compact_skip",
    "q93_merge_evolution",
    "q94_hash_split",
    "q95_bigram_counts",
    "q96_stratified_sample",
    "q97_zorder_box_query",
    "q98_version_diff",
    "q99_pii_redaction",
    "q100_boilerplate_removal",
    # round-4 ops (tracked from this round). The MOR lifecycle queries
    # (q103/q109) are deliberately NOT here: their wall time is dominated
    # by the oracle-scenario's table SETUP (multiple partitioned writes),
    # not the DML under test — q73 already tracks DML cost.
    "q110_weighted_resample",
    # round-5 ops (tracked from this round). q112 (SQL MERGE) is not
    # here for the same setup-dominated reason as q103/q109 — q89
    # already tracks merge cost, and q116/q117/q120 (metadata-table /
    # time-travel / procedure SQL) are likewise table-setup-dominated.
    "q113_deterministic_sample",
    "q114_token_budget_batches",
    "q115_semantic_dedup",
    "q118_paragraph_dedup",
    "q119_quantile_filter",
    "q121_corpus_mix",
    "q122_expectations",
    "q124_bucket_pruning",
    "q125_url_curation",
    "q126_term_search",
    "q127_cluster_sample",
    "q128_lm_quality_score",
    "q129_audio_framing",
    "q131_contamination_stats",
    "q134_gapfill_locf",
    "q135_clean_text",
    "q136_histogram",
    "q137_funnel",
    "q138_cohort_retention",
    "q139_interval_join",
    "q143_lateral_topk",
    # round-6: the continuous-ingestion shapes a 100 TB corpus runs
    # daily (IVM rollup refresh, incremental ingest dedup, COPY INTO)
    "q130_incremental_rollup",
    "q140_ingest_dedup",
    "q141_copy_into",
    # round-6 corpus operators. q149/q150 (change consumer, bloom
    # lookup) are excluded as table-setup-dominated, same rationale as
    # q103/q112 above; q148 includes its two bucketed writes — that IS
    # the operator's amortized cost story.
    "q145_classifier_filter",
    "q146_dup_spans",
    "q147_bm25_search",
    "q148_bucketed_cojoin",
    "q151_leakage_free_split",
    "q153_burst_dedup",
    "q154_percentile_bands",
    "q155_fuzzy_join",
    "q156_regex_family",
    "q157_string_format_family",
    "q158_argmin_argmax",
    "q159_gaps_islands",
    "q160_skew_report",
    "q161_embedding_pooling",
    "q162_time_weighted_avg",
    # round-7 operators (tracked from this round)
    "q166_ohlc_bars",
    "q167_corr_regression",
    "q168_mad_outliers",
    "q169_rolling_zscore",
    "q172_counter_agg",
    # round-7 second half: evaluation & drift statistics
    "q173_classifier_eval",
    "q174_ab_welch",
    "q175_event_transitions",
    "q176_pmi_collocations",
    "q177_cusum_changepoint",
    "q178_autocorr",
    "q179_tv_divergence",
    "q180_variant_shred",
    "q181_rrf_fusion",
    "q182_interval_coverage",
    "q183_assoc_rules",
    "q184_period_over_period",
    # round-8/9 faces (tracked from round 10, r9 VERDICT ask #3).
    # q170 (clone+constraints) is excluded as table-setup-dominated,
    # same rationale as q103/q112; q171 and q185 ARE their incremental
    # cost stories (SCD2 delta merge, CDC moment-rollup refresh), so the
    # lakehouse work they do is the thing being measured.
    "q171_scd2_incremental",
    "q185_incremental_ab",
    "q186_triangle_count",
    "q187_degree_stats",
    "q188_pps_sample",
    "q189_domain_budget",
    # round-13 faces, joined in round 14 as the r13 in-file note
    # promised (ADDITIVE: the 106 pre-existing entries above are
    # unchanged, so per-query comparison against every committed r13
    # sidecar still works; only the total's denominator grows to 108).
    "q190_dsir_importance",
    "q191_encoding_anomalies",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark()

    # warm the JVM/session so per-query numbers measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    def consume(df) -> None:
        # checksum every output column: forces full evaluation without the
        # v2 noop-write path (measured slow in this build) and without
        # shipping rows to Python.
        df.select(F.sum(F.hash(*df.columns))).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        # two runs, report the warm one: run-to-run variance on this shared
        # VM is large and the first run folds in plan+codegen setup.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            consume(q.spark_fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    full_line = json.dumps(full)
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_full.json")
    with open(full_path, "w") as fh:
        fh.write(full_line + "\n")
    # ALSO write a per-run unique sidecar (r13 PERF lost its whole
    # per-query comparison because the driver's 8-core scaling run
    # overwrote the 32-core run's BENCH_full.json). BENCH_full.json
    # stays as "the latest" for compatibility; the unique path is
    # additive. $BENCH_FULL_PATH overrides the unique path outright.
    run_path = os.environ.get("BENCH_FULL_PATH") or os.path.join(
        here,
        "BENCH_full_c%s_%d_%d.json"
        % (
            os.environ.get("SPARK_GRAFT_CPUS", "8"),
            int(time.time()),
            os.getpid(),
        ),
    )
    with open(run_path, "w") as fh:
        fh.write(full_line + "\n")
    print(full_line)
    # tail-capture-proof final line: short enough (~200 bytes) to survive
    # any tail truncation, carries the headline number + a hash tying it
    # to the full per-query dict written above.
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries_sha256_12": hashlib.sha256(
                    json.dumps(timings, sort_keys=True).encode()
                ).hexdigest()[:12],
                "full_json": full_path,
                "full_json_run": run_path,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
