"""Round-3 training-pipeline operators: decontamination, repetition
filters, deterministic shuffle shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.dedup import decontaminate
from spark_iceberg_schema_evolution_spark.operators.text import (
    repetition_stats,
    shuffle_shards,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words about spark and lakehouse tables"),
        (3, "the quick brown fox jumps high above everything else"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_drops_overlapping_docs(spark, docs):
    bench = spark.createDataFrame(
        [(99, "x y the quick brown fox jumps z")], ["doc_id", "text"]
    )
    clean = decontaminate(docs, bench)
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps"
    assert sorted(r.doc_id for r in clean.collect()) == [2]
    flags = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, bench, flag_only=True).collect()
    }
    assert flags == {1: True, 2: False, 3: True}


def test_decontaminate_no_overlap_keeps_all(spark, docs):
    bench = spark.createDataFrame(
        [(99, "unrelated benchmark sentence with novel vocabulary only")],
        ["doc_id", "text"],
    )
    assert decontaminate(docs, bench).count() == 3


def test_repetition_stats_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a b"),          # top word 4/5, bigram "a a" 3/4
            (2, "one two three four"), # all distinct
            (3, "solo"),               # no bigrams -> NULL frac
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    r1 = out[1]
    assert r1.n_words == 5 and r1.n_distinct == 2 and r1.top_word_n == 4
    assert r1.top_word_frac == 0.8 and r1.top_bigram_frac == 0.75
    r2 = out[2]
    assert r2.distinct_ratio == 1.0 and r2.top_word_frac == 0.25
    assert out[3].top_bigram_frac is None and out[3].n_bigrams is None


def test_shuffle_shards_deterministic_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = shuffle_shards(df, n_shards=4, seed="s").collect()
    b = shuffle_shards(df, n_shards=4, seed="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = {(r.shard, r.shard_pos) for r in a}
    assert len(rows) == 200  # (shard, pos) unique
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for poss in by_shard.values():  # contiguous 0..n-1 per shard
        assert sorted(poss) == list(range(len(poss)))
    # a different seed yields a different permutation
    c = shuffle_shards(df, n_shards=4, seed="other").collect()
    assert {(r.doc_id, r.shard, r.shard_pos) for r in c} != {
        (r.doc_id, r.shard, r.shard_pos) for r in a
    }


def test_shuffle_shards_single_shard(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    out = shuffle_shards(df, n_shards=1)
    rows = out.collect()
    assert all(r.shard == 0 for r in rows)
    assert sorted(r.shard_pos for r in rows) == list(range(10))


# -- round 4: weighted resampling + keep-best dedup -------------------------


def test_weighted_resample_copy_semantics(spark):
    from pyspark.sql import functions as F

    from spark_iceberg_schema_evolution_spark.operators.text import (
        weighted_resample,
    )

    d = spark.createDataFrame(
        [(i, ["a", "b", "c", "drop"][i % 4]) for i in range(400)],
        ["doc_id", "dom"],
    )
    out = weighted_resample(
        d,
        {"a": 2.0, "b": 0.5, "c": 1.0, "drop": 0.0},
        domain_col="dom",
        seed="t",
    )
    per = {
        r.dom: (r.n, r.docs)
        for r in out.groupBy("dom")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .collect()
    }
    assert "drop" not in per  # w=0 domain vanishes
    assert per["a"] == (200, 100)  # integer weight: exactly 2 copies each
    assert per["c"] == (100, 100)  # w=1: untouched
    nb, docsb = per["b"]  # w=0.5: kept docs have exactly 1 copy
    assert nb == docsb and 20 <= nb <= 80  # ~50 of 100, md5-deterministic
    # determinism: same seed -> identical expansion
    again = weighted_resample(
        d,
        {"a": 2.0, "b": 0.5, "c": 1.0, "drop": 0.0},
        domain_col="dom",
        seed="t",
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_weighted_resample_append_stability(spark):
    """Adding new docs never changes existing docs' copy counts — the
    property that makes the mix incrementally maintainable."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        weighted_resample,
    )

    base = spark.createDataFrame(
        [(i, "x") for i in range(100)], ["doc_id", "dom"]
    )
    bigger = spark.createDataFrame(
        [(i, "x") for i in range(200)], ["doc_id", "dom"]
    )
    w = {"x": 1.5}
    a = weighted_resample(base, w, domain_col="dom", seed="s")
    b = weighted_resample(bigger, w, domain_col="dom", seed="s").where(
        "doc_id < 100"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_weighted_resample_rejects_negative(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        weighted_resample,
    )

    d = spark.createDataFrame([(1, "a")], ["doc_id", "dom"])
    with pytest.raises(ValueError, match=">= 0"):
        weighted_resample(d, {"a": -0.5}, domain_col="dom")


def test_dedup_keep_best_picks_quality_winner(spark):
    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7), (5, 50)],
        ["doc_id", "quality"],
    )
    # cluster {1,2,3}: best quality 99, tiebreak lowest id -> 2 survives
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    kept = sorted(
        (r.doc_id, r.quality) for r in
        dedup_keep_best(docs, pairs, quality_col="quality").collect()
    )
    assert kept == [(2, 99), (4, 7), (5, 50)]


def test_dedup_keep_best_with_id_col_named_id(spark):
    """id_col="id" must not collide with the component frame's internal
    member column — drop-by-name would silently remove BOTH and lose the
    document id."""
    from spark_iceberg_schema_evolution_spark.operators.dedup import (
        dedup_keep_best,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7)], ["id", "quality"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = dedup_keep_best(docs, pairs, quality_col="quality", id_col="id")
    assert out.columns == ["id", "quality"]
    kept = sorted((r.id, r.quality) for r in out.collect())
    assert kept == [(2, 99), (4, 7)]


def test_deterministic_sample_exact_and_stable(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        deterministic_sample,
    )

    d = spark.range(1000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id for r in deterministic_sample(d, 50, seed="a").collect()}
    # repartitioning must not change the drawn sample
    s2 = {
        r.doc_id
        for r in deterministic_sample(
            d.repartition(13), 50, seed="a"
        ).collect()
    }
    s3 = {r.doc_id for r in deterministic_sample(d, 50, seed="b").collect()}
    assert len(s1) == 50 and s1 == s2
    assert s1 != s3  # independent draw per seed


def test_token_budget_batches_overflow_bound(spark):
    """Every batch's token sum stays under budget + its own largest
    document (the one-straddler overflow bound), in-batch positions are
    dense from 0, and the assignment is append-order independent."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        token_budget_batches,
    )

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(900)) + 1).alias("toks"),
    )
    out = token_budget_batches(
        d, budget=2000, tokens_col="toks", n_shards=4, seed="x"
    ).collect()
    by_batch: dict = {}
    for r in out:
        by_batch.setdefault((r.shard, r.batch_id), []).append(r)
    assert len(out) == 500
    for (shard, bid), rows in by_batch.items():
        total = sum(r.toks for r in rows)
        biggest = max(r.toks for r in rows)
        assert total <= 2000 + biggest, (shard, bid, total)
        assert sorted(r.batch_pos for r in rows) == list(range(len(rows)))


def test_dedup_paragraphs_keep_first_semantics(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        dedup_paragraphs,
    )

    rows = [
        # doc 1: B repeats intra-doc; first B survives, second drops
        (1, "A\n\nB\n\nB", "x"),
        # doc 2: B already seen in doc 1 (case/space-insensitive) -> drops;
        # C is fresh
        (2, " b \n\nC", "y"),
        # doc 3: every paragraph already seen -> rebuilt text is empty
        (3, "a\n\nC", "z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tag"])
    out = {
        r.doc_id: (r.text, r.tag)
        for r in dedup_paragraphs(df).collect()
    }
    assert out[1] == ("A\n\nB", "x")       # intra-doc repeat dropped
    assert out[2] == ("C", "y")            # normalized cross-doc repeat
    assert out[3] == ("", "z")             # all dropped -> empty, row kept
    # passthrough column order preserved, text rebuilt in place
    assert dedup_paragraphs(df).columns == ["doc_id", "tag", "text"]


def test_dedup_paragraphs_regex_safe_separator(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        dedup_paragraphs,
    )

    # '|' is a regex metachar: literal escaping must keep it a separator
    df = spark.createDataFrame(
        [(1, "p|q"), (2, "q|r")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.text
        for r in dedup_paragraphs(df, sep="|").collect()
    }
    assert out == {1: "p|q", 2: "r"}


def test_quantile_band_filter_exact_cut(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        quantile_band_filter,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], ["id", "score"]
    )
    # p25 of 1..10 = 3.25, p75 = 7.75 -> kept ids 4..7
    kept = sorted(
        r.id
        for r in quantile_band_filter(df, "score", 0.25, 0.75).collect()
    )
    assert kept == [4, 5, 6, 7]
    # degenerate band keeps exactly the median element when it's a datum
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], ["id", "score"]
    )
    kept2 = sorted(
        r.id
        for r in quantile_band_filter(df2, "score", 0.5, 0.5).collect()
    )
    assert kept2 == [3]


def test_mix_corpora_hits_target_shares(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        mix_corpora,
    )

    rows = [
        (i, "a" if i < 400 else "b", 100) for i in range(600)
    ]  # a: 40k tokens, b: 20k tokens
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = mix_corpora(
        df, {"a": 0.5, "b": 0.5}, total_tokens=20000, seed="t"
    )
    got = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    # targets: 10k tokens each -> a at rate 0.25, b at rate 0.5; at
    # 400/200 docs the md5 draw sits within ~3 binomial sigma of target
    # (exact per-copy decisions are oracle-pinned by q121)
    assert abs(got["a"] - 10000) / 10000 < 0.20
    assert abs(got["b"] - 10000) / 10000 < 0.20
    # determinism: identical rerun, byte-identical draw
    again = mix_corpora(
        df, {"a": 0.5, "b": 0.5}, total_tokens=20000, seed="t"
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # unlisted domains drop
    assert out.where("source NOT IN ('a','b')").count() == 0


def test_mix_corpora_validation(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        mix_corpora,
    )

    df = spark.createDataFrame(
        [(1, "a", 10)], ["doc_id", "source", "n_chars"]
    )
    with pytest.raises(ValueError, match="sum to 1"):
        mix_corpora(df, {"a": 0.4}, total_tokens=100)
    with pytest.raises(ValueError, match="no tokens"):
        mix_corpora(df, {"a": 0.5, "zz": 0.5}, total_tokens=100)
    with pytest.raises(ValueError, match=">= 0"):
        mix_corpora(df, {"a": 1.5, "zz": -0.5}, total_tokens=100)


def test_validate_expectations_single_pass_and_errors(spark):
    from spark_iceberg_schema_evolution_spark.operators.profile import (
        validate_expectations,
    )
    from spark_iceberg_schema_evolution_spark.plans import explain

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 50), (2, None, -1)], ["id", "s", "v"]
    )
    out = validate_expectations(
        df,
        [
            {"rule": "not_null", "col": "s"},
            {"rule": "unique", "cols": ["id"]},
            {"rule": "accepted_values", "col": "s", "values": ["a", "b"]},
            {"rule": "range", "col": "v", "min": 0, "max": 10},
            {"rule": "expression", "name": "pos", "expr": "v > 0"},
        ],
    )
    got = {r.rule: (r.n_violations, r.passed) for r in out.collect()}
    assert got["not_null(s)"] == (1, False)
    assert got["unique(id)"] == (1, False)
    # NULL s is not an accepted_values violation (three-valued logic)
    assert got["accepted_values(s)"] == (0, True)
    # NULL-free v: 50 and -1 out of band
    assert got["range(v)"] == (2, False)
    assert got["expression(pos)"] == (1, False)
    # one scan: a single aggregate subtree, no join/union of passes
    plan = explain.physical_plan(out)
    assert plan.count("FileScan") == 0  # in-memory here; structural check:
    assert "Union" not in plan and "Join" not in plan
    with pytest.raises(ValueError, match="unknown rule"):
        validate_expectations(df, [{"rule": "huh"}])
    with pytest.raises(ValueError, match="no rules"):
        validate_expectations(df, [])


def test_validate_expectations_empty_frame_passes(spark):
    from spark_iceberg_schema_evolution_spark.operators.profile import (
        validate_expectations,
    )

    df = spark.createDataFrame([], "id INT, s STRING")
    out = validate_expectations(
        df,
        [{"rule": "not_null", "col": "s"},
         {"rule": "unique", "cols": ["id"]}],
    )
    assert all(r.passed for r in out.collect())  # vacuously green, not NULL


def test_quantile_band_filter_approximate_path(spark):
    """approximate=True swaps in approx_percentile (fixed-size sketch,
    the 100 TB path for high-cardinality scores); on this small frame
    the sketch is exact, so the kept set matches the exact cut."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        quantile_band_filter,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], ["id", "score"]
    )
    exact = sorted(
        r.id for r in quantile_band_filter(df, "score", 0.1, 0.9).collect()
    )
    approx = sorted(
        r.id
        for r in quantile_band_filter(
            df, "score", 0.1, 0.9, approximate=True
        ).collect()
    )
    assert abs(len(approx) - len(exact)) <= 2  # sketch edge tolerance
    assert set(approx) >= set(exact[2:-2])


def test_histogram_binning(spark):
    from spark_iceberg_schema_evolution_spark.operators.profile import (
        histogram,
    )

    df = spark.createDataFrame(
        [
            (float(x) if x is not None else None,)
            for x in [0, 1, 2.5, 5, 9.99, 10, -3, 42, None]
        ],
        "x DOUBLE",
    )
    out = {
        r.bin: (r.bin_lo, r.bin_hi, r.n)
        for r in histogram(df, "x", 4, lo=0.0, hi=10.0).collect()
    }
    # clamping: -3 -> bin 0, 10 and 42 -> bin 3; NULL dropped
    assert out[0] == (0.0, 2.5, 3)   # 0, 1, -3
    assert out[1] == (2.5, 5.0, 1)   # 2.5
    assert out[2] == (5.0, 7.5, 1)   # 5
    assert out[3] == (7.5, 10.0, 3)  # 9.99, 10, 42
    # empty bins surface with n=0
    empty = histogram(
        spark.createDataFrame([(1.0,), (9.0,)], "x DOUBLE"), "x", 8
    ).collect()
    assert len(empty) == 8 and sum(r.n for r in empty) == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="bins"):
        histogram(df, "x", 0)
    with _pt.raises(ValueError, match="hi > lo"):
        histogram(df, "x", 4, lo=5.0, hi=5.0)

    # NaN rows are excluded like NULLs (round-8 advice: floor(NaN)
    # casts to 0 under non-ANSI semantics -> silently binned lowest),
    # from BOTH the counts and the derived bounds (max() is NaN-poisoned)
    nan_df = spark.createDataFrame(
        [(0.0,), (float("nan"),), (9.99,), (None,)], "x DOUBLE"
    )
    nan_out = {
        r.bin: r.n for r in histogram(nan_df, "x", 2, lo=0.0, hi=10.0).collect()
    }
    assert nan_out == {0: 1, 1: 1}
    auto = histogram(nan_df, "x", 2).collect()  # bounds derive NaN-free
    assert [r.n for r in sorted(auto, key=lambda r: r.bin)] == [1, 1]
    assert auto[1].bin_hi == 9.99


def test_skew_report_identifies_hot_keys(spark):
    from spark_iceberg_schema_evolution_spark.operators.profile import (
        skew_report,
    )

    rows = (
        [("hot", i) for i in range(80)]
        + [("warm", i) for i in range(15)]
        + [("cold", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["k", "v"])
    out = skew_report(df, ["k"], top=2).collect()
    assert [(r.k, r.n_rows, r.rank) for r in out] == [
        ("hot", 80, 1), ("warm", 15, 2)
    ]
    assert abs(out[0].share - 0.8) < 1e-12
    import pytest as _p
    with _p.raises(ValueError):
        skew_report(df, [])


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_pps_systematic_sample_matches_replica_and_pps(spark):
    """Systematic PPS: exact row-set equality vs a pure-python replica
    (md5 order, integer cumsum, seed-derived fractional start, sample
    points at (U + j*W)/n), exactly-n when no row outweighs W/n,
    inclusion EXACTLY n*w/W over the start draw (enumerated, not
    sampled), and frequency across seeds tracks
    probability-proportional-to-size."""
    import hashlib

    from spark_iceberg_schema_evolution_spark.operators.text import (
        pps_systematic_sample,
    )

    rows = [(i, (i * 37) % 19 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    n = 10

    def start(seed: str, total: int) -> int:
        return (
            int(
                hashlib.md5(f"{seed}:start".encode()).hexdigest()[:15],
                16,
            )
            % total
        )

    def pick(ordered, total, u):
        picked, cum = set(), 0
        for i, w in ordered:
            before = cum
            cum += w
            if (cum * n - u - 1 + total) // total > (
                before * n - u - 1 + total
            ) // total:
                picked.add(i)
        return picked

    def replica(seed: str) -> set[int]:
        ordered = sorted(rows, key=lambda r: (_md5(f"{seed}:{r[0]}"), r[0]))
        total = sum(w for _, w in ordered)
        return pick(ordered, total, start(seed, total))

    # inclusion-frequency property, EXACT (VERDICT r10 #6): for a fixed
    # permutation, enumerating EVERY start U in [0, W) must select each
    # row in exactly n*w draws (w <= W/n here), and always exactly n
    # rows — the fractional start makes the estimator honest; the old
    # W-anchored grid always selected the order-last row.
    ordered0 = sorted(rows, key=lambda r: (_md5(f":{r[0]}"), r[0]))
    total0 = sum(w for _, w in ordered0)
    hits = {i: 0 for i, _ in rows}
    for u in range(total0):
        got_u = pick(ordered0, total0, u)
        assert len(got_u) == n
        for i in got_u:
            hits[i] += 1
    for i, w in rows:
        assert hits[i] == n * w, (i, w, hits[i])

    for seed in ("", "s1", "s2"):
        got = {
            r["doc_id"]
            for r in pps_systematic_sample(
                df, n, "w", seed=seed
            ).collect()
        }
        assert got == replica(seed), seed
        assert len(got) == n  # max w=19 << W/n

    # PPS property: over many seeds, selection frequency ~ n*w/W
    freq = {i: 0 for i, _ in rows}
    n_seeds = 60
    for k in range(n_seeds):
        for i in replica(f"seed{k}"):
            freq[i] += 1
    total = sum(w for _, w in rows)
    heavy = [i for i, w in rows if w >= 15]
    light = [i for i, w in rows if w <= 3]
    f_heavy = sum(freq[i] for i in heavy) / len(heavy) / n_seeds
    f_light = sum(freq[i] for i in light) / len(light) / n_seeds
    assert f_heavy > 2.5 * f_light  # 15+/3- weight ratio >= 5x

    # grouped variant partitions the walk per group
    gdf = spark.createDataFrame(
        [(i, 1 + i % 5, "g%d" % (i % 2)) for i in range(40)],
        "doc_id long, w long, g string",
    )
    out = pps_systematic_sample(gdf, 4, "w", group_cols=["g"])
    per_g = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_g == {"g0": 4, "g1": 4}

    # the sharded walk is provably identical to the one-window form
    for shards in (1, 3, 16):
        got_s = {
            r["doc_id"]
            for r in pps_systematic_sample(
                df, n, "w", seed="s1", n_shards=shards
            ).collect()
        }
        assert got_s == replica("s1"), shards

    import pytest as _pt
    with _pt.raises(ValueError, match="n must"):
        pps_systematic_sample(df, 0, "w")
    with _pt.raises(ValueError, match="n_shards"):
        pps_systematic_sample(df, 2, "w", n_shards=0)


def test_domain_budget_select_nucleus_semantics(spark):
    """Per-domain top-p: keeps highest-quality rows until the budget is
    crossed (crossing row included), integer cross-multiplied — matches
    a pure-python replica; zero/NULL weights excluded; p_bp=0 keeps
    nothing, 10000 keeps everything."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        domain_budget_select,
    )

    rows = [
        # (id, weight, quality, domain)
        (1, 40, 9.0, "a"), (2, 30, 8.0, "a"), (3, 20, 7.0, "a"),
        (4, 10, 6.0, "a"),
        (5, 50, 1.0, "b"), (6, 50, 2.0, "b"),
        (7, 0, 9.9, "b"), (8, None, 9.9, "b"),  # excluded weights
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, w long, q double, source string"
    )
    got = {
        r["doc_id"]
        for r in domain_budget_select(df, 5000, "w", "q").collect()
    }
    # domain a (W=100, budget 50%): q-desc order 1(40),2(30) — row 2
    # crosses at cum_before=40 < 50 -> kept; row 3 cum_before=70 -> out
    # domain b (W=100): 6(50) kept (cum_before 0), 5 crosses? cum_before
    # =50, 50*10000 < 5000*100=500000? 500000 < 500000 false -> out
    assert got == {1, 2, 6}
    assert domain_budget_select(df, 0, "w", "q").count() == 0
    kept_all = domain_budget_select(df, 10_000, "w", "q")
    assert kept_all.count() == 6  # the two bad-weight rows stay out
    import pytest as _pt
    with _pt.raises(ValueError, match="p_bp"):
        domain_budget_select(df, 10_001, "w", "q")


def test_domain_budget_sharded_equals_one_window(spark):
    """The round-10 hot-domain decomposition: quality-quantile shards +
    broadcast prefix offsets must select the IDENTICAL row set as the
    single-window form for every n_shards — including quality ties
    (never split across shards), a constant-quality domain (collapses
    to one shard), NULL qualities (last shard), and a hot domain
    holding most rows. Non-numeric quality falls back to the
    single-window plan instead of failing."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        domain_budget_select,
    )

    rows = []
    for i in range(600):
        dom = "hot" if i % 4 else f"d{i % 13}"
        q = float((i * 31) % 23)  # heavy ties: 23 distinct values
        if i % 97 == 0:
            q = None  # NULL quality sorts last
        if dom == "d3":
            q = 5.0  # constant-quality domain: one shard
        if dom == "d7":
            dom = None  # NULL domain: its own partition, never dropped
        rows.append((i, dom, (i * 7) % 50 + 1, q))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, w long, q double"
    )
    for p_bp in (0, 1, 2500, 9999, 10_000):
        want = {
            r.doc_id
            for r in domain_budget_select(
                df, p_bp, "w", "q", n_shards=1
            ).collect()
        }
        for n_shards in (4, 32, 64):
            got = {
                r.doc_id
                for r in domain_budget_select(
                    df, p_bp, "w", "q", n_shards=n_shards
                ).collect()
            }
            assert got == want, (p_bp, n_shards)

    # string quality: non-numeric -> single-window fallback, same set
    sdf = df.withColumn("qs", F.format_string("%05.1f", "q"))
    a = {
        r.doc_id
        for r in domain_budget_select(sdf, 2500, "w", "qs").collect()
    }
    b = {
        r.doc_id
        for r in domain_budget_select(
            sdf, 2500, "w", "qs", n_shards=1
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# round 13: DSIR importance scores + encoding-anomaly detection
# ---------------------------------------------------------------------------


def _dsir_replica(raw_texts, target_texts, alpha=0.5):
    """Pure-python replica of text.dsir_importance (same tokenization,
    same md5-prefix bucketing, same smoothing)."""
    import hashlib
    import math

    def grams(text):
        words = text.strip().lower().split()
        words = words if words else [""]
        out = list(words)
        out += [f"{a} {b}" for a, b in zip(words, words[1:])]
        return [
            hashlib.md5(g.encode("utf-8")).hexdigest()[:2] for g in out
        ]

    tgt, rawc = {}, {}
    for t in target_texts:
        for b in grams(t):
            tgt[b] = tgt.get(b, 0) + 1
    for t in raw_texts:
        for b in grams(t):
            rawc[b] = rawc.get(b, 0) + 1
    tt, rt = sum(tgt.values()), sum(rawc.values())
    scores = []
    for t in raw_texts:
        ls = [
            math.log((tgt.get(b, 0) + alpha) / (tt + alpha * 256))
            - math.log((rawc[b] + alpha) / (rt + alpha * 256))
            for b in grams(t)
        ]
        scores.append((sum(ls), sum(ls) / len(ls), len(ls)))
    return scores


def test_dsir_importance_matches_replica_and_separates(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        dsir_importance,
    )

    target_texts = [
        "alpha beta gamma alpha delta",
        "beta gamma alpha beta epsilon",
    ]
    raw_texts = [
        "alpha beta gamma delta epsilon",   # target-like
        "zebra xylophone quux wombat nix",  # off-target
        "alpha beta zebra quux gamma",      # mixed
    ]
    raw = spark.createDataFrame(
        list(enumerate(raw_texts)), ["doc_id", "text"]
    )
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(target_texts)],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.llr_sum, r.llr_avg, r.n_grams)
        for r in dsir_importance(raw, tgt).collect()
    }
    want = _dsir_replica(raw_texts, target_texts)
    for i, (ws, wa, wn) in enumerate(want):
        gs, ga, gn = got[i]
        assert gn == wn, i
        assert abs(gs - ws) < 1e-9, (i, gs, ws)
        assert abs(ga - wa) < 1e-9, (i, ga, wa)
    # the published property the operator exists for: target-like text
    # outranks off-target text, mixed sits between
    assert got[0][1] > got[2][1] > got[1][1]


def test_dsir_importance_validation(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        dsir_importance,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="alpha"):
        dsir_importance(df, df, alpha=0.0)


def test_encoding_anomalies_counts_each_signature(spark):
    from spark_iceberg_schema_evolution_spark.operators.text import (
        encoding_anomalies,
    )

    rows = [
        (1, "perfectly clean text with tabs\tand\nnewlines kept"),
        (2, "cafÃ© mojibake"),  # A-tilde + Latin-1 pair
        (3, "smart â€œquoteâ€ artifact"),
        (4, "binary\x08junk\x01here"),
        (5, "decoder gave up �� twice"),
        (6, ""),
    ]
    out = {
        r.doc_id: r
        for r in encoding_anomalies(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert (
        out[1].n_replacement,
        out[1].n_control,
        out[1].n_mojibake,
        out[1].is_suspect,
    ) == (0, 0, 0, False)
    assert out[2].n_mojibake == 1 and out[2].is_suspect
    assert out[3].n_mojibake == 2  # both smart-quote digraph leads
    assert out[4].n_control == 2 and out[4].n_replacement == 0
    assert out[5].n_replacement == 2
    assert out[5].anomaly_ratio == pytest.approx(2 / len(rows[4][1]))
    # empty text: ratio divides by max(len,1), no NaN
    assert out[6].anomaly_ratio == 0.0 and out[6].keep
    # keep flag: clean docs keep=True, heavily corrupted keep=False
    assert out[1].keep and not out[2].keep


def test_dsir_importance_empty_target_floor(spark):
    """With an EMPTY target corpus every bucket scores the same alpha
    floor ln(alpha/(alpha*256)) - ln(p_raw(bucket)): finite, no crash,
    and docs over rarer buckets score HIGHER (nothing is target-like,
    only the raw-model term differentiates)."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        dsir_importance,
    )

    raw = spark.createDataFrame(
        [(1, "common common common"), (2, "common rare")],
        ["doc_id", "text"],
    )
    empty = raw.where("doc_id < 0")
    got = {
        r.doc_id: r.llr_avg for r in dsir_importance(raw, empty).collect()
    }
    want = _dsir_replica(
        ["common common common", "common rare"], []
    )
    assert abs(got[1] - want[0][1]) < 1e-9
    assert abs(got[2] - want[1][1]) < 1e-9
    assert all(v == v and abs(v) < 1e6 for v in got.values())  # finite


def test_encoding_anomalies_ratio_boundary(spark):
    """keep flips exactly at flag_ratio: 1 anomaly in a 1000-char doc
    (ratio == 0.001 == default flag_ratio) keeps; 1 in 999 drops."""
    from spark_iceberg_schema_evolution_spark.operators.text import (
        encoding_anomalies,
    )

    at = "x" * 999 + "�"      # len 1000, ratio exactly 0.001
    above = "x" * 998 + "�"   # len 999, ratio > 0.001
    out = {
        r.doc_id: r
        for r in encoding_anomalies(
            spark.createDataFrame(
                [(1, at), (2, above)], ["doc_id", "text"]
            )
        ).collect()
    }
    assert out[1].anomaly_ratio == 0.001 and out[1].keep
    assert not out[2].keep and out[2].is_suspect
