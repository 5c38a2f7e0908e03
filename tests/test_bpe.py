"""BPE learn/encode property gates.

The distributed learner must EXACTLY match a pure-python reference BPE
(Sennrich-style merge loop over word counts, same deterministic
tiebreak), and encoding must be a lossless segmentation: concatenating
a word's tokens reproduces the word (+ marker).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.operators.bpe import (
    BpeMerge,
    bpe_encode,
    bpe_learn,
    encode_word,
    merges_to_df,
    word_counts,
)

SF = "/root/testdata/sf0.001"
MARKER = "</w>"


def ref_bpe(word_n: dict[str, int], num_merges: int, min_pair_count: int):
    """Pure-python reference learner: max pair count, ties broken on the
    lexicographically smallest (left, right) — the learner's contract."""
    vocab = {w: tuple(list(w) + [MARKER]) for w in word_n}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            n = word_n[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < min_pair_count:
            break
        left, right = min(p for p, c in pairs.items() if c == best_n)
        merges.append((rank, left, right, best_n))
        for w, syms in list(vocab.items()):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = tuple(out)
    return merges


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bpe_learner_matches_reference_exactly(spark):
    docs = _docs(spark).limit(120)
    wc = {
        r["word"]: r["n"] for r in word_counts(docs, "text").collect()
    }
    got = bpe_learn(docs, "text", num_merges=40, min_pair_count=2)
    want = ref_bpe(wc, num_merges=40, min_pair_count=2)
    assert [(m.rank, m.left, m.right, m.pair_n) for m in got] == want
    # merges must be genuinely learned, not a degenerate early stop
    assert len(got) == 40


def test_bpe_min_pair_count_stops_early(spark):
    docs = _docs(spark).limit(30)
    wc = {
        r["word"]: r["n"] for r in word_counts(docs, "text").collect()
    }
    floor = 500  # far above any pair count in 30 docs
    got = bpe_learn(docs, "text", num_merges=20, min_pair_count=floor)
    want = ref_bpe(wc, num_merges=20, min_pair_count=floor)
    assert [(m.rank, m.left, m.right, m.pair_n) for m in got] == want
    assert len(got) < 20


def test_bpe_encode_lossless_and_word_python_agree(spark):
    docs = _docs(spark).limit(80).cache()
    merges = bpe_learn(docs, "text", num_merges=30)
    enc = bpe_encode(docs, merges, "text", "doc_id")
    rows = enc.select("doc_id", "text", "bpe_tokens").collect()
    assert len(rows) == 80
    ranked = [(m.left, m.right) for m in merges]
    for r in rows:
        words = [w for w in r["text"].strip().lower().split() if w]
        # lossless segmentation: tokens concat back to word + marker
        want_tokens = [
            t for w in words for t in encode_word(w, ranked, MARKER)
        ]
        assert r["bpe_tokens"] == want_tokens
        assert "".join(r["bpe_tokens"]) == "".join(
            w + MARKER for w in words
        )
    docs.unpersist()


def test_bpe_encode_uses_merges(spark):
    # at least one multi-char token must appear once merges are applied
    docs = _docs(spark).limit(80)
    merges = bpe_learn(docs, "text", num_merges=30)
    assert merges, "corpus should yield merges"
    enc = bpe_encode(docs, merges, "text", "doc_id")
    n_multi = enc.select(
        F.explode("bpe_tokens").alias("t")
    ).where(
        (F.length("t") > 1) & (F.col("t") != MARKER)
    ).count()
    assert n_multi > 0


def test_merges_to_df_roundtrip(spark):
    merges = [BpeMerge(0, "t", "h", 10), BpeMerge(1, "th", "e</w>", 7)]
    df = merges_to_df(spark, merges)
    rows = df.orderBy("rank").collect()
    assert [(r["rank"], r["left"], r["right"], r["merged"], r["pair_n"])
            for r in rows] == [
        (0, "t", "h", "th", 10),
        (1, "th", "e</w>", "the</w>", 7),
    ]


def test_bpe_batched_counts_exact_sequential_replay(spark):
    """Disjoint-batch learning contract: merging (a,b) only perturbs
    adjacent pairs containing a, b, or ab, so the counts recorded for
    a batch's OTHER (symbol-disjoint) members are still exact. Replay
    the learned merge list sequentially in pure python and check every
    recorded pair_n equals the live count at its application point —
    true for every merge in every batch iff the disjointness argument
    holds."""
    docs = _docs(spark).limit(120)
    wc = {
        r["word"]: r["n"] for r in word_counts(docs, "text").collect()
    }
    got = bpe_learn(docs, "text", num_merges=40, batch_size=8)
    assert len(got) == 40
    vocab = {w: tuple(list(w) + [MARKER]) for w in wc}
    for m in got:
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        assert pairs[(m.left, m.right)] == m.pair_n, (m.rank, m.left, m.right)
        for w, syms in list(vocab.items()):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == m.left and x == m.right:
                    out[-1] = m.left + m.right
                else:
                    out.append(x)
            vocab[w] = tuple(out)
    # batching must share the TOP of the table with textbook: the first
    # scan's argmax is identical by construction, and the high-count
    # head overlaps; the tail legitimately diverges (textbook's later
    # picks depend on symbols batching hasn't built yet)
    textbook = bpe_learn(docs, "text", num_merges=40, batch_size=1)
    assert (got[0].left, got[0].right) == (
        textbook[0].left, textbook[0].right,
    )
    overlap = {(m.left, m.right) for m in got} & {
        (m.left, m.right) for m in textbook
    }
    assert len(overlap) >= 10

    import pytest as _p
    with _p.raises(ValueError):
        bpe_learn(docs, "text", num_merges=10, batch_size=0)
