"""Distributed BPE tokenizer-vocabulary induction and encoding.

The missing piece between the corpus ops (dedup, quality, mixing) and
model training: LEARN a byte-pair-encoding merge table from the corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the frequency-driven merge loop every GPT/Llama-style
tokenizer descends from), then ENCODE the corpus with it.

Spark-first shape, and why it scales to 100 TB:

* The ONLY corpus-sized pass is the word-count aggregation (explode
  whitespace tokens -> one hash aggregate). Everything after operates
  on the distinct-word vocabulary, which Heaps' law keeps orders of
  magnitude smaller than the corpus (~millions of rows at 100 TB — a
  comfortably distributed frame, but not a 100 TB one).
* Each merge iteration is one explode+sum over the vocabulary frame
  plus a single-ROW argmax collect (bounded planning metadata, not a
  data collect). The merge itself is a pure-JVM ``aggregate`` left-fold
  over the symbol arrays — no UDF in the loop.
* Lineage is truncated with ``localCheckpoint`` per iteration, the
  same discipline as the connected-components fixpoint in
  ``dedup.dedup_clusters``; without it the plan nests K aggregate
  expressions deep and the optimizer chokes long before the executor.
* Encoding pays the per-word Python cost ONCE PER DISTINCT WORD, never
  per token: distinct words are encoded with an Arrow-batched pandas
  UDF (greedy merge application is inherently iterative — there is no
  built-in expression for it), then the corpus is re-tokenized by a
  word -> token-array JOIN (vocabulary side is Heaps-small; the
  planner broadcasts it when it fits). Real pipelines swap the pandas
  UDF for a native tokenizer; the Spark plumbing — schema, join shape,
  reassembly — is identical.

Reference parity: the reference engine (C++/Rust tokenizer loops) has
no distributed analog; this module is a capability extension over
`/root/reference` (see SURVEY.md §2.B).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via module globals)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGE_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_n", LongType(), False),
    ]
)


@dataclass(frozen=True)
class BpeMerge:
    rank: int
    left: str
    right: str
    pair_n: int

    @property
    def merged(self) -> str:
        return self.left + self.right


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-cased whitespace word counts: ``(word, n)``. The one
    corpus-sized aggregation in the BPE pipeline."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.select(F.explode(words).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: F.Column, marker: str) -> F.Column:
    # split on the zero-width boundary after every char; Spark keeps
    # the trailing empty match (limit -1 semantics), so drop empties.
    chars = F.filter(
        F.split(word, r"(?!^)"), lambda x: F.length(x) > 0
    )
    if marker:
        return F.concat(chars, F.array(F.lit(marker)))
    return chars


def _apply_merge_col(syms: F.Column, left: str, right: str) -> F.Column:
    """Pure-JVM leftmost-first single-merge pass: fold the symbol array,
    gluing every adjacent (left, right) into left+right. Literals are
    bound through the Python lambda API (never string-formatted into
    SQL — symbols are corpus bytes and may contain quotes)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    marker: str = "</w>",
    counts: DataFrame | None = None,
) -> list[BpeMerge]:
    """Learn up to ``num_merges`` BPE merges from the corpus (or from a
    precomputed ``word_counts`` frame). Deterministic: ties on pair
    count break on the lexicographically smallest (left, right).

    Returns the merge table as a driver-side list — it IS planning
    metadata (a tokenizer vocabulary, ~10k-100k rows in production,
    bounded by ``num_merges`` here), the same bounded-collect class as
    the ANN codebook fits in ``similarity.py``. Use
    :func:`merges_to_df` to persist it as a lakehouse table.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1: {num_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1: {min_pair_count}")
    wc = counts if counts is not None else word_counts(df, text_col)
    vocab = wc.select(
        _initial_symbols(F.col("word"), marker).alias("syms"),
        F.col("n").cast("long").alias("n"),
    ).localCheckpoint(eager=True)

    adjacent = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(element_at(syms, i) AS l, "
            "element_at(syms, i + 1) AS r))"
        ),
    ).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )

    merges: list[BpeMerge] = []
    for rank in range(num_merges):
        best = (
            vocab.select(F.explode(adjacent).alias("p"), "n")
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("pn"))
            .orderBy(F.desc("pn"), "l", "r")
            .first()
        )
        if best is None or best["pn"] < min_pair_count:
            break
        merges.append(BpeMerge(rank, best["l"], best["r"], best["pn"]))
        nxt = vocab.select(
            _apply_merge_col(F.col("syms"), best["l"], best["r"]).alias(
                "syms"
            ),
            "n",
        ).localCheckpoint(eager=True)
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def merges_to_df(spark: SparkSession, merges: list[BpeMerge]) -> DataFrame:
    """Merge table as a DataFrame (persistable as a lakehouse table)."""
    rows = [
        (m.rank, m.left, m.right, m.merged, int(m.pair_n)) for m in merges
    ]
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def encode_word(word: str, merges: list[tuple[str, str]], marker: str) -> list[str]:
    """Reference single-word encoder: apply merges in rank order, each
    as the same leftmost-first fold the learner uses. Shared by the
    pandas-UDF path and the pure-python property oracle in tests."""
    syms = list(word)
    if marker:
        syms.append(marker)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[BpeMerge],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    marker: str = "</w>",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table. Python cost is
    O(distinct words), not O(corpus): distinct words are encoded with
    an Arrow-batched pandas UDF, then joined back onto the exploded
    corpus and reassembled in document order. Two keyed shuffles (word
    join + doc-id reassembly); the word->tokens side is Heaps-small so
    the planner broadcasts it at corpus scale."""
    from pyspark.sql.functions import pandas_udf

    ranked = [(m.left, m.right) for m in sorted(merges, key=lambda m: m.rank)]

    @pandas_udf(ArrayType(StringType()))
    def encode_batch(words: pd.Series) -> pd.Series:
        return words.map(lambda w: encode_word(w, ranked, marker))

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    positioned = df.select(
        F.col(id_col), F.posexplode(words).alias("pos", "word")
    ).where(F.length("word") > 0)
    word_tokens = (
        positioned.select("word")
        .distinct()
        .select("word", encode_batch("word").alias("__toks"))
    )
    assembled = (
        positioned.join(word_tokens, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "__toks"))
                ).getField("__toks")
            ).alias(out_col)
        )
    )
    return df.join(assembled, id_col, "left").withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast("array<string>")),
    )
