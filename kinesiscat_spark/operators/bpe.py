"""Distributed byte-pair-encoding tokenizer: training and encoding.

BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units") learns a merge table by repeatedly fusing the
most frequent adjacent symbol pair across the corpus vocabulary.  The
layout here is Spark-first and sized for 100 TB:

- ``word_frequencies`` is the ONLY corpus-wide stage: one scan + one
  shuffle keyed on the word, partially aggregated map-side.  Everything
  after runs on the distinct-word table — |vocab| rows (~1e8 at web
  scale, i.e. 4-6 orders of magnitude smaller than the corpus).
- Each training iteration is (a) one pair-count aggregation over the
  word table (adjacent pairs come from a zip of shifted slices — no
  posexplode, no per-row Python), (b) a 1-row argmax collect (count
  desc, then lexicographic pair — a total order, so training is
  deterministic regardless of partitioning), and (c) a scan-stage
  rewrite of the symbol arrays via a left fold that only runs on words
  actually containing the pair.  ``localCheckpoint`` truncates the plan
  every iteration (the argmax already materializes the frame, so the
  checkpoint rides a job that must run anyway) — without it each
  iteration nests another fold into one ever-deeper expression tree.
- ``bpe_encode``/``tokenize`` is embarrassingly parallel: an
  Arrow-batched pandas UDF applying the learned ranks greedily per
  word, with a per-batch word cache — under a Zipfian corpus the hit
  rate is >99 %, so the per-word cost amortizes to a dict lookup.

The left fold merges occurrences leftmost-first without overlap —
exactly the reference algorithm's single left-to-right pass (a merged
symbol can immediately participate as the LEFT element of the next
match, e.g. pair (a,a) on "a a a a" → "aa aa", never "a aa a").
``tests/test_bpe.py`` pins training and encoding against a pure-Python
replay of the published algorithm.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from kinesiscat_spark.operators.curation import words

END_OF_WORD = "</w>"


# --- corpus → word frequencies ---------------------------------------------


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-wide pass."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def initial_symbols(word: Column) -> Column:
    """Character symbols plus the end-of-word marker as its own symbol."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


# --- training ---------------------------------------------------------------


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (zip of shifted slices
    — the same shape dedup.shingles uses; empty for 1-symbol arrays)."""
    n = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.arrays_zip(
        F.slice(syms, 1, n).alias("a"), F.slice(syms, 2, n).alias("b")
    )


def pair_counts(word_syms: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair frequencies weighted by word freq.
    One aggregation; the explode happens after the slice-zip so each
    word contributes len-1 narrow rows, combined map-side."""
    return (
        word_syms.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Left fold replacing every leftmost non-overlapping (a, b) adjacency
    with the fused symbol.  CASE branches short-circuit, so the
    element_at(acc, -1) probe never runs on an empty accumulator (ANSI
    mode would throw)."""
    fused = a + b
    fold = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x))
        .when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
            ),
        )
        .otherwise(F.concat(acc, F.array(x))),
    )
    has_pair = F.exists(
        _adjacent_pairs(syms),
        lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)),
    )
    return F.when(has_pair, fold).otherwise(syms)


# The driver-side trainer fast path engages when the DISTINCT-WORD table
# fits comfortably on the driver (it is vocabulary-bounded, not corpus-
# bounded — the same guarded-collect discipline as clusters.py's
# union-find). 2M (word, freq) rows is tens of MB; past that the exact
# distributed loop below takes over.
_DRIVER_VOCAB_LIMIT = 2_000_000


def _train_bpe_driver(
    rows: list, n_merges: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Pure-Python twin of the distributed merge loop over collected
    (word, freq) rows: same pair counting (freq-weighted adjacent
    pairs), same (cnt DESC, a ASC, b ASC) selection, same leftmost-
    non-overlapping merge fold — bit-identical merges by construction
    (pinned differentially in tests/test_bpe.py)."""
    word_syms: list[tuple[int, list[str]]] = [
        (r.freq, list(r.word) + [END_OF_WORD]) for r in rows
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for freq, syms in word_syms:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        fused = a + b
        for w, (freq, syms) in enumerate(word_syms):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = fused
                else:
                    out.append(s)
            word_syms[w] = (freq, out)
    return merges


def train_bpe_detailed(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    (left, right, count) in rank order.  Stops early when no pair
    reaches ``min_pair_count`` (merging hapax adjacencies memorizes the
    corpus — the reference algorithm's stopping rule).

    Ties break lexicographically on (a, b) — a total order, so the
    result is independent of partitioning and cluster size.

    Round 10 (guide §1.2 — the distributed algorithm first): the corpus-
    wide work is ONE word-frequency aggregation. The merge loop runs
    over the DISTINCT-WORD table, which is vocabulary-bounded; when that
    table fits on the driver (≤ ``_DRIVER_VOCAB_LIMIT`` rows, every word
    BMP-only so Java's and Python's per-character splits agree) the loop
    runs in pure Python on the collected rows — the distributed loop
    paid ~2 fixed-latency Spark jobs per merge for kilobytes of actual
    work. Oversized or non-BMP vocabularies take the exact distributed
    loop below; both paths produce identical merges (differential test
    in tests/test_bpe.py).
    """
    wf = word_frequencies(docs, text_col)
    rows = wf.limit(_DRIVER_VOCAB_LIMIT + 1).collect()
    if len(rows) <= _DRIVER_VOCAB_LIMIT and all(
        ord(c) <= 0xFFFF for r in rows for c in r.word
    ):
        return _train_bpe_driver(rows, n_merges, min_pair_count)

    word_syms = wf.select(
        "freq", initial_symbols(F.col("word")).alias("syms")
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        word_syms = word_syms.localCheckpoint(eager=False)
        best = (
            pair_counts(word_syms)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0].cnt < min_pair_count:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b, best[0].cnt))
        word_syms = word_syms.select(
            "freq", _merge_pair(F.col("syms"), a, b).alias("syms")
        )
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The merge table alone — see :func:`train_bpe_detailed`."""
    return [
        (a, b)
        for a, b, _ in train_bpe_detailed(docs, n_merges, text_col, min_pair_count)
    ]


def merges_df(spark: SparkSession, merges: Sequence[tuple[str, str]]) -> DataFrame:
    """The learned merge table as (rank, left, right) rows."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def bpe_vocab(merges: Iterable[tuple[str, str]]) -> list[str]:
    """Merged symbols in rank order (the learned subword units; base
    characters are open-vocabulary and need no table)."""
    return [a + b for a, b in merges]


# --- encoding ---------------------------------------------------------------


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy reference encoder: repeatedly merge the lowest-rank adjacent
    pair (leftmost-first within a rank via the same left fold) until no
    learned pair remains — equivalent to applying the merge table in
    rank order."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            break
        a, b = min(ranked, key=ranks.__getitem__)
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    col: Column, merges: Sequence[tuple[str, str]]
) -> Column:
    """array<string> of BPE tokens for a whitespace-tokenized text column.

    Arrow-batched pandas UDF; the merge table rides the closure (small —
    vocab-sized) and a per-batch word cache makes the amortized per-word
    cost a dict hit on Zipfian text.  Null text encodes to the empty
    token array, matching ``words(NULL)``.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split():
                if w not in cache:
                    cache[w] = _encode_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(enc)

    return encode(col)


def tokenize(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append the BPE token array and its length — the real token counter
    behind packing/token-budget sampling once a merge table exists."""
    return docs.withColumn(out_col, bpe_encode(F.col(text_col), merges)).withColumn(
        f"n_{out_col}", F.size(F.col(out_col)).cast("long")
    )
