"""BPE training/encoding (operators/bpe.py) against a pure-Python replay
of the published algorithm (Sennrich et al. 2016, Algorithm 1), with the
same deterministic tie-break (count desc, then lexicographic pair)."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_vocab,
    merges_df,
    tokenize,
    train_bpe,
    word_frequencies,
)

from .conftest import SF_SMOKE


def _py_fold(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_train(word_freq: dict[str, int], n_merges: int, min_pair_count: int = 2):
    syms = {w: list(w) + [END_OF_WORD] for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        syms = {w: _py_fold(s, a, b) for w, s in syms.items()}
    return merges


def _py_encode(word: str, merges) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        syms = _py_fold(syms, a, b)
    return syms


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest new new newer",
    "the lowest of the low",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def _py_word_freq(texts) -> dict[str, int]:
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    return dict(wf)


def test_train_matches_reference_replay(spark, corpus_df):
    merges = train_bpe(corpus_df, n_merges=20)
    expect = _py_train(_py_word_freq(CORPUS), 20)
    assert merges == expect
    assert len(merges) > 5  # the corpus supports a real merge sequence


def test_train_on_documents_matches_replay(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(80).cache()
    merges = train_bpe(docs, n_merges=12)
    texts = [r.text or "" for r in docs.select("text").collect()]
    assert merges == _py_train(_py_word_freq(texts), 12)
    docs.unpersist()


def test_train_partition_invariant(spark, corpus_df):
    assert train_bpe(corpus_df.repartition(7), n_merges=10) == train_bpe(
        corpus_df.coalesce(1), n_merges=10
    )


def test_train_early_stop_on_hapax(spark):
    df = spark.createDataFrame([("each word appears once only",)], "text string")
    # every adjacency is unique → nothing reaches min_pair_count=2...
    merges = train_bpe(df, n_merges=50)
    expect = _py_train(_py_word_freq(["each word appears once only"]), 50)
    assert merges == expect
    # ...except pairs shared across words ('ea' in each/appears, 'on' ...)
    assert len(merges) < 50


def test_train_empty_corpus(spark):
    df = spark.createDataFrame([], "text string")
    assert train_bpe(df, n_merges=5) == []
    assert train_bpe(df.union(spark.sql("SELECT ''")), n_merges=5) == []


def test_encode_matches_replay_and_roundtrips(spark, corpus_df):
    merges = train_bpe(corpus_df, n_merges=15)
    rows = (
        corpus_df.select("text", bpe_encode(F.col("text"), merges).alias("toks"))
        .collect()
    )
    for r in rows:
        expect = [t for w in r.text.split() for t in _py_encode(w, merges)]
        assert r.toks == expect
        # lossless: stripping markers reconstructs the original words
        joined = "".join(r.toks).replace(END_OF_WORD, " ").split()
        assert joined == r.text.split()


def test_encode_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",), ("  ",)], "text string")
    rows = df.select(bpe_encode(F.col("text"), [("l", "o")]).alias("t")).collect()
    assert all(r.t == [] for r in rows)


def test_encode_unicode_codepoints(spark):
    df = spark.createDataFrame([("héllo 🎉🎉 héllo",)], "text string")
    merges = train_bpe(df, n_merges=8)
    [r] = df.select(bpe_encode(F.col("text"), merges).alias("t")).collect()
    expect = [t for w in "héllo 🎉🎉 héllo".split() for t in _py_encode(w, merges)]
    assert r.t == expect


def test_tokenize_counts_and_merges_df(spark, corpus_df):
    merges = train_bpe(corpus_df, n_merges=10)
    out = tokenize(corpus_df, merges).collect()
    assert all(r.n_bpe_tokens == len(r.bpe_tokens) for r in out)
    mdf = merges_df(spark, merges)
    assert [(r.left, r.right) for r in mdf.orderBy("rank").collect()] == merges
    assert bpe_vocab(merges) == [a + b for a, b in merges]


def test_train_degenerate_single_char_runs(spark):
    """Adversarial: a corpus of one repeated character exercises the
    self-overlapping pair (a,a) cascade — fold semantics (leftmost,
    non-overlapping, merged symbol re-usable as LEFT element) must match
    the replay at every rank."""
    df = spark.createDataFrame([("a " + "aaaa " * 6 + "aaaaaaaa",)], "text string")
    merges = train_bpe(df, n_merges=6)
    texts = ["a " + "aaaa " * 6 + "aaaaaaaa"]
    assert merges == _py_train(_py_word_freq(texts), 6)
    [r] = df.select(bpe_encode(F.col("text"), merges).alias("t")).collect()
    expect = [t for w in texts[0].split() for t in _py_encode(w, merges)]
    assert r.t == expect


def test_driver_trainer_matches_distributed_loop(spark, corpus_df):
    """Round 10: the vocabulary-bounded driver fast path of
    train_bpe_detailed must produce bit-identical merges (incl. counts)
    to the exact distributed loop it replaces for small vocabularies."""
    import kinesiscat_spark.operators.bpe as bpe

    fast = bpe.train_bpe_detailed(corpus_df, 8, min_pair_count=2)
    old = bpe._DRIVER_VOCAB_LIMIT
    try:
        bpe._DRIVER_VOCAB_LIMIT = 0  # force the distributed path
        slow = bpe.train_bpe_detailed(corpus_df, 8, min_pair_count=2)
    finally:
        bpe._DRIVER_VOCAB_LIMIT = old
    assert fast == slow


def test_driver_trainer_non_bmp_falls_back(spark):
    """Non-BMP words (Java regex splits UTF-16 code units, Python splits
    codepoints) must route to the distributed loop — and still train."""
    df = spark.createDataFrame([("🎉a 🎉a 🎉a bb bb",)], "text string")
    merges = train_bpe(df, n_merges=3)
    # the distributed loop's answer, independent of the fast path
    import kinesiscat_spark.operators.bpe as bpe

    old = bpe._DRIVER_VOCAB_LIMIT
    try:
        bpe._DRIVER_VOCAB_LIMIT = 0
        slow = bpe.train_bpe(df, n_merges=3)
    finally:
        bpe._DRIVER_VOCAB_LIMIT = old
    assert merges == slow
