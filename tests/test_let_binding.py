"""Pin the let-binding fix for HOF-lambda subexpression re-evaluation.

Catalyst re-evaluates a subexpression referenced inside a higher-order-
function lambda once per element (kinesiscat_spark/let.py). These tests pin the
STRUCTURE — the expensive defining expression appears exactly once in the
expression tree, with inner lambdas reading the bound NamedLambdaVariable
— and the SEMANTICS (values identical to a Python reference, including
NULL/empty edges).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesiscat_spark.operators.curation import (
    dup_ngram_char_frac,
    repetition_signals,
    top_ngram_char_frac,
    word_ngrams,
)
from kinesiscat_spark.let import let_
from kinesiscat_spark.operators.similarity import normalize


def _expr(col) -> str:
    # Column repr renders the full unresolved expression tree.
    return str(col)


def test_word_ngrams_splits_once(spark):
    # the text split must appear once (the let_ binding), not inside the
    # per-gram slice lambda
    assert _expr(word_ngrams(F.col("text"), 6)).count("split(") == 1


def test_repetition_signals_splits_once(spark):
    assert _expr(repetition_signals(F.col("text"))).count("split(") == 1


def test_signal_fracs_build_grams_once(spark):
    # gram construction (the array_join inside word_ngrams) appears once
    # per expression; _count_in then reads the bound gram array
    assert _expr(top_ngram_char_frac(F.col("text"), 2)).count("split(") == 1
    assert _expr(dup_ngram_char_frac(F.col("text"), 3)).count("split(") == 1


def test_normalize_folds_norm_once(spark):
    # l2_norm is an aggregate() fold; exactly one fold in the tree
    assert _expr(normalize(F.col("v"))).count("aggregate(") == 1


def test_quantize_codes_fold_amax_once(spark):
    from kinesiscat_spark.operators.quantize import quantize_embeddings

    df = spark.createDataFrame([Row(vec_id=1, embedding=[3.0, -4.0])])
    plan = quantize_embeddings(df)._jdf.queryExecution().analyzed().toString()
    # exactly 3 folds: the let-bound one feeding the codes transform plus
    # the two row-scalar uses in scale (condition + value) — NOT one per
    # vector element inside the codes lambda
    assert plan.count("array_max") == 3


def test_let_null_propagates(spark):
    row = spark.range(1).select(
        let_(F.lit(None).cast("string"), lambda s: F.length(s)).alias("a"),
        let_(F.lit("abc"), lambda s: F.length(s)).alias("b"),
    ).first()
    assert row.a is None and row.b == 3


@pytest.mark.parametrize(
    "text",
    [
        None,
        "",
        "   ",
        "one two",
        "a b c d e f g h",
        "dup dup dup dup dup dup dup",
        "x\ny\nx\ny\nz",
        "unicode éé 中文 éé tail words here now",
    ],
)
def test_word_ngrams_matches_python(spark, text):
    n = 3
    got = (
        spark.createDataFrame([Row(text=text)], "text string")
        .select(word_ngrams(F.col("text"), n).alias("g"))
        .first()
        .g
    )
    if text is None:
        # split(NULL) propagates, size(NULL) is -1 (non-ANSI), so the
        # when() falls to the empty-array branch — same as pre-let_
        assert got == []
        return
    ws = text.split()
    want = (
        [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        if len(ws) >= n
        else []
    )
    assert got == want


def test_repetition_signals_matches_python(spark):
    text = "a\nb\na\nccc\nb\na"
    got = (
        spark.createDataFrame([Row(text=text)])
        .select(repetition_signals(F.col("text")).alias("s"))
        .first()
        .s
    )
    lines = text.split("\n")
    distinct = list(dict.fromkeys(lines))
    assert got.n_lines == len(lines)
    assert got.dup_line_frac == pytest.approx(1 - len(distinct) / len(lines))
    total = sum(len(x) for x in lines)
    dup = sum((lines.count(d) - 1) * len(d) for d in distinct)
    assert got.dup_line_char_frac == pytest.approx(dup / total)


def test_normalize_matches_python(spark):
    got = (
        spark.createDataFrame([Row(v=[3.0, 4.0])])
        .select(normalize(F.col("v")).alias("n"))
        .first()
        .n
    )
    assert got == pytest.approx([0.6, 0.8])


def test_shingles_split_once(spark):
    from kinesiscat_spark.operators.dedup import shingles

    assert _expr(shingles(F.col("text"), 3)).count("split(") == 1


def test_winnow_kgrams_hashed_once(spark):
    from kinesiscat_spark.operators.text import winnow_fingerprints

    # kgram_hashes is one transform-with-md5 pass; the let_ binding keeps
    # it single even though the window zip reads w shifted slices
    assert _expr(winnow_fingerprints(F.col("text"))).count("md5(") == 1
