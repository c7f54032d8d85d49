"""DSIR-style importance resampling (operators/sampling.py dsir_resample):
selection bias toward target-like documents, determinism under
partitioning, and the TakeOrdered (no-global-sort) plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kinesiscat_spark.operators.sampling import dsir_resample

TARGET_VOCAB = ["spark", "query", "join", "shuffle", "column", "table"]
JUNK_VOCAB = ["zz", "qq", "ww", "xx", "yy", "vv"]


def _mk_docs(rng, vocab, ids):
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 16))))
        for i in ids
    ]


def test_dsir_prefers_target_like_documents(spark):
    rng = random.Random(7)
    target = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB, range(1000, 1040)), "doc_id long, text string"
    )
    # raw: 30 target-like + 30 junk docs
    raw_rows = _mk_docs(rng, TARGET_VOCAB, range(0, 30)) + _mk_docs(
        rng, JUNK_VOCAB, range(30, 60)
    )
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    kept = dsir_resample(raw, target, n_keep=20)
    rows = kept.collect()
    assert len(rows) == 20
    target_like = sum(1 for r in rows if r.id < 30)
    # weight-proportional sampling must overrepresent target-like docs
    # massively here: junk tokens never appear in the target model, so
    # their importance weights are orders of magnitude smaller
    assert target_like >= 18, target_like
    # log_w sign sanity: target-like docs score higher than junk
    by_id = {r.id: r.log_w for r in rows}
    if any(i >= 30 for i in by_id):
        assert min(v for i, v in by_id.items() if i < 30) > max(
            v for i, v in by_id.items() if i >= 30
        )


def test_dsir_deterministic_and_salt_varies(spark):
    rng = random.Random(11)
    target = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB, range(1000, 1020)), "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB + JUNK_VOCAB, range(0, 50)),
        "doc_id long, text string",
    )
    a = {r.id for r in dsir_resample(raw, target, 15, salt=1).collect()}
    b = {
        r.id
        for r in dsir_resample(
            raw.repartition(13), target, 15, salt=1
        ).collect()
    }
    assert a == b  # partitioning never changes the selection
    c = {r.id for r in dsir_resample(raw, target, 15, salt=2).collect()}
    assert a != c  # a different salt draws a different sample


def test_dsir_topk_is_take_ordered_not_global_sort(spark):
    rng = random.Random(3)
    target = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB, range(1000, 1010)), "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB, range(0, 20)), "doc_id long, text string"
    )
    plan = (
        dsir_resample(raw, target, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dsir_keeps_empty_docs_selectable(spark):
    """Token-less documents carry log_w = 0 (an empty product — weight 1)
    and stay selectable, so n_keep is honored whenever the corpus is
    large enough."""
    rng = random.Random(5)
    target = spark.createDataFrame(
        _mk_docs(rng, TARGET_VOCAB, range(1000, 1010)), "doc_id long, text string"
    )
    raw_rows = _mk_docs(rng, TARGET_VOCAB, range(0, 8)) + [
        (8, ""),
        (9, None),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    kept = dsir_resample(raw, target, n_keep=10).collect()
    assert len(kept) == 10
    by_id = {r.id: (r.n_tokens, r.log_w) for r in kept}
    # "" splits to one empty-string token (the unigram_model tokenizer's
    # semantics — scoring must match training); NULL text has NO tokens
    # and takes the empty-product log_w = 0 path
    assert by_id[8][0] == 1
    assert by_id[9] == (0, 0.0)
