"""Incremental cross-snapshot dedup (operators/dedup.py dedup_against):
exact digest anti-join, asymmetric minhash near stage, signature-collapse
losslessness, partition invariance."""

from __future__ import annotations

from kinesiscat_spark.operators.dedup import dedup_against

SCHEMA = "doc_id long, text string"

_BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind distant purple mountains tonight"
)
_NEAR = _BASE.replace("lazy", "sleepy")  # one-token edit: high jaccard
_OTHER = (
    "completely different content about database engines and shuffle "
    "partitioning strategies for petabyte scale analytical workloads"
)


def test_exact_stage_drops_only_exact(spark):
    corpus = spark.createDataFrame([(1, _BASE), (2, _OTHER)], SCHEMA)
    new = spark.createDataFrame(
        [(10, _BASE), (11, _NEAR), (12, "brand new text entirely")], SCHEMA
    )
    out = sorted(r.doc_id for r in dedup_against(new, corpus).collect())
    assert out == [11, 12]  # exact copy dropped, near-dup kept


def test_near_stage_drops_near_duplicates(spark):
    corpus = spark.createDataFrame([(1, _BASE), (2, _OTHER)], SCHEMA)
    new = spark.createDataFrame(
        [(10, _BASE), (11, _NEAR), (12, "brand new text entirely")], SCHEMA
    )
    out = sorted(
        r.doc_id
        for r in dedup_against(new, corpus, near_threshold=0.5).collect()
    )
    assert out == [12]


def test_corpus_duplication_is_irrelevant(spark):
    """A corpus with the same text duplicated 50x must behave exactly
    like a single copy (digest distinct + signature collapse)."""
    corpus = spark.createDataFrame(
        [(i, _BASE) for i in range(50)] + [(100, _OTHER)], SCHEMA
    )
    new = spark.createDataFrame([(10, _NEAR), (11, "fresh text")], SCHEMA)
    got = sorted(
        r.doc_id
        for r in dedup_against(new, corpus, near_threshold=0.5).collect()
    )
    one = spark.createDataFrame([(1, _BASE), (100, _OTHER)], SCHEMA)
    want = sorted(
        r.doc_id for r in dedup_against(new, one, near_threshold=0.5).collect()
    )
    assert got == want == [11]


def test_empty_corpus_keeps_everything(spark):
    corpus = spark.createDataFrame([], SCHEMA)
    new = spark.createDataFrame([(10, _BASE), (11, _NEAR)], SCHEMA)
    assert dedup_against(new, corpus, near_threshold=0.5).count() == 2


def test_schema_and_columns_preserved(spark):
    corpus = spark.createDataFrame([(1, _BASE)], SCHEMA)
    new = spark.createDataFrame(
        [(10, _OTHER, "en")], "doc_id long, text string, lang string"
    )
    out = dedup_against(new, corpus, near_threshold=0.5)
    assert out.columns == ["doc_id", "text", "lang"]
    assert out.count() == 1


def test_partition_invariance(spark):
    corpus = spark.createDataFrame(
        [(i, f"{_BASE} tail{i}") for i in range(20)], SCHEMA
    )
    new = spark.createDataFrame(
        [(100 + i, f"{_BASE} tail{i} extra") for i in range(20)]
        + [(500, _OTHER)],
        SCHEMA,
    )
    a = sorted(
        r.doc_id
        for r in dedup_against(new, corpus, near_threshold=0.5).collect()
    )
    b = sorted(
        r.doc_id
        for r in dedup_against(
            new.repartition(13), corpus.repartition(7), near_threshold=0.5
        ).collect()
    )
    assert a == b
