"""The optional ExactSubstr-style span-removal stage of curate():
differential against applying the standalone operator to the pipeline's
own pre-stage output, audit counts, and the default-off contract."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.curation import remove_duplicate_spans
from kinesiscat_spark.pipelines import CurationConfig, curate
from tests.conftest import SF_ORACLE

BASE = CurationConfig(
    min_tokens=5,
    near_dup_threshold=0.5,
    sample_fraction=1.0,
)


def test_span_removal_stage_equals_operator_on_prestage_output(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    pre = curate(docs, BASE)
    cleaned = remove_duplicate_spans(pre, w=6)
    expected = {(r.id, r.clean_text) for r in cleaned.collect()}

    got_df = curate(docs, replace(BASE, span_removal_w=6))
    got = {(r.doc_id, r.text) for r in got_df.collect()}
    assert got == expected
    # non-text columns survive the rewrite join
    assert set(got_df.columns) == set(pre.columns)
    # and the stage actually removed something on this corpus
    assert sum(r.n_removed for r in cleaned.collect()) > 0


def test_span_removal_stage_audit_and_default_off(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    counts: dict = {}
    out = curate(docs, replace(BASE, span_removal_w=6, stage_counts=counts))
    n = out.count()
    # removal rewrites text, never drops documents
    assert counts["span_removal"] == counts["near_dedup"] == n
    # default-off: no stage recorded, plans identical to the base config
    counts2: dict = {}
    curate(docs, replace(BASE, stage_counts=counts2)).count()
    assert "span_removal" not in counts2


def test_span_removal_stage_preserves_untouched_text(spark):
    """Documents with nothing removed keep their ORIGINAL bytes — the
    token-rebuilt form (whitespace collapsed) only replaces documents
    that actually lost a span."""
    from kinesiscat_spark.pipelines import span_removal

    docs = spark.createDataFrame(
        [
            (0, "line1\nline2\t end"),              # unique → untouched
            (1, "a b c d e f a b c d e f"),         # internal dup, rewritten
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in span_removal(docs, replace(BASE, span_removal_w=2)).collect()
    }
    assert out[0] == "line1\nline2\t end"
    assert out[1] == "a b c d e f"
