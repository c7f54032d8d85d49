"""Streaming curation pipeline (pipelines.curate_stream): the drained
stream equals the batch stage composition on the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def cfg(spark):
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.pipelines import CurationConfig

    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " ").alias(
            "text"
        )
    )
    return CurationConfig(
        min_tokens=5,
        max_dup_line_frac=0.3,
        max_top_ngram_char_frac=0.2,
        top_ngram_n=2,
        pii_policy="drop",
        benchmark=bench,
        contamination_ngram=5,
        sample_fraction=0.5,
        sample_salt=7,
        sample_method="md5",
    )


def test_curate_stream_equals_batch_stages(spark, cfg):
    """A single-batch drain of curate_stream must keep exactly the doc_ids
    the equivalent batch composition keeps (first-seen == min-id within
    one micro-batch, so even the dedup stage agrees)."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.sampling import hash_sample
    from kinesiscat_spark.pipelines import (
        curate_stream,
        decontaminate,
        exact_dedup,
        pii_gate,
        quality_gate,
        repetition_gate,
    )
    from kinesiscat_spark.streaming import run_to_memory
    from kinesiscat_spark.streaming.source import read_table_stream

    stream = read_table_stream(spark, SF_SMOKE, "documents")
    drained = run_to_memory(curate_stream(stream, cfg), output_mode="append")
    got = sorted(r.doc_id for r in drained.select("doc_id").collect())

    batch = load_table(spark, SF_SMOKE, "documents")
    b = quality_gate(batch, cfg)
    b = repetition_gate(b, cfg)
    b = pii_gate(b, cfg)
    b = decontaminate(b, cfg)
    b = exact_dedup(b, cfg)
    b = hash_sample(b, cfg.sample_fraction, ["doc_id"], cfg.sample_salt, method="md5")
    want = sorted(r.doc_id for r in b.select("doc_id").collect())

    assert got == want
    assert got  # non-vacuous: the gates keep a non-empty corpus


def test_scan_stage_decontamination_matches_report_form(spark, cfg):
    """The streaming-safe arrays_overlap decontamination drops exactly the
    documents the batch contamination_report form drops."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.curation import word_ngrams
    from kinesiscat_spark.pipelines import decontaminate, decontaminate_scan_stage

    docs = load_table(spark, SF_SMOKE, "documents")
    grams = [
        r.g
        for r in cfg.benchmark.select(
            F.explode(
                F.array_distinct(word_ngrams(F.col("text"), cfg.contamination_ngram))
            ).alias("g")
        )
        .distinct()
        .collect()
    ]
    scan = decontaminate_scan_stage(docs, grams, cfg.contamination_ngram)
    report = decontaminate(docs, cfg)
    assert sorted(r.doc_id for r in scan.select("doc_id").collect()) == sorted(
        r.doc_id for r in report.select("doc_id").collect()
    )


def test_curate_stream_classifier_stage(spark, tmp_path):
    """The classifier stage runs inside the streaming plan (literal
    weight array — no stream-static cross join) and keeps exactly the
    doc_ids the batch composition keeps — INCLUDING a NULL-text document
    (scores NULL → keep-on-null coalesce; VERDICT r6 #3 pinned the
    stream silently dropping what batch curate() keeps)."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.quality_classifier import (
        pareto_keep,
        score_documents_quality,
        train_quality_classifier,
    )
    from kinesiscat_spark.pipelines import (
        CurationConfig,
        curate_stream,
        exact_dedup,
        quality_gate,
    )
    from kinesiscat_spark.streaming import run_to_memory
    from kinesiscat_spark.streaming.source import read_table_stream

    batch = load_table(spark, SF_SMOKE, "documents")
    null_doc = batch.limit(1).select(
        *[
            F.lit(None).cast("string").alias(c)
            if c == "text"
            else (F.lit(-999).cast(dict(batch.dtypes)[c]).alias(c)
                  if c == "doc_id" else F.col(c))
            for c in batch.columns
        ]
    )
    # single FILE named documents.parquet (the stream source symlinks the
    # file path, not a directory tree)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(batch.unionByName(null_doc).toPandas()),
        str(tmp_path / "documents.parquet"),
    )
    aug = spark.read.parquet(str(tmp_path / "documents.parquet"))

    labeled = batch.select(
        "text", (F.col("lang") == "en").cast("int").alias("label")
    )
    model = train_quality_classifier(labeled, n_features=64, n_iter=5)
    # min_tokens=0 disables the length gate so the NULL-text doc reaches
    # the classifier stage in BOTH pipelines
    cfg = CurationConfig(min_tokens=0, quality_model=model, pareto_salt=11)

    stream = read_table_stream(spark, str(tmp_path), "documents")
    drained = run_to_memory(curate_stream(stream, cfg), output_mode="append")
    got = sorted(r.doc_id for r in drained.select("doc_id").collect())

    b = exact_dedup(quality_gate(aug, cfg), cfg)
    b = score_documents_quality(b, model, out_col="_q").filter(
        F.coalesce(
            pareto_keep(F.col("_q"), F.col("doc_id"), 9.0, 11), F.lit(True)
        )
    )
    want = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert -999 in want  # the NULL-text doc must reach and pass batch-side
    assert got == want  # ...and the stream must agree, NULL doc included
    assert 0 < len(got) < aug.count()


def test_curate_stream_bloom_path_equals_literal_path(spark, cfg):
    """The large-benchmark Bloom decontamination path (round 6) must keep
    EXACTLY the documents the literal arrays_overlap path keeps — Bloom
    has no false negatives and the survivors-only exact verify kills
    every false positive.  Forced via the pinned size switch
    (stream_bloom_gram_threshold=0 -> every benchmark takes the Bloom
    path; the default 10_000 keeps small benchmarks on the literal)."""
    import dataclasses

    from kinesiscat_spark.pipelines import curate_stream
    from kinesiscat_spark.streaming import run_to_memory
    from kinesiscat_spark.streaming.source import read_table_stream

    bloom_cfg = dataclasses.replace(cfg, stream_bloom_gram_threshold=0)

    stream = read_table_stream(spark, SF_SMOKE, "documents")
    got = sorted(
        r.doc_id
        for r in run_to_memory(
            curate_stream(stream, bloom_cfg), output_mode="append"
        ).select("doc_id").collect()
    )
    stream2 = read_table_stream(spark, SF_SMOKE, "documents")
    want = sorted(
        r.doc_id
        for r in run_to_memory(
            curate_stream(stream2, cfg), output_mode="append"
        ).select("doc_id").collect()
    )
    assert got == want
    assert got  # non-vacuous


def test_stream_bloom_switch_is_pinned(spark, cfg):
    """The size switch is plan-visible: below the threshold the streaming
    plan carries the arrays_overlap literal; above it (threshold=0) it
    carries the getbit Bloom probe and NO gram literal."""
    import dataclasses

    from kinesiscat_spark.pipelines import curate_stream
    from kinesiscat_spark.streaming.source import read_table_stream

    literal_plan = curate_stream(
        read_table_stream(spark, SF_SMOKE, "documents"), cfg
    )._jdf.queryExecution().analyzed().toString()
    assert "arrays_overlap" in literal_plan
    assert "getbit" not in literal_plan

    bloom_plan = curate_stream(
        read_table_stream(spark, SF_SMOKE, "documents"),
        dataclasses.replace(cfg, stream_bloom_gram_threshold=0),
    )._jdf.queryExecution().analyzed().toString()
    assert "getbit" in bloom_plan
    assert "arrays_overlap" not in bloom_plan
