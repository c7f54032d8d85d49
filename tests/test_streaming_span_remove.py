"""Streaming first-seen window removal: cross-batch state, and exact
equality with the batch operator when the stream arrives in id order."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kinesiscat_spark.queries.stream_queries import run_to_memory
from kinesiscat_spark.streaming.source import StreamConfig


def test_streaming_span_removal_matches_batch(spark, tmp_path):
    from kinesiscat_spark.operators.curation import remove_duplicate_spans
    from kinesiscat_spark.streaming.stateful import (
        streaming_remove_duplicate_spans,
    )

    src = str(tmp_path / "docsrc")
    clock = [1_700_000_000]

    def write_file(rows):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        clock[0] += 10
        # touch only the NEW files: a shared mtime would leave micro-batch
        # order to the (random-uuid) file names
        for p in set(glob.glob(os.path.join(src, "*.parquet"))) - before:
            os.utime(p, (clock[0], clock[0]))

    # w=2 windows; repeats within a batch, across batches, and a tail
    rows1 = [(0, "a b c d e f"), (1, "a b x y")]          # [a b] dup in-batch
    rows2 = [(2, "c d e f q"), (3, "x y a b q")]          # cross-batch dups
    write_file(rows1)
    write_file(rows2)

    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_to_memory(
        streaming_remove_duplicate_spans(raw, w=2),
        output_mode="append",
        cfg=StreamConfig(batch_size=1),
    )
    stream_removed = {(r.id, r.win_idx) for r in out.collect()}
    stream_tokens = {}
    for r in out.collect():
        stream_tokens[r.id] = stream_tokens.get(r.id, 0) + r.win_len

    batch = remove_duplicate_spans(
        spark.createDataFrame(rows1 + rows2, "doc_id long, text string"), w=2
    )
    batch_tokens = {r.id: r.n_removed for r in batch.collect() if r.n_removed}
    assert stream_tokens == batch_tokens

    # the id-ordered stream reproduces the batch decisions exactly:
    # doc 0 keeps everything; doc 1 loses [a b]; doc 2 loses [c d],[e f]
    # but keeps tail [q] (first); doc 3 loses [x y],[a b] and tail [q]
    assert stream_removed == {(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2)}


def test_streaming_span_removal_string_ids(spark, tmp_path):
    """The output schema derives the id type from the input — string/UUID
    document ids must stream without Arrow schema mismatches."""
    from kinesiscat_spark.streaming.stateful import (
        streaming_remove_duplicate_spans,
    )

    src = str(tmp_path / "docsrc")
    spark.createDataFrame(
        [("doc-a", "a b c d"), ("doc-b", "a b q r")],
        "doc_id string, text string",
    ).coalesce(1).write.parquet(src)
    raw = spark.readStream.schema("doc_id string, text string").parquet(src)
    out = run_to_memory(
        streaming_remove_duplicate_spans(raw, w=2), output_mode="append"
    )
    removed = {(r.id, r.win_idx) for r in out.collect()}
    assert removed == {("doc-b", 0)}  # [a b] first seen in doc-a
