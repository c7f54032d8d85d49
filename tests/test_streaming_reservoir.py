"""Streaming A-ES reservoir: admitted rows stream out append-mode across
micro-batches; the top-k over everything emitted must equal the batch
``weighted_reservoir_sample`` exactly (same key column, same tie-break)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kinesiscat_spark.operators.sampling import weighted_reservoir_sample
from kinesiscat_spark.streaming.source import StreamConfig, run_to_memory
from kinesiscat_spark.streaming.stateful import streaming_reservoir


def _rows():
    # 40 rows over 4 files; weights vary so admission order is nontrivial
    return [(i, (i * 7) % 13 + 1) for i in range(40)] + [(98, 0)]


def _write_files(spark, src, rows, n_files=4):
    clock = [1_700_000_000]
    per = (len(rows) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = rows[f * per:(f + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(
            chunk, "doc_id long, w long"
        ).coalesce(1).write.mode("append").parquet(src)
        clock[0] += 10
        for p in glob.glob(os.path.join(src, "*.parquet")):
            os.utime(p, (clock[0], clock[0]))


def test_streaming_reservoir_topk_equals_batch(spark, tmp_path):
    src = str(tmp_path / "resv_src")
    rows = _rows()
    _write_files(spark, src, rows)

    raw = (
        spark.readStream.schema("doc_id long, w long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_to_memory(
        streaming_reservoir(raw, k=8, weight_col="w", salt=5, n_shards=4),
        output_mode="append",
        cfg=StreamConfig(batch_size=1),
    )
    emitted = out.collect()
    # every batch-reservoir row was admitted at arrival (monotone shard
    # thresholds): top-k over the emitted superset IS the reservoir
    stream_top = [
        (r.id, r.weight, r.key)
        for r in out.orderBy(F.desc("key"), F.asc("id")).limit(8).collect()
    ]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    batch = [
        (r.id, r.weight, r.key)
        for r in weighted_reservoir_sample(
            docs, 8, "w", salt=5, method="md5"
        ).collect()
    ]
    assert sorted(stream_top) == sorted(batch)
    # superset is bounded: at most one admission per (shard, arrival)
    assert 8 <= len(emitted) <= len(rows)
    assert not any(r.id == 98 for r in emitted)  # w=0 never enters


def test_streaming_reservoir_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "doc_id long, w long")
    with pytest.raises(ValueError):
        streaming_reservoir(df, k=0, weight_col="w")
    with pytest.raises(ValueError):
        streaming_reservoir(df, k=4, weight_col="w", n_shards=0)
