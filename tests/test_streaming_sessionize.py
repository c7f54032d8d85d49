"""Streaming sessionization (streaming/stateful.py streaming_sessionize):
cross-micro-batch gap sessions must equal the batch lane's result minus
each user's last (still-open) session on an in-order drain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.queries.window_queries import (
    _SESSION_GAP_US,
    events_sessionization,
)
from kinesiscat_spark.streaming.source import StreamConfig, run_to_memory
from kinesiscat_spark.streaming.stateful import streaming_sessionize
from tests.conftest import SF_ORACLE


def _write_time_slices(ev, path: str, k: int) -> None:
    """k single-file time slices with ascending mtimes, so the file
    stream's (mtime, path) order replays events in event-time order."""
    rows = ev.orderBy("ts_us", "event_id").collect()
    per = (len(rows) + k - 1) // k
    spark = ev.sparkSession
    for i in range(k):
        chunk = rows[i * per : (i + 1) * per]
        sub = os.path.join(path, f"slice_{i:03d}")
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(os.path.join(root, f), (1_700_000_000 + i, 1_700_000_000 + i))


def test_streaming_sessions_equal_batch_minus_open(spark, tmp_path):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_time_slices(ev, src, 4)

    stream = spark.readStream.schema(
        "user_id long, ts_us long, event_id long"
    ).parquet(f"{src}/slice_*")
    out = run_to_memory(
        streaming_sessionize(stream, _SESSION_GAP_US),
        output_mode="append",
        cfg=StreamConfig(batch_size=1),
    )
    streamed = {
        (r.user_id, r.session_id, r.n_events, r.session_start_us, r.session_end_us)
        for r in out.collect()
    }

    batch = events_sessionization(spark, SF_ORACLE).filter(
        "kind = 'batch'"
    )
    w = Window.partitionBy("user_id")
    closed_batch = batch.withColumn(
        "_max_sid", F.max("session_id").over(w)
    ).filter(F.col("session_id") < F.col("_max_sid"))
    expected = {
        (r.user_id, r.session_id, r.n_events, r.session_start_us, r.session_end_us)
        for r in closed_batch.collect()
    }
    assert streamed == expected
    assert len(streamed) > 0


def test_streaming_sessionize_single_batch_no_emit_for_open(spark, tmp_path):
    """One user, one micro-batch, all events within the gap: nothing
    closes, nothing is emitted; state carries the open session."""
    rows = [(1, i * 1_000_000, i) for i in range(5)]  # 1s apart
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long")
    src = str(tmp_path / "one")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts_us long, event_id long"
    ).parquet(src)
    out = run_to_memory(
        streaming_sessionize(stream, gap_us=30 * 60 * 1_000_000),
        output_mode="append",
    )
    assert out.count() == 0
