"""Streaming funnel (streaming/stateful.py streaming_funnel): the
cross-micro-batch completions must equal the batch operator's completed
rows (reached == n_steps) on an in-order drain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.funnel import funnel_report
from kinesiscat_spark.queries.window_queries import (
    _FUNNEL_HORIZON_US,
    _FUNNEL_STEPS,
)
from kinesiscat_spark.streaming.source import run_to_memory
from kinesiscat_spark.streaming.stateful import streaming_funnel
from tests.conftest import SF_ORACLE


def _slices(ev, path: str, k: int) -> None:
    rows = ev.orderBy("ts_us", "event_id").collect()
    per = (len(rows) + k - 1) // k
    spark = ev.sparkSession
    for i in range(k):
        chunk = rows[i * per : (i + 1) * per]
        sub = os.path.join(path, f"slice_{i:03d}")
        spark.createDataFrame(
            chunk, "event_id long, ts_us long, user_id long, event_type string"
        ).repartition(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )


def test_streaming_funnel_equals_batch_completions(spark, tmp_path):
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
    )
    src = str(tmp_path / "src")
    _slices(ev, src, 4)
    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/slice_*")
    )
    drained = run_to_memory(
        streaming_funnel(stream, _FUNNEL_STEPS, _FUNNEL_HORIZON_US),
        output_mode="append",
    )
    got = {
        r.user_id: (r.t0_us, r.t_end_us, r.completed)
        for r in drained.collect()
    }
    batch = funnel_report(
        load_table(spark, SF_ORACLE, "events"),
        _FUNNEL_STEPS,
        _FUNNEL_HORIZON_US,
    )
    want = {
        r.user_id: (r.t0_us, r.t_end_us, r.completed)
        for r in batch.filter(F.col("reached") == len(_FUNNEL_STEPS)).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_funnel_cross_batch_progression(spark, tmp_path):
    """A funnel whose steps arrive in DIFFERENT micro-batches completes;
    one event per file forces true cross-batch state transitions."""
    rows = [
        (1, 10_000_000, 7, "view"),
        (2, 20_000_000, 7, "click"),
        (3, 30_000_000, 7, "purchase"),
        (4, 40_000_000, 8, "view"),  # user 8 never progresses
    ]
    src = str(tmp_path / "src")
    for i, r in enumerate(rows):
        sub = os.path.join(src, f"slice_{i:03d}")
        spark.createDataFrame(
            [r], "event_id long, ts_us long, user_id long, event_type string"
        ).repartition(1).write.parquet(sub)
        for root, _, files in os.walk(sub):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )
    stream = (
        spark.readStream.schema(
            "event_id long, ts_us long, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/slice_*")
    )
    drained = run_to_memory(
        streaming_funnel(
            stream, ("view", "click", "purchase"), 15_000_000
        ),
        output_mode="append",
    )
    rows_out = drained.collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r.user_id, r.t0_us, r.t_end_us, r.completed) == (
        7, 10_000_000, 30_000_000, False,  # 20s > 15s horizon
    )
