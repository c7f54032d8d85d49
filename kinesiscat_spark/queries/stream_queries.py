"""Streaming queries with batch-exact oracles.

Each runs a real Structured Streaming query (file stream source over the
events table, micro-batched by maxFilesPerTrigger, checkpointed, drained
with availableNow) into a memory sink, then hands the driver the result
table. The DuckDB oracle is the *batch* SQL over the same input — proving
the streaming plan computes exactly the batch answer (the micro-batch
model's core invariant)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.queries.window_queries import _TUMBLING_ORACLE
from kinesiscat_spark.io_tables import utc_wall
from kinesiscat_spark.registry import query
from kinesiscat_spark.streaming import StreamConfig, read_events_stream, run_to_memory

# No exact distinct-count in streaming state (Spark restriction —
# approx_count_distinct is the streaming-native alternative), so the
# streamed twin of events_agg_by_type carries the exact aggregates only.
_STREAM_AGG_ORACLE = """
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 2) AS total_value,
  ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY event_type
"""


@query("stream_agg_by_type", oracle=_STREAM_AGG_ORACLE)
def stream_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S4 + stateful agg: streamed groupBy equals the batch answer."""
    ev = read_events_stream(spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON"))
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    return run_to_memory(agg, output_mode="complete")


_STATEFUL_DEDUP_ORACLE = """
SELECT user_id, event_type,
       event_id AS first_event_id,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
       ROUND(value, 6) AS first_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type ORDER BY event_id
  ) AS rn
  FROM events
) WHERE rn = 1
"""


@query("stream_stateful_dedup", oracle=_STATEFUL_DEDUP_ORACLE)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): streaming
    first-seen dedup per (user_id, event_type), state in the checkpoint.

    The file-backed source delivers micro-batches in file order, so
    first-seen == min event_id and the batch SQL twin is exact; with an
    unordered source the oracle weakens to rows-only (count per key = 1).
    """
    from kinesiscat_spark.streaming.stateful import dedup_first_seen

    ev = read_events_stream(spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON"))
    first = dedup_first_seen(
        ev.select("user_id", "event_type", "event_id", "ts", "value"),
        keys=["user_id", "event_type"],
        order_col="event_id",
        output_schema=(
            "user_id bigint, event_type string, event_id bigint, "
            "ts timestamp, value double"
        ),
    )
    out = run_to_memory(first, output_mode="append")
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("first_event_id"),
        F.date_format(utc_wall(F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.round("value", 6).alias("first_value"),
    )


# The md5 hash-range shard routing (envelope.shard_id, Kinesis
# api.go:1141-1149) is reproducible in DuckDB, so per-shard results are
# oracle-checkable — the reason shard_id is md5-based rather than a
# JVM-only hash.
_SHARD_SQL = (
    "'shardId-' || lpad(CAST((('0x' || substring(md5(CAST(user_id AS "
    "VARCHAR)), 1, 12))::BIGINT * 8 >> 48) AS VARCHAR), 12, '0')"
)

_LAG_ORACLE = f"""
WITH recs AS (SELECT {_SHARD_SQL} AS shardId, ts FROM events),
per AS (
  SELECT shardId, COUNT(*) AS n_records, MAX(ts) AS latest
  FROM recs GROUP BY shardId
)
SELECT shardId,
       CAST(n_records AS BIGINT) AS n_records,
       CAST(epoch_ms((SELECT MAX(latest) FROM per)) - epoch_ms(latest)
            AS BIGINT) AS millis_behind_latest
FROM per
"""


@query("stream_lag_metric", oracle=_LAG_ORACLE)
def stream_lag_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 MillisBehindLatest (worker.go:143-146, 226-227, 245-251): the
    per-shard lag signal, streamed.

    The stream runs with ``with_lag_metric`` attached — the ``observe``
    aggregate rides each micro-batch (no extra pass) and surfaces through
    StreamingQueryProgress / LagListener, which tests/test_streaming.py
    asserts on. Wall-clock lag is nondeterministic, so the hash-checked
    output is the deterministic batch twin of the same signal: each
    shard's record count and how many millis its newest record trails the
    stream's newest record overall."""
    from pyspark.sql import Window

    from kinesiscat_spark.streaming.lag import with_lag_metric

    ev = read_events_stream(
        spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON"), as_records=True
    )
    agg = (
        with_lag_metric(ev)
        .groupBy("shardId")
        .agg(
            F.count("*").alias("n_records"),
            F.max("approximateArrivalTimestamp").alias("latest"),
        )
    )
    out = run_to_memory(agg, output_mode="complete")
    latest_all = F.max("latest").over(Window.partitionBy())
    return out.select(
        "shardId",
        "n_records",
        (F.unix_millis(latest_all) - F.unix_millis(F.col("latest"))).alias(
            "millis_behind_latest"
        ),
    )


@query("stream_tumbling_window", oracle=_TUMBLING_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 streaming form: event-time tumbling window over the stream.

    Complete mode (memory sink snapshot); the append-mode/watermark
    late-data path is exercised in tests/test_streaming.py.
    """
    ev = read_events_stream(spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON"))
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(utc_wall(F.col("w.start")), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(agg, output_mode="complete")
