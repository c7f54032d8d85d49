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

from kinesiscat_spark.queries.window_queries import _TUMBLING_BASE
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


def stream_agg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S4 + stateful agg: streamed groupBy equals the batch answer.

    Driver lane: folded into ``stream_tumbling_window`` (round 5) under
    ``kind = 'by_type'`` — same hash strength, one lane slot.
    """
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


# The watermark/append twin: the drained append-mode result is EXACTLY
# the windows whose end is at or below the final watermark (max event
# time − delay) — late-data semantics as a deterministic batch predicate.
_WATERMARK_DELAY = "1 hour"

_TUMBLING_APPEND_ORACLE = f"""
SELECT window_start, event_type, n_events, total_value
FROM ({_TUMBLING_BASE})
WHERE STRPTIME(window_start, '%Y-%m-%d %H:%M:%S') + INTERVAL '1 hour'
      <= (SELECT MAX(ts) FROM events) - INTERVAL '{_WATERMARK_DELAY}'
"""

_TUMBLING_PLUS_AGG_ORACLE = f"""
SELECT 'window' AS kind, window_start, event_type, n_events, total_value,
       CAST(NULL AS DOUBLE) AS avg_value
FROM ({_TUMBLING_BASE})
UNION ALL
SELECT 'by_type' AS kind, CAST(NULL AS VARCHAR) AS window_start, event_type,
       n_events, total_value, avg_value
FROM ({_STREAM_AGG_ORACLE})
UNION ALL
SELECT 'window_append' AS kind, window_start, event_type, n_events,
       total_value, CAST(NULL AS DOUBLE) AS avg_value
FROM ({_TUMBLING_APPEND_ORACLE})
"""


@query("stream_tumbling_window", oracle=_TUMBLING_PLUS_AGG_ORACLE)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 streaming form: event-time tumbling window over the stream.

    Complete mode (memory sink snapshot); the append-mode/watermark
    late-data path is exercised in tests/test_streaming.py.

    Folded in (round 5): the former stream_agg_by_type lane under
    ``kind = 'by_type'``, and the WATERMARK/APPEND late-data path under
    ``kind = 'window_append'`` — the same tumbling aggregation run with
    ``withWatermark('ts', '1 hour')`` in append mode, whose drained
    output is exactly the windows closed by the final watermark (end ≤
    max event time − delay), a deterministic batch predicate. Three real
    streaming queries drain in this lane, each hash-checked against its
    batch twin via the UNION ALL oracle.
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
    windowed = run_to_memory(agg, output_mode="complete").select(
        F.lit("window").alias("kind"),
        "window_start",
        "event_type",
        "n_events",
        "total_value",
        F.lit(None).cast("double").alias("avg_value"),
    )
    by_type = stream_agg_by_type(spark, sf_dir).select(
        F.lit("by_type").alias("kind"),
        F.lit(None).cast("string").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
        "avg_value",
    )
    ev2 = read_events_stream(spark, sf_dir, StreamConfig(iterator_type="TRIM_HORIZON"))
    appended = (
        ev2.withWatermark("ts", _WATERMARK_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(utc_wall(F.col("w.start")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    window_append = run_to_memory(appended, output_mode="append").select(
        F.lit("window_append").alias("kind"),
        "window_start",
        "event_type",
        "n_events",
        "total_value",
        F.lit(None).cast("double").alias("avg_value"),
    )
    return windowed.unionByName(by_type).unionByName(window_append)


def _stream_minhash_oracle() -> str:
    from kinesiscat_spark.queries.dedup_queries import minhash_oracle

    return minhash_oracle(distinct_pairs=False)


@query("stream_minhash_candidates", oracle=_stream_minhash_oracle())
def stream_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup detection (streaming/stateful.py
    streaming_minhash_candidates): banded-minhash candidate pairs ACROSS
    micro-batches, bucket membership in per-(band, key) checkpointed
    state. Signatures come from the same Arrow kernel as the batch
    ``minhash_lsh_pairs``, so the drained stream is bit-identical to the
    batch result BY CONSTRUCTION — the oracle is the batch minhash SQL
    with one row per colliding band (the stream emits a pair once per
    band bucket it collides in), which is exactly what this lane
    hash-verifies.
    """
    from kinesiscat_spark.queries.dedup_queries import (
        MINHASH_T,
        N_BANDS,
        N_HASHES,
    )
    from kinesiscat_spark.streaming.source import read_table_stream
    from kinesiscat_spark.streaming.stateful import streaming_minhash_candidates

    docs = read_table_stream(spark, sf_dir, "documents")
    pairs = streaming_minhash_candidates(
        docs, threshold=MINHASH_T, n_hashes=N_HASHES, n_bands=N_BANDS, n=3
    )
    out = run_to_memory(pairs, output_mode="append")
    return out.select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


# S4/S6/S8 config-echo lane: run a REAL multi-file stream with a bounded
# per-trigger intake, observe the micro-batch progress objects, and
# materialize each contract as a deterministic (knob, value) row:
#   - S4 poll pacing: the trigger StreamConfig.sleep_time_ms compiles to;
#   - S3/S6 backpressure: number of non-empty micro-batches == ceil(files /
#     batch_size) AND every batch's numInputRows within the per-trigger
#     file budget (bounded intake per trigger — no batch drained the
#     whole source);
#   - S8 graceful shutdown: the query is stopped and inactive after the
#     drain, with every input row accounted for exactly once.
_N_SRC_FILES = 8
_ECHO_BATCH_FILES = 3

# n_nonempty_batches derives from the DATA on both sides (the number of
# distinct pmod-8 classes actually present → files actually written), so a
# sparse events table can never make the lane hash-fail spuriously.
_CONFIG_ECHO_ORACLE = f"""
SELECT 'trigger_interval_ms' AS knob, '1000' AS value
UNION ALL SELECT 'max_files_per_trigger', '{_ECHO_BATCH_FILES}'
UNION ALL SELECT 'n_nonempty_batches',
  CAST(CAST(ceil((SELECT COUNT(DISTINCT event_id % {_N_SRC_FILES}) FROM events)
            / {_ECHO_BATCH_FILES}.0) AS BIGINT) AS VARCHAR)
UNION ALL SELECT 'per_trigger_intake_bounded', 'true'
UNION ALL SELECT 'rows_drained', CAST((SELECT COUNT(*) FROM events) AS VARCHAR)
UNION ALL SELECT 'stopped_gracefully', 'true'
"""


@query("stream_config_echo", oracle=_CONFIG_ECHO_ORACLE)
def stream_config_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (poll pacing), S6 (backpressure), S8 (graceful shutdown) as
    driver-hash-checked data. The events table is split into
    {_N_SRC_FILES} files; a maxFilesPerTrigger={_ECHO_BATCH_FILES} stream
    drains it under availableNow with a checkpoint, and the lane emits
    the OBSERVED facts (from StreamingQueryProgress and the drained sink)
    next to the compiled config — every value is deterministic, so the
    oracle is exact."""
    import math
    import tempfile

    from kinesiscat_spark.io_tables import load_table

    cfg = StreamConfig(
        iterator_type="TRIM_HORIZON",
        batch_size=_ECHO_BATCH_FILES,
        sleep_time_ms=1000,
    )
    # S4: the pacing knob compiles to the processing-time trigger.
    trigger_ms = cfg.trigger_kwargs(available_now=False)["processingTime"]
    assert trigger_ms == "1000 milliseconds"

    ev = load_table(spark, sf_dir, "events")
    total_rows = ev.count()
    src = tempfile.mkdtemp(prefix="kc_echo_src_")
    # One file per DISTINCT pmod-{_N_SRC_FILES} class actually present, so
    # the file count is exactly the value the oracle derives from the data
    # (a range-partitioned write could merge classes / skip empty
    # partitions → fewer files → a spurious hash mismatch). Tiny per-class
    # writes are fine here: this lane materializes a micro-batch fixture,
    # not a production path.
    cls = F.pmod("event_id", F.lit(_N_SRC_FILES))
    classes = sorted(r.c for r in ev.select(cls.alias("c")).distinct().collect())
    for c in classes:
        ev.filter(cls == c).coalesce(1).write.mode("append").parquet(src)
    if not classes:
        # empty source: nothing to stream — every contract holds vacuously
        # (0 batches, 0 rows, bounded intake, nothing left running), which
        # is exactly what the oracle's data-derived expressions evaluate to
        rows = [
            ("trigger_interval_ms", trigger_ms.split()[0]),
            ("max_files_per_trigger", str(cfg.batch_size)),
            ("n_nonempty_batches", "0"),
            ("per_trigger_intake_bounded", "true"),
            ("rows_drained", "0"),
            ("stopped_gracefully", "true"),
        ]
        return spark.createDataFrame(rows, "knob string, value string")
    # actual per-file row counts bound what one trigger may legally intake
    per_file = [
        r.n
        for r in spark.read.parquet(src)
        .groupBy(F.input_file_name())
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    n_files = len(per_file)
    max_intake = sum(sorted(per_file, reverse=True)[:_ECHO_BATCH_FILES])

    import uuid

    name = f"kc_echo_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="kc_ckpt_")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", cfg.batch_size)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("config-echo stream did not drain")
    finally:
        if q.isActive:
            q.stop()
    batch_rows = [
        int(p["numInputRows"])
        for p in (q.recentProgress or [])
        if int(p["numInputRows"]) > 0
    ]
    drained = spark.table(name).count()
    rows = [
        ("trigger_interval_ms", trigger_ms.split()[0]),
        ("max_files_per_trigger", str(cfg.batch_size)),
        ("n_nonempty_batches", str(len(batch_rows))),
        (
            "per_trigger_intake_bounded",
            str(
                bool(batch_rows)
                and max(batch_rows) <= max_intake
                and len(batch_rows) == math.ceil(n_files / cfg.batch_size)
            ).lower(),
        ),
        ("rows_drained", str(drained if drained == total_rows else -1)),
        ("stopped_gracefully", str(not q.isActive).lower()),
    ]
    return spark.createDataFrame(rows, "knob string, value string")
