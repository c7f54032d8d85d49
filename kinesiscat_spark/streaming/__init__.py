"""Structured-Streaming surface (SURVEY §2.1 S1–S9, M4).

The reference's stream plumbing re-expressed on Spark Structured Streaming:

========  =====================================  ==============================
ref op    reference behavior                     here
========  =====================================  ==============================
S1        one goroutine per shard, merged chan   file/parquet stream source;
                                                 one task per input split
S2        -position LATEST/TRIM_HORIZON/AT/      ``start_position_filter`` —
          AFTER_SEQUENCE_NUMBER                  sargable envelope predicates
S3        GetRecords batch limit                 ``maxFilesPerTrigger``
S4        -sleep-time poll pacing                ``trigger(processingTime=...)``
S5        per-shard parallel read                Spark task parallelism (free)
S6        blocking channel backpressure          micro-batch admission control
S7        MillisBehindLatest lag metric          ``with_lag_metric`` (observe)
                                                 + ``LagListener``
S8        Stop()/done channel                    ``query.stop()``
S9        log-and-continue on bad fetch/JSON     checkpoint + permissive parse
========  =====================================  ==============================

Checkpointing/exactly-once is a strict upgrade over the reference (which
restarts at LATEST and loses data, SURVEY §2.4).
"""

from kinesiscat_spark.streaming.lag import LAG_OBSERVATION, LagListener, with_lag_metric
from kinesiscat_spark.streaming.sink import format_record, write_formatted
from kinesiscat_spark.streaming.source import (
    ITERATOR_TYPES,
    StreamConfig,
    read_events_stream,
    read_record_stream,
    run_to_memory,
    start_position_filter,
)

__all__ = [
    "ITERATOR_TYPES",
    "LAG_OBSERVATION",
    "LagListener",
    "StreamConfig",
    "format_record",
    "read_events_stream",
    "read_record_stream",
    "run_to_memory",
    "start_position_filter",
    "with_lag_metric",
    "write_formatted",
]
