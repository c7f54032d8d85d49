"""Envelope / source / sink surface as oracle-checkable batch queries.

Covers the reference's CLI emission modes and start positions:
- K1 `-format data|partition-key|sequence` (`/root/reference/main.go:68-83`)
- K2 `-separator` / `-0` (`main.go:35-36, 47-49, 103`)
- S2 start positions AT/AFTER_SEQUENCE_NUMBER as sargable predicates
  (`worker/worker.go:148-169`) — the batch twin of the streaming option.

Note the reference prints the *pointer* for partition-key/sequence formats
(`main.go:79,81` — a fidelity bug); we implement the intended semantics
(the value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.envelope import events_as_records
from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

# DuckDB twin of the envelope mapping (sequence zero-padded to 20).
_ENVELOPE_CTE = """
WITH records AS (
  SELECT
    props AS data_str,
    CAST(user_id AS VARCHAR) AS partitionKey,
    LPAD(CAST(event_id AS VARCHAR), 20, '0') AS sequenceNumber,
    ts AS approximateArrivalTimestamp
  FROM events
)
"""


@query(
    "envelope_formats",
    oracle=_ENVELOPE_CTE
    + """
SELECT data_str AS record_data,
       partitionKey AS record_partition_key,
       sequenceNumber AS record_sequence,
       data_str || '|' AS record_separated
FROM records
WHERE sequenceNumber > LPAD('5000', 20, '0')""",
)
def envelope_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 + K2 + S2 in one lane (folded to free registry slots for the
    curation surface; each contract is still hash-checked):

    - K1 `-format data | partition-key | sequence`: all three emission
      modes of ``sink.format_record`` over the same record set — one
      column per mode (main.go:74-83, intended semantics);
    - K2 `-separator` (record + separator, ready for a byte-stream sink —
      main.go:35-36,103);
    - S2 AFTER_SEQUENCE_NUMBER as the row filter: zero-padded sequence
      strings compare lexicographically == numerically, so the predicate
      pushes down to the parquet scan (PushedFilters shows a GreaterThan
      on the source column) instead of needing a post-scan cast.
    """
    from kinesiscat_spark.envelope import sequence_number
    from kinesiscat_spark.streaming.sink import format_record

    records = events_as_records(load_table(spark, sf_dir, "events"))
    return records.filter(
        F.col("sequenceNumber") > sequence_number(F.lit(5000))
    ).select(
        format_record("data").alias("record_data"),
        format_record("partition-key").alias("record_partition_key"),
        format_record("sequence").alias("record_sequence"),
        F.concat(F.decode(F.col("data"), "UTF-8"), F.lit("|")).alias(
            "record_separated"
        ),
    )
