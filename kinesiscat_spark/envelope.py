"""The Kinesis record envelope as a Spark schema (SURVEY §1.1).

Reference: the physical unit in kinesiscat is the Kinesis record — an opaque
binary payload plus a fixed metadata envelope
(`vendor/github.com/aws/aws-sdk-go/service/kinesis/api.go:1519-1539`):
Data []byte, PartitionKey string, SequenceNumber string (per-shard
monotonic), ApproximateArrivalTimestamp. Shards are the unit of parallelism
and ordering; we add shardId so one Spark input partition maps to one shard.

``events_as_records`` adapts the driver's ``events`` table into this
envelope (FIXTURES.md role mapping: props -> Data, user_id -> PartitionKey,
event_id -> SequenceNumber, ts -> arrival timestamp). Shard assignment
mirrors Kinesis: hash of the partition key routed to one of N contiguous
hash ranges (`api.go:1141-1149`) — here pmod(xxhash64(key), n_shards),
computed JVM-side so it stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType(), nullable=False),
        T.StructField("partitionKey", T.StringType(), nullable=False),
        T.StructField("sequenceNumber", T.StringType(), nullable=False),
        T.StructField("approximateArrivalTimestamp", T.TimestampType(), nullable=False),
        T.StructField("shardId", T.StringType(), nullable=False),
    ]
)

# SequenceNumber is a decimal string, per-shard monotonically increasing
# (api.go:1537-1538). Zero-pad so lexicographic order == numeric order, which
# makes start-position predicates (S2) sargable as plain string comparisons.
_SEQ_WIDTH = 20


def sequence_number(col: F.Column) -> F.Column:
    return F.lpad(col.cast("string"), _SEQ_WIDTH, "0")


def shard_id(partition_key: F.Column, n_shards: int) -> F.Column:
    return F.format_string(
        "shardId-%012d", F.pmod(F.xxhash64(partition_key), F.lit(n_shards))
    )


def events_as_records(events: DataFrame, n_shards: int = 8) -> DataFrame:
    """Map the events table into the record envelope."""
    pk = F.col("user_id").cast("string")
    return events.select(
        F.encode(F.col("props"), "UTF-8").alias("data"),
        pk.alias("partitionKey"),
        sequence_number(F.col("event_id")).alias("sequenceNumber"),
        F.col("ts").alias("approximateArrivalTimestamp"),
        shard_id(pk, n_shards).alias("shardId"),
    )
