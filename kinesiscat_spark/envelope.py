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
mirrors Kinesis exactly: the MD5 hash of the partition key routed to one
of N contiguous hash ranges (`api.go:1141-1149`), computed JVM-side so it
stays in whole-stage codegen.
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


def shard_index(key: F.Column, n_shards: int) -> F.Column:
    """Kinesis-faithful hash-range routing (`api.go:1141-1149`) as a plain
    integer: the MD5 of the key, read as an unsigned integer, falls into
    one of ``n_shards`` contiguous equal hash ranges — md5 is reproducible
    in DuckDB (``('0x' || hex)::BIGINT``), so shard assignment itself is
    oracle-checkable, unlike a JVM-only hash. All math stays in
    whole-stage codegen.

    h < 2^48, so h·n_shards fits a long for any n_shards < 2^15, and the
    divisor is a power of two: ``>> 48`` IS the exact floor division —
    pure integer math, no rounding hazard (DuckDB reproduces it with the
    ``>>`` operator). The bound is VALIDATED here (h·n_shards overflows a
    signed long past it — the shared guard the round-5 review asked for);
    the one routing implementation serves both the stream envelope and
    the sequence-packing shards."""
    if not 1 <= n_shards < (1 << 15):
        raise ValueError(f"n_shards must be in [1, 32768), got {n_shards}")
    h = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
    return F.shiftright(h * F.lit(n_shards), 48)


def shard_id(partition_key: F.Column, n_shards: int) -> F.Column:
    """``shard_index`` with the Kinesis ``shardId-%012d`` string dressing."""
    return F.format_string("shardId-%012d", shard_index(partition_key, n_shards))


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
