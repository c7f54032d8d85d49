"""JMESPath per-record transform queries over the events payload (K3/J*).

These exercise the reference's query engine surface — per-record JSON
querying (`/root/reference/main.go:85-104`, JMESPath interpreter at
`vendor/github.com/jmespath/go-jmespath/interpreter.go`) — against the
driver's `events.props` JSON column, with DuckDB JSON functions as oracle.

Phase A registers native-column equivalents of the core operators; the
compiler (kinesiscat_spark.functions.jmespath_compiler) replaces the
hand-built columns with compiled expressions as it lands, keeping the same
query names/output schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

# Payload shape in the driver corpus: {"k": <int>}. The compiler derives a
# minimal from_json schema from the expression's static shape (SURVEY §1.2);
# here it is simply `k BIGINT`.
_PROPS_SCHEMA = "k BIGINT"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core pipeline as one batch plan (SURVEY §3, M0).

    Kinesis-record envelope over `events` → decode payload → JMESPath-style
    transform `{id: @, k: k} | [?k > `50`]` semantics → `-format data`
    emission column. The JSON parse is pruned to the single referenced field
    by Catalyst (vs the reference's full per-record json.Unmarshal,
    `/root/reference/main.go:90`), and the expression is compiled once per
    plan (fixing the per-record re-parse at `main.go:91`).
    """
    from kinesiscat_spark.envelope import events_as_records
    from kinesiscat_spark.io_tables import load_table

    records = events_as_records(load_table(spark, sf_dir, "events"))
    payload = F.from_json(F.decode(F.col("data"), "UTF-8"), _PROPS_SCHEMA)
    return (
        records.withColumn("payload", payload)
        .filter(F.col("payload.k") > 50)
        .select(
            F.col("sequenceNumber"),
            F.col("partitionKey"),
            F.to_json(F.struct(F.col("payload.k").alias("k"))).alias("record"),
        )
    )


def _parsed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("payload", F.from_json("props", _PROPS_SCHEMA))


@query(
    "jp_field_access",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def jp_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 field access `k`: project a key from the JSON payload.

    from_json with a minimal schema -> Catalyst prunes the JSON parse to the
    single referenced field (json expression optimization), vs the
    reference's full json.Unmarshal per record (`main.go:90`).
    """
    return _parsed_events(spark, sf_dir).select(
        "event_id", F.col("payload.k").alias("k")
    )


@query(
    "jp_filter_compare",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
)
def jp_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 comparator `k > 50` used as a filter (JMESPath `[?k > `50`]`).

    Ordering comparators apply to numbers only (jp/interpreter.go:48-55);
    the payload field is statically numeric here so the comparison compiles
    to a plain JVM-side predicate.
    """
    parsed = _parsed_events(spark, sf_dir)
    return parsed.filter(F.col("payload.k") > 50).select(
        "event_id", F.col("payload.k").alias("k")
    )


@query(
    "jp_multiselect_hash",
    oracle="""
SELECT
  event_id AS id,
  event_type AS type,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def jp_multiselect_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 multi-select hash `{id: event_id, type: event_type, k: payload.k}`.

    JMESPath object construction maps to named columns / F.struct
    (jp/interpreter.go:175-188).
    """
    return _parsed_events(spark, sf_dir).select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("type"),
        F.col("payload.k").alias("k"),
    )


@query(
    "jp_or_default",
    oracle="""
SELECT
  event_id,
  COALESCE(CAST(json_extract(props, '$.missing') AS BIGINT), -1) AS v
FROM events
""",
)
def jp_or_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 `missing || `-1``: value-returning OR over a numeric operand.

    JMESPath `a || b` returns a unless a is falsy (jp/interpreter.go:202-213);
    for a numeric/absent operand the truthy set is exactly NOT NULL, so the
    compiled form is COALESCE. (Missing key -> null, jp/interpreter.go:78-83.)
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("payload", F.from_json("props", "missing BIGINT"))
    return parsed.select(
        "event_id", F.coalesce(F.col("payload.missing"), F.lit(-1)).alias("v")
    )
