"""JMESPath per-record transform queries over the events payload (K3/J*).

These exercise the reference's query engine surface — per-record JSON
querying (`/root/reference/main.go:85-104`, interpreter at
`vendor/github.com/jmespath/go-jmespath/interpreter.go`) — against the
driver's `events.props` JSON column, with DuckDB JSON functions as oracle.

Every query here goes through the real expression compiler
(``kinesiscat_spark.functions.jmespath``): the expression string is parsed
once at plan time and compiled either to a native Column tree
(``compile_column`` — JVM-side, codegen) or to the Arrow-batched pandas UDF
(``jmespath_udf`` — full dynamic fidelity). The reference re-parses the
expression per record (`main.go:91`); we compile per plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesiscat_spark.functions.jmespath import jmespath_udf
from kinesiscat_spark.functions.jmespath.columns import compile_column, truthy
from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

# Payload shape in the driver corpus: {"k": <int>}. from_json with this
# minimal schema lets Catalyst prune the JSON parse to the referenced field.
_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def _payload(df: DataFrame) -> DataFrame:
    return df.withColumn("payload", F.from_json("props", _PROPS_SCHEMA))


def _jp(expression: str, col: Column = None, schema: T.DataType = _PROPS_SCHEMA):
    """Compile a JMESPath expression against the payload struct column."""
    return compile_column(expression, col if col is not None else F.col("payload"), schema)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core pipeline as one batch plan (SURVEY §3, M0).

    Kinesis-record envelope over `events` → decode payload → JMESPath
    filter `k > `50`` and transform `{k: k}` (compiled to native Columns
    at plan time) → `-format data` emission column.
    """
    from kinesiscat_spark.envelope import events_as_records

    records = events_as_records(load_table(spark, sf_dir, "events"))
    payload = F.from_json(F.decode(F.col("data"), "UTF-8"), _PROPS_SCHEMA)
    with_payload = records.withColumn("payload", payload)
    keep = truthy(_jp("k > `50`"))
    transformed = _jp("{k: k}")
    return with_payload.filter(keep).select(
        F.col("sequenceNumber"),
        F.col("partitionKey"),
        F.to_json(transformed.col).alias("record"),
    )


@query(
    "jp_field_access",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def jp_field_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 field access `k`, compiled to a native struct-field reference."""
    ev = _payload(load_table(spark, sf_dir, "events"))
    return ev.select("event_id", _jp("k").col.alias("k"))


@query(
    "jp_filter_compare",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
)
def jp_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 comparator `k > `50`` as a filter predicate (truthiness applied,
    SURVEY §1.3); compiles to a plain JVM-side predicate."""
    ev = _payload(load_table(spark, sf_dir, "events"))
    return ev.filter(truthy(_jp("k > `50`"))).select(
        "event_id", _jp("k").col.alias("k")
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
    """J10 multi-select hash `{id: event_id, type: event_type, k: payload.k}`
    compiled over a composed document struct (envelope + payload)."""
    ev = _payload(load_table(spark, sf_dir, "events"))
    doc_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("payload", _PROPS_SCHEMA),
        ]
    )
    doc = F.struct(
        F.col("event_id"), F.col("event_type"), F.col("payload")
    )
    typed = compile_column(
        "{id: event_id, type: event_type, k: payload.k}", doc, doc_schema
    )
    return ev.select(typed.col.alias("r")).select("r.id", "r.type", "r.k")


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
    """J12 `missing || `-1``: value-returning OR; missing key → null →
    falsy → fall through to the literal (jp/interpreter.go:202-213)."""
    ev = _payload(load_table(spark, sf_dir, "events"))
    typed = _jp("missing || `-1`")
    return ev.select("event_id", typed.col.cast("long").alias("v"))


@query(
    "jp_function_math",
    oracle="""
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) + 1 AS k_next,
  ABS(CAST(json_extract(props, '$.k') AS BIGINT) - 50) AS dist50
FROM events
""",
)
def jp_function_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F21 function calls `sum([k, `1`])`, `abs(k - `50`)` — native
    aggregate-within-array + abs, no Python in the loop.

    (JMESPath has no infix minus; `k - 50` is spelled `sum([k, `-50`])`.)
    """
    ev = _payload(load_table(spark, sf_dir, "events"))
    k_next = _jp("sum([k, `1`])")
    dist = _jp("abs(sum([k, `-50`]))")
    return ev.select(
        "event_id",
        k_next.col.cast("long").alias("k_next"),
        dist.col.cast("long").alias("dist50"),
    )


@query(
    "jp_udf_dynamic",
    oracle="""
SELECT
  event_id,
  '{"t":"' || event_type || '","k":' || json_extract(props, '$.k') || '}' AS record
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 10
""",
)
def jp_udf_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 full-fidelity path: the Arrow-batched pandas UDF evaluating
    `{t: t, k: k}` over a dynamic JSON document (no static schema).

    This is the fallback lane for payloads whose shape isn't known at plan
    time — semantics identical to the Python evaluator (and therefore the
    compliance corpus), ~Arrow-batch overhead instead of per-record parse.
    """
    ev = load_table(spark, sf_dir, "events")
    # build the dynamic doc as a JSON string: {"t": <event_type>, "k": <k>}
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    udf = jmespath_udf("{t: t, k: k}")
    filt = jmespath_udf("k >= `10`")
    out = ev.withColumn("doc", doc)
    return (
        out.withColumn("keep", filt(F.col("doc")))
        .filter(F.col("keep") == "true")
        .select("event_id", udf(F.col("doc")).alias("record"))
    )
