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
    "jp_filter_compare",
    oracle="""
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
  event_id AS id,
  event_type AS type,
  COALESCE(CAST(json_extract(props, '$.missing') AS BIGINT), -1) AS v
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
""",
)
def jp_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 comparator `k > `50`` as a filter predicate (truthiness applied,
    SURVEY §1.3) — a plain JVM-side predicate — plus the access surface
    folded from the former jp_access_defaults lane: J1 field access, J2
    subexpression `payload.k`, J10 multi-select hash, J12 value-returning
    OR `missing || `-1`` (missing key → null → falsy → literal;
    jp/interpreter.go:202-213), compiled over a composed document struct
    (envelope + payload)."""
    ev = _payload(load_table(spark, sf_dir, "events"))
    doc_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("payload", _PROPS_SCHEMA),
        ]
    )
    doc = F.struct(F.col("event_id"), F.col("event_type"), F.col("payload"))
    sel = compile_column(
        "{id: event_id, type: event_type, k: payload.k}", doc, doc_schema
    )
    dflt = compile_column("payload.missing || `-1`", doc, doc_schema)
    return ev.filter(truthy(_jp("k > `50`"))).select(
        "event_id",
        _jp("k").col.alias("k"),
        sel.col.getField("id").alias("id"),
        sel.col.getField("type").alias("type"),
        dflt.col.cast("long").alias("v"),
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


# ---------------------------------------------------------------------------
# Array-operator lanes (J3-J9, F7/F9/F10/F17/F18/F21) over documents.text
# split into word arrays. Array-valued outputs are serialized with to_json on
# BOTH sides so the driver's value hash compares strings, not engine-native
# list types. DuckDB list semantics are 1-based inclusive; the oracles below
# translate each 0-based exclusive JMESPath slice accordingly.
# ---------------------------------------------------------------------------

_WORDS_SCHEMA = T.StructType(
    [T.StructField("words", T.ArrayType(T.StringType()))]
)


def _words_doc(df: DataFrame) -> DataFrame:
    return df.withColumn("doc", F.struct(F.split("text", " ").alias("words")))


def _jpw(expression: str):
    return compile_column(expression, F.col("doc"), _WORDS_SCHEMA)


@query(
    "jp_array_index_slice",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
e AS (
  SELECT doc_id, x, length(x) AS klen, ord
  FROM (SELECT doc_id, unnest(l) AS x,
               generate_subscripts(l, 1) AS ord
        FROM w)
),
stbl AS (
  SELECT doc_id,
    list(x ORDER BY klen ASC, ord ASC) AS sorted_by_len,
    (list(x ORDER BY klen DESC, ord ASC))[1] AS longest,
    (list(x ORDER BY klen ASC, ord ASC))[1] AS shortest
  FROM e GROUP BY doc_id
)
SELECT w.doc_id,
  l[1] AS first_word,
  l[-1] AS last_word,
  to_json(l[2:4]) AS mid,
  to_json(list_slice(l, 1, 6, 2)) AS stride,
  to_json(list_reverse(l)) AS rev_stride,
  to_json(list_transform(generate_series(least(6, len(l)), 1, -2), i -> l[i]))
    AS back_stride,
  array_to_string(l[1:3], '-') AS first3,
  to_json(list_reverse(l)) AS rev,
  to_json(list_sort(l)) AS sorted_words,
  to_json(flatten([l[1:2], l[3:4]])) AS head4,
  to_json([l[1], l[-1]]) AS ends,
  to_json(list_transform(l, x -> CAST(length(x) AS BIGINT))) AS lens_proj,
  to_json(list_filter(l, x -> length(x) >= 6)) AS long_words,
  CAST(len(list_filter(l, x -> length(x) >= 6)) AS BIGINT) AS n_long,
  to_json(list_transform(l, x -> length(x))) AS word_lens,
  CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) AS total_len,
  ROUND(list_avg(list_transform(l, x -> length(x))), 4) AS avg_len,
  list_aggregate(l, 'max') AS max_word,
  list_aggregate(l, 'min') AS min_word,
  to_json(stbl.sorted_by_len) AS sorted_by_len,
  stbl.longest AS longest,
  stbl.shortest AS shortest
FROM w JOIN stbl ON w.doc_id = stbl.doc_id
""",
)
def jp_array_index_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 index (incl. negative), J4 slice (incl. positive AND negative
    stride), J5 list projection `[*]`
    (with a per-element RHS), J8 one-level flatten over a J9 multi-select
    list, F7 join, F17 reverse, F18 sort — all compiled to native array Columns
    (jp/interpreter.go:114-170, jp/util.go:54-138, jp/functions.go:715-792).

    `words[::-1]` (full reverse) and `words[5::-2]` (backward stride with
    clamped start) pin the general negative-step slice semantics the
    compliance corpus exercises, with a driver-visible hash check.

    Folded in (former jp_array_hof lane, round 5): J7 filter projection
    with truthy predicate, F10 map over expref, F9 length, F21 sum, F2
    avg, F11 max, F14 min — per-record array HOFs
    (jp/interpreter.go:84-113, jp/functions.go:404-621), zero Python.

    Folded in (former jp_sort_functions lane, round 6): F19 sort_by
    (STABLE sort by expref key — equal keys keep document order), F12
    max_by / F15 min_by (FIRST element attaining the extreme key) — the
    comparator-semantics fidelity surface of
    jp/functions.go:527-575,735-766; the oracle reproduces stability
    with a (key, original-index) sort and ties-to-first with the same
    order.
    """
    docs = _words_doc(load_table(spark, sf_dir, "documents"))
    long_words = _jpw("words[?length(@) >= `6`]")
    lens = _jpw("map(&length(@), words)")
    return docs.select(
        "doc_id",
        _jpw("words[0]").col.alias("first_word"),
        _jpw("words[-1]").col.alias("last_word"),
        F.to_json(_jpw("words[1:4]").col).alias("mid"),
        F.to_json(_jpw("words[0:6:2]").col).alias("stride"),
        F.to_json(_jpw("words[::-1]").col).alias("rev_stride"),
        F.to_json(_jpw("words[5::-2]").col).alias("back_stride"),
        _jpw("join('-', words[0:3])").col.alias("first3"),
        F.to_json(_jpw("reverse(words)").col).alias("rev"),
        F.to_json(_jpw("sort(words)").col).alias("sorted_words"),
        F.to_json(_jpw("[words[0:2], words[2:4]][]").col).alias("head4"),
        F.to_json(_jpw("[words[0], words[-1]]").col).alias("ends"),
        # J5 list projection `[*]` with a per-element RHS (driver-visible)
        F.to_json(_jpw("words[*].length(@)").col).alias("lens_proj"),
        F.to_json(long_words.col).alias("long_words"),
        _jpw("length(words[?length(@) >= `6`])").col.cast("long").alias("n_long"),
        F.to_json(lens.col).alias("word_lens"),
        _jpw("sum(map(&length(@), words))").col.cast("long").alias("total_len"),
        F.round(_jpw("avg(map(&length(@), words))").col, 4).alias("avg_len"),
        _jpw("max(words)").col.alias("max_word"),
        _jpw("min(words)").col.alias("min_word"),
        F.to_json(_jpw("sort_by(words, &length(@))").col).alias("sorted_by_len"),
        _jpw("max_by(words, &length(@))").col.alias("longest"),
        _jpw("min_by(words, &length(@))").col.alias("shortest"),
    )


@query(
    "jp_object_functions",
    oracle="""
SELECT
  event_id,
  '["a","b"]' AS ks,
  to_json([CAST(json_extract(props, '$.k') AS BIGINT), event_id]) AS vs,
  to_json([CAST(json_extract(props, '$.k') AS BIGINT), event_id]) AS vproj,
  to_json({'a': CAST(json_extract(props, '$.k') AS BIGINT),
           'b': event_id, 'c': 1}) AS merged,
  'number' AS ty,
  CAST(json_extract(props, '$.k') AS BIGINT) AS nn,
  to_json([CAST(json_extract(props, '$.k') AS BIGINT)]) AS arr,
  CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) AS s,
  CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DOUBLE) AS num,
  event_id AS and_val,
  false AS not_val,
  contains(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR), '1')
    AS has1,
  starts_with(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR), '1')
    AS sw1,
  ends_with(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR), '1')
    AS ew1,
  CAST(ceil((CAST(json_extract(props, '$.k') AS BIGINT) + event_id) / 2.0)
    AS BIGINT) AS ceil_avg,
  CAST(floor((CAST(json_extract(props, '$.k') AS BIGINT) + event_id) / 2.0)
    AS BIGINT) AS floor_avg,
  CAST(json_extract(props, '$.k') AS BIGINT) + 1 AS k_next,
  ABS(CAST(json_extract(props, '$.k') AS BIGINT) - 50) AS dist50
FROM events
""",
)
def jp_object_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 keys, F26 values, J6 object-value projection `*`, F13 merge,
    F25 type, F16 not_null, F22 to_array, F23 to_string, F24 to_number,
    F4 contains, F20 starts_with, F5 ends_with, F3 ceil, F6 floor (over
    F2 avg), J13 value-returning AND, J14 not — over a homogeneous
    two-field document {a: k, b: event_id}, all compiled to native Columns
    (jp/functions.go:125-324, jp/interpreter.go:171-230).

    Semantics pinned: numbers are always truthy (so `a && b` → b and
    `!a` → false); `not_null` returns the first non-null argument;
    `to_number(to_string(x))` is double-valued (go float64); ceil/floor
    of the fractional avg of two integers round half away correctly.
    """
    ev = _payload(load_table(spark, sf_dir, "events"))
    doc_schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    doc = F.struct(
        F.col("payload")["k"].alias("a"), F.col("event_id").alias("b")
    )

    def jpo(expression: str):
        return compile_column(expression, doc, doc_schema)

    return ev.select(
        "event_id",
        F.to_json(jpo("keys(@)").col).alias("ks"),
        F.to_json(jpo("values(@)").col).alias("vs"),
        F.to_json(jpo("*").col).alias("vproj"),
        F.to_json(jpo("merge(@, `{\"c\": 1}`)").col).alias("merged"),
        jpo("type(a)").col.alias("ty"),
        jpo("not_null(missing, a)").col.alias("nn"),
        F.to_json(jpo("to_array(a)").col).alias("arr"),
        jpo("to_string(a)").col.alias("s"),
        jpo("to_number(to_string(a))").col.alias("num"),
        jpo("a && b").col.alias("and_val"),
        jpo("!a").col.alias("not_val"),
        jpo("contains(to_string(a), '1')").col.alias("has1"),
        jpo("starts_with(to_string(a), '1')").col.alias("sw1"),
        jpo("ends_with(to_string(a), '1')").col.alias("ew1"),
        jpo("ceil(avg([a, b]))").col.cast("long").alias("ceil_avg"),
        jpo("floor(avg([a, b]))").col.cast("long").alias("floor_avg"),
        # F1/F21 math (folded from the former jp_function_math lane);
        # JMESPath has no infix minus — `a - 50` is `sum([a, `-50`])`
        jpo("sum([a, `1`])").col.cast("long").alias("k_next"),
        jpo("abs(sum([a, `-50`]))").col.cast("long").alias("dist50"),
    )


# Error-fidelity cases: (name, expression) pairs that must raise typed
# errors per the JMESPath spec (jp/functions.go:326-385 arity/type checks,
# parser syntax errors). The lane evaluates each through the real Python
# evaluator at plan-build time, catches the typed error, and returns
# (case, err) rows — giving the error surface a driver-visible hash check.
_ERROR_CASES = [
    ("abs_wrong_type", "abs(`\"a\"`)"),
    ("abs_wrong_arity", "abs(`1`, `2`)"),
    ("unknown_function", "unknown_function(`1`)"),
    ("length_wrong_type", "length(`1`)"),
    ("ceil_wrong_type", "ceil(`\"x\"`)"),
    ("max_mixed_types", "max(`[1, \"a\"]`)"),
    ("sort_mixed_types", "sort(`[1, \"a\"]`)"),
    ("syntax_error", "foo["),
]


@query(
    "jp_error_fidelity",
    oracle="""
SELECT * FROM (VALUES
  ('abs_wrong_type', 'invalid-type'),
  ('abs_wrong_arity', 'invalid-arity'),
  ('unknown_function', 'unknown-function'),
  ('length_wrong_type', 'invalid-type'),
  ('ceil_wrong_type', 'invalid-type'),
  ('max_mixed_types', 'invalid-type'),
  ('sort_mixed_types', 'invalid-type'),
  ('syntax_error', 'syntax')
) AS t(case_name, err)
""",
)
def jp_error_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec error fidelity (SURVEY §2.3): wrong-type and wrong-arity calls
    and malformed expressions raise the spec's typed errors
    ('invalid-type' | 'invalid-arity' | 'unknown-function' | 'syntax'),
    exactly as the compliance corpus demands (jp/functions.go:326-385).
    Each case runs through the real parser + evaluator; the caught error
    class is mapped to its corpus error name.
    """
    from kinesiscat_spark.functions.jmespath import search
    from kinesiscat_spark.functions.jmespath.errors import (
        InvalidArityError,
        InvalidTypeError,
        LexerError,
        ParseError,
        UnknownFunctionError,
    )

    def err_name(expression: str) -> str:
        try:
            search(expression, {})
            return "no-error"
        except InvalidArityError:
            return "invalid-arity"
        except InvalidTypeError:
            return "invalid-type"
        except UnknownFunctionError:
            return "unknown-function"
        except (ParseError, LexerError):
            return "syntax"

    rows = [(name, err_name(expression)) for name, expression in _ERROR_CASES]
    return spark.createDataFrame(rows, "case_name string, err string")
