"""Public API: compile once, evaluate anywhere (Python docs or Spark columns).

The reference re-lexes/re-parses the expression for every record
(`/root/reference/main.go:91`); here an expression compiles once per *plan*
— either to a native Column tree (``columns.py``) or to an Arrow-batched
pandas UDF closing over the parsed AST.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from kinesiscat_spark.functions.jmespath.evaluator import evaluate
from kinesiscat_spark.functions.jmespath.parser import Node, parse


@dataclass(frozen=True)
class CompiledExpression:
    expression: str
    ast: Node

    def search(self, doc):
        """Evaluate against a Python JSON value."""
        return evaluate(self.ast, doc)

    def search_json(self, doc_json: str | None) -> str | None:
        """JSON-string in → JSON-string out (the CLI pipeline's K3 shape)."""
        if doc_json is None:
            return None
        result = evaluate(self.ast, json.loads(doc_json))
        return None if result is None else json.dumps(
            result, separators=(",", ":"), ensure_ascii=False
        )


def compile_expr(expression: str) -> CompiledExpression:
    return CompiledExpression(expression, parse(expression))


def search(expression: str, doc):
    """One-shot convenience (parses every call — use compile_expr in loops)."""
    return compile_expr(expression).search(doc)


def jmespath_udf(expression: str):
    """Arrow-batched pandas UDF: JSON-string column → JSON-string result.

    Full-fidelity fallback path for expressions the native Column compiler
    can't express; the AST is built on the driver once and shipped in the
    UDF closure (per-plan compilation, ~1000x fewer parses than the
    reference's per-record `jmespath.Search`).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    compiled = compile_expr(expression)

    def _eval(payload):
        return payload.map(compiled.search_json, na_action="ignore")

    # explicit annotations: `from __future__ import annotations` would turn
    # inline hints into strings pandas_udf can't resolve
    _eval.__annotations__ = {"payload": pd.Series, "return": pd.Series}
    return F.pandas_udf(_eval, T.StringType())


def jmespath_native_json(expression: str, json_col, schema):
    """Native-path K3: JSON-string column → JSON-string result column,
    entirely JVM-side (whole-stage codegen), matching ``jmespath_udf``
    byte-for-byte on documents that fit ``schema``.

    ``schema`` (a StructType) declares the payload's object shape — the
    static-typing contract that makes native compilation possible. Rows
    whose payload is corrupt JSON (or not an object of that shape) yield
    NULL, the same skip policy as the UDF path
    (`/root/reference/main.go:92-98`). Raises ``NotColumnCompilable`` when
    the expression leaves the statically-typeable subset or its output
    type can't be serialized faithfully (float repr differs between
    Java and Python) — callers fall back to ``jmespath_udf``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kinesiscat_spark.functions.jmespath.columns import (
        compile_column,
        json_faithful,
        to_json_string,
    )
    from kinesiscat_spark.functions.jmespath.errors import NotColumnCompilable

    from kinesiscat_spark.functions.jmespath.schemas import OPAQUE, demote_boxes

    # BOXED/SHADOW fields (infer_type-derived schemas) are only realizable
    # from createDataFrame-shaped input, not from_json — demote them so
    # expressions touching them fall back to the UDF.
    schema = demote_boxes(schema)

    def _opaque(f: T.StructField) -> bool:
        return bool((f.metadata or {}).get(OPAQUE))

    def _strip(dt: T.DataType) -> T.DataType:
        """Parse schema without OPAQUE fields: their runtime values are
        non-null JSON of an unrepresentable type, and PERMISSIVE from_json
        poisons the rest of the row when coercion into a declared void
        field fails. Undeclared keys are simply skipped instead."""
        if isinstance(dt, T.StructType):
            return T.StructType(
                [
                    T.StructField(f.name, _strip(f.dataType))
                    for f in dt.fields
                    if not _opaque(f)
                ]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(_strip(dt.elementType))
        return dt

    def _rebuild(col, dt: T.DataType):
        """Re-insert stripped OPAQUE fields as typed NULLs so the compile
        schema and the runtime value shape agree."""
        if isinstance(dt, T.StructType):
            if not any(_opaque(f) or _differs(f.dataType) for f in dt.fields):
                return col
            fields = [
                F.lit(None).alias(f.name)
                if _opaque(f)
                else _rebuild(col.getField(f.name), f.dataType).alias(f.name)
                for f in dt.fields
            ]
            return F.when(col.isNotNull(), F.struct(*fields))
        if isinstance(dt, T.ArrayType) and _differs(dt.elementType):
            return F.transform(col, lambda x: _rebuild(x, dt.elementType))
        return col

    def _differs(dt: T.DataType) -> bool:
        if isinstance(dt, T.StructType):
            return any(_opaque(f) or _differs(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _differs(dt.elementType)
        return False

    corrupt = "_kc_corrupt"
    if any(f.name == corrupt for f in schema.fields):  # pragma: no cover
        raise NotColumnCompilable(f"payload schema uses reserved field {corrupt}")
    parse_schema = _strip(schema)
    probe_schema = T.StructType(
        list(parse_schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    parsed = F.from_json(
        json_col, probe_schema, {"columnNameOfCorruptRecord": corrupt}
    )
    # PERMISSIVE from_json yields an all-null row (not NULL) for corrupt
    # input; gate on the corrupt-record column so bad payloads become a
    # NULL document — which every JMESPath construct propagates to NULL.
    # The explicit isNotNull matters: for a NULL input, parsed is NULL and
    # NULL[corrupt].isNull() is TRUE, which would fabricate a document.
    payload = F.when(
        json_col.isNotNull() & parsed[corrupt].isNull(),
        F.struct(
            *[
                F.lit(None).alias(f.name)
                if _opaque(f)
                else _rebuild(parsed[f.name], f.dataType).alias(f.name)
                for f in schema.fields
            ]
        ),
    )
    tc = compile_column(expression, payload, schema)
    if not json_faithful(tc.dtype):
        raise NotColumnCompilable(
            f"output type {tc.dtype.simpleString()} has no faithful JSON form"
        )
    return to_json_string(tc)
