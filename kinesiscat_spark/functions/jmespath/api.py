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

    corrupt = "_kc_corrupt"
    if any(f.name == corrupt for f in schema.fields):  # pragma: no cover
        raise NotColumnCompilable(f"payload schema uses reserved field {corrupt}")
    probe_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    parsed = F.from_json(
        json_col, probe_schema, {"columnNameOfCorruptRecord": corrupt}
    )
    # PERMISSIVE from_json yields an all-null row (not NULL) for corrupt
    # input; gate on the corrupt-record column so bad payloads become a
    # NULL document — which every JMESPath construct propagates to NULL.
    payload = F.when(
        parsed[corrupt].isNull(),
        F.struct(*[parsed[f.name].alias(f.name) for f in schema.fields]),
    )
    tc = compile_column(expression, payload, schema)
    if not json_faithful(tc.dtype):
        raise NotColumnCompilable(
            f"output type {tc.dtype.simpleString()} has no faithful JSON form"
        )
    return to_json_string(tc)
