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
