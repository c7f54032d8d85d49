"""JMESPath query language for Spark — the reference's query engine
re-expressed Spark-first.

The reference's entire relational surface is the JMESPath interpreter it
vendors (SURVEY §0; `/root/reference/vendor/github.com/jmespath/go-jmespath/`).
This package implements the same language (public spec, jmespath.org) with
one shared lexer/parser and three evaluation paths:

- ``search(expr, doc)`` / ``compile_expr(expr)`` — pure-Python document
  evaluation, full fidelity to the spec + the reference's 862-case
  compliance corpus. Semantic ground truth.
- ``jmespath_udf(expr)`` — Arrow-batched pandas UDF: JSON-string column →
  JSON-string result column, for arbitrary dynamic payloads. Compiled once
  per plan (the reference re-parses per record, `/root/reference/main.go:91`).
- ``compile_column(expr, col)`` (``columns.py``) — native Column tree for
  the statically-typeable subset (JVM-side, whole-stage codegen); raises
  ``NotColumnCompilable`` for callers to fall back to the UDF.
"""

from kinesiscat_spark.functions.jmespath.api import (
    CompiledExpression,
    compile_expr,
    jmespath_udf,
    search,
)
from kinesiscat_spark.functions.jmespath.errors import (
    JMESPathError,
    NotColumnCompilable,
)

__all__ = [
    "CompiledExpression",
    "compile_expr",
    "jmespath_udf",
    "search",
    "JMESPathError",
    "NotColumnCompilable",
]
