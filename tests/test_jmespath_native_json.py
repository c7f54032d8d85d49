"""Differential sweep of the CLI's native K3 path: for every compliance
case whose document has a static schema and whose expression compiles with
a JSON-faithful output type, ``jmespath_native_json`` (JVM, whole-stage
codegen) must emit byte-identical JSON text to the Python evaluator's
``search_json`` — the contract that lets the CLI swap paths freely.

Corrupt and shape-mismatched payloads are additionally pinned to NULL
(the S9 skip policy) on the native path.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesiscat_spark.functions.jmespath.api import (
    compile_expr,
    jmespath_native_json,
)
from kinesiscat_spark.functions.jmespath.errors import (
    JMESPathError,
    NotColumnCompilable,
)
from kinesiscat_spark.functions.jmespath.schemas import (
    Unrepresentable,
    contains_empty_struct,
    infer_type,
)
from tests.test_jmespath_columns_corpus import ALL

CHUNK = 40


def _cases():
    """(case_id, expression, doc_json, schema) for every corpus case whose
    document is a statically-typeable OBJECT (the CLI payload shape)."""
    out = []
    for case_id, given, case in ALL:
        if not isinstance(given, dict):
            continue
        try:
            dtype = infer_type(given)
        except Unrepresentable:
            continue
        if contains_empty_struct(dtype) or not isinstance(dtype, T.StructType):
            continue
        out.append((case_id, case["expression"], json.dumps(given), dtype))
    return out


CASES = _cases()


@pytest.mark.skipif(not CASES, reason="compliance corpus not available")
def test_native_json_matches_evaluator_on_corpus(spark):
    compilable = []
    for case_id, expression, doc_json, schema in CASES:
        try:
            jmespath_native_json(expression, F.lit(doc_json), schema)
        except (NotColumnCompilable, JMESPathError):
            continue
        compilable.append((case_id, expression, doc_json, schema))
    assert len(compilable) >= 400  # the native path must carry real share

    failures = []
    for lo in range(0, len(compilable), CHUNK):
        batch = compilable[lo : lo + CHUNK]
        df = spark.range(1)
        cols = [
            jmespath_native_json(expr, F.lit(doc_json), schema).alias(f"r{i}")
            for i, (_, expr, doc_json, schema) in enumerate(batch)
        ]
        row = df.select(*cols).collect()[0]
        for i, (case_id, expr, doc_json, _) in enumerate(batch):
            want = compile_expr(expr).search_json(doc_json)
            got = row[f"r{i}"]
            if got != want:
                failures.append(f"{case_id} {expr!r}: native={got!r} want={want!r}")
    assert not failures, "\n".join(failures[:30]) + f"\n({len(failures)} total)"


def test_native_json_skips_corrupt_and_mismatched(spark):
    schema = T.StructType([T.StructField("k", T.LongType())])
    docs = ['{"k": 5}', "not json {", None, '"a json string"', "[1,2]"]
    df = spark.createDataFrame([(d,) for d in docs], "s string")
    out = df.select(jmespath_native_json("{k: k}", F.col("s"), schema).alias("r"))
    got = [r.r for r in out.collect()]
    # object payload evaluates; corrupt/null/non-object shapes are skipped
    assert got[0] == '{"k":5}'
    assert got[1] is None and got[2] is None
    assert got[3] is None and got[4] is None
