"""Run the JMESPath compliance corpus against our Python evaluator.

The corpus is the public JMESPath compliance suite (jmespath.org /
github.com/jmespath/jmespath.test); the reference vendors a copy at
/root/reference/vendor/github.com/jmespath/go-jmespath/compliance/
(862 cases — SURVEY §5.2). We load it read-only from there rather than
copying it into the repo; tests skip if the corpus is unavailable.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from kinesiscat_spark.functions.jmespath import JMESPathError, compile_expr
from kinesiscat_spark.functions.jmespath.errors import ParseError

CORPUS = "/root/reference/vendor/github.com/jmespath/go-jmespath/compliance"

# Same whitelist as the reference runner (compliance_test.go:26-43).
FILES = [
    "basic.json", "boolean.json", "current.json", "escape.json",
    "filters.json", "functions.json", "identifiers.json", "indices.json",
    "literal.json", "multiselect.json", "ormatch.json", "pipe.json",
    "slice.json", "syntax.json", "unicode.json", "wildcard.json",
]

UNORDERED_HINTS = ("*", "values(", "keys(")


def _cases():
    if not os.path.isdir(CORPUS):
        return []
    out = []
    for fname in FILES:
        path = os.path.join(CORPUS, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            suites = json.load(f)
        for si, suite in enumerate(suites):
            for ci, case in enumerate(suite["cases"]):
                out.append(
                    pytest.param(
                        suite["given"], case, id=f"{fname}:{si}:{ci}:{case['expression'][:40]}"
                    )
                )
    return out


def _normalize(v):
    """Order-insensitive form for results that traverse unordered objects
    (Go map iteration order is random — SURVEY §2.2 J6)."""
    if isinstance(v, list):
        return sorted((json.dumps(_normalize(x), sort_keys=True) for x in v))
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    return v


def _num_normalize(v):
    if isinstance(v, float) and not math.isnan(v) and v == int(v):
        return int(v)
    if isinstance(v, list):
        return [_num_normalize(x) for x in v]
    if isinstance(v, dict):
        return {k: _num_normalize(x) for k, x in v.items()}
    return v


ALL_CASES = _cases()


@pytest.mark.skipif(not ALL_CASES, reason="compliance corpus not available")
@pytest.mark.parametrize("given,case", ALL_CASES)
def test_compliance(given, case):
    expression = case["expression"]
    if "error" in case:
        with pytest.raises(JMESPathError):
            compile_expr(expression).search(given)
        return
    try:
        result = compile_expr(expression).search(given)
    except ParseError as e:
        pytest.fail(f"parse error on valid expression {expression!r}: {e}")
    expected = case["result"]
    got, want = _num_normalize(result), _num_normalize(expected)
    if got != want:
        # retry order-insensitively for unordered-object traversals
        if any(h in expression for h in UNORDERED_HINTS) and _normalize(
            got
        ) == _normalize(want):
            return
        pytest.fail(f"{expression!r}: got {got!r}, want {want!r}")
