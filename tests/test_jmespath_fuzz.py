"""Hypothesis fuzz tests for the JMESPath engine (SURVEY §5.3).

Two properties the compliance corpus cannot exhaust:
- the lexer/parser NEVER escapes with a raw Python exception — any input
  either parses or raises a typed JMESPathError (the reference's parser
  contract: jp/parser.go returns SyntaxError values, never panics);
- slice semantics equal Python list slicing for every (start, stop, step)
  — the spec defines slices in Python's terms (jp/util.go:54-138).
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesiscat_spark.functions.jmespath import compile_expr, search
from kinesiscat_spark.functions.jmespath.errors import JMESPathError

# printable junk, biased toward JMESPath metacharacters
_META = "[]{}.*?@&|!<>=,:`'\"\\$()#- "
_junk = st.text(
    alphabet=st.sampled_from(_META + string.ascii_letters + string.digits),
    min_size=0,
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(_junk)
def test_parser_never_escapes_with_raw_exception(expression):
    try:
        compile_expr(expression)
    except JMESPathError:
        pass  # typed error — the contract
    except RecursionError as e:  # pragma: no cover
        raise AssertionError(f"parser recursion blowup on {expression!r}") from e


@settings(max_examples=300, deadline=None)
@given(_junk, st.dictionaries(st.text(max_size=5), st.integers(), max_size=3))
def test_eval_never_escapes_with_raw_exception(expression, doc):
    try:
        search(expression, doc)
    except JMESPathError:
        pass


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(-100, 100), max_size=12),
    st.one_of(st.none(), st.integers(-15, 15)),
    st.one_of(st.none(), st.integers(-15, 15)),
    st.one_of(st.none(), st.integers(-15, 15).filter(lambda x: x != 0)),
)
def test_slice_semantics_equal_python(arr, start, stop, step):
    """JMESPath slices are DEFINED as Python slices (spec; jp/util.go)."""
    expression = "@[{}:{}:{}]".format(
        "" if start is None else start,
        "" if stop is None else stop,
        "" if step is None else step,
    )
    assert search(expression, arr) == arr[start:stop:step]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-100, 100), max_size=12), st.integers(-15, 15))
def test_index_semantics_equal_python(arr, i):
    """Indexing incl. negative; out-of-range → null (not an error)."""
    got = search(f"@[{i}]", arr)
    expected = arr[i] if -len(arr) <= i < len(arr) else None
    assert got == expected
