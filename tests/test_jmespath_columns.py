"""Differential test: native Column compilation vs the Python evaluator.

For each expression, evaluate (a) via compile_column on a typed struct
column and (b) via the pure-Python evaluator on the same docs; results must
agree. This pins the JVM hot path to the compliance-validated semantics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesiscat_spark.functions.jmespath import compile_expr
from kinesiscat_spark.functions.jmespath.columns import (
    JsonBoxType,
    compile_column,
)
from kinesiscat_spark.functions.jmespath.errors import NotColumnCompilable

def _f(name, dt):
    return T.StructField(name, dt)


SCHEMA = T.StructType(
    [
        _f("a", T.LongType()),
        _f("b", T.DoubleType()),
        _f("s", T.StringType()),
        _f("flag", T.BooleanType()),
        _f("arr", T.ArrayType(T.LongType())),
        _f("tags", T.ArrayType(T.StringType())),
        _f("nested", T.StructType([_f("x", T.LongType()), _f("y", T.StringType())])),
        _f("pair", T.StructType([_f("lo", T.LongType()), _f("hi", T.LongType())])),
        _f(
            "items",
            T.ArrayType(
                T.StructType([_f("name", T.StringType()), _f("v", T.LongType())])
            ),
        ),
    ]
)

DOCS = [
    {
        "a": 1, "b": 2.5, "s": "hello", "flag": True,
        "arr": [5, 3, 9, 1, 7], "tags": ["x", "y", "z"],
        "nested": {"x": 10, "y": "ten"},
        "pair": {"lo": 1, "hi": 9},
        "items": [
            {"name": "a", "v": 3}, {"name": "b", "v": 1}, {"name": "c", "v": 7},
        ],
    },
    {
        "a": 0, "b": -1.5, "s": "", "flag": False,
        "arr": [], "tags": [],
        "nested": {"x": None, "y": None},
        "pair": {"lo": 4, "hi": 4},
        "items": [],
    },
    {
        "a": None, "b": None, "s": "x", "flag": None,
        "arr": [2], "tags": ["only"],
        "nested": None,
        "pair": None,
        "items": None,
    },
    {
        # tied sort keys: max_by/min_by must keep the FIRST extremal item
        # (go jpfMaxBy/jpfMinBy strict >/<) and sort_by must be stable
        "a": 2, "b": 0.5, "s": "tie", "flag": True,
        "arr": [4, 4, 1, 4, 1], "tags": ["t", "t"],
        "nested": {"x": 4, "y": "four"},
        "pair": {"lo": 2, "hi": 2},
        "items": [
            {"name": "a", "v": 5}, {"name": "b", "v": 2}, {"name": "c", "v": 5},
            {"name": "d", "v": 2}, {"name": "e", "v": 5},
        ],
    },
]


def _random_docs(n: int = 24, seed: int = 17) -> list[dict]:
    """Seeded random documents conforming to SCHEMA — widens the
    differential beyond the curated cases (nulls, empties, ties, negative
    and duplicate values in every position)."""
    import random

    rng = random.Random(seed)

    def maybe(v, p=0.15):
        return None if rng.random() < p else v

    def word():
        return "".join(rng.choice("abcxyz") for _ in range(rng.randint(0, 4)))

    out = []
    for _ in range(n):
        out.append(
            {
                "a": maybe(rng.randint(-5, 5)),
                "b": maybe(rng.choice([0.0, -1.5, 2.5, 7.25, -0.0])),
                "s": maybe(word()),
                "flag": maybe(rng.choice([True, False])),
                "arr": maybe([rng.randint(-9, 9) for _ in range(rng.randint(0, 7))], 0.1),
                "tags": maybe([word() for _ in range(rng.randint(0, 4))], 0.1),
                "nested": maybe({"x": maybe(rng.randint(0, 20)), "y": maybe(word())}),
                "pair": maybe({"lo": rng.randint(0, 5), "hi": rng.randint(0, 5)}),
                "items": maybe(
                    [
                        {"name": maybe(word(), 0.1), "v": rng.randint(0, 6)}
                        for _ in range(rng.randint(0, 5))
                    ],
                    0.1,
                ),
            }
        )
    return out


DOCS = DOCS + _random_docs()

EXPRESSIONS = [
    # traversal
    "a", "nested.x", "nested.y", "missing", "nested.missing", "pair.lo",
    "arr[0]", "arr[-1]", "arr[10]", "items[1].name",
    # slices
    "arr[1:3]", "arr[:2]", "arr[::2]", "arr[::-1]", "arr[3:1:-1]", "arr[-2:]",
    # projections
    "items[*].name", "items[*].v", "arr[*]", "items[:2].v",
    "items[?v > `2`].name", "items[?name == 'b'].v", "tags[?@ == 'x']",
    # multiselect
    "{x: a, s: s}", "[a, b]", "nested.{only: x}", "[a]",
    # boolean / comparator
    "a == `1`", "a != `1`", "a < b", "b >= `0`", "s == 'hello'",
    "a || b", "s || 'dflt'", "flag && a", "a && flag", "!flag", "!s", "!arr",
    "nested.x == `10` && s == 'hello'",
    # functions
    "abs(b)", "ceil(b)", "floor(b)", "sum(arr)", "avg(arr)",
    "length(s)", "length(arr)", "length(nested)",
    "contains(s, 'ell')", "contains(arr, `9`)", "contains(tags, 'x')",
    "starts_with(s, 'he')", "ends_with(s, 'lo')",
    "join('-', tags)", "reverse(tags)", "reverse(s)",
    "keys(nested)", "values(pair)", "not_null(missing, a, b)",
    "max(arr)", "min(arr)", "sort(arr)", "sort(tags)",
    "sort_by(items, &v)[0].name", "max_by(items, &v).name",
    "min_by(items, &v).v", "min_by(items, &v).name",
    "sort_by(items, &v)[*].name", "map(&v, items)", "map(&name, items)",
    "to_array(a)", "to_array(arr)", "to_string(a)", "to_string(nested)",
    "to_number(s)", "to_number(a)", "type(a)", "type(s)", "type(arr)",
    "type(nested)", "type(missing)",
    "merge(nested, pair)", "merge(pair, {hi: `99`})",
    # composition
    "items[?v >= `3`] | length(@)", "sort_by(items, &v) | [-1].name",
    "arr | [0]", "[a, b] | [1]",
]


def _plainify(v):
    if isinstance(v, Row):
        return {k: _plainify(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_plainify(x) for x in v]
    if isinstance(v, dict):
        return {k: _plainify(x) for k, x in v.items()}
    return v


def _agree(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b and isinstance(a, bool) == isinstance(b, bool)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_agree(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_agree(v, b[k]) for k, v in a.items())
    return a == b


@pytest.fixture(scope="module")
def typed_df(spark):
    rows = [Row(**d) for d in DOCS]
    df = spark.createDataFrame(rows, SCHEMA)
    return df.select(F.struct(*[F.col(f.name) for f in SCHEMA.fields]).alias("doc"))


_RAISES = object()  # evaluator raised a runtime type error on this doc


@pytest.mark.parametrize("expression", EXPRESSIONS)
def test_column_matches_evaluator(spark, typed_df, expression):
    from kinesiscat_spark.functions.jmespath import JMESPathError

    compiled = compile_expr(expression)
    expected = []
    for doc in DOCS:
        try:
            expected.append(compiled.search(doc))
        except JMESPathError:
            expected.append(_RAISES)
    try:
        typed = compile_column(compiled.ast, F.col("doc"), SCHEMA)
    except NotColumnCompilable as e:
        pytest.skip(f"not column-compilable: {e}")
    got = [_plainify(r[0]) for r in typed_df.select(typed.col).collect()]
    if isinstance(typed.dtype, JsonBoxType):
        import json as _json

        got = [None if g is None else _plainify(_json.loads(g)) for g in got]
    for g, e, doc in zip(got, expected, DOCS):
        if e is _RAISES:
            # Documented deviation: per-row runtime type errors cannot raise
            # from a native Column — the hot path yields null; the pandas-UDF
            # path (api.jmespath_udf) preserves strict error fidelity.
            assert g is None, (
                f"{expression!r} on {doc!r}: evaluator raised, column gave {g!r}"
            )
            continue
        assert _agree(g, e), (
            f"{expression!r} on {doc!r}:\n  column   = {g!r}\n  evaluator= {e!r}"
        )


# --- json-box machinery pins ------------------------------------------------
# The compliance-corpus sweep (test_jmespath_columns_corpus) covers values
# broadly; these pin the box-specific invariants directly.


def _box_schema_and_rows():
    """A table whose `v` field is dynamically typed (BOXED) and whose
    elements pad against each other (SHADOW), built via infer_type."""
    from kinesiscat_spark.functions.jmespath.schemas import (
        infer_type,
        to_spark_value,
    )

    docs = [
        {"items": [{"v": 1}, {"v": 1.0}, {"v": "1"}, {"v": True},
                   {"v": [1, 2]}, {"v": {"b": 2, "a": 1}}, {"v": None}, {}]},
    ]
    dtype = infer_type(docs[0])
    rows = [(to_spark_value(d, dtype),) for d in docs]
    schema = T.StructType([T.StructField("doc", dtype)])
    return schema, rows, dtype


def test_boxed_equality_canonicalizes_numbers(spark):
    """1 and 1.0 are the same JMESPath number; a boxed 1.0 must equal the
    literal `1`, while the STRING "1" and boolean true must not."""
    schema, rows, dtype = _box_schema_and_rows()
    df = spark.createDataFrame(rows, schema)
    typed = compile_column("items[?v == `1`]", F.col("doc"), dtype)
    assert isinstance(typed.dtype, JsonBoxType)
    import json as _json

    got = _json.loads(df.select(typed.col).collect()[0][0])
    assert got == [{"v": 1}, {"v": 1.0}]


def test_boxed_object_equality_sorts_keys(spark):
    """Deep equality on boxed objects must not depend on key order."""
    schema, rows, dtype = _box_schema_and_rows()
    df = spark.createDataFrame(rows, schema)
    typed = compile_column('items[?v == `{"a": 1, "b": 2}`]', F.col("doc"), dtype)
    import json as _json

    got = _json.loads(df.select(typed.col).collect()[0][0])
    assert got == [{"v": {"a": 1, "b": 2}}]


def test_shadow_preserves_key_absence(spark):
    """A padded element that never had the key must round-trip as {} —
    not as {"v": null} — through a boxed result."""
    schema, rows, dtype = _box_schema_and_rows()
    df = spark.createDataFrame(rows, schema)
    typed = compile_column("items[-1:]", F.col("doc"), dtype)
    import json as _json

    got = _json.loads(df.select(typed.col).collect()[0][0])
    assert got == [{}]


def test_boxed_null_vs_missing_both_equal_null(spark):
    """`v == null` matches explicit null; the no-key element also matches
    (JMESPath missing-key access yields null)."""
    schema, rows, dtype = _box_schema_and_rows()
    df = spark.createDataFrame(rows, schema)
    typed = compile_column("length(items[?v == `null`])", F.col("doc"), dtype)
    got = df.select(typed.col).collect()[0][0]
    assert got == 2


def test_box_path_is_python_free(spark):
    """The whole box pipeline must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes in the plan of a boxed expression."""
    schema, rows, dtype = _box_schema_and_rows()
    df = spark.createDataFrame(rows, schema)
    typed = compile_column("items[?v]", F.col("doc"), dtype)
    plan = df.select(typed.col)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_merge_on_maps_requires_last_win_policy(spark):
    """merge() compiles to map_concat, whose right-wins semantics exist
    only under mapKeyDedupPolicy=LAST_WIN; in a session with the default
    EXCEPTION policy the compiler must refuse (UDF fallback) instead of
    throwing at runtime on overlapping keys."""
    map_schema = T.StructType(
        [
            T.StructField("m1", T.MapType(T.StringType(), T.LongType())),
            T.StructField("m2", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    old = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        with pytest.raises(NotColumnCompilable, match="LAST_WIN"):
            compile_column("merge(m1, m2)", F.col("doc"), map_schema)
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        typed = compile_column("merge(m1, m2)", F.col("doc"), map_schema)
        df = spark.createDataFrame(
            [(({"a": 1, "b": 2}, {"b": 9}),)],
            T.StructType([T.StructField("doc", map_schema)]),
        )
        got = df.select(typed.col.alias("r")).collect()[0].r
        assert got == {"a": 1, "b": 9}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", old)


def test_box_member_access_via_variant(spark):
    """Field and index access INTO a boxed dynamic value runs JVM-side
    through the variant runtime: missing members and non-containers yield
    null, explicit JSON nulls normalize to null, and extracted values are
    again canonical boxes (sorted keys)."""
    from kinesiscat_spark.functions.jmespath.schemas import (
        infer_type,
        to_spark_value,
    )

    doc = {
        "items": [
            {"v": {"kind": "basic", "n": 1}},
            {"v": [10, 20]},
            {"v": "scalar"},
            {"v": None},
            {"v": {"kind": None}},
        ]
    }
    dtype = infer_type(doc)
    schema = T.StructType([T.StructField("doc", dtype)])
    df = spark.createDataFrame([(to_spark_value(doc, dtype),)], schema)
    import json as _json

    def run(expression):
        typed = compile_column(expression, F.col("doc"), dtype)
        assert isinstance(typed.dtype, JsonBoxType), expression
        raw = df.select(typed.col).collect()[0][0]
        return None if raw is None else _json.loads(raw)

    assert run("items[*].v.kind") == ["basic"]  # others -> null -> dropped
    assert run("items[0].v.n") == 1
    assert run("items[1].v[1]") == 20
    assert run("items[1].v[5]") is None
    assert run("items[2].v.kind") is None  # member of a string -> null
    assert run("items[0].v") == {"kind": "basic", "n": 1}
    # plan stays JVM-only
    typed = compile_column("items[*].v.kind", F.col("doc"), dtype)
    plan = df.select(typed.col)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_box_iteration_via_variant(spark):
    """Projections, flatten, slices, filters, and the container functions
    over a boxed dynamic value run JVM-side by exploding the box into
    array<variant>/map<string,variant> — differential against the pure
    evaluator on documents exercising every box-iteration path."""
    from kinesiscat_spark.functions.jmespath import search
    from kinesiscat_spark.functions.jmespath.schemas import (
        infer_type,
        to_spark_value,
    )

    # `v` is dynamic (heterogeneous across docs) -> BOXED field
    doc = {
        "v": [1, [2, 3], None, {"k": "x"}, [], "s", [[4], 5]],
        "o": {"b": 2, "a": [1, None], "weird key!": {"z": 9}},
        "w": "héllo",
    }
    alt = {"v": {"obj": True}, "o": {"a": 1, "b": 2, "weird key!": 3}, "w": ""}
    dtype = infer_type([doc, alt][0])  # force per-field boxing via union
    from kinesiscat_spark.functions.jmespath.schemas import infer_type as it

    dtype = it(doc)
    # make every top-level field a box by inferring over both docs
    both = it(doc)
    schema = T.StructType([T.StructField("doc", both)])
    df = spark.createDataFrame([(to_spark_value(doc, both),)], schema)
    import json as _json

    def run(expression):
        typed = compile_column(expression, F.col("doc"), both)
        raw = df.select(typed.col.alias("r")).collect()[0].r
        if isinstance(typed.dtype, JsonBoxType):
            return None if raw is None else _json.loads(raw)
        return raw

    UNORDERED = {"o.*", "values(o)"}
    for expression in [
        "v[*]",            # identity projection drops JSON nulls
        "v[]",             # one-level flatten keeps nulls and non-arrays
        "v[] | length(@)",
        "v[1:5]",
        "v[::-1]",
        "v[-1]",
        "v[?@]",           # truthy filter over boxed elements
        "o.*",             # object-value projection (unordered)
        'o."weird key!".z',
        "to_array(v[3])",
        "to_array(v[9])",
        "length(v)",
        "length(o)",
        "length(w)",
        "values(o)",
        "reverse(v[1])",
        "reverse(w)",
        "contains(v[1], `2`)",
        "contains(v, `null`)",
        "contains(w, 'él')",
        "contains(w, `5`)",
        "to_string(v[3])",
        "to_string(w)",
        "v[].to_number(@)",
    ]:
        want = search(expression, doc)
        got = run(expression)
        if expression in UNORDERED and isinstance(got, list):
            key = lambda x: _json.dumps(x, sort_keys=True)  # noqa: E731
            assert sorted(got, key=key) == sorted(want, key=key), expression
        else:
            assert got == want, (expression, got, want)

    # the whole family stays JVM-only
    typed = compile_column("v[] | [0]", F.col("doc"), both)
    plan = df.select(typed.col)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_box_chain_parses_once(spark):
    """A chained member access into a box compiles to ONE try_parse_json +
    one deep variant path — not a parse/serialize round-trip per level
    (the _VariantPath coalescing; 25x on a 4-deep chain at 1M rows)."""
    import json as _json

    box_txt = _json.dumps(
        {"a": {"b": {"c": {"d": 42, "e": None}, "z": [1, 2, 3]}}},
        separators=(",", ":"),
        sort_keys=True,
    )
    df = spark.createDataFrame([(box_txt,)], ["v"])
    typed = compile_column("a.b.c.d", F.col("v"), JsonBoxType())
    assert isinstance(typed.dtype, JsonBoxType)
    plan = (
        df.select(typed.col.alias("r"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the whole chain is ONE deep path; the parse appears at most twice
    # (the null-normalizing CASE WHEN prints its branch expression twice)
    assert "$.a.b.c.d" in plan, plan
    assert plan.count("parseJson") <= 2, plan
    assert df.select(typed.col.alias("r")).collect()[0].r == "42"
    # explicit JSON null at the end of a chain still normalizes to NULL,
    # and index steps extend the same path
    for expr, want in [
        ("a.b.c.e", None),
        ("a.b.z[1]", "2"),
        ("a.b.missing.x", None),
    ]:
        t = compile_column(expr, F.col("v"), JsonBoxType())
        got = df.select(t.col.alias("r")).collect()[0].r
        assert got == want, (expr, got, want)


def test_box_folds_via_variant(spark):
    """sum/avg/min/max/sort/map over boxed runtime arrays run JVM-side,
    differential against the pure evaluator on valid inputs; invalid
    shapes yield null (documented box deviation, evaluator raises)."""
    import json as _json

    from kinesiscat_spark.functions.jmespath import search
    from kinesiscat_spark.functions.jmespath.errors import JMESPathError

    docs = {
        "nums": [3, 1.5, 2],
        "strs": ["b", "a", "c"],
        "empty": [],
        "mixed": [1, "a"],
        "nested": [[1], [2, 3]],
    }
    box_txt = _json.dumps(docs, separators=(",", ":"), sort_keys=True)
    df = spark.createDataFrame([(box_txt,)], ["v"])

    def run(expression):
        typed = compile_column(expression, F.col("v"), JsonBoxType())
        raw = df.select(typed.col.alias("r")).collect()[0].r
        if isinstance(typed.dtype, JsonBoxType):
            return None if raw is None else _json.loads(raw)
        return raw

    valid = [
        "sum(nums)", "avg(nums)", "min(nums)", "max(nums)", "sort(nums)",
        "min(strs)", "max(strs)", "sort(strs)",
        "sum(empty)", "min(empty)", "max(empty)", "sort(empty)",
        "map(&@, nums)", "map(&to_string(@), nums)", "map(&[0], nested)",
    ]
    doc = docs
    for expression in valid:
        want = search(expression, doc)
        got = run(expression)
        assert got == want, (expression, got, want)
    # avg([]) is null on both paths
    assert run("avg(empty)") is None and search("avg(empty)", doc) is None
    # invalid shapes: evaluator raises, box path yields null (deviation)
    for expression in ["sum(mixed)", "min(mixed)", "sort(mixed)", "sum(strs)"]:
        with pytest.raises(JMESPathError):
            search(expression, doc)
        assert run(expression) is None, expression
    # plan stays JVM-only
    typed = compile_column("sort(nums)", F.col("v"), JsonBoxType())
    plan = df.select(typed.col)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_box_keyed_folds_via_variant(spark):
    """sort_by/min_by/max_by over boxed runtime arrays: numeric and
    string keys, stability and first-extremal tie rules, null on
    non-uniform keys (box deviation; evaluator raises)."""
    import json as _json

    from kinesiscat_spark.functions.jmespath import search
    from kinesiscat_spark.functions.jmespath.errors import JMESPathError

    doc = {
        "items": [
            {"n": "a", "v": 5}, {"n": "b", "v": 2}, {"n": "c", "v": 5},
            {"n": "d", "v": 2}, {"n": "e", "v": 5},
        ],
        "strk": [{"k": "z", "i": 0}, {"k": "a", "i": 1}, {"k": "z", "i": 2}],
        "empty": [],
        "badkey": [{"v": 1}, {"v": "x"}],
    }
    box_txt = _json.dumps(doc, separators=(",", ":"), sort_keys=True)
    df = spark.createDataFrame([(box_txt,)], ["v"])

    def run(expression):
        typed = compile_column(expression, F.col("v"), JsonBoxType())
        raw = df.select(typed.col.alias("r")).collect()[0].r
        if isinstance(typed.dtype, JsonBoxType):
            return None if raw is None else _json.loads(raw)
        return raw

    for expression in [
        "sort_by(items, &v)",          # stable on tied keys
        "sort_by(items, &n)",
        "sort_by(strk, &k)",
        "max_by(items, &v)",           # FIRST max on ties
        "min_by(items, &v)",           # FIRST min on ties
        "max_by(strk, &k)",
        "min_by(strk, &k)",
        "sort_by(empty, &v)",
        "max_by(empty, &v)",
    ]:
        want = search(expression, doc)
        got = run(expression)
        assert got == want, (expression, got, want)
    # non-uniform key types: evaluator raises, box path yields null
    with pytest.raises(JMESPathError):
        search("sort_by(badkey, &v)", doc)
    assert run("sort_by(badkey, &v)") is None
    assert run("max_by(badkey, &v)") is None
