"""JMESPath AST → native Spark Column compiler (the hot path).

Compiles the statically-typeable subset of JMESPath straight to Catalyst
Column trees — JVM-side, inside whole-stage codegen, no Python in the loop.
The input is a *typed* column (e.g. the struct produced by ``from_json``);
the compiler threads Spark DataTypes through the AST, resolving every node's
output type at plan time. Any construct whose type can't be resolved
statically raises ``NotColumnCompilable`` and the caller falls back to the
Arrow-batched pandas UDF (``api.jmespath_udf``), mirroring how the dynamic
reference interpreter behaves on arbitrary JSON
(`/root/reference/vendor/github.com/jmespath/go-jmespath/interpreter.go`).

Key semantic bridges (SURVEY §1.3, §2.2):
- truthiness: false/null/''/[]/{} falsy, 0 truthy → per-type boolean Column;
- `a || b` / `a && b` are value-returning, not boolean;
- `==` is null-safe deep equality (null == null is true);
- ordering comparators yield null unless both sides are numbers;
- missing struct fields compile to typed NULL literals, never errors.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesiscat_spark.let import let_
from kinesiscat_spark.functions.jmespath.errors import (
    InvalidArityError,
    NotColumnCompilable,
    UnknownFunctionError,
)
from kinesiscat_spark.functions.jmespath.parser import Node, parse
from kinesiscat_spark.functions.jmespath.schemas import (
    BOXED,
    BOXED_ELEM,
    OPAQUE,
    PADDED,
    SHADOW,
    SHADOW_NAME,
    canonical_json,
    has_markers,
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _is_num(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC)


def _no_markers(dt: T.DataType, what: str) -> None:
    """Refuse operations that could observe absent-vs-null on key-union
    (PADDED) or value-dropped (OPAQUE) schema fields — see schemas.py."""
    if has_markers(dt):
        raise NotColumnCompilable(f"{what} on a schema-padded object type")


class JsonBoxType(T.DataType):
    """Compiler-internal sentinel: the column is a STRING holding the
    value's canonical JSON text (schemas.canonical_json — sorted keys,
    compact, integral floats as ints), with SQL NULL encoding JMESPath
    null. Never appears in a real Spark schema — ``_storage`` maps it to
    StringType wherever an actual cast target is needed.

    Boxes are how the dynamically-typed tail of JMESPath (heterogeneous
    or/and, mixed multiselects, BOXED schema fields) stays on the native
    path: truthiness, deep equality, and JSON-total functions operate on
    the canonical text directly, and traversal/iteration (member access,
    index, slice, the three projections, flatten, to_array/to_string/
    length/keys/values/reverse/contains) runs through the variant runtime
    (``try_parse_json`` + ``from_json`` to array<variant>/map<string,
    variant>), including the arithmetic/ordered folds (sum/avg/min/max/
    sort/map) and the &expr-keyed folds (sort_by/min_by/max_by), all
    guarded by all-numbers / all-strings runtime checks — the ENTIRE
    operator and function surface evaluates boxes natively. Two
    divergences from the evaluator, by design: (a) invalid-type errors
    inside boxed operands yield null instead of raising (the static path
    cannot see the type mismatch; callers that need error fidelity use
    the UDF), and (b) float repr outside ±2^53 follows Java, so
    ``json_faithful`` stays False for boxes and the byte-exact CLI path
    falls back to the UDF.
    """

    def simpleString(self) -> str:
        return "jsonbox"


_JSONBOX = JsonBoxType()


class _VariantPath(JsonBoxType):
    """Internal JsonBox refinement: the text column was produced by a
    variant-path extraction, and the (parsed-once) root variant plus the
    path are kept so that a FURTHER field/index access extends the path —
    one ``try_parse_json`` + one deep ``try_variant_get`` + one
    ``to_json`` for the whole chain, instead of a parse/serialize
    round-trip per level (measured 48× on a 4-deep chain over 1M rows).
    Everything except ``_c_field``/``_c_index`` sees an ordinary JsonBox:
    ``Typed.col`` is still the canonical text."""

    def __init__(self, base: Column, path: str) -> None:
        self.base = base
        self.path = path

    # DataType.__eq__ compares __dict__, which would invoke Column.__eq__
    # (an expression builder, not a bool) — use identity instead; two
    # distinct extractions never unify as "the same type" anyway.
    def __eq__(self, other: object) -> bool:
        return self is other

    def __hash__(self) -> int:
        return id(self)


def _is_box(dt: T.DataType) -> bool:
    return isinstance(dt, JsonBoxType)


def _demote_vpath(dt: T.DataType) -> T.DataType:
    """Strip _VariantPath refinements down to plain JsonBox, recursively.

    A _VariantPath's ``base`` column is only meaningful inside the lambda
    scope (or expression chain) that created it.  When a type crosses a
    lambda boundary — an HOF's declared element/result type, or a key
    compile against a FRESH lambda variable — the fast-path base would be
    a stale probe placeholder or another lambda's variable, and extending
    it silently yields NULL for every element (found by the round-6 third
    fuzz expansion: ``map(&k0, items[?...])`` and ``sort_by(..., &k0)``
    returned nulls over filter-projection subjects).  Plain JsonBox
    semantics (re-parse the element's canonical text on access) are always
    correct; only the parse-once optimization is lost."""
    if isinstance(dt, _VariantPath):
        return _JSONBOX
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_demote_vpath(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            dt.keyType, _demote_vpath(dt.valueType), dt.valueContainsNull
        )
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    f.name, _demote_vpath(f.dataType), f.nullable, f.metadata
                )
                for f in dt.fields
            ]
        )
    return dt


def _contains_box(dt: T.DataType) -> bool:
    if _is_box(dt):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_box(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_box(f.dataType) for f in dt.fields)
    return False


def _storage(dt: T.DataType) -> T.DataType:
    """The real Spark type underlying a (possibly box-bearing) dtype."""
    if _is_box(dt):
        return T.StringType()
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_storage(dt.elementType))
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _storage(f.dataType), f.nullable, f.metadata)
                for f in dt.fields
            ]
        )
    return dt


@dataclass(frozen=True)
class Typed:
    """A Column plus its statically-known Spark type."""

    col: Column
    dtype: T.DataType


def _null(dtype: T.DataType = T.NullType()) -> Typed:
    return Typed(F.lit(None).cast(_storage(dtype)), dtype)


# Functions whose RETURN value is truthy whenever they return at all:
# sum/length/abs/ceil/floor yield a number (0 included — truthy in
# JMESPath), type() a non-empty string. avg/to_number are excluded (null
# on empty/unparseable), merge/to_string are excluded ({}/"" are falsy).
_TRUTHY_RETURN_FNS = frozenset(
    {"sum", "length", "abs", "ceil", "floor", "type"}
)


_NO_CONST = object()


def _closed(node: Node) -> bool:
    """True when the subtree's value cannot depend on the document:
    a literal; a pipe whose LEFT side is closed (JMESPath has no root
    reference, so the right side sees only the piped value); or a
    function call whose every argument is closed (expref arguments
    apply to elements of those closed arguments, so they are closed
    too)."""
    if node.type == "literal":
        return True
    if node.type == "pipe":
        return _closed(node.children[0])
    if node.type == "function_call":
        return all(
            c.type == "expref" or _closed(c) for c in node.children
        )
    return False


def _static_truthiness(node: Node):
    """JMESPath truthiness of a subtree decided at COMPILE time:
    True / False when decidable, None otherwise. Used by ||/&& to prune
    the branch the evaluator's short-circuit would never reach."""
    if _closed(node):
        from kinesiscat_spark.functions.jmespath import evaluator
        from kinesiscat_spark.functions.jmespath.errors import JMESPathError

        try:
            val = evaluator.evaluate(node, None)
        except JMESPathError:
            return None
        return val not in (None, False) and val != "" and val != [] and val != {}
    if node.type == "function_call" and node.value in _TRUTHY_RETURN_FNS:
        return True
    return None


def truthy(tc: Typed) -> Column:
    """JMESPath truthiness as a non-null BooleanType Column."""
    dt = tc.dtype
    if _is_box(dt):
        # canonical text of every falsy value is one of these four
        return tc.col.isNotNull() & ~tc.col.isin("false", '""', "[]", "{}")
    if isinstance(dt, T.NullType):
        return F.lit(False)
    if isinstance(dt, T.BooleanType):
        return tc.col.eqNullSafe(F.lit(True))
    if isinstance(dt, T.StringType):
        return tc.col.isNotNull() & (F.length(tc.col) > 0)
    if isinstance(dt, T.ArrayType):
        return tc.col.isNotNull() & (F.size(tc.col) > 0)
    if isinstance(dt, T.MapType):
        return tc.col.isNotNull() & (F.size(tc.col) > 0)
    if isinstance(dt, T.StructType):
        shadow = _shadow_field(dt)
        if shadow is not None:
            # key presence is dynamic, but the shadow text decides {}
            return tc.col.isNotNull() & (
                tc.col.getField(SHADOW_NAME) != F.lit("{}")
            )
        if has_markers(dt):
            # a key-union struct may represent {} (all fields padded-null),
            # whose truthiness (falsy) is not statically decidable
            raise NotColumnCompilable("truthiness of a schema-padded object")
        return tc.col.isNotNull() if dt.fields else F.lit(False)
    # numbers (0 included) and anything else non-null are truthy
    return tc.col.isNotNull()


def _shadow_field(dt: T.DataType) -> T.StructField | None:
    if not isinstance(dt, T.StructType):
        return None
    for f in dt.fields:
        if (f.metadata or {}).get(SHADOW):
            return f
    return None


def _json_text(tc: Typed) -> Column:
    """Canonical JSON text of a Typed value (NULL for JMESPath null) —
    the Column-side twin of ``schemas.canonical_json``. Raises
    ``NotColumnCompilable`` for shapes whose text cannot be reconstructed
    (PADDED structs without a shadow, maps, opaque fields)."""
    dt, col = tc.dtype, tc.col
    if _is_box(dt):
        return col
    if isinstance(dt, T.NullType):
        return F.lit(None).cast("string")
    if isinstance(dt, T.BooleanType):
        return F.when(col, "true").when(~col, "false")
    if _is_num(dt):
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            d = col.cast("double")
            exact = F.lit(2.0**53)
            lng = d.cast("long")
            integral = (d >= -exact) & (d <= exact) & (d == lng.cast("double"))
            return F.when(integral, lng.cast("string")).otherwise(
                d.cast("string")
            )
        return col.cast("string")
    if isinstance(dt, T.StringType):
        # quote + escape via a 1-element array round-trip through to_json
        j = F.to_json(F.array(col), {"ignoreNullFields": "false"})
        return F.when(col.isNotNull(), j.substr(F.lit(2), F.length(j) - 2))
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        inner = F.transform(
            col,
            lambda e: F.coalesce(_json_text(Typed(e, elem)), F.lit("null")),
        )
        return F.when(
            col.isNotNull(),
            F.concat(F.lit("["), F.array_join(inner, ","), F.lit("]")),
        )
    if isinstance(dt, T.StructType):
        shadow = _shadow_field(dt)
        if shadow is not None:
            return col.getField(SHADOW_NAME)
        parts = []
        for f in sorted(dt.fields, key=lambda f: f.name):
            md = f.metadata or {}
            if md.get(PADDED) or md.get(OPAQUE):
                raise NotColumnCompilable(
                    "cannot serialize a padded object without a shadow"
                )
            if md.get(BOXED):
                val = F.coalesce(col.getField(f.name), F.lit("null"))
            elif md.get(BOXED_ELEM):
                val = F.coalesce(
                    _json_text(
                        Typed(col.getField(f.name), T.ArrayType(_JSONBOX))
                    ),
                    F.lit("null"),
                )
            else:
                val = F.coalesce(
                    _json_text(Typed(col.getField(f.name), f.dataType)),
                    F.lit("null"),
                )
            parts.append(F.concat(F.lit(json.dumps(f.name) + ":"), val))
        body = F.concat_ws(",", *parts) if parts else F.lit("")
        return F.when(
            col.isNotNull(), F.concat(F.lit("{"), body, F.lit("}"))
        )
    raise NotColumnCompilable(f"cannot box {dt.simpleString()}")


def box(tc: Typed) -> Typed:
    """Re-express any serializable Typed value as a JsonBox."""
    if _is_box(tc.dtype):
        return tc
    return Typed(_json_text(tc), _JSONBOX)


def _unify(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common type for value-returning or/and + multiselect lists."""
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if _is_num(a) and _is_num(b):
        if T.DoubleType() in (a, b) or T.FloatType() in (a, b):
            return T.DoubleType()
        return T.LongType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        elem = _unify(a.elementType, b.elementType)
        return T.ArrayType(elem) if elem is not None else None
    return None


def _coerce(tc: Typed, target: T.DataType) -> Typed:
    if tc.dtype == target:
        return tc
    return Typed(tc.col.cast(_storage(target)), target)


class ColumnCompiler:
    def compile(self, node: Node, doc: Typed) -> Typed:
        # Constant folding (round 7): a closed subtree (value provably
        # independent of the document — see _closed) partially evaluates
        # with the tree evaluator at compile time and compiles as the
        # resulting literal. Besides being free at runtime, this reaches
        # branches the type checker would refuse (e.g. a container
        # function over a value piped from literals). An evaluation
        # ERROR falls through to the normal compile path — raising is
        # the evaluator's behavior there, and the static refusal that
        # may follow is the honest Column-side equivalent.
        if node.type != "literal" and _closed(node):
            from kinesiscat_spark.functions.jmespath import evaluator
            from kinesiscat_spark.functions.jmespath.errors import (
                JMESPathError,
            )

            try:
                val = evaluator.evaluate(node, None)
            except JMESPathError:
                val = _NO_CONST
            if val is not _NO_CONST:
                return self._c_literal(Node("literal", (), val), doc)
        method = getattr(self, f"_c_{node.type}", None)
        if method is None:
            raise NotColumnCompilable(f"no column compilation for {node.type}")
        return method(node, doc)

    # --- structure traversal ---------------------------------------------
    @staticmethod
    def _box_get(box: Column, path: str) -> Column:
        """Dynamic member access inside a boxed JSON value, JVM-side via
        the variant runtime: parse the canonical text, extract ``path`` as
        a variant, serialize back. Variant objects serialize with SORTED
        keys and canonical number forms, so the result is again a valid
        box. Missing member / non-container → SQL NULL (JMESPath null);
        an explicit JSON null serializes to the 4-char text 'null', which
        no other value produces, and normalizes to SQL NULL.
        """
        g = F.try_variant_get(F.try_parse_json(box), path, "variant")
        txt = F.to_json(g)
        return F.when(txt != F.lit("null"), txt)

    @staticmethod
    def _vpath(base: Column, path: str) -> Typed:
        """Variant-path extraction producing a chainable _VariantPath box:
        the text column is the normalized serialization of the extraction,
        and (base, path) let a further member access extend the path."""
        g = F.try_variant_get(base, path, "variant")
        txt = F.to_json(g)
        return Typed(
            F.when(txt != F.lit("null"), txt), _VariantPath(base, path)
        )

    @staticmethod
    def _variant_box(v: Column) -> Column:
        """A variant value re-serialized as box text (canonical: sorted
        object keys, canonical number forms); explicit JSON null → SQL
        NULL (the box encoding of JMESPath null)."""
        txt = F.to_json(v)
        return F.when(txt != F.lit("null"), txt)

    @staticmethod
    def _box_elems(box: Column) -> Column:
        """array<jsonbox> of a boxed JSON *array*'s elements; SQL NULL when
        the box does not hold an array (from_json to array<variant> yields
        NULL for any non-array JSON text — exactly JMESPath's
        projection/index-on-non-array → null rule)."""
        arr = F.from_json(box, "array<variant>")
        return F.transform(arr, ColumnCompiler._variant_box)

    @staticmethod
    def _box_vals(box: Column) -> Column:
        """array<jsonbox> of a boxed JSON *object*'s values in document
        (canonical, i.e. sorted-key) order; SQL NULL for non-objects.
        Object-value order is unordered by contract (SURVEY §2.2 J6 — Go
        map iteration is random), so sorted-key order is a valid order."""
        m = F.from_json(box, "map<string,variant>")
        return F.transform(F.map_values(m), ColumnCompiler._variant_box)

    @staticmethod
    def _box_str(box: Column) -> Column:
        """The decoded (unquoted, unescaped) string when the box holds a
        JSON string, else SQL NULL."""
        return F.when(
            box.startswith('"'),
            F.try_variant_get(F.try_parse_json(box), "$", "string"),
        )

    @staticmethod
    def _box_num_elems(elems: Column) -> tuple[Column, Column]:
        """(all-numbers?, array<double>) for an array of box-text elements.
        Canonical number text casts cleanly; any other shape (strings are
        quoted, so '\"2\"' does NOT cast) yields NULL and fails the guard."""
        nums = F.transform(elems, lambda e: e.try_cast("double"))
        valid = F.forall(
            F.zip_with(elems, nums, lambda e, x: e.isNotNull() & x.isNotNull()),
            lambda ok: ok,
        )
        return valid, nums

    @staticmethod
    def _box_str_elems(elems: Column) -> tuple[Column, Column]:
        """(all-strings?, array<string> decoded) for box-text elements."""
        valid = F.forall(
            elems, lambda e: e.isNotNull() & e.startswith('"')
        )
        dec = F.transform(
            elems,
            lambda e: F.try_variant_get(F.try_parse_json(e), "$", "string"),
        )
        return valid, dec

    _IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    def _c_field(self, node: Node, doc: Typed) -> Typed:
        name = node.value
        dt = doc.dtype
        if _is_box(dt):
            if not self._IDENT.match(name):
                # variant path syntax can't address exotic keys; go through
                # the full object map instead (absent key and explicit null
                # value both normalize to SQL NULL — JMESPath null either way)
                m = F.from_json(doc.col, "map<string,variant>")
                v = F.try_element_at(m, F.lit(name))
                return Typed(self._variant_box(v), _JSONBOX)
            if isinstance(dt, _VariantPath):
                # extend the existing variant path: no re-parse
                return self._vpath(dt.base, f"{dt.path}.{name}")
            return self._vpath(F.try_parse_json(doc.col), f"$.{name}")
        if isinstance(dt, T.StructType):
            if name in dt.fieldNames():
                f = dt[name]
                md = f.metadata or {}
                if md.get(OPAQUE):
                    raise NotColumnCompilable(
                        f"field {name!r} has no static type (OPAQUE)"
                    )
                if md.get(SHADOW):
                    return _null()  # synthetic field, not a document key
                if md.get(BOXED):
                    return Typed(doc.col.getField(name), _JSONBOX)
                if md.get(BOXED_ELEM):
                    return Typed(
                        doc.col.getField(name), T.ArrayType(_JSONBOX)
                    )
                return Typed(doc.col.getField(name), f.dataType)
            return _null()  # missing key -> null (jp/interpreter.go:78-83)
        if isinstance(dt, T.MapType) and isinstance(dt.keyType, T.StringType):
            return Typed(F.try_element_at(doc.col, F.lit(name)), dt.valueType)
        if isinstance(dt, T.NullType):
            return _null()
        return _null()  # field access on non-object -> null

    def _c_subexpression(self, node: Node, doc: Typed) -> Typed:
        left, right = node.children
        return self.compile(right, self.compile(left, doc))

    _c_pipe = _c_subexpression
    _c_index_expression = _c_subexpression

    def _c_identity(self, node: Node, doc: Typed) -> Typed:
        return doc

    def _c_index(self, node: Node, doc: Typed) -> Typed:
        dt = doc.dtype
        if _is_box(dt):
            if node.value < 0:
                # variant paths have no negative-index form; element_at
                # counts from the end (non-array box → NULL elems → NULL)
                return Typed(
                    F.try_element_at(
                        self._box_elems(doc.col), F.lit(node.value)
                    ),
                    _JSONBOX,
                )
            if isinstance(dt, _VariantPath):
                return self._vpath(dt.base, f"{dt.path}[{node.value}]")
            return self._vpath(
                F.try_parse_json(doc.col), f"$[{node.value}]"
            )
        if isinstance(dt, T.NullType):
            return _null()
        if not isinstance(dt, T.ArrayType):
            return _null()
        i = node.value
        # element_at is 1-based; negative counts from the end in both systems.
        spark_i = i + 1 if i >= 0 else i
        return Typed(F.try_element_at(doc.col, F.lit(spark_i)), dt.elementType)

    def _c_slice(self, node: Node, doc: Typed) -> Typed:
        dt = doc.dtype
        if _is_box(dt):
            # slice the box's element array (NULL for non-array boxes)
            doc = Typed(self._box_elems(doc.col), T.ArrayType(_JSONBOX))
            dt = doc.dtype
        if not isinstance(dt, T.ArrayType):
            return _null()
        start, stop, step = node.value
        step = 1 if step is None else step
        if step == 0:
            raise NotColumnCompilable("slice step 0 is invalid")

        # The keep() predicate references the bounds (which depend on the
        # array's size) inside the filter lambda, so the array is let-bound
        # first: inlined, Catalyst would re-evaluate the whole document
        # path — a from_json chain on dynamic payloads — once per element
        # (kinesiscat_spark/let.py).
        def body(arr: Column) -> Column:
            n = F.size(arr)

            def resolve(v, default_lo, default_hi):
                # python-style bound resolution against runtime length n
                if v is None:
                    return default_lo if step > 0 else default_hi
                c = F.lit(v)
                if v < 0:
                    c = c + n
                lo = F.lit(-1) if step < 0 else F.lit(0)
                return F.greatest(lo, F.least(c, n if step > 0 else n - 1))

            if step > 0:
                lo = resolve(start, F.lit(0), None)
                hi = resolve(stop, n, None)
                keep = lambda i: (i >= lo) & (i < hi) & (((i - lo) % step) == 0)  # noqa: E731
                return F.filter(arr, lambda x, i: keep(i))
            hi = resolve(start, None, n - 1)  # first index taken (from top)
            lo = resolve(stop, None, F.lit(-1))  # exclusive lower bound
            keep = lambda i: (i <= hi) & (i > lo) & (((hi - i) % (-step)) == 0)  # noqa: E731
            return F.reverse(F.filter(arr, lambda x, i: keep(i)))

        return Typed(let_(doc.col, body), dt)

    # --- projections ------------------------------------------------------
    def _lambda_body(self, rhs: Node, elem_type: T.DataType):
        """Compile `rhs` as a function of a lambda variable of elem_type.

        Returns (fn, result_type): result_type is resolved by compiling once
        against a placeholder; Spark lambda variables are only materialized
        inside the HOF call, so we compile per invocation.

        Both the incoming element type and the returned result type cross
        a lambda boundary, so _VariantPath refinements are demoted to
        plain JsonBox (see _demote_vpath).
        """
        elem_type = _demote_vpath(elem_type)
        probe = self.compile(
            rhs, Typed(F.lit(None).cast(_storage(elem_type)), elem_type)
        )

        def fn(x: Column) -> Column:
            return self.compile(rhs, Typed(x, elem_type)).col

        return fn, _demote_vpath(probe.dtype)

    def _box_lambda(self, rhs: Node):
        """Compile ``rhs`` as a function of a VARIANT lambda variable (an
        element of a box exploded with ``from_json`` to array<variant> /
        map<string,variant>). The element is presented as a _VariantPath
        box rooted at the element variant itself, so member accesses
        inside the lambda extend the variant path instead of re-parsing
        the element's serialized text once per element."""

        def mk(v: Column) -> Typed:
            return Typed(self._variant_box(v), _VariantPath(v, "$"))

        probe = self.compile(rhs, mk(F.try_parse_json(F.lit(None).cast("string"))))

        def fn(v: Column) -> Column:
            return self.compile(rhs, mk(v)).col

        # the declared result type escapes this lambda's scope — demote
        # probe-rooted _VariantPath refinements (stale base otherwise)
        return fn, _demote_vpath(probe.dtype)

    def _c_projection(self, node: Node, doc: Typed) -> Typed:
        left, right = node.children
        base = self.compile(left, doc)
        dt = base.dtype
        if _is_box(dt):
            # project over the box's element array (variant elements, so
            # member accesses inside the lambda need no re-parse); null
            # RESULTS drop per the projection rule (a JSON null element
            # under identity is itself a null result)
            arr = F.from_json(base.col, "array<variant>")
            fn, rtype = self._box_lambda(right)
            mapped = F.transform(arr, fn)
            kept = F.filter(mapped, lambda r: r.isNotNull())
            return Typed(kept, T.ArrayType(rtype))
        if isinstance(dt, T.NullType):
            return _null()
        if not isinstance(dt, T.ArrayType):
            return _null()
        fn, rtype = self._lambda_body(right, dt.elementType)
        mapped = F.transform(base.col, fn)
        kept = F.filter(mapped, lambda r: r.isNotNull())
        return Typed(kept, T.ArrayType(rtype))

    def _c_value_projection(self, node: Node, doc: Typed) -> Typed:
        left, right = node.children
        base = self.compile(left, doc)
        dt = base.dtype
        if _is_box(dt):
            # object-value projection over a box: values in canonical
            # (sorted-key) order — a valid order for the unordered J6
            # contract (Go map iteration is random, SURVEY §2.2)
            vals = F.map_values(F.from_json(base.col, "map<string,variant>"))
            fn, rtype = self._box_lambda(right)
            mapped = F.transform(vals, fn)
            return Typed(
                F.filter(mapped, lambda r: r.isNotNull()), T.ArrayType(rtype)
            )
        if isinstance(dt, T.MapType):
            fn, rtype = self._lambda_body(right, dt.valueType)
            mapped = F.transform(F.map_values(base.col), fn)
            return Typed(F.filter(mapped, lambda r: r.isNotNull()), T.ArrayType(rtype))
        if isinstance(dt, T.StructType):
            _no_markers(dt, "object-value projection")
            # static object: project each field value through rhs
            outs = []
            rtypes = []
            for f in dt.fields:
                r = self.compile(
                    node.children[1], Typed(base.col.getField(f.name), f.dataType)
                )
                outs.append(r)
                rtypes.append(r.dtype)
            target: T.DataType | None = rtypes[0] if rtypes else T.NullType()
            for rt in rtypes[1:]:
                target = _unify(target, rt)
                if target is None:
                    break
            if target is None:
                # heterogeneous results: carry them as boxes
                arr = F.array(*[box(o).col for o in outs])
                return Typed(
                    F.filter(arr, lambda r: r.isNotNull()),
                    T.ArrayType(_JSONBOX),
                )
            arr = F.array(*[_coerce(o, target).col for o in outs])
            return Typed(
                F.filter(arr, lambda r: r.isNotNull()), T.ArrayType(target)
            )
        return _null()

    def _c_filter_projection(self, node: Node, doc: Typed) -> Typed:
        left, right, condition = node.children
        base = self.compile(left, doc)
        dt = base.dtype
        if _is_box(dt):
            # filter the box's element array (variant elements — the
            # condition AND the projection body both see path-extendable
            # boxes; truthiness on canonical text is exact)
            arr = F.from_json(base.col, "array<variant>")

            def cond_v(v: Column) -> Column:
                elem_box = Typed(self._variant_box(v), _VariantPath(v, "$"))
                return truthy(self.compile(condition, elem_box))

            filtered = F.filter(arr, cond_v)
            fn, rtype = self._box_lambda(right)
            mapped = F.transform(filtered, fn)
            return Typed(
                F.filter(mapped, lambda r: r.isNotNull()), T.ArrayType(rtype)
            )
        if not isinstance(dt, T.ArrayType):
            return _null()
        elem = _demote_vpath(dt.elementType)
        if self._filter_statically_empty(condition, elem):
            # `[?type(X) == 'L']` where the STATIC type of X can produce
            # neither 'L' nor 'null': no element ever passes, so the
            # projection is [] (null base stays null, the projection
            # rule). Folding to array<null> matters beyond speed: it
            # lets aggregate functions that would refuse the element
            # type (join/sum/avg/sort over the wrong static type) accept
            # the provably-empty result exactly as the evaluator does —
            # the last schema-known refusal class (round 7).
            return Typed(
                F.when(base.col.isNotNull(), F.array()),
                T.ArrayType(T.NullType()),
            )

        def cond_fn(x: Column) -> Column:
            return truthy(self.compile(condition, Typed(x, elem)))

        filtered = F.filter(base.col, cond_fn)
        fn, rtype = self._lambda_body(right, elem)
        mapped = F.transform(filtered, fn)
        return Typed(F.filter(mapped, lambda r: r.isNotNull()), T.ArrayType(rtype))

    def _filter_statically_empty(self, condition: Node, elem) -> bool:
        """True for a filter predicate ``type(X) == 'L'`` whose compiled
        static type of ``X`` (non-box) can produce neither 'L' nor
        'null' — no element can ever satisfy it."""
        if condition.type != "comparator" or condition.value != "==":
            return False
        a, b = condition.children
        if b.type != "literal":
            a, b = b, a
        if b.type != "literal" or not isinstance(b.value, str):
            return False
        if a.type != "function_call" or a.value != "type" or len(a.children) != 1:
            return False
        from kinesiscat_spark.functions.jmespath.errors import JMESPathError

        try:
            at = self.compile(
                a.children[0], Typed(F.lit(None).cast(_storage(elem)), elem)
            )
        except JMESPathError:
            return False
        adt = at.dtype
        if _is_box(adt):
            return False
        if isinstance(adt, T.NullType):
            name = "null"
        elif isinstance(adt, T.BooleanType):
            name = "boolean"
        elif _is_num(adt):
            name = "number"
        elif isinstance(adt, T.StringType):
            name = "string"
        elif isinstance(adt, T.ArrayType):
            name = "array"
        elif isinstance(adt, (T.StructType, T.MapType)):
            name = "object"
        else:
            return False
        # a null value of ANY static type reports 'null'
        return b.value != name and b.value != "null"

    def _c_flatten(self, node: Node, doc: Typed) -> Typed:
        base = self.compile(node.children[0], doc)
        dt = base.dtype
        if _is_box(dt):
            base = Typed(self._box_elems(base.col), T.ArrayType(_JSONBOX))
            dt = base.dtype
        if not isinstance(dt, T.ArrayType):
            return _null()
        if _is_box(dt.elementType):
            # one-level splice of dynamic elements: an element that is
            # itself an array contributes its members; every other element
            # (including JSON null, kept per jp/interpreter.go:114-144)
            # contributes itself. Canonical text starts with '[' iff array,
            # and _box_elems(non-array) is NULL, so coalesce wraps it.
            spliced = F.transform(
                base.col,
                lambda e: F.coalesce(self._box_elems(e), F.array(e)),
            )
            return Typed(F.flatten(spliced), T.ArrayType(_JSONBOX))
        if isinstance(dt.elementType, T.ArrayType):
            return Typed(F.flatten(base.col), dt.elementType)
        # flatten of non-nested array keeps elements as-is (jp one-level rule)
        return base

    # --- boolean / comparison --------------------------------------------
    def _c_comparator(self, node: Node, doc: Typed) -> Typed:
        left, right = node.children
        a, b = self.compile(left, doc), self.compile(right, doc)
        op = node.value
        if op in ("==", "!="):
            boxish = (
                _contains_box(a.dtype)
                or _contains_box(b.dtype)
                or has_markers(a.dtype)
                or has_markers(b.dtype)
            )
            if boxish:
                # deep equality over dynamic/padded values: compare the
                # canonical JSON texts (raises if a side is unserializable)
                eq = _json_text(a).eqNullSafe(_json_text(b))
            elif _is_num(a.dtype) and _is_num(b.dtype):
                eq = a.col.eqNullSafe(b.col)
            elif a.dtype == b.dtype or isinstance(a.dtype, T.NullType) or isinstance(
                b.dtype, T.NullType
            ):
                eq = a.col.eqNullSafe(b.col)
            else:
                eq = F.lit(False)  # different static types are never equal
            return Typed(eq if op == "==" else ~eq, T.BooleanType())
        # ordering: numbers only, else null (jp/interpreter.go:48-55).
        # A BOXED operand is dynamic — whether it holds a number is a
        # per-row fact, not a static type, so extract it as try_cast
        # double (canonical number text casts cleanly; strings are
        # quoted, bools/null/containers don't cast → NULL → comparator
        # null → falsy, the evaluator's rule).  Statically refusing the
        # box here returned null for EVERY element, silently emptying
        # filter projections over heterogeneous arrays — found by the
        # round-6 native-vs-evaluator fuzz (test_jmespath_fuzz.py).
        if _is_box(a.dtype):
            a = self._box_as_num(a)
        if _is_box(b.dtype):
            b = self._box_as_num(b)
        if not (_is_num(a.dtype) and _is_num(b.dtype)):
            return _null(T.BooleanType())
        cmp = {
            "<": a.col < b.col,
            "<=": a.col <= b.col,
            ">": a.col > b.col,
            ">=": a.col >= b.col,
        }[op]
        return Typed(cmp, T.BooleanType())

    def _c_or_expression(self, node: Node, doc: Typed) -> Typed:
        # Dead-branch pruning (round 7): when the left operand's
        # truthiness is decidable at COMPILE time, the other branch never
        # evaluates — exactly the evaluator's short-circuit — so a
        # branch that would refuse native compilation (e.g. a container
        # function over a dynamically-piped base) never has to compile.
        # Two decidable shapes:
        #  - document-independent ("closed") left: literals, or pipes
        #    whose left is closed — partially evaluated with the tree
        #    evaluator at compile time;
        #  - functions whose return value is truthy whenever they return
        #    (sum/length/abs/ceil/floor → number, 0 included, truthy;
        #    type → non-empty string). On inputs where the evaluator
        #    would RAISE instead of return, compiled Columns are already
        #    best-effort (they yield null, not errors), so pruning stays
        #    inside the existing error-envelope policy.
        known = _static_truthiness(node.children[0])
        if known is True:
            return self.compile(node.children[0], doc)
        if known is False:
            return self.compile(node.children[1], doc)
        a = self.compile(node.children[0], doc)
        b = self.compile(node.children[1], doc)
        target = _unify(a.dtype, b.dtype)
        if target is None:
            # incompatible operand types: pick by truthiness on the typed
            # sides, return the winner boxed
            ba, bb = box(a), box(b)
            return Typed(
                F.when(truthy(a), ba.col).otherwise(bb.col), _JSONBOX
            )
        a, b = _coerce(a, target), _coerce(b, target)
        return Typed(F.when(truthy(a), a.col).otherwise(b.col), target)

    def _c_and_expression(self, node: Node, doc: Typed) -> Typed:
        # mirror of the _c_or_expression dead-branch pruning: truthy
        # left → the right side is the result; falsy left → the right
        # side never evaluates
        known = _static_truthiness(node.children[0])
        if known is True:
            return self.compile(node.children[1], doc)
        if known is False:
            return self.compile(node.children[0], doc)
        a = self.compile(node.children[0], doc)
        b = self.compile(node.children[1], doc)
        target = _unify(a.dtype, b.dtype)
        if target is None:
            ba, bb = box(a), box(b)
            return Typed(
                F.when(truthy(a), bb.col).otherwise(ba.col), _JSONBOX
            )
        a, b = _coerce(a, target), _coerce(b, target)
        return Typed(F.when(truthy(a), b.col).otherwise(a.col), target)

    def _c_not_expression(self, node: Node, doc: Typed) -> Typed:
        return Typed(~truthy(self.compile(node.children[0], doc)), T.BooleanType())

    # --- construction -----------------------------------------------------
    def _c_literal(self, node: Node, doc: Typed) -> Typed:
        return _lit_typed(node.value)

    def _c_multiselect_list(self, node: Node, doc: Typed) -> Typed:
        outs = [self.compile(c, doc) for c in node.children]
        target: T.DataType | None = T.NullType()
        for o in outs:
            target = _unify(target, o.dtype)
            if target is None:
                break
        if target is None:
            # heterogeneous members: emit the list as one boxed JSON value
            parts = [
                F.coalesce(_json_text(o), F.lit("null")) for o in outs
            ]
            arr_txt = F.concat(
                F.lit("["), F.concat_ws(",", *parts), F.lit("]")
            )
            return Typed(
                F.when(doc.col.isNotNull(), arr_txt), _JSONBOX
            )
        arr = F.array(*[_coerce(o, target).col for o in outs])
        # multiselect on null input -> null (spec)
        arr = F.when(doc.col.isNotNull(), arr)
        return Typed(arr, T.ArrayType(target))

    def _c_multiselect_dict(self, node: Node, doc: Typed) -> Typed:
        vals = [(kv.value, self.compile(kv.children[0], doc)) for kv in node.children]
        if any(
            _contains_box(v.dtype) or has_markers(v.dtype) for _, v in vals
        ):
            # a member carries boxed/padded content: emit the whole hash as
            # one boxed JSON value (canonical key order)
            parts = [
                F.concat(
                    F.lit(json.dumps(k) + ":"),
                    F.coalesce(_json_text(v), F.lit("null")),
                )
                for k, v in sorted(vals, key=lambda kv: kv[0])
            ]
            txt = F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))
            return Typed(F.when(doc.col.isNotNull(), txt), _JSONBOX)
        fields = [v.col.alias(k) for k, v in vals]
        out_fields = [T.StructField(k, v.dtype) for k, v in vals]
        struct = F.when(doc.col.isNotNull(), F.struct(*fields))
        return Typed(struct, T.StructType(out_fields))

    # --- functions --------------------------------------------------------
    def _c_function_call(self, node: Node, doc: Typed) -> Typed:
        name = node.value
        handler = getattr(self, f"_f_{name}", None)
        if handler is None:
            if name in _KNOWN_FUNCTIONS:
                raise NotColumnCompilable(f"function {name}() needs the UDF path")
            raise UnknownFunctionError(f"unknown function {name}()")
        return handler(node, doc)

    def _args(self, node: Node, doc: Typed, n: int | None = None) -> list[Typed]:
        if n is not None and len(node.children) != n:
            raise InvalidArityError(
                f"{node.value}() takes {n} args, got {len(node.children)}"
            )
        return [self.compile(c, doc) for c in node.children]

    def _expref_child(self, node: Node, i: int) -> Node:
        child = node.children[i]
        if child.type != "expref":
            raise NotColumnCompilable(f"{node.value}() argument {i} must be &expr")
        return child.children[0]

    @staticmethod
    def _box_as_num(tc: Typed) -> Typed:
        """A boxed operand where a number is required: canonical number
        text casts cleanly; any other JSON shape casts to NULL (the
        evaluator raises invalid-type there — documented box deviation)."""
        return Typed(tc.col.try_cast("double"), T.DoubleType())

    def _f_abs(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            a = self._box_as_num(a)
        _require_num(a, "abs")
        return Typed(F.abs(a.col), a.dtype)

    def _f_ceil(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            a = self._box_as_num(a)
        _require_num(a, "ceil")
        return Typed(F.ceil(a.col).cast("long"), T.LongType())

    def _f_floor(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            a = self._box_as_num(a)
        _require_num(a, "floor")
        return Typed(F.floor(a.col).cast("long"), T.LongType())

    def _f_sum(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            # runtime array of numbers → exact sum (0 on empty); any other
            # shape → null (evaluator raises invalid-type — box deviation)
            elems = self._box_elems(a.col)
            valid, nums = self._box_num_elems(elems)
            total = F.aggregate(
                nums, F.lit(0.0), lambda acc, x: acc + x
            )
            return Typed(F.when(valid, total), T.DoubleType())
        if self._all_null_array(a.dtype) or (
            node.children[0].type == "literal" and node.children[0].value == []
        ):
            # sum([]) is 0
            return Typed(F.when(a.col.isNotNull(), F.lit(0.0)), T.DoubleType())
        et = _require_num_array(a, "sum")
        zero = F.lit(0.0) if isinstance(et, (T.DoubleType, T.FloatType)) else F.lit(0).cast("long")
        rt = T.DoubleType() if isinstance(et, (T.DoubleType, T.FloatType)) else T.LongType()
        return Typed(
            F.aggregate(a.col, zero, lambda acc, x: acc + x.cast(rt)), rt
        )

    def _f_avg(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            elems = self._box_elems(a.col)
            valid, nums = self._box_num_elems(elems)
            total = F.aggregate(nums, F.lit(0.0), lambda acc, x: acc + x)
            n = F.size(elems)
            # avg([]) is null (0/0); non-number shapes → null (deviation)
            return Typed(F.when(valid & (n > 0), total / n), T.DoubleType())
        if self._all_null_array(a.dtype):
            # a provably-empty array (e.g. a statically-false filter
            # fold): avg([]) is null
            return _null(T.DoubleType())
        _require_num_array(a, "avg")
        total = F.aggregate(a.col, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        n = F.size(a.col)
        return Typed(F.when(n > 0, total / n), T.DoubleType())

    def _f_length(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        dt = a.dtype
        if _is_box(dt):
            # string → decoded rune count; array/object → member count;
            # any other shape → null (evaluator raises invalid-type there —
            # documented box deviation)
            c = a.col
            head = c.substr(1, 1)
            out = (
                F.when(head == '"', F.length(self._box_str(c)))
                .when(head == "[", F.size(self._box_elems(c)))
                .when(
                    head == "{",
                    F.size(F.from_json(c, "map<string,variant>")),
                )
            )
            return Typed(out.cast("long"), T.LongType())
        if isinstance(dt, T.StringType):
            return Typed(F.length(a.col).cast("long"), T.LongType())
        if isinstance(dt, (T.ArrayType, T.MapType)):
            return Typed(F.size(a.col).cast("long"), T.LongType())
        if isinstance(dt, T.StructType):
            # only DIRECT padding makes the key count dynamic; nested
            # markers and boxed values don't change how many keys exist
            direct = [
                f for f in dt.fields if not (f.metadata or {}).get(SHADOW)
            ]
            if any((f.metadata or {}).get(PADDED) for f in direct):
                shadow = _shadow_field(dt)
                if shadow is not None:
                    return Typed(
                        F.size(
                            F.json_object_keys(a.col.getField(SHADOW_NAME))
                        ).cast("long"),
                        T.LongType(),
                    )
                raise NotColumnCompilable(
                    "length() on a schema-padded object type"
                )
            return Typed(
                F.when(a.col.isNotNull(), F.lit(len(direct)).cast("long")),
                T.LongType(),
            )
        raise NotColumnCompilable("length() on unsupported static type")

    def _f_contains(self, node: Node, doc: Typed) -> Typed:
        a, b = self._args(node, doc, 2)
        if _is_box(a.dtype):
            # array subject: membership by deep equality = canonical-text
            # equality (a JMESPath-null needle matches a null element);
            # string subject: substring, non-string needle → false (mirrors
            # the static path); other subjects → null (box deviation)
            elems = self._box_elems(a.col)
            needle = _json_text(b)  # NULL iff b is JMESPath null
            # coalesce: array_contains is three-valued — a null ELEMENT
            # with no match yields SQL NULL, but JMESPath contains() is
            # false there (null elements don't equal a non-null needle);
            # found by the round-6 fuzz sweep
            arr_case = F.when(
                needle.isNull(), F.exists(elems, lambda e: e.isNull())
            ).otherwise(
                F.coalesce(F.array_contains(elems, needle), F.lit(False))
            )
            if isinstance(b.dtype, T.StringType):
                bs = b.col
            elif _is_box(b.dtype):
                bs = self._box_str(b.col)
            else:
                bs = None
            subj = self._box_str(a.col)
            if bs is None:
                str_case = F.lit(False)
            else:
                # needle decodes to NULL when b's box isn't a string
                str_case = F.coalesce(subj.contains(bs), F.lit(False))
            head = a.col.substr(1, 1)
            out = F.when(head == "[", arr_case).when(head == '"', str_case)
            return Typed(out, T.BooleanType())
        if isinstance(a.dtype, T.StringType):
            if not isinstance(b.dtype, T.StringType):
                return Typed(F.lit(False), T.BooleanType())
            return Typed(a.col.contains(b.col), T.BooleanType())
        if isinstance(a.dtype, T.ArrayType) and _is_box(a.dtype.elementType):
            # membership by deep equality = canonical-text equality; a
            # JMESPath-null needle matches a null element.  coalesce: see
            # the box branch above (three-valued array_contains).
            needle = _json_text(b)
            out = F.when(
                needle.isNull(), F.exists(a.col, lambda e: e.isNull())
            ).otherwise(
                F.when(
                    a.col.isNotNull(),
                    F.coalesce(F.array_contains(a.col, needle), F.lit(False)),
                )
            )
            return Typed(out, T.BooleanType())
        if isinstance(a.dtype, T.ArrayType):
            _no_markers(a.dtype, "contains()")
            _no_markers(b.dtype, "contains()")
            u = _unify(a.dtype.elementType, b.dtype)
            if u is None:
                return Typed(
                    F.when(a.col.isNotNull(), F.lit(False)), T.BooleanType()
                )
            return Typed(
                F.array_contains(a.col.cast(T.ArrayType(u)), b.col.cast(u)),
                T.BooleanType(),
            )
        raise NotColumnCompilable("contains() subject must be string or array")

    def _affix_args(self, a: Typed, b: Typed, fname: str):
        """Decode (subject, prefix/suffix) for starts_with/ends_with: box
        operands decode to their string value (NULL when the box holds a
        non-string — the evaluator raises invalid-type there, the
        documented box deviation)."""
        if _is_box(a.dtype):
            sa = self._box_str(a.col)
        else:
            _require_str(a, fname)
            sa = a.col
        if _is_box(b.dtype):
            sb = self._box_str(b.col)
        else:
            _require_str(b, fname)
            sb = b.col
        return sa, sb

    def _f_starts_with(self, node: Node, doc: Typed) -> Typed:
        a, b = self._args(node, doc, 2)
        sa, sb = self._affix_args(a, b, "starts_with")
        return Typed(sa.startswith(sb), T.BooleanType())

    def _f_ends_with(self, node: Node, doc: Typed) -> Typed:
        a, b = self._args(node, doc, 2)
        sa, sb = self._affix_args(a, b, "ends_with")
        return Typed(sa.endswith(sb), T.BooleanType())

    def _f_join(self, node: Node, doc: Typed) -> Typed:
        if len(node.children) != 2:
            raise InvalidArityError("join() takes 2 args")
        sep_node = node.children[0]
        # array_join takes a plain-string delimiter; dynamic separators would
        # need the UDF path (never seen in practice — separators are literals)
        if sep_node.type != "literal" or not isinstance(sep_node.value, str):
            raise NotColumnCompilable("join() separator must be a string literal")
        a = self.compile(node.children[1], doc)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            # boxed runtime array of strings → decoded join; empty → '';
            # any other shape → null (evaluator raises — box deviation)
            elems = self._box_elems(a.col)
            svalid, dec = self._box_str_elems(elems)
            out = F.when(F.size(elems) == 0, F.lit("")).when(
                svalid, F.array_join(dec, sep_node.value)
            )
            return Typed(out, T.StringType())
        if self._all_null_array(a.dtype):
            # join(sep, []) is ''
            return Typed(
                F.when(a.col.isNotNull(), F.lit("")), T.StringType()
            )
        if not (
            isinstance(a.dtype, T.ArrayType)
            and isinstance(a.dtype.elementType, T.StringType)
            and not _is_box(a.dtype.elementType)
        ):
            raise NotColumnCompilable("join() needs array<string>")
        return Typed(F.array_join(a.col, sep_node.value), T.StringType())

    def _f_reverse(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # array box → reversed elements re-serialized; string box →
            # reversed decoded string re-encoded; other shapes → null
            # (evaluator raises invalid-type — box deviation)
            arr_txt = _json_text(
                Typed(F.reverse(self._box_elems(a.col)), T.ArrayType(_JSONBOX))
            )
            str_txt = _json_text(
                Typed(F.reverse(self._box_str(a.col)), T.StringType())
            )
            return Typed(F.coalesce(arr_txt, str_txt), _JSONBOX)
        if isinstance(a.dtype, (T.StringType, T.ArrayType)):
            return Typed(F.reverse(a.col), a.dtype)
        raise NotColumnCompilable("reverse() needs string or array")

    def _f_keys(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # null for non-object boxes (evaluator raises — box deviation)
            return Typed(F.json_object_keys(a.col), T.ArrayType(T.StringType()))
        if isinstance(a.dtype, T.MapType):
            return Typed(F.map_keys(a.col), T.ArrayType(a.dtype.keyType))
        if isinstance(a.dtype, T.StructType):
            shadow = _shadow_field(a.dtype)
            if shadow is not None:
                return Typed(
                    F.json_object_keys(a.col.getField(SHADOW_NAME)),
                    T.ArrayType(T.StringType()),
                )
            _no_markers(a.dtype, "keys()")
            # canonical sorted order, matching the evaluator and the box
            # path (variant maps serialize sorted) — keys()/values() order
            # is unspecified by the spec, so we pick one deterministically
            arr = F.array(
                *[F.lit(n) for n in sorted(f.name for f in a.dtype.fields)]
            )
            return Typed(
                F.when(a.col.isNotNull(), arr), T.ArrayType(T.StringType())
            )
        raise NotColumnCompilable("keys() needs object")

    def _f_values(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # canonical (sorted-key) value order — valid for the unordered
            # contract; null for non-object boxes (evaluator raises — box
            # deviation, same as keys())
            return Typed(self._box_vals(a.col), T.ArrayType(_JSONBOX))
        if isinstance(a.dtype, T.MapType):
            return Typed(F.map_values(a.col), T.ArrayType(a.dtype.valueType))
        if isinstance(a.dtype, T.StructType):
            _no_markers(a.dtype, "values()")
            # canonical sorted-key order (see keys())
            sfields = sorted(a.dtype.fields, key=lambda f: f.name)
            target: T.DataType | None = T.NullType()
            for f in sfields:
                target = _unify(target, f.dataType)
                if target is None:
                    break
            if target is None:
                # heterogeneous field types: carry the values as boxes
                arr = F.array(
                    *[
                        box(Typed(a.col.getField(f.name), f.dataType)).col
                        for f in sfields
                    ]
                )
                return Typed(
                    F.when(a.col.isNotNull(), arr), T.ArrayType(_JSONBOX)
                )
            arr = F.array(
                *[a.col.getField(f.name).cast(target) for f in sfields]
            )
            return Typed(F.when(a.col.isNotNull(), arr), T.ArrayType(target))
        raise NotColumnCompilable("values() needs object")

    def _f_not_null(self, node: Node, doc: Typed) -> Typed:
        outs = self._args(node, doc)
        if not outs:
            raise InvalidArityError("not_null() needs at least one argument")
        target: T.DataType | None = T.NullType()
        for o in outs:
            target = _unify(target, o.dtype)
            if target is None:
                break
        if target is None:
            # heterogeneous args: coalesce their boxed forms
            return Typed(
                F.coalesce(*[box(o).col for o in outs]), _JSONBOX
            )
        return Typed(
            F.coalesce(*[_coerce(o, target).col for o in outs]), target
        )

    @staticmethod
    def _coerce_box_arr(a: Typed) -> Typed:
        """ArrayType(box) → ONE box (serialize the element texts): lets the
        JSON-total functions' box paths accept projection outputs whose
        elements are dynamic (e.g. ``sort(items[?type(@) == 'number'])``
        over a variant root — the filter projection yields array<box>,
        which the static paths refuse).  Costs one serialize + reparse;
        correctness is unchanged (canonical texts round-trip exactly)."""
        if isinstance(a.dtype, T.ArrayType) and _is_box(a.dtype.elementType):
            return box(a)
        return a

    @staticmethod
    def _all_null_array(dt: T.DataType) -> bool:
        """array<null>: every element the schema can hold is null, so a
        non-error document can only supply [] here (a NONEMPTY array of
        nulls is an invalid-type error on the evaluator — box deviation:
        the native path treats it as empty)."""
        return isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, T.NullType
        )

    def _box_minmax(self, a: Typed, take_max: bool) -> Typed:
        """min/max over a boxed runtime array: exact for all-number and
        all-string arrays (result re-encoded canonically), null on empty,
        null for any other shape (evaluator raises — box deviation)."""
        elems = self._box_elems(a.col)
        nvalid, nums = self._box_num_elems(elems)
        svalid, dec = self._box_str_elems(elems)
        pick = F.array_max if take_max else F.array_min
        num_out = _json_text(Typed(pick(nums), T.DoubleType()))
        str_out = _json_text(Typed(pick(dec), T.StringType()))
        out = (
            F.when(F.size(elems) == 0, F.lit(None).cast("string"))
            .when(nvalid, num_out)
            .when(svalid, str_out)
        )
        return Typed(out, _JSONBOX)

    def _f_max(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            return self._box_minmax(a, take_max=True)
        if self._all_null_array(a.dtype):
            return _null()  # max([]) is null
        et = _require_ord_array(a, "max")
        return Typed(F.array_max(a.col), et)

    def _f_min(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            return self._box_minmax(a, take_max=False)
        if self._all_null_array(a.dtype):
            return _null()  # min([]) is null
        et = _require_ord_array(a, "min")
        return Typed(F.array_min(a.col), et)

    def _f_sort(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        a = self._coerce_box_arr(a)
        if _is_box(a.dtype):
            # sort a boxed runtime array: numbers or strings, re-encoded
            # canonically; sort([]) is []; other shapes → null (deviation)
            elems = self._box_elems(a.col)
            nvalid, nums = self._box_num_elems(elems)
            svalid, dec = self._box_str_elems(elems)
            num_arr = F.transform(
                F.array_sort(nums),
                lambda x: F.coalesce(
                    _json_text(Typed(x, T.DoubleType())), F.lit("null")
                ),
            )
            str_arr = F.transform(
                F.array_sort(dec),
                lambda s: F.coalesce(
                    _json_text(Typed(s, T.StringType())), F.lit("null")
                ),
            )
            wrap = lambda arr: F.concat(  # noqa: E731
                F.lit("["), F.array_join(arr, ","), F.lit("]")
            )
            out = (
                F.when(F.size(elems) == 0, F.lit("[]"))
                .when(nvalid, wrap(num_arr))
                .when(svalid, wrap(str_arr))
            )
            return Typed(out, _JSONBOX)
        if self._all_null_array(a.dtype):
            return a  # sort([]) is []
        _require_ord_array(a, "sort")
        return Typed(F.array_sort(a.col), a.dtype)

    def _key_comparator(self, key_fn):
        def cmp(l: Column, r: Column) -> Column:  # noqa: E741
            kl, kr = key_fn(l), key_fn(r)
            return F.when(kl < kr, -1).when(kl > kr, 1).otherwise(0)

        return cmp

    def _box_keyed(self, a: Typed, key_ast: Node):
        """(pairs, cmp, valid) for &expr-keyed folds over a boxed runtime
        array: pairs = array<struct<k: box-text key, e: box-text elem>>,
        cmp a comparator choosing numeric or string ordering by the
        row-level all-numbers/all-strings guards (captured outer columns),
        valid = keys uniformly ordered (else the fold yields null — the
        evaluator raises invalid-type there, documented box deviation)."""
        arr = F.from_json(a.col, "array<variant>")

        def kv(v: Column) -> Column:
            elem_box = Typed(self._variant_box(v), _VariantPath(v, "$"))
            k = box(self.compile(key_ast, elem_box)).col
            return F.struct(k.alias("k"), self._variant_box(v).alias("e"))

        pairs = F.transform(arr, kv)
        keys = F.transform(pairs, lambda p: p["k"])
        knum, _ = self._box_num_elems(keys)
        kstr, _ = self._box_str_elems(keys)

        def cmp(l: Column, r: Column) -> Column:  # noqa: E741
            ln, rn = l["k"].try_cast("double"), r["k"].try_cast("double")
            ls = F.try_variant_get(F.try_parse_json(l["k"]), "$", "string")
            rs = F.try_variant_get(F.try_parse_json(r["k"]), "$", "string")
            num = F.when(ln < rn, -1).when(ln > rn, 1).otherwise(0)
            st = F.when(ls < rs, -1).when(ls > rs, 1).otherwise(0)
            return F.when(knum, num).otherwise(st)

        return pairs, cmp, knum | kstr

    def _arr_box_keyed(self, arr: Column, elem: T.DataType, key_ast: Node):
        """The ArrayType twin of ``_box_keyed``: (pairs, cmp, valid) for
        &expr keys whose COMPILED type is a box (dynamic) over a
        statically-typed array subject — e.g. ``sort_by(filtered, &@)``
        where the subject is a filter projection of box elements.  Without
        this, the static comparator ordered boxed NUMERIC keys by their
        canonical TEXT ('-3.1' < '-0.9' lexically) — found by the round-6
        fuzz sweep.  cmp picks numeric vs string ordering by the row-level
        all-numbers/all-strings guards, exactly like ``_box_keyed``."""

        elem = _demote_vpath(elem)

        def kv(x: Column) -> Column:
            k = box(self.compile(key_ast, Typed(x, elem))).col
            return F.struct(k.alias("k"), x.alias("e"))

        pairs = F.transform(arr, kv)
        keys = F.transform(pairs, lambda p: p["k"])
        knum, _ = self._box_num_elems(keys)
        kstr, _ = self._box_str_elems(keys)

        def cmp(l: Column, r: Column) -> Column:  # noqa: E741
            ln, rn = l["k"].try_cast("double"), r["k"].try_cast("double")
            ls = F.try_variant_get(F.try_parse_json(l["k"]), "$", "string")
            rs = F.try_variant_get(F.try_parse_json(r["k"]), "$", "string")
            num = F.when(ln < rn, -1).when(ln > rn, 1).otherwise(0)
            st = F.when(ls < rs, -1).when(ls > rs, 1).otherwise(0)
            return F.when(knum, num).otherwise(st)

        return pairs, cmp, knum | kstr

    def _key_is_box(self, key_ast: Node, elem: T.DataType) -> bool:
        """Does the &expr key compile to a dynamic (boxed) type against
        this element type?  Dry-run compile, same trick as the corpus
        typecheck."""
        elem = _demote_vpath(elem)
        return _is_box(self.compile(key_ast, Typed(F.lit(None), elem)).dtype)

    def _f_sort_by(self, node: Node, doc: Typed) -> Typed:
        if len(node.children) != 2:
            raise InvalidArityError("sort_by() takes 2 args")
        a = self.compile(node.children[0], doc)
        key_ast = self._expref_child(node, 1)
        if _is_box(a.dtype):
            pairs, cmp, valid = self._box_keyed(a, key_ast)
            srt = F.array_sort(pairs, cmp)
            body = F.array_join(
                F.transform(srt, lambda p: F.coalesce(p["e"], F.lit("null"))),
                ",",
            )
            out = F.when(F.size(pairs) == 0, F.lit("[]")).when(
                valid, F.concat(F.lit("["), body, F.lit("]"))
            )
            return Typed(out, _JSONBOX)
        if not isinstance(a.dtype, T.ArrayType):
            raise NotColumnCompilable("sort_by() needs array")
        elem = _demote_vpath(a.dtype.elementType)
        if self._key_is_box(key_ast, elem):
            pairs, cmp, valid = self._arr_box_keyed(a.col, elem, key_ast)
            srt = F.array_sort(pairs, cmp)
            out = F.when(F.size(pairs) == 0, a.col).when(
                valid, F.transform(srt, lambda p: p["e"])
            )
            return Typed(out, a.dtype)

        def key_fn(x: Column) -> Column:
            return self.compile(key_ast, Typed(x, elem)).col

        return Typed(F.array_sort(a.col, self._key_comparator(key_fn)), a.dtype)

    def _f_max_by(self, node: Node, doc: Typed) -> Typed:
        return self._minmax_by(node, doc, last=True)

    def _f_min_by(self, node: Node, doc: Typed) -> Typed:
        return self._minmax_by(node, doc, last=False)

    def _minmax_by(self, node: Node, doc: Typed, last: bool) -> Typed:
        if len(node.children) != 2:
            raise InvalidArityError(f"{node.value}() takes 2 args")
        a = self.compile(node.children[0], doc)
        key_ast = self._expref_child(node, 1)
        if _is_box(a.dtype):
            pairs, cmp, valid = self._box_keyed(a, key_ast)
            order = (lambda l, r: -cmp(l, r)) if last else cmp  # noqa: E741
            srt = F.array_sort(pairs, order)
            first = F.try_element_at(srt, F.lit(1))
            return Typed(
                F.when(valid & (F.size(pairs) > 0), first["e"]), _JSONBOX
            )
        if not isinstance(a.dtype, T.ArrayType):
            raise NotColumnCompilable(f"{node.value}() needs array")
        elem = _demote_vpath(a.dtype.elementType)
        if self._key_is_box(key_ast, elem):
            # dynamic (boxed) keys over a static array: the _arr_box_keyed
            # comparator (numeric vs string by runtime guard) — see
            # _f_sort_by; same first-extremal tie rule as below
            pairs, cmp, valid = self._arr_box_keyed(a.col, elem, key_ast)
            order = (lambda l, r: -cmp(l, r)) if last else cmp  # noqa: E741
            srt = F.array_sort(pairs, order)
            first = F.try_element_at(srt, F.lit(1))
            return Typed(
                F.when(valid & (F.size(pairs) > 0), first["e"]), elem
            )

        def key_fn(x: Column) -> Column:
            return self.compile(key_ast, Typed(x, elem)).col

        # Ties keep the FIRST extremal element (go jpfMaxBy/jpfMinBy use
        # strict >/<, so the earliest winner is never replaced). A stable
        # sort ascending + element 1 gives first-min; for max we stable-sort
        # with the REVERSED comparator and take element 1 (first-max) —
        # taking element -1 of the ascending sort would yield the LAST max.
        cmp = self._key_comparator(key_fn)
        order = (lambda l, r: -cmp(l, r)) if last else cmp  # noqa: E741
        srt = F.array_sort(a.col, order)
        return Typed(F.try_element_at(srt, F.lit(1)), elem)

    def _f_map(self, node: Node, doc: Typed) -> Typed:
        if len(node.children) != 2:
            raise InvalidArityError("map() takes 2 args")
        fn_ast = self._expref_child(node, 0)
        a = self.compile(node.children[1], doc)
        if _is_box(a.dtype):
            # map over a boxed runtime array (variant elements, nulls
            # KEPT — unlike projections); non-array box → null (the
            # evaluator raises invalid-type — box deviation)
            arr = F.from_json(a.col, "array<variant>")
            fn, rtype = self._box_lambda(fn_ast)
            return Typed(F.transform(arr, fn), T.ArrayType(rtype))
        if not isinstance(a.dtype, T.ArrayType):
            raise NotColumnCompilable("map() needs array")
        fn, rtype = self._lambda_body(fn_ast, a.dtype.elementType)
        # map() keeps nulls (unlike projections)
        return Typed(F.transform(a.col, fn), T.ArrayType(rtype))

    def _f_to_array(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # runtime array → its elements unwrapped; anything else
            # (including null, go jpfToArray wraps it) → 1-element array
            return Typed(
                F.coalesce(self._box_elems(a.col), F.array(a.col)),
                T.ArrayType(_JSONBOX),
            )
        if isinstance(a.dtype, T.ArrayType):
            # runtime null is NOT an array — go jpfToArray wraps it:
            # to_array(null) == [null] (functions.go:793-798)
            null_elem = F.lit(None).cast(a.dtype.elementType)
            return Typed(
                F.when(a.col.isNotNull(), a.col).otherwise(F.array(null_elem)),
                a.dtype,
            )
        return Typed(F.array(a.col), T.ArrayType(a.dtype))

    def _f_to_string(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # a box holding a string round-trips unquoted (identity); every
            # other shape's JSON text IS the box text; null → "null"
            out = F.coalesce(self._box_str(a.col), a.col, F.lit("null"))
            return Typed(out, T.StringType())
        if _contains_box(a.dtype) or has_markers(a.dtype):
            # container with boxed parts (e.g. a filter projection's
            # array<box>): F.to_json on the STORAGE would quote the box
            # text as string elements ('["[]"]' for [[]] — round-6 fuzz
            # find); _json_text splices each box's JSON raw instead
            out = F.coalesce(_json_text(a), F.lit("null"))
            return Typed(out, T.StringType())
        _no_markers(a.dtype, "to_string()")
        if isinstance(a.dtype, T.StringType):
            return a
        if isinstance(a.dtype, (T.StructType, T.ArrayType, T.MapType)):
            out = F.to_json(a.col, {"ignoreNullFields": "false"})
        elif isinstance(a.dtype, T.BooleanType):
            out = F.when(a.col, "true").otherwise("false")
        elif isinstance(a.dtype, (T.DoubleType, T.FloatType)):
            # JSON renders integral doubles without a decimal point (Go's
            # Marshal of float64(-1) is "-1"; Spark's cast gives "-1.0").
            # Doubles are exact integers only below 2^53.
            exact = F.lit(1 << 53).cast("double")
            integral = (
                (a.col == F.floor(a.col)) & (a.col < exact) & (a.col > -exact)
            )
            out = F.when(integral, a.col.cast("long").cast("string")).otherwise(
                a.col.cast("string")
            )
        else:
            out = a.col.cast("string")
        # JSON serialization of null is the string "null"
        return Typed(F.coalesce(out, F.lit("null")), T.StringType())

    def _f_to_number(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        if _is_box(a.dtype):
            # number text casts directly; quoted numeric strings are
            # unquoted first (canonical numeric text has no escapes);
            # any other shape -> null (to_number is total: go
            # functions.go jpfToNumber returns null for non-numbers)
            col = a.col
            unq = F.when(
                col.startswith('"') & col.endswith('"'),
                col.substr(F.lit(2), F.length(col) - 2),
            ).otherwise(col)
            return Typed(unq.try_cast("double"), T.DoubleType())
        if _is_num(a.dtype):
            return a
        if isinstance(a.dtype, T.StringType):
            return Typed(a.col.try_cast("double"), T.DoubleType())
        return _null(T.DoubleType())

    def _f_type(self, node: Node, doc: Typed) -> Typed:
        (a,) = self._args(node, doc, 1)
        dt = a.dtype
        if _is_box(dt):
            c = a.col
            head = c.substr(1, 1)
            out = (
                F.when(c.isNull(), "null")
                .when(head == '"', "string")
                .when(head == "[", "array")
                .when(head == "{", "object")
                .when(c.isin("true", "false"), "boolean")
                .otherwise("number")
            )
            return Typed(out, T.StringType())
        if isinstance(dt, T.NullType):
            name = "null"
        elif isinstance(dt, T.BooleanType):
            name = "boolean"
        elif _is_num(dt):
            name = "number"
        elif isinstance(dt, T.StringType):
            name = "string"
        elif isinstance(dt, T.ArrayType):
            name = "array"
        elif isinstance(dt, (T.StructType, T.MapType)):
            name = "object"
        else:
            raise NotColumnCompilable(f"type() on {dt}")
        return Typed(
            F.when(a.col.isNull(), "null").otherwise(F.lit(name)), T.StringType()
        )

    def _f_merge(self, node: Node, doc: Typed) -> Typed:
        if not node.children:
            raise InvalidArityError("merge() needs at least one argument")
        # empty-object literals contribute no keys; drop them at compile
        # time (they have no struct form) — merge(`{}`) and friends
        kept = [
            c
            for c in node.children
            if not (c.type == "literal" and c.value == {})
        ]
        if not kept:
            return Typed(F.lit("{}"), _JSONBOX)
        outs = [self.compile(c, doc) for c in kept]
        if all(isinstance(o.dtype, T.MapType) for o in outs):
            # map_concat is right-wins ONLY under mapKeyDedupPolicy=
            # LAST_WIN (session.py sets it; a foreign session may not —
            # default EXCEPTION throws at runtime on overlapping keys,
            # which is exactly the merge use case). Verify the ACTIVE
            # session rather than mutating it under the user.
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            policy = (
                active.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
                if active is not None
                else "EXCEPTION"
            )
            if policy != "LAST_WIN":
                raise NotColumnCompilable(
                    "merge() on maps needs spark.sql.mapKeyDedupPolicy="
                    "LAST_WIN in the active session"
                )
            return Typed(F.map_concat(*[o.col for o in outs]), outs[0].dtype)
        if all(isinstance(o.dtype, T.StructType) for o in outs):
            for o in outs:
                _no_markers(o.dtype, "merge()")
            # static right-wins field merge; null operand -> null result
            # (evaluator raises there — null-on-native-path deviation)
            merged: dict[str, tuple[Column, T.DataType]] = {}
            for o in outs:
                for f in o.dtype.fields:
                    merged[f.name] = (o.col.getField(f.name), f.dataType)
            cols = [c.alias(k) for k, (c, _) in merged.items()]
            st = T.StructType(
                [T.StructField(k, dt) for k, (_, dt) in merged.items()]
            )
            all_present = outs[0].col.isNotNull()
            for o in outs[1:]:
                all_present = all_present & o.col.isNotNull()
            return Typed(F.when(all_present, F.struct(*cols)), st)
        # Mixed static/dynamic object args (round 6 — was the last fuzz
        # refusal class): box every arg and merge at RUNTIME over the
        # canonical texts.  Right-wins key resolution scans the args'
        # maps last-to-first with an EXPLICIT presence check
        # (map_contains_key), so an explicit JSON-null value in a later
        # arg correctly overrides an earlier value — to_json(variant
        # null) is the 4-char text 'null', distinguishable from absent.
        # Output keys sort canonically (UTF-8 binary order == code-point
        # order, matching schemas.canonical_json).  Any arg that is not
        # an object (or is JMESPath null) → SQL NULL (the evaluator
        # raises invalid-type there — documented box deviation).
        btxts = [box(o).col for o in outs]
        maps = [F.from_json(t, "map<string,variant>") for t in btxts]
        ks = F.array_sort(
            F.array_distinct(
                F.flatten(F.array(*[F.map_keys(m) for m in maps]))
            )
        )

        def vtext(k: Column) -> Column:
            picks = [
                F.when(
                    F.map_contains_key(m, k),
                    F.coalesce(
                        F.to_json(F.try_element_at(m, k)), F.lit("null")
                    ),
                )
                for m in reversed(maps)
            ]
            return F.coalesce(*picks) if len(picks) > 1 else picks[0]

        def ktext(k: Column) -> Column:
            j = F.to_json(F.array(k), {"ignoreNullFields": "false"})
            return j.substr(F.lit(2), F.length(j) - 2)

        body = F.array_join(
            F.transform(ks, lambda k: F.concat(ktext(k), F.lit(":"), vtext(k))),
            ",",
        )
        all_objects = None
        for t in btxts:
            is_obj = t.substr(1, 1) == "{"
            all_objects = is_obj if all_objects is None else (all_objects & is_obj)
        out = F.when(
            all_objects, F.concat(F.lit("{"), body, F.lit("}"))
        )
        return Typed(out, _JSONBOX)


_KNOWN_FUNCTIONS = {
    "abs", "avg", "ceil", "contains", "ends_with", "floor", "join", "keys",
    "length", "map", "max", "max_by", "merge", "min", "min_by", "not_null",
    "reverse", "sort", "sort_by", "starts_with", "sum", "to_array",
    "to_number", "to_string", "type", "values",
}


def _require_num(tc: Typed, fname: str) -> None:
    if not (_is_num(tc.dtype) or isinstance(tc.dtype, T.NullType)):
        raise NotColumnCompilable(f"{fname}() needs a number")


def _require_str(tc: Typed, fname: str) -> None:
    if not isinstance(tc.dtype, T.StringType):
        raise NotColumnCompilable(f"{fname}() needs a string")


def _require_num_array(tc: Typed, fname: str) -> T.DataType:
    if isinstance(tc.dtype, T.ArrayType) and _is_num(tc.dtype.elementType):
        return tc.dtype.elementType
    raise NotColumnCompilable(f"{fname}() needs array<number>")


def _require_ord_array(tc: Typed, fname: str) -> T.DataType:
    if isinstance(tc.dtype, T.ArrayType) and (
        _is_num(tc.dtype.elementType)
        or isinstance(tc.dtype.elementType, T.StringType)
    ):
        return tc.dtype.elementType
    raise NotColumnCompilable(f"{fname}() needs array<number|string>")


def _lit_typed(value) -> Typed:
    if value is None:
        return _null()
    if isinstance(value, bool):
        return Typed(F.lit(value), T.BooleanType())
    if isinstance(value, int):
        return Typed(F.lit(value), T.LongType())
    if isinstance(value, float):
        return Typed(F.lit(value), T.DoubleType())
    if isinstance(value, str):
        return Typed(F.lit(value), T.StringType())
    if isinstance(value, list):
        outs = [_lit_typed(v) for v in value]
        target: T.DataType = T.NullType()
        for o in outs:
            u = _unify(target, o.dtype)
            if u is None:
                # heterogeneous literal array: a compile-time constant, so
                # inline its canonical JSON as ONE box literal — the box
                # runtime handles it from there (round-6: was a refusal)
                from kinesiscat_spark.functions.jmespath.schemas import (
                    canonical_json,
                )

                return Typed(F.lit(canonical_json(value)), _JSONBOX)
            target = u
        if not outs:
            return Typed(F.array().cast(T.ArrayType(T.StringType())), T.ArrayType(T.StringType()))
        return Typed(
            F.array(*[_coerce(o, target).col for o in outs]), T.ArrayType(target)
        )
    if isinstance(value, dict):
        if not value:
            # {} has no Spark struct form; as a VALUE it lives in a box
            return Typed(F.lit("{}"), _JSONBOX)
        fields, st = [], []
        for k, v in value.items():
            tv = _lit_typed(v)
            fields.append(tv.col.alias(k))
            st.append(T.StructField(k, tv.dtype))
        return Typed(F.struct(*fields), T.StructType(st))
    raise NotColumnCompilable(f"unsupported literal {value!r}")


def compile_column(expression: str | Node, col: Column, dtype: T.DataType) -> Typed:
    """Compile a JMESPath expression against a typed input column.

    Returns a ``Typed`` (Column + resolved output type). Raises
    ``NotColumnCompilable`` when the expression leaves the statically-
    typeable subset — callers then use ``api.jmespath_udf``.
    """
    ast = parse(expression) if isinstance(expression, str) else expression
    out = ColumnCompiler().compile(ast, Typed(col, dtype))
    # A padded/boxed result is faithful to traverse but not to RETURN as a
    # plain Spark value (absent keys would surface as JSON nulls; boxed
    # members are raw JSON text). If the shape is serializable — shadows
    # cover the padded parts — return it as ONE JsonBox column; else refuse.
    if has_markers(out.dtype) or (
        _contains_box(out.dtype) and not _is_box(out.dtype)
    ):
        try:
            return box(out)
        except NotColumnCompilable:
            raise NotColumnCompilable("result type is schema-padded") from None
    return out


# --- JSON-string output (the CLI's K3 emission shape) ---------------------

_JSON_EXACT_SCALARS = (
    T.NullType, T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
    T.LongType, T.StringType,
)


def json_faithful(dt: T.DataType) -> bool:
    """True when serializing ``dt`` with ``to_json`` is byte-identical to
    Python's ``json.dumps(..., ensure_ascii=False)`` of the evaluator's
    result. Floats/decimals are excluded: Java's shortest-repr and
    E-notation thresholds differ from Python's (1e23 → "1.0E23" vs
    "1e+23"), so float-typed results take the Arrow-UDF path instead.
    """
    if has_markers(dt):
        return False  # padded NULLs would serialize as JSON null
    if isinstance(dt, _JSON_EXACT_SCALARS):
        return True
    if isinstance(dt, T.ArrayType):
        return json_faithful(dt.elementType)
    if isinstance(dt, T.MapType):
        return isinstance(dt.keyType, T.StringType) and json_faithful(dt.valueType)
    if isinstance(dt, T.StructType):
        return all(json_faithful(f.dataType) for f in dt.fields)
    return False


def to_json_string(tc: Typed) -> Column:
    """JSON-encode a Typed result the way ``CompiledExpression.search_json``
    does: NULL result → NULL (record skipped, S9), everything else → its
    compact JSON text. Caller must have checked ``json_faithful``.
    """
    dt = tc.dtype
    if isinstance(dt, T.NullType):
        return F.lit(None).cast("string")
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return F.when(
            tc.col.isNotNull(), F.to_json(tc.col, {"ignoreNullFields": "false"})
        )
    if isinstance(dt, T.StringType):
        # quote + escape via a 1-element array round-trip through to_json
        # (Jackson's string escaping matches json.dumps(ensure_ascii=False))
        j = F.to_json(F.array(tc.col), {"ignoreNullFields": "false"})
        return F.when(tc.col.isNotNull(), j.substr(F.lit(2), F.length(j) - 2))
    if isinstance(dt, T.BooleanType):
        return F.when(tc.col, "true").otherwise(F.when(~tc.col, "false"))
    return tc.col.cast("string")  # integral scalars
