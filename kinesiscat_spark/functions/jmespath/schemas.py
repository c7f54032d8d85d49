"""JSON document → Spark schema inference for the native JMESPath path.

The reference evaluates JMESPath over dynamically-typed JSON
(`/root/reference/vendor/github.com/jmespath/go-jmespath/interpreter.go`);
Spark's hot path wants a static schema.  This module bridges the two: given a
sample document (or a JSON payload at ingest), derive the `StructType` that
`from_json` / `createDataFrame` should use so the expression compiler
(``columns.py``) can stay entirely JVM-side.  Documents whose shape has no
faithful static Spark type (heterogeneous arrays, objects used as open maps
with conflicting value types) raise ``Unrepresentable`` — callers fall back
to the Arrow-batched UDF path, mirroring SURVEY §1.2's mapping decision.

JMESPath's type system has a single number type (double — `functions.go:352`),
so every JSON number infers as ``DoubleType``.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T


class Unrepresentable(ValueError):
    """The document's shape has no faithful static Spark type."""


# StructField metadata markers. PADDED: the key is absent in some of the
# objects this struct type represents — runtime NULL may mean "absent", so
# plain field access stays faithful (missing → null is JMESPath semantics)
# but key-ENUMERATING operations (keys/values/merge/to_string/`*`/length/
# deep equality) are not and must refuse. OPAQUE: the field's true value
# type has no static Spark form; the value is dropped (stored as NULL), so
# even accessing it must refuse.
PADDED = "kc_padded"
OPAQUE = "kc_opaque"

# BOXED: the field's value type has no static Spark form, but the value is
# KEPT — stored as a StringType column holding the value's canonical JSON
# text (sorted keys, compact separators, integral floats as ints; SQL NULL
# encodes both JSON null and an absent key, which JMESPath cannot tell
# apart anyway). The compiler treats such columns as dynamically-typed
# "json box" values: truthiness, equality, or/and, and a handful of
# functions operate on the text directly (columns.py JsonBoxType).
# BOXED_ELEM: same, but the field is a heterogeneous ARRAY — stored as
# array<string> of per-element canonical JSON, preserving native index/
# slice/size/reverse on the array shape.
BOXED = "kc_boxed"
BOXED_ELEM = "kc_boxed_elem"

# SHADOW: a synthetic `_kc_raw` StringType field appended to any struct
# that carries PADDED/BOXED/BOXED_ELEM/OPAQUE members, holding the WHOLE
# object's canonical JSON. It restores what padding/boxing lost — key
# presence and dropped values — so such structs can still be returned,
# compared, and serialized faithfully (columns.py boxes them via the
# shadow). Never addressable from a JMESPath expression.
SHADOW = "kc_shadow"
SHADOW_NAME = "_kc_raw"


def _mark(f: T.StructField, key: str) -> T.StructField:
    md = dict(f.metadata or {})
    md[key] = True
    return T.StructField(f.name, f.dataType, f.nullable, md)


def _merge_meta(a: dict, b: dict) -> dict:
    return {**(a or {}), **(b or {})}


def contains_empty_struct(dt: T.DataType) -> bool:
    """True if ``dt`` contains a zero-field struct anywhere — Spark cannot
    construct ``named_struct()`` with no fields, so such types are only
    representable as OPAQUE fields (or not at all, at the root)."""
    if isinstance(dt, T.StructType):
        return not dt.fields or any(
            contains_empty_struct(f.dataType) for f in dt.fields
        )
    if isinstance(dt, T.ArrayType):
        return contains_empty_struct(dt.elementType)
    if isinstance(dt, T.MapType):
        return contains_empty_struct(dt.valueType)
    return False


_ALL_MARKERS = (PADDED, OPAQUE, BOXED, BOXED_ELEM, SHADOW)


def has_markers(dt: T.DataType) -> bool:
    """True if ``dt`` (recursively) contains marker-bearing fields — i.e.
    some runtime values inside it are not what their plain Spark type says
    (absent-vs-null padding, dropped values, or boxed JSON text)."""
    if isinstance(dt, T.StructType):
        return any(
            any((f.metadata or {}).get(m) for m in _ALL_MARKERS)
            or has_markers(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, T.ArrayType):
        return has_markers(dt.elementType)
    if isinstance(dt, T.MapType):
        return has_markers(dt.valueType)
    return False


def canonical_json(v) -> str | None:
    """Canonical JSON text of a JSON-shaped Python value: sorted keys,
    compact separators, integral floats printed as ints (JMESPath has one
    number type; 1.0 and 1 are the same value and must box identically).
    The int conversion is bounded at 2**53 to match what the Column-side
    serializer (columns.py ``_json_text``) can reproduce with a long cast.
    Top-level ``None`` boxes to SQL NULL (returns None), matching the
    compiler's NULL ⇔ JMESPath-null convention; nested nulls stay "null".
    """
    if v is None:
        return None
    return json.dumps(
        _canon_nums(v), separators=(",", ":"), ensure_ascii=False, sort_keys=True
    )


def _canon_nums(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and abs(v) <= 2.0**53 and v == int(v):
        return int(v)
    if isinstance(v, list):
        return [_canon_nums(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon_nums(x) for k, x in v.items()}
    return v


def unify(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common Spark type of two inferred types.

    Null absorbs into anything; arrays unify element-wise; structs unify
    field-wise. Objects with DIFFERING key sets unify to the key union,
    with one-sided keys marked PADDED (the compiler refuses the operations
    that could observe absent ≢ null). A field whose two types genuinely
    conflict (string vs number, array vs struct, ...) becomes an OPAQUE
    NullType field — representable, but inaccessible natively. Conflicts
    at the top level (no owning field to absorb them) still raise
    ``Unrepresentable``.
    """
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if isinstance(a, T.DoubleType) and isinstance(b, T.DoubleType):
        return a
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(unify(a.elementType, b.elementType))
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        bf = {f.name: f for f in b.fields}
        af = {f.name: f for f in a.fields}
        out = []
        for f in a.fields:
            if f.name not in bf:
                out.append(_mark(f, PADDED))
                continue
            g = bf[f.name]
            md = _merge_meta(f.metadata, g.metadata)
            if md.get(OPAQUE):
                dt: T.DataType = T.NullType()
            elif md.get(BOXED):
                # one side already boxes the whole value: box both
                dt = T.StringType()
                md.pop(BOXED_ELEM, None)
            elif md.get(BOXED_ELEM):
                if isinstance(f.dataType, T.ArrayType) and isinstance(
                    g.dataType, T.ArrayType
                ):
                    dt = T.ArrayType(T.StringType())
                else:  # array on one side, scalar/object on the other
                    dt = T.StringType()
                    md.pop(BOXED_ELEM, None)
                    md[BOXED] = True
            else:
                try:
                    dt = unify(f.dataType, g.dataType)
                except Unrepresentable:
                    # genuinely conflicting value types: keep the values as
                    # canonical JSON text instead of dropping them
                    dt, md = T.StringType(), {**md, BOXED: True}
            out.append(T.StructField(f.name, dt, True, md))
        out.extend(_mark(g, PADDED) for g in b.fields if g.name not in af)
        return T.StructType(out)
    raise Unrepresentable(f"cannot unify {a.simpleString()} with {b.simpleString()}")


def infer_type(doc) -> T.DataType:
    """Infer the Spark DataType of one JSON-shaped Python value.

    Object fields whose value type is itself unrepresentable become OPAQUE
    NullType fields (value dropped, native access refused) so that
    expressions which never touch them still compile natively.
    """
    if doc is None:
        return T.NullType()
    if isinstance(doc, bool):
        return T.BooleanType()
    if isinstance(doc, (int, float)):
        return T.DoubleType()
    if isinstance(doc, str):
        return T.StringType()
    if isinstance(doc, list):
        elem: T.DataType = T.NullType()
        for x in doc:
            elem = unify(elem, infer_type(x))
        return T.ArrayType(_ensure_shadow(elem))
    if isinstance(doc, dict):
        if not all(isinstance(k, str) for k in doc):
            raise Unrepresentable("object with non-string keys")
        fields = []
        for k, v in doc.items():
            try:
                vt = infer_type(v)
                if contains_empty_struct(vt):
                    raise Unrepresentable("empty object has no Spark struct")
                fields.append(T.StructField(k, vt))
            except Unrepresentable:
                fields.append(_boxed_field(k, v))
        return _ensure_shadow(T.StructType(fields))
    raise Unrepresentable(f"no Spark type for {type(doc).__name__}")


def _boxed_field(k: str, v) -> T.StructField:
    """Field for a value with no static Spark type: keep it as canonical
    JSON (BOXED / BOXED_ELEM) when serializable, else drop it (OPAQUE)."""
    try:
        canonical_json(v)
    except (TypeError, ValueError):
        return T.StructField(k, T.NullType(), True, {OPAQUE: True})
    if isinstance(v, list):
        return T.StructField(
            k, T.ArrayType(T.StringType()), True, {BOXED_ELEM: True}
        )
    return T.StructField(k, T.StringType(), True, {BOXED: True})


def _ensure_shadow(dt: T.DataType) -> T.DataType:
    """Append the SHADOW field to a struct whose direct members carry
    markers (the usual source: unifying array elements with differing key
    sets or conflicting value types), so the element's original JSON is
    recoverable at runtime."""
    if not isinstance(dt, T.StructType):
        return dt
    names = dt.fieldNames()
    if SHADOW_NAME in names:
        return dt
    marked = any(
        any((f.metadata or {}).get(m) for m in _ALL_MARKERS) for f in dt.fields
    )
    if not marked:
        return dt
    return T.StructType(
        list(dt.fields)
        + [T.StructField(SHADOW_NAME, T.StringType(), True, {SHADOW: True})]
    )


def demote_boxes(dt: T.DataType) -> T.DataType:
    """Schema variant for ``from_json``-backed evaluation (api.py): boxed
    and shadow fields cannot be reconstructed from a parsed payload —
    ``from_json`` keeps no raw text per subtree — so BOXED/BOXED_ELEM
    demote to OPAQUE (expressions touching them refuse to the UDF) and
    SHADOW fields are dropped entirely."""
    if isinstance(dt, T.StructType):
        out = []
        for f in dt.fields:
            md = dict(f.metadata or {})
            if md.get(SHADOW):
                continue
            if md.get(BOXED) or md.get(BOXED_ELEM):
                md.pop(BOXED, None)
                md.pop(BOXED_ELEM, None)
                md[OPAQUE] = True
                out.append(T.StructField(f.name, T.NullType(), True, md))
            else:
                out.append(
                    T.StructField(
                        f.name, demote_boxes(f.dataType), f.nullable, md
                    )
                )
        return T.StructType(out)
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(demote_boxes(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            dt.keyType, demote_boxes(dt.valueType), dt.valueContainsNull
        )
    return dt


def to_spark_value(doc, dtype: T.DataType):
    """Convert a JSON-shaped value to the shape createDataFrame expects
    under ``dtype`` (structs → tuples in field order, numbers → float;
    BOXED/SHADOW fields → canonical JSON text)."""
    if doc is None:
        return None
    if isinstance(dtype, T.NullType):
        return None  # OPAQUE field: the unrepresentable value is dropped
    if isinstance(dtype, T.StructType):
        out = []
        for f in dtype.fields:
            md = f.metadata or {}
            if md.get(SHADOW):
                out.append(canonical_json(doc))
            elif md.get(OPAQUE):
                out.append(None)
            elif md.get(BOXED):
                out.append(canonical_json(doc.get(f.name)))
            elif md.get(BOXED_ELEM):
                v = doc.get(f.name)
                out.append(
                    None if v is None else [canonical_json(x) for x in v]
                )
            else:
                out.append(to_spark_value(doc.get(f.name), f.dataType))
        return tuple(out)
    if isinstance(dtype, T.ArrayType):
        return [to_spark_value(x, dtype.elementType) for x in doc]
    if isinstance(dtype, T.DoubleType):
        return float(doc)
    return doc
