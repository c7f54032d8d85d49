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


def has_markers(dt: T.DataType) -> bool:
    """True if ``dt`` (recursively) contains PADDED or OPAQUE fields —
    i.e. some runtime NULLs inside it encode "absent"/"dropped" rather
    than JSON null."""
    if isinstance(dt, T.StructType):
        return any(
            (f.metadata or {}).get(PADDED)
            or (f.metadata or {}).get(OPAQUE)
            or has_markers(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, T.ArrayType):
        return has_markers(dt.elementType)
    if isinstance(dt, T.MapType):
        return has_markers(dt.valueType)
    return False


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
            try:
                dt = unify(f.dataType, g.dataType)
            except Unrepresentable:
                dt, md = T.NullType(), {**md, OPAQUE: True}
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
        return T.ArrayType(elem)
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
                fields.append(T.StructField(k, T.NullType(), True, {OPAQUE: True}))
        return T.StructType(fields)
    raise Unrepresentable(f"no Spark type for {type(doc).__name__}")


def to_spark_value(doc, dtype: T.DataType):
    """Convert a JSON-shaped value to the shape createDataFrame expects
    under ``dtype`` (structs → tuples in field order, numbers → float)."""
    if doc is None:
        return None
    if isinstance(dtype, T.NullType):
        return None  # OPAQUE field: the unrepresentable value is dropped
    if isinstance(dtype, T.StructType):
        return tuple(
            to_spark_value(doc.get(f.name), f.dataType) for f in dtype.fields
        )
    if isinstance(dtype, T.ArrayType):
        return [to_spark_value(x, dtype.elementType) for x in doc]
    if isinstance(dtype, T.DoubleType):
        return float(doc)
    return doc
