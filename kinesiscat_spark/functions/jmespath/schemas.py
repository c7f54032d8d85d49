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


def unify(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common Spark type of two inferred types.

    Null absorbs into anything; arrays unify element-wise; structs unify
    field-wise only when their key sets are IDENTICAL — merging differing
    shapes would fabricate null-valued fields for keys the original object
    never had, and JMESPath can observe that difference (absent ≢ null when
    the whole object is returned, e.g. ``foo[0]`` or a filter projection).
    A genuine type conflict (string vs number, array vs struct, differing
    object shapes, ...) raises ``Unrepresentable``.
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
        if {f.name for f in a.fields} != {f.name for f in b.fields}:
            raise Unrepresentable("objects with differing key sets")
        bt = {f.name: f.dataType for f in b.fields}
        return T.StructType(
            [T.StructField(f.name, unify(f.dataType, bt[f.name])) for f in a.fields]
        )
    raise Unrepresentable(f"cannot unify {a.simpleString()} with {b.simpleString()}")


def infer_type(doc) -> T.DataType:
    """Infer the Spark DataType of one JSON-shaped Python value."""
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
        return T.StructType(
            [T.StructField(k, infer_type(v)) for k, v in doc.items()]
        )
    raise Unrepresentable(f"no Spark type for {type(doc).__name__}")


def to_spark_value(doc, dtype: T.DataType):
    """Convert a JSON-shaped value to the shape createDataFrame expects
    under ``dtype`` (structs → tuples in field order, numbers → float)."""
    if doc is None:
        return None
    if isinstance(dtype, T.StructType):
        return tuple(
            to_spark_value(doc.get(f.name), f.dataType) for f in dtype.fields
        )
    if isinstance(dtype, T.ArrayType):
        return [to_spark_value(x, dtype.elementType) for x in doc]
    if isinstance(dtype, T.DoubleType):
        return float(doc)
    return doc
