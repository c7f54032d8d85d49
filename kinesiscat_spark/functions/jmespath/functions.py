"""JMESPath built-in function library (public spec) — Python evaluation side.

Spark-native Column mappings for these functions live in ``columns.py``
(SURVEY §2.3 table, F1–F26); this module is the dynamic-typed ground truth
with the spec's strict arity/type error behavior: function misuse raises,
while missing keys / wrong-typed *data access* yields null.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Callable

from kinesiscat_spark.functions.jmespath.errors import (
    InvalidArityError,
    InvalidTypeError,
    UnknownFunctionError,
)


@dataclass(frozen=True)
class ExpRef:
    """An `&expression` argument: an unevaluated AST + the evaluator hook."""

    node: object
    evaluate: Callable  # (node, doc) -> value

    def __call__(self, doc):
        return self.evaluate(self.node, doc)


def is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def type_name(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if is_number(v):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    if isinstance(v, ExpRef):
        return "expref"
    raise InvalidTypeError(f"unsupported value {v!r}")


def _matches(value, allowed: tuple[str, ...]) -> bool:
    if not allowed:
        return True
    t = type_name(value)
    for a in allowed:
        if a == t:
            return True
        if a == "array-number" and t == "array" and all(is_number(x) for x in value):
            return True
        if (
            a == "array-string"
            and t == "array"
            and all(isinstance(x, str) for x in value)
        ):
            return True
        if a.startswith("array-") and t == "array" and not value:
            return True  # empty array satisfies any element constraint
    return False


@dataclass(frozen=True)
class Arg:
    types: tuple[str, ...] = ()
    variadic: bool = False


_TABLE: dict[str, tuple[tuple[Arg, ...], Callable]] = {}


def _register(name: str, *args: Arg):
    def deco(fn):
        _TABLE[name] = (args, fn)
        return fn

    return deco


def call_function(name: str, args: list):
    entry = _TABLE.get(name)
    if entry is None:
        raise UnknownFunctionError(f"unknown function {name}()")
    sig, fn = entry
    if sig and sig[-1].variadic:
        if len(args) < len(sig):
            raise InvalidArityError(
                f"{name}() takes at least {len(sig)} args, got {len(args)}"
            )
        fixed, var = sig[:-1], sig[-1]
        for a, spec in zip(args, fixed):
            if not _matches(a, spec.types):
                raise InvalidTypeError(f"{name}(): bad argument type {type_name(a)}")
        for a in args[len(fixed) :]:
            if not _matches(a, var.types):
                raise InvalidTypeError(f"{name}(): bad argument type {type_name(a)}")
    else:
        if len(args) != len(sig):
            raise InvalidArityError(f"{name}() takes {len(sig)} args, got {len(args)}")
        for a, spec in zip(args, sig):
            if not _matches(a, spec.types):
                raise InvalidTypeError(f"{name}(): bad argument type {type_name(a)}")
    return fn(*args)


# --- numeric ---------------------------------------------------------------


@_register("abs", Arg(("number",)))
def _abs(n):
    return abs(n)


@_register("ceil", Arg(("number",)))
def _ceil(n):
    return int(math.ceil(n))


@_register("floor", Arg(("number",)))
def _floor(n):
    return int(math.floor(n))


@_register("avg", Arg(("array-number",)))
def _avg(a):
    return sum(a) / len(a) if a else None


@_register("sum", Arg(("array-number",)))
def _sum(a):
    return sum(a) if a else 0


# --- string ----------------------------------------------------------------


@_register("starts_with", Arg(("string",)), Arg(("string",)))
def _starts_with(s, prefix):
    return s.startswith(prefix)


@_register("ends_with", Arg(("string",)), Arg(("string",)))
def _ends_with(s, suffix):
    return s.endswith(suffix)


@_register("join", Arg(("string",)), Arg(("array-string",)))
def _join(sep, a):
    return sep.join(a)


@_register("reverse", Arg(("array", "string")))
def _reverse(x):
    return x[::-1]


@_register("length", Arg(("string", "array", "object")))
def _length(x):
    return len(x)


@_register("contains", Arg(("array", "string")), Arg())
def _contains(subject, search):
    if isinstance(subject, str):
        # non-string needle in a string → false, not an error
        # (go jpfContains, functions.go:443-460)
        if not isinstance(search, str):
            return False
        return search in subject
    return any(deep_equal(e, search) for e in subject)


# --- array / object --------------------------------------------------------


# keys()/values() order is UNSPECIFIED by the spec (the reference's Go map
# iteration is literally random, jp/functions.go) — we pick canonical
# sorted-key order so the evaluator, the native Column path (variant maps
# serialize with sorted keys), and any other engine agree byte-for-byte.


@_register("keys", Arg(("object",)))
def _keys(o):
    return sorted(o.keys())


@_register("values", Arg(("object",)))
def _values(o):
    return [o[k] for k in sorted(o.keys())]


@_register("merge", Arg(("object",), variadic=True))
def _merge(*objs):
    out: dict = {}
    for o in objs:
        out.update(o)
    return out


@_register("not_null", Arg((), variadic=True))
def _not_null(*vals):
    for v in vals:
        if v is not None:
            return v
    return None


@_register("max", Arg(("array-number", "array-string")))
def _max(a):
    return max(a) if a else None


@_register("min", Arg(("array-number", "array-string")))
def _min(a):
    return min(a) if a else None


@_register("sort", Arg(("array-number", "array-string")))
def _sort(a):
    return sorted(a)


def _by_key(name: str, a: list, expref) -> list:
    """Evaluate the expref over each element, requiring a uniform
    number-or-string key type (spec: invalid-type otherwise)."""
    if not isinstance(expref, ExpRef):
        raise InvalidTypeError(f"{name}(): second argument must be an expression")
    keys = [expref(e) for e in a]
    if keys:
        first = type_name(keys[0])
        if first not in ("number", "string"):
            raise InvalidTypeError(f"{name}(): key type {first} not orderable")
        for k in keys:
            if type_name(k) != first:
                raise InvalidTypeError(f"{name}(): mixed key types")
    return keys


@_register("sort_by", Arg(("array",)), Arg(("expref",)))
def _sort_by(a, expref):
    keys = _by_key("sort_by", a, expref)
    return [e for _, e in sorted(zip(keys, a), key=lambda p: p[0])] if a else []


@_register("max_by", Arg(("array",)), Arg(("expref",)))
def _max_by(a, expref):
    keys = _by_key("max_by", a, expref)
    if not a:
        return None
    i = max(range(len(a)), key=lambda i: keys[i])
    return a[i]


@_register("min_by", Arg(("array",)), Arg(("expref",)))
def _min_by(a, expref):
    keys = _by_key("min_by", a, expref)
    if not a:
        return None
    i = min(range(len(a)), key=lambda i: keys[i])
    return a[i]


@_register("map", Arg(("expref",)), Arg(("array",)))
def _map(expref, a):
    if not isinstance(expref, ExpRef):
        raise InvalidTypeError("map(): first argument must be an expression")
    return [expref(e) for e in a]


# --- conversion / reflection ----------------------------------------------


@_register("to_array", Arg(()))
def _to_array(x):
    return x if isinstance(x, list) else [x]


@_register("to_string", Arg(()))
def _to_string(x):
    if isinstance(x, str):
        return x
    # sort_keys: JSON object order is unspecified; the reference's Go
    # json.Marshal sorts map keys, and the native Column path serializes
    # variants with sorted keys — canonical order everywhere
    return json.dumps(x, separators=(",", ":"), ensure_ascii=False, sort_keys=True)


@_register("to_number", Arg(()))
def _to_number(x):
    if is_number(x):
        return x
    if isinstance(x, str):
        try:
            return int(x)
        except ValueError:
            try:
                return float(x)
            except ValueError:
                return None
    return None


@_register("type", Arg(()))
def _type(x):
    return type_name(x)


# --- shared helpers --------------------------------------------------------


def deep_equal(a, b) -> bool:
    """JSON structural equality; bool is never equal to 0/1 numbers."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if is_number(a) and is_number(b):
        return a == b
    if type(a) is not type(b) and not (
        isinstance(a, type(b)) or isinstance(b, type(a))
    ):
        return False
    if isinstance(a, list):
        return (
            isinstance(b, list)
            and len(a) == len(b)
            and all(deep_equal(x, y) for x, y in zip(a, b))
        )
    if isinstance(a, dict):
        return (
            isinstance(b, dict)
            and a.keys() == b.keys()
            and all(deep_equal(v, b[k]) for k, v in a.items())
        )
    return a == b


def is_truthy(v) -> bool:
    """JMESPath truthiness: false/null/""/[]/{}  are falsy; 0 is truthy
    (SURVEY §1.3; `jp/util.go:8-45`)."""
    if v is None or v is False:
        return False
    if isinstance(v, (str, list, dict)):
        return len(v) > 0
    return True
