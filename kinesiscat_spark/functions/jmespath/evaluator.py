"""Tree evaluator for JMESPath ASTs over Python JSON values.

This is the full-fidelity semantic ground truth (validated against the
reference's 862-case compliance corpus) and the body of the Arrow-batched
pandas-UDF fallback. Data-access mismatches yield null; function misuse
raises (SURVEY §2.2/§2.3 error-vs-null matrix).
"""

from __future__ import annotations

from kinesiscat_spark.functions.jmespath.errors import InvalidValueError
from kinesiscat_spark.functions.jmespath.functions import (
    ExpRef,
    call_function,
    deep_equal,
    is_number,
    is_truthy,
)
from kinesiscat_spark.functions.jmespath.parser import Node


def evaluate(node: Node, doc):
    return _EVAL[node.type](node, doc)


def _field(node, doc):
    if isinstance(doc, dict):
        return doc.get(node.value)
    return None


def _subexpression(node, doc):
    left, right = node.children
    return evaluate(right, evaluate(left, doc))


def _pipe(node, doc):
    left, right = node.children
    return evaluate(right, evaluate(left, doc))


def _index_expression(node, doc):
    left, right = node.children
    return evaluate(right, evaluate(left, doc))


def _index(node, doc):
    if not isinstance(doc, list):
        return None
    i = node.value
    if i < 0:
        i += len(doc)
    if 0 <= i < len(doc):
        return doc[i]
    return None


def _slice(node, doc):
    if not isinstance(doc, list):
        return None
    start, stop, step = node.value
    if step == 0:
        raise InvalidValueError("slice step cannot be 0")
    return doc[start:stop:step]


def _projection(node, doc):
    left, right = node.children
    base = evaluate(left, doc)
    if not isinstance(base, list):
        return None
    out = []
    for elem in base:
        r = evaluate(right, elem)
        if r is not None:
            out.append(r)
    return out


def _value_projection(node, doc):
    left, right = node.children
    base = evaluate(left, doc)
    if not isinstance(base, dict):
        return None
    out = []
    # canonical sorted-key order: object iteration order is unspecified
    # (the reference's Go map iteration is random); sorted matches the
    # native path's variant maps, so both engines agree element-for-element
    for k in sorted(base.keys()):
        r = evaluate(right, base[k])
        if r is not None:
            out.append(r)
    return out


def _filter_projection(node, doc):
    left, right, condition = node.children
    base = evaluate(left, doc)
    if not isinstance(base, list):
        return None
    out = []
    for elem in base:
        if is_truthy(evaluate(condition, elem)):
            r = evaluate(right, elem)
            if r is not None:
                out.append(r)
    return out


def _flatten(node, doc):
    (child,) = node.children
    base = evaluate(child, doc)
    if not isinstance(base, list):
        return None
    out = []
    for elem in base:
        if isinstance(elem, list):
            out.extend(elem)
        else:
            out.append(elem)
    return out


def _comparator(node, doc):
    left, right = node.children
    a, b = evaluate(left, doc), evaluate(right, doc)
    op = node.value
    if op == "==":
        return deep_equal(a, b)
    if op == "!=":
        return not deep_equal(a, b)
    if not (is_number(a) and is_number(b)):
        # ordering is defined for numbers only; anything else -> null
        return None
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    return a >= b


def _or_expression(node, doc):
    left, right = node.children
    a = evaluate(left, doc)
    return a if is_truthy(a) else evaluate(right, doc)


def _and_expression(node, doc):
    left, right = node.children
    a = evaluate(left, doc)
    return evaluate(right, doc) if is_truthy(a) else a


def _not_expression(node, doc):
    return not is_truthy(evaluate(node.children[0], doc))


def _identity(node, doc):
    return doc


def _literal(node, doc):
    return node.value


def _multiselect_list(node, doc):
    if doc is None:
        return None
    return [evaluate(child, doc) for child in node.children]


def _multiselect_dict(node, doc):
    if doc is None:
        return None
    return {kv.value: evaluate(kv.children[0], doc) for kv in node.children}


def _expref(node, doc):
    return ExpRef(node.children[0], evaluate)


def _function_call(node, doc):
    args = [evaluate(child, doc) for child in node.children]
    return call_function(node.value, args)


_EVAL = {
    "field": _field,
    "subexpression": _subexpression,
    "pipe": _pipe,
    "index_expression": _index_expression,
    "index": _index,
    "slice": _slice,
    "projection": _projection,
    "value_projection": _value_projection,
    "filter_projection": _filter_projection,
    "flatten": _flatten,
    "comparator": _comparator,
    "or_expression": _or_expression,
    "and_expression": _and_expression,
    "not_expression": _not_expression,
    "identity": _identity,
    "literal": _literal,
    "multiselect_list": _multiselect_list,
    "multiselect_dict": _multiselect_dict,
    "expref": _expref,
    "function_call": _function_call,
}
