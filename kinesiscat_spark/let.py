"""let-binding for Column expression trees.

Catalyst re-evaluates any subexpression referenced inside a higher-order-
function lambda once PER ELEMENT: ``transform(seq, i -> f(expensive, i))``
computes ``expensive`` len(seq) times. When ``expensive`` is itself O(len)
(a split, an array fold, an array_max) the whole expression silently turns
O(len²) per row — invisible at test scale, catastrophic on real documents
or high-dim vectors.

``let_`` gives Column expressions a let-binding: lambda ARGUMENTS are
evaluated once per element, so wrapping the value in a 1-element array and
binding it as the lambda variable materializes it exactly once per row:

    let_(words(text), lambda ws: F.transform(idx(ws), lambda i: use(ws, i)))

Inner lambdas then reference the bound variable (a NamedLambdaVariable —
a plain slot read), not the defining expression. Equivalent results for
NULL inputs: ``array(NULL)`` binds the variable to NULL, which propagates
through the body exactly as the inlined expression would.

The alternative spellings used elsewhere in this repo (zip-of-shifted-
slices in ``dedup.shingles`` / ``text.winnow_fingerprints``, materialized
norm columns in ``similarity.ivf_centroids``) predate this helper and are
kept: they are equally safe and already plan-shape-pinned.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row, then ``body`` on the bound result."""
    return F.transform(F.array(value), body)[0]
