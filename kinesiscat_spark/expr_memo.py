"""Process-wide memo for PURE Column expression trees (round 9).

Building a large Column expression costs one py4j gateway round trip per
operator call (~0.3 ms each); the heavy multi-kind lanes rebuild the
same few-hundred-node trees on every invocation, which cProfile showed
as seconds of driver time per bench pass. An expression that depends
only on LITERAL parameters and input COLUMN NAMES — never on a
DataFrame, session, path or data — is an immutable JVM handle that can
be reused verbatim across invocations and sessions in one process.

This is NOT result caching: a memoized Column is a plan fragment; every
query that embeds it is a fresh DataFrame whose action recomputes from
the parquet inputs.

Callers own key hygiene: the key MUST encode every parameter the built
expression depends on (the ``curation_signals`` select-list memo
discipline).
"""

from __future__ import annotations

_MEMO: dict = {}


def expr_memo(key: str, build):
    """Return ``build()``, computed once per process per ``key``."""
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]
