"""In-situ per-kind digest capture for multi-kind driver lanes.

VERDICT r8 task 1a/7: `sampling_mix` went hash-red on the driver twice
while replaying green in every judge/builder session — and because its 12
kinds share ONE order-insensitive hash, the red row carried zero
information about WHICH kind diverged. This module closes that gap
without re-running anything: the lane's returned DataFrame gets a Spark
``Observation`` computing, per kind, ``(row count, bit_xor(xxhash64(all
cols)))`` — aggregates that ride the SAME job the driver executes when it
collects the frame (observations are computed inline by the action, no
extra job, no second plan execution). A daemon thread waits for the
observation to resolve and appends one JSON line to
``DEBUG_<lane>.jsonl`` at the repo root, stamped with wall time, Spark
application id, and the session confs that have historically mattered
(timezone / ANSI / AQE / shuffle partitions / arrow batch).

So the NEXT driver red is self-localizing: diff the driver-run line
against any green session's line and the divergent kind (and whether the
divergence was even on the Spark side at all) is named. Cost: one
conditional-aggregate observation evaluated during the driver's own
collect — no extra Spark jobs, schema untouched.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import deque

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# repo root = parent of the package dir; override for installed layouts
DEBUG_DIR = os.environ.get(
    "KC_DEBUG_DIR",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)

_CONF_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.adaptive.enabled",
    "spark.sql.shuffle.partitions",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.master",
)

# Accumulator registration is WEAKREF-based on the driver: once the
# Python-side Observation (and with it the observed plan) is GC'd, any
# straggling task completion from the same job logs a non-fatal but noisy
# "attempted to access non-existent accumulator" DAGScheduler ERROR (113
# of them in one bench run). Pin the last few observations + frames in a
# bounded ring so their accumulators outlive late task completions; only
# plan objects are held, never data.
_RECENT: deque = deque(maxlen=64)


def _session_info(df: DataFrame) -> dict:
    info: dict = {}
    try:
        spark = df.sparkSession
        info["app_id"] = spark.sparkContext.applicationId
        for k in _CONF_KEYS:
            try:
                info[k] = spark.conf.get(k, None)
            except Exception:
                info[k] = "<unreadable>"
    except Exception as e:  # diagnostics must never fail the lane
        info["error"] = repr(e)
    return info


def _dump_when_resolved(
    obs: Observation, lane: str, kinds: list[str], info: dict
) -> None:
    try:
        metrics = obs.get  # blocks until the caller's first action
        rec = {
            "ts": time.time(),
            "lane": lane,
            "session": info,
            "total": metrics.get("n_total"),
            "kinds": {
                k: {"n": metrics.get(f"n_{i}"), "xor": metrics.get(f"x_{i}")}
                for i, k in enumerate(kinds)
            },
        }
        path = os.path.join(DEBUG_DIR, f"DEBUG_{lane}.jsonl")
        line = json.dumps(rec, default=str) + "\n"
        # single O_APPEND write: concurrent lane invocations interleave
        # whole lines, never partial ones
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, line.encode())
        finally:
            os.close(fd)
    except Exception:
        pass  # diagnostics must never fail or wedge anything


def observe_kind_digests(
    df: DataFrame,
    lane: str,
    kinds: list[str],
    kind_col: str = "kind",
) -> DataFrame:
    """Attach the per-kind digest observation to a multi-kind lane frame.

    Returns the same frame (schema unchanged) with an ``observe`` node;
    when the caller — in production, the DRIVER — runs its first action
    on it, the per-kind ``(count, bit_xor(xxhash64(*)))`` digests are
    computed inside that very job and appended to ``DEBUG_<lane>.jsonl``
    by a daemon thread. If no action ever runs, the thread parks
    harmlessly (daemon) and nothing is written.
    """
    cols = ", ".join(df.columns)
    exprs = []
    for i, k in enumerate(kinds):
        safe = k.replace("'", "''")
        exprs.append(
            F.expr(
                f"bit_xor(case when {kind_col} = '{safe}' "
                f"then xxhash64({cols}) end)"
            ).alias(f"x_{i}")
        )
        exprs.append(
            F.expr(
                f"sum(case when {kind_col} = '{safe}' then 1 else 0 end)"
            ).alias(f"n_{i}")
        )
    exprs.append(F.count(F.lit(1)).alias("n_total"))
    obs = Observation(f"kc_digests_{lane}")
    out = df.observe(obs, exprs[0], *exprs[1:])
    _RECENT.append((obs, out))
    info = _session_info(df)
    threading.Thread(
        target=_dump_when_resolved,
        args=(obs, lane, list(kinds), info),
        daemon=True,
        name=f"kc-digest-{lane}",
    ).start()
    return out


def observe_column_digests(df: DataFrame, lane: str) -> DataFrame:
    """The per-COLUMN sibling of :func:`observe_kind_digests` for wide
    per-row lanes that have no ``kind`` column (e.g. text_quality_score's
    one-row-per-doc join of five LM score families): each column gets its
    own ``(non-null count, bit_xor(xxhash64(col)))`` digest, so a
    driver-side hash red names the divergent column family instead of
    the whole frame. Same mechanics: the aggregates ride the caller's
    first action, a daemon thread appends one line to
    ``DEBUG_<lane>.jsonl``.
    """
    exprs = []
    cols = list(df.columns)
    for i, c in enumerate(cols):
        exprs.append(
            F.expr(f"bit_xor(xxhash64(`{c}`))").alias(f"x_{i}")
        )
        exprs.append(F.expr(f"count(`{c}`)").alias(f"n_{i}"))
    exprs.append(F.count(F.lit(1)).alias("n_total"))
    obs = Observation(f"kc_coldigests_{lane}")
    out = df.observe(obs, exprs[0], *exprs[1:])
    _RECENT.append((obs, out))
    info = _session_info(df)
    threading.Thread(
        target=_dump_when_resolved,
        args=(obs, lane, cols, info),
        daemon=True,
        name=f"kc-digest-{lane}",
    ).start()
    return out
