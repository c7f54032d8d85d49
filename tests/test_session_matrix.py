"""Session-environment matrix for the sampling lanes (VERDICT r8 task 3).

The judge's round-8 adjudication of the driver-only ``sampling_mix`` hash
red replayed the lane clean under six session-config variants (local[2],
ANSI on, AQE off, shuffle.partitions=7, arrow maxRecordsPerBatch=7,
non-UTC timezone) plus concurrent in-session execution. This module PINS
that matrix as pytest so the divergence hunt accumulates permanently
excluded hypotheses instead of re-running them by hand each round.

Mechanics: each conf variant runs in a FRESH ``spark.newSession()``
(isolated SQLConf + temp-view catalog, shared JVM — cheap), compares the
full lane against the DuckDB oracle at sf0.001 with the exact
oracle_check canonicalization the driver mirrors. The master variant
(local[2]) needs its own SparkContext, so it runs in a subprocess. The
concurrency case runs sampling_mix twice
simultaneously in one session from two threads.
"""

from __future__ import annotations

import subprocess
import sys
import threading

import pytest

from tests.conftest import SF_SMOKE

VARIANTS = {
    "ansi_on": {"spark.sql.ansi.enabled": "true"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "shuffle7": {"spark.sql.shuffle.partitions": "7"},
    "arrow7": {"spark.sql.execution.arrow.maxRecordsPerBatch": "7"},
    "tz_tokyo": {"spark.sql.session.timeZone": "Asia/Tokyo"},
}

LANES = ("sampling_mix",)


def _compare_lane(session, lane: str) -> None:
    from kinesiscat_spark.registry import REGISTRY, load_all_query_modules
    from tools.oracle_check import compare, duckdb_con

    load_all_query_modules()
    rq = REGISTRY[lane]
    con = duckdb_con(SF_SMOKE)
    try:
        oracle = con.execute(rq.oracle).df()
    finally:
        con.close()
    ok, msg = compare(rq.fn(session, SF_SMOKE), oracle)
    assert ok, f"{lane}: {msg}"


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("lane", LANES)
def test_sampling_conf_variant(spark, variant, lane):
    s = spark.newSession()
    for k, v in VARIANTS[variant].items():
        s.conf.set(k, v)
    _compare_lane(s, lane)


def test_sampling_concurrent_in_one_session(spark):
    """Two sampling-lane compares executing simultaneously in ONE
    session — the cross-talk hypothesis (shared memo views / fixture
    cache / scheduler) for the driver-only red. The streamed reservoir
    kind is folded inside sampling_mix, so running the lane from two
    threads at once exercises the same shared-state surface the split
    lane did."""
    s = spark.newSession()
    errors: list[BaseException] = []

    def run(lane: str) -> None:
        try:
            _compare_lane(s, lane)
        except BaseException as e:  # noqa: BLE001 — surface in main thread
            errors.append(e)

    threads = [threading.Thread(target=run, args=(ln,))
               for ln in ("sampling_mix", "sampling_mix")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert not errors, errors


def test_sampling_mix_local2_subprocess():
    """master=local[2] needs its own SparkContext — run the same compare
    in a subprocess (the judge's remaining session variant)."""
    code = f"""
import sys
sys.path.insert(0, {repr(sys.path[0] or ".")})
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("kc-session-matrix")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
from tests.test_session_matrix import _compare_lane
for lane in {LANES!r}:
    _compare_lane(spark, lane)
print("MATRIX_LOCAL2_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MATRIX_LOCAL2_OK" in proc.stdout
