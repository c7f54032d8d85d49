"""Non-UTC parity sweep (VERDICT r2 #9): the whole oracle-parity gate must
hold when the host/JVM/session timezone is not UTC — the interval-join and
events-timestamp class of bug regresses silently otherwise.

Runs tools/oracle_check.py in a SUBPROCESS so TZ reaches JVM startup (the
JVM default zone, and therefore spark.sql.session.timeZone, is fixed at
launch — an in-process conf flip would not exercise the Python-side
datetime handling or DuckDB's zone).

The UTC leg is the regular test_oracle_parity.py suite; this file adds the
America/New_York leg at the smoke scale.
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import REPO, SF_SMOKE


def test_oracle_parity_in_new_york():
    env = dict(os.environ, TZ="America/New_York")
    proc = subprocess.run(
        [sys.executable, "tools/oracle_check.py", "--bare", SF_SMOKE],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    tail = "\n".join(proc.stdout.splitlines()[-60:])
    assert proc.returncode == 0, f"non-UTC parity sweep failed:\n{tail}"
    assert "all queries match" in proc.stdout
