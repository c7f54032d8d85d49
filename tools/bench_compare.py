"""Compare two bench JSON files lane by lane on their COMMON lanes.

Cross-round bench totals are not directly comparable when the lane set
changes (folds/additions) or the host speed drifts (see COVERAGE.md
"Bench-drift adjudication") — this tool restricts to common lanes and
prints per-lane ratios plus the env blocks, so "code got slower" and
"host got slower" are distinguishable at a glance.

    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver-recorded files wrap the parsed line under "parsed"
    return d.get("parsed", d)


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda k: -qb[k])
    print(f"{'lane':36s}{'A':>8s}{'B':>8s}{'B/A':>7s}")
    for k in common:
        r = qb[k] / qa[k] if qa[k] else float("inf")
        print(f"{k:36s}{qa[k]:8.3f}{qb[k]:8.3f}{r:7.2f}")
    ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    if ta > 0:
        print(f"{'COMMON TOTAL':36s}{ta:8.3f}{tb:8.3f}{tb / ta:7.2f}")
    else:
        print("no common lanes (or zero common total) — sets compared below")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print("only in A:", ", ".join(only_a))
    if only_b:
        print("only in B:", ", ".join(f"{k} ({qb[k]:.3f}s)" for k in only_b))
    for name, d in (("A", a), ("B", b)):
        env = d.get("env")
        if env:
            print(f"env {name}: start load {env['start']['load_1m']}, "
                  f"end load {env['end']['load_1m']}, cpus {env.get('cpus')}; "
                  f"pass totals {d.get('pass_totals')}")
        else:
            print(f"env {name}: (not recorded — pre-round-5 bench)")


if __name__ == "__main__":
    main()
