"""Snapshot / diff the in-situ per-kind digest artifacts.

`kinesiscat_spark/debug_digests.py` appends one JSON line per lane
invocation to ``DEBUG_<lane>.jsonl`` (gitignored — they accumulate per
run). This tool freezes a KNOWN-GREEN run's last line per lane into the
committed ``DIGEST_BASELINE_sf0.01.json``, and diffs any later run's
DEBUG lines against it — so when the driver's correctness gate reds a
multi-kind lane's hash, the divergent kind is named by comparing the
driver-written DEBUG line to this baseline, with no replay needed:

    python tools/digest_baseline.py snapshot   # after a green 50/50 sweep
    python tools/digest_baseline.py diff       # after any suspect run

The baseline is only meaningful at the correctness-gate scale factor
(sf0.01): digests are content hashes of the lane output, so any other sf
differs by construction. `diff` therefore reports — it does not assert —
and skips lanes with no DEBUG file.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "DIGEST_BASELINE_sf0.01.json")


def _last_lines() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "DEBUG_*.jsonl"))):
        lane = os.path.basename(path)[len("DEBUG_"):-len(".jsonl")]
        with open(path) as f:
            lines = [ln for ln in f if ln.strip()]
        if lines:
            out[lane] = json.loads(lines[-1])
    return out


def snapshot() -> None:
    recs = _last_lines()
    if not recs:
        sys.exit("no DEBUG_*.jsonl files found — run the oracle sweep first")
    frozen = {
        lane: {"total": r["total"], "kinds": r["kinds"]}
        for lane, r in recs.items()
    }
    with open(BASELINE, "w") as f:
        json.dump(frozen, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {BASELINE} ({len(frozen)} lanes)")


def diff() -> int:
    if not os.path.exists(BASELINE):
        sys.exit(f"{BASELINE} missing — run `snapshot` on a green sweep")
    with open(BASELINE) as f:
        base = json.load(f)
    recs = _last_lines()
    divergent = 0
    for lane, b in sorted(base.items()):
        cur = recs.get(lane)
        if cur is None:
            print(f"{lane:35s} (no DEBUG file this run — skipped)")
            continue
        moved = [
            k
            for k, d in b["kinds"].items()
            if cur["kinds"].get(k) != d
        ] + [k for k in cur["kinds"] if k not in b["kinds"]]
        if moved or cur["total"] != b["total"]:
            divergent += 1
            print(f"{lane:35s} DIVERGED kinds={sorted(set(moved))} "
                  f"total {b['total']} -> {cur['total']}")
            for k in sorted(set(moved)):
                print(f"    {k}: baseline={b['kinds'].get(k)} "
                      f"current={cur['kinds'].get(k)}")
        else:
            print(f"{lane:35s} matches baseline")
    return 1 if divergent else 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "diff"
    if mode == "snapshot":
        snapshot()
    elif mode == "diff":
        sys.exit(diff())
    else:
        sys.exit(f"unknown mode {mode!r}; use snapshot|diff")
