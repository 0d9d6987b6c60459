"""Executed-plan (post-AQE) drift gate (VERDICT r10 item 1).

``bench.py`` captures the FINAL executed-plan skeleton of every
HEAVY_TIER query, every query over 0.5 s, and every query already in
the committed baseline (one untimed execution after the timed reps —
AQE finalizes on first execute) and records a fingerprint per query in
``BENCH_DETAIL.json`` while maintaining the committed baseline
``EXEC_PLANS.json``.  This tool is the loud gate: it compares the
latest bench capture against the baseline and exits non-zero on any
structural diff — the static audit (tools/plan_audit.py) cannot see
runtime re-planning (plan_audit.py:10-11), this closes that gap.

Usage: python tools/exec_plan_audit.py   (after a full bench run)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    base_path = os.path.join(ROOT, "EXEC_PLANS.json")
    if not os.path.exists(detail_path):
        print("no BENCH_DETAIL.json — run a full bench first")
        return 1
    if not os.path.exists(base_path):
        print("no EXEC_PLANS.json baseline — run a full bench first "
              "(it writes the baseline when missing)")
        return 1
    with open(detail_path) as fh:
        detail = json.load(fh)
    with open(base_path) as fh:
        base = json.load(fh)
    fps = detail.get("exec_plan_fp", {})
    if not fps:
        print("BENCH_DETAIL.json carries no exec-plan fingerprints — "
              "predates the r11 capture; re-run bench")
        return 1
    if detail.get("sf") != base.get("sf"):
        print(f"sf mismatch: bench at sf={detail.get('sf')}, baseline at "
              f"sf={base.get('sf')} — AQE skeletons only comparable at "
              "the same sf")
        return 1
    diffs, missing = [], []
    for name, fp in fps.items():
        want = base["plans"].get(name)
        if want is None:
            missing.append(name)
        elif want["fp"] != fp and fp not in want.get("alt_fps", []):
            # alt_fps: adjudicated bistable alternates (AQE near-tie
            # build-side flips); anything outside the set still fails
            diffs.append(name)
    recorded = [
        n for n in detail.get("exec_plan_diffs", [])
        if not (base["plans"].get(n)
                and fps.get(n) in base["plans"][n].get("alt_fps", []))
    ]
    print(f"{len(fps)} executed plans checked against baseline")
    print(f"fingerprint diffs: {diffs or 'NONE'}")
    if recorded:
        print(f"bench-run recorded skeleton diffs: {recorded}")
    if missing:
        print(f"not in baseline yet (new heavy queries): {missing}")
    return 1 if (diffs or recorded) else 0


if __name__ == "__main__":
    raise SystemExit(main())
