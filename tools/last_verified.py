"""Per-entry last-verified manifest (VERDICT r10 item 5).

The driver window re-samples 50 registry entries per round, so the
oldest driver-green timestamp for some entries dates back rounds while
the code underneath kept moving.  This tool makes the staleness
visible: it merges every committed ``CORRECTNESS_r*.json`` (latest
driver round each entry was green, and its status) with the newest
full local replica report (``check_oracle.py`` run with
``ORACLE_REPORT=<path>`` at current HEAD) into ``LAST_VERIFIED.json``:

  {name: {"driver_round": N | null, "driver_status": "green"|"red",
          "replica": "OK"|"rows"|"FAIL ..." | null}}

Usage: python tools/last_verified.py [replica_report.json]
Exits non-zero if any registry entry has neither a green driver row
nor a green replica row — i.e. a claim with no verification at all.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402


def _green(v: dict) -> bool:
    return not v.get("err") and v.get("rows_match") is not False and \
        v.get("schema_match") is not False and v.get("hash_match") is not False


def main() -> int:
    replica_path = sys.argv[1] if len(sys.argv) > 1 else None
    registry = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    manifest: dict[str, dict] = {
        n: {"driver_round": None, "driver_status": None, "replica": None,
            "gate": "oracle" if n in oracles else "rows_only"}
        for n in registry
    }
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if name not in manifest:
                continue  # renamed/retired entries
            manifest[name]["driver_round"] = rnd
            manifest[name]["driver_status"] = (
                "green" if _green(row) else "red"
            )
    if replica_path:
        with open(replica_path) as fh:
            rep = json.load(fh)
        for name, status in rep.items():
            if name in manifest:
                manifest[name]["replica"] = status
    out = os.path.join(ROOT, "LAST_VERIFIED.json")
    with open(out, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    unverified = [
        n for n, m in manifest.items()
        if m["driver_status"] != "green" and m["replica"] not in ("OK", "rows")
    ]
    rounds = [m["driver_round"] for m in manifest.values() if m["driver_round"]]
    print(f"{len(manifest)} registry entries -> {out}")
    if rounds:
        from collections import Counter

        print("driver last-green round distribution:",
              dict(sorted(Counter(rounds).items())))
    print(f"entries with NO green verification anywhere: "
          f"{unverified or 'NONE'}")
    return 1 if unverified else 0


if __name__ == "__main__":
    raise SystemExit(main())
