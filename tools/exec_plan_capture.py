"""Isolated executed-plan capture for adjudicating AQE drift.

When ``tools/exec_plan_audit.py`` flags a fingerprint drift, the
protocol (SCALE.md r11 triangle_count adjudication) is a min-of-5
ISOLATED capture: run the query's post-AQE capture N times in a quiet
session and see whether the alternate fingerprint reproduces.  Two
stable fingerprints across isolated runs = a genuinely bistable AQE
near-tie (typically the build-side pick on a self-join of one frame)
and the alternate joins the baseline's ``alt_fps`` accepted set; a
fingerprint that does NOT reproduce was concurrency noise; anything
beyond two shapes stays a loud failure.

Usage:
  python tools/exec_plan_capture.py NAME [NAME ...] [--reps 5]
      capture each query REPS times in one fresh session, print the
      observed fingerprint set per query (invoke the script more than
      once for cross-session evidence — AQE stat-readiness order can
      differ between JVMs).
  python tools/exec_plan_capture.py --admit NAME FP [SKELETON.json]
      add FP to EXEC_PLANS.json's alt_fps accepted set for NAME
      (after the drift is adjudicated as bistable), persisting the
      adjudicated skeleton into alt_skeletons alongside it — sourced
      from BENCH_DETAIL.json's drift record, or the optional JSON
      file.  Refuses a tree-less admit.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def admit(name: str, fp: str, skeleton_json: str | None = None) -> int:
    path = os.path.join(ROOT, "EXEC_PLANS.json")
    with open(path) as fh:
        base = json.load(fh)
    entry = base["plans"].get(name)
    if entry is None:
        print(f"{name} not in baseline")
        return 1
    if fp == entry["fp"] or fp in entry.get("alt_fps", []):
        print(f"{name}: {fp} already accepted")
        return 0
    # an admitted alternate without its tree is unverifiable later
    # (review r12: the r11 bd6d0069 admit left only a fingerprint
    # behind, blocking the tree-read the adjudication rule requires) —
    # pull the skeleton from BENCH_DETAIL's drift record, or take it
    # explicitly as a JSON file argument
    skeleton = None
    if skeleton_json is not None:
        with open(skeleton_json) as fh:
            skeleton = json.load(fh)
            if isinstance(skeleton, dict):
                skeleton = skeleton[fp] if fp in skeleton else skeleton[name]
    else:
        detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
        if os.path.exists(detail_path):
            with open(detail_path) as fh:
                drifts = json.load(fh).get("exec_plan_drift_skeletons", {})
            sk = drifts.get(name)
            if sk is not None:
                import hashlib as _h
                if _h.sha256("\n".join(sk).encode()).hexdigest()[:16] == fp:
                    skeleton = sk
    if skeleton is None:
        print(f"{name}: refusing to admit {fp} without its skeleton — "
              f"pass a skeleton JSON file as the third argument, or "
              f"re-run bench so BENCH_DETAIL.json records the drift "
              f"tree for this fingerprint")
        return 1
    entry.setdefault("alt_fps", []).append(fp)
    entry.setdefault("alt_skeletons", {})[fp] = skeleton
    with open(path, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{name}: admitted {fp} to alt_fps with its skeleton stored "
          f"(accepted set now {[entry['fp']] + entry['alt_fps']})")
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv[:1] == ["--admit"]:
        return admit(argv[1], argv[2],
                     argv[3] if len(argv) > 3 else None)
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    backfill = "--backfill" in argv
    if backfill:
        argv.remove("--backfill")
    names = argv
    import bench  # noqa: E402  (repo-root harness; shares the skeletonizer)
    import __spark_entry__ as entrymod  # noqa: E402
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exec-plan-capture")
    queries = entrymod.queries()
    base_path = os.path.join(ROOT, "EXEC_PLANS.json")
    baseline = {}
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline = json.load(fh).get("plans", {})
    out: dict[str, dict] = {}
    for name in names:
        fps: list[str] = []
        skels: dict[str, list[str]] = {}
        for _ in range(reps):
            sk = bench._capture_exec_plan(queries[name](spark, sf_dir))
            fp = hashlib.sha256("\n".join(sk).encode()).hexdigest()[:16]
            fps.append(fp)
            skels[fp] = sk
        want = baseline.get(name, {})
        accepted = ([want["fp"]] + want.get("alt_fps", [])) if want else []
        out[name] = {
            "fps": fps,
            "distinct": sorted(set(fps)),
            "baseline_fp": want.get("fp"),
            "alt_fps": want.get("alt_fps", []),
            "outside_accepted": sorted(set(fps) - set(accepted)),
        }
        print(json.dumps({name: out[name]}))
        # --backfill: an observed fp that is ALREADY an accepted
        # alternate but has no stored tree (pre-r13 admits) gets its
        # skeleton persisted now, making the historical adjudication
        # tree-verifiable (review r12)
        if backfill and want:
            missing = [fp for fp in set(fps)
                       if fp in want.get("alt_fps", [])
                       and fp not in want.get("alt_skeletons", {})]
            if missing:
                with open(base_path) as fh:
                    base_full = json.load(fh)
                entry = base_full["plans"][name]
                for fp in missing:
                    entry.setdefault("alt_skeletons", {})[fp] = skels[fp]
                with open(base_path, "w") as fh:
                    json.dump(base_full, fh, indent=1, sort_keys=True)
                    fh.write("\n")
                print(f"  backfilled alt_skeletons for {name}: {missing}")
        # on a novel shape, print the diff vs baseline for adjudication
        for fp in out[name]["outside_accepted"]:
            if want.get("skeleton"):
                import difflib
                for dl in difflib.unified_diff(
                    want["skeleton"], skels[fp], "baseline", fp, n=1
                ):
                    print(f"  {dl}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
