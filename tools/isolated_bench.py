"""Isolated min-of-N wall-clock adjudication for bench movers.

The driver bench runs 230 queries back-to-back in one JVM; SCALE.md has
documented (r9 positional movers, r12 sf1 sweep harness artifact) that
in-sweep positions can read 2-13x above a quiet reading on an identical
plan.  The standing rule: a >2x round-over-round mover is `weak` until
a min-of-N ISOLATED reading — one fresh JVM per query, nothing else in
the session — either reproduces the slowdown (then adjudicate the plan)
or collapses it (then record host/harness variance with numbers).

Usage:
  python tools/isolated_bench.py NAME [NAME ...] [--reps 5]
      For each NAME, fork a fresh Python+JVM subprocess that warms the
      lineitem scan, runs the query REPS times (noop sink, same
      measurement as bench.py), and prints min/median.  One process per
      query: no cross-query block-manager or JIT pollution.

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import __spark_entry__ as entrymod
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import get_spark

name = {name!r}
reps = {reps}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="isolated-bench-" + name)
fn = entrymod.queries()[name]
# same warm protocol as bench.py: one lineitem scan primes page cache /
# parquet footer reads, then the reps; min absorbs JIT/codegen warmup.
spark.read.parquet(sf_dir + "/lineitem.parquet").write.format("noop").mode(
    "overwrite").save()
samples = []
for _ in range(reps):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples.append(time.perf_counter() - t0)
samples.sort()
print("ISOLATED_RESULT " + json.dumps({{
    "query": name,
    "min": round(samples[0], 3),
    "median": round(samples[len(samples) // 2], 3),
    "max": round(samples[-1], 3),
    "reps": reps,
    "sf_dir": sf_dir,
}}))
"""


def main() -> int:
    argv = sys.argv[1:]
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    results = []
    for name in argv:
        code = _CHILD.format(root=ROOT, name=name, reps=reps)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd=ROOT,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines()
             if ln.startswith("ISOLATED_RESULT ")), None)
        if line is None:
            print(f"{name}: FAILED\n{proc.stderr[-2000:]}")
            return 1
        rec = json.loads(line.removeprefix("ISOLATED_RESULT "))
        results.append(rec)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
