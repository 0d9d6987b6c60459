"""Plan-regression audit: dump per-query PHYSICAL-PLAN structure stats
for every bench headline query into one JSON — exchanges (shuffles),
broadcast vs sort-merge joins, scans, whole-stage-codegen spans, and
row-at-a-time Python evals.  Structural plan diffs between rounds are
the signal that separates real regressions from host noise (SCALE.md
round-5 environment note): wall-clock moves with the instance, plan
shape only moves with the code.

Usage: python tools/plan_audit.py [out.json]   (runs at sf0.001 — plan
shape is sf-independent for these queries; AQE final plans may differ
at runtime, this audits the static pick)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
    get_spark,
)

MARKS = {
    "exchanges": r"Exchange hashpartitioning|Exchange rangepartitioning",
    "broadcast_exchanges": r"BroadcastExchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "scans": r"FileScan parquet|Scan parquet",
    "codegen_spans": r"\*\(\d+\)",
    "python_row_eval": r"BatchEvalPython",
    "arrow_eval": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow",
    "sorts": r"Sort \[",
    "window_ops": r"Window \[|RunningWindowFunction",
}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_AUDIT.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="plan-audit")
    queries = entrymod.queries()
    audit: dict[str, dict[str, int]] = {}
    for name in HEADLINE:
        plan = queries[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        stats = {k: len(re.findall(rx, plan)) for k, rx in MARKS.items()}
        # codegen spans count distinct stage ids, not occurrences
        stats["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
        audit[name] = stats
    with open(out_path, "w") as fh:
        json.dump(audit, fh, indent=1, sort_keys=True)
    n_row_eval = [q for q, s in audit.items() if s["python_row_eval"]]
    print(f"{len(audit)} queries audited -> {out_path}")
    print(f"row-at-a-time Python in: {n_row_eval or 'NONE'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
