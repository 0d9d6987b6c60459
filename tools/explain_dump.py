"""Dump ``explain("formatted")`` for bench queries to plans/<tag>/.

Optimization-round evidence artifact: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters) against these files.

Usage: python tools/explain_dump.py TAG [--suffix before|after] [name ...]
  Writes plans/<TAG>/<name>_<suffix>.txt for each query (default: every
  bench HEADLINE query).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    tag = sys.argv[1]
    suffix = "before"
    names: list[str] = []
    it = iter(sys.argv[2:])
    for a in it:
        if a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain-dump")
    queries = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names or bench.HEADLINE:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: exchanges={n_exch} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
