"""Three-stage CLI with the reference's contract (``Main.py:345-406``).

    python -m project_market_pulse_etl_pipeline_with_llm_integration_spark.cli clean  <input.jsonl> <out_dir>
    python -m ...cli enrich <clean.parquet> <out_dir> [--sample N] [--rate S]
    python -m ...cli load   <database> <table>

Both positional and flag forms are accepted, like the reference
(``Main.py:357-374``).
"""

from __future__ import annotations

import argparse
import sys

from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.clean import (
    extract_and_clean,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.enrich import (
    enrich_to_parquet,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.plans.catalog import index_table
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description="News ETL pipeline (PySpark engine).")
    parser.add_argument("stage", choices=["clean", "enrich", "load"])
    parser.add_argument("arg1", nargs="?", help="input path / database name")
    parser.add_argument("arg2", nargs="?", help="output dir / table name")
    parser.add_argument("--arg1", dest="arg1_flag")
    parser.add_argument("--arg2", dest="arg2_flag")
    parser.add_argument("--sample", type=int, default=None)
    parser.add_argument("--rate", type=float, default=0.2)
    args = parser.parse_args(argv)

    arg1 = args.arg1 or args.arg1_flag
    arg2 = args.arg2 or args.arg2_flag
    if not arg1 or not arg2:
        parser.error("both arg1 and arg2 are required (positional or --arg1/--arg2)")

    spark = get_spark(app_name=f"market-pulse-{args.stage}")
    if args.stage == "clean":
        ok = extract_and_clean(spark, arg1, arg2) is not None
    elif args.stage == "enrich":
        ok = (
            enrich_to_parquet(spark, arg1, arg2, sample_size=args.sample, rate_delay=args.rate)
            is not None
        )
    else:
        ok = index_table(spark, arg1, arg2)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
