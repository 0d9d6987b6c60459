"""Cross-engine DTYPE audit: for every registry entry with a DuckDB
oracle, compare the oracle result's *pandas* dtypes against the Spark
result schema, column by column.

Why: the driver's correctness gate canonicalizes both results through
pandas.  DuckDB's ``SUM(BIGINT)`` returns HUGEINT, which pandas renders
as float64 — so an oracle that forgets to ``CAST(... AS BIGINT)`` hashes
``1234.0`` against Spark's ``1234`` and goes red AT THE DRIVER while the
``fetchall()``-based local gate (Python ints, HUGEINT-blind) stays
green.  That exact mismatch was the root cause of the three r8 driver
reds (poisson_bootstrap, bandit_replay, ab_uplift_ci).

Flag rules (per column):
  - Spark integral  vs oracle float64 with no NaN  -> HUGEINT-style bug.
  - Spark floating  vs oracle int64/int32          -> reverse renderer
    mismatch ("1.0" vs "1").
  - float64 WITH NaN is accepted for Spark integral columns: a nullable
    long goes float64 through pandas on BOTH engines, symmetrically.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
Exit 1 if any column is flagged.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import (  # noqa: E402
    TESTDATA_TABLES,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
    get_spark,
)

_INTEGRAL = {"byte", "short", "int", "integer", "long", "bigint"}
_FLOATING = {"float", "double"}


def spark_family(dt: str) -> str:
    base = dt.split("(")[0].lower()
    if base in _INTEGRAL:
        return "int"
    if base in _FLOATING:
        return "float"
    if base == "boolean":
        return "bool"
    return "other"


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else "/root/testdata/sf0.01"
    )
    only = set(
        sys.argv[2:]
        if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
        else sys.argv[1:]
    )

    spark = get_spark(app_name="dtype-audit")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
    flagged: list[str] = []
    for name, fn in qs.items():
        if (only and name not in only) or name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: spark_family(f.dataType.simpleString()) for f in sdf.schema.fields}
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # audit must see every entry; report and move on
            flagged.append(name)
            print(f"ERR   {name:28s} {exc}")
            continue
        bad = []
        for col in odf.columns:
            sfam = stypes.get(col)
            od = odf[col]
            if str(od.dtype).startswith("int"):
                ofam = "int"
            elif str(od.dtype).startswith("float"):
                has_nan = bool(od.isna().any())
                if sfam == "int" and has_nan:
                    ofam = "int"  # nullable long: float64 on BOTH engines
                else:
                    ofam = "float"
            elif str(od.dtype) == "bool":
                ofam = "bool"
            else:
                ofam = "other"
            if sfam in ("int", "float", "bool") and ofam != sfam:
                bad.append(f"{col}: spark={sfam} oracle_pandas={od.dtype}")
        if bad:
            flagged.append(name)
            print(f"FLAG  {name:28s} {'; '.join(bad)}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(flagged)} flagged" + (f": {flagged}" if flagged else ""))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
