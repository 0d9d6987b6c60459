"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count, column names, and an
order-insensitive value hash (strict: exact value string match incl.
floats after per-column canonicalization).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from project_market_pulse_etl_pipeline_with_llm_integration_spark.config import (  # noqa: E402
    TESTDATA_TABLES,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
    get_spark,
)


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else sys.argv[1:])

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # ORACLE_REPORT=path: also write {name: "OK"|"rows"|"FAIL ..."} so
    # tools/last_verified.py can fold a full-replica run into the
    # per-entry last-verified manifest (VERDICT r10 item 5)
    report: dict[str, str] = {}
    report_path = os.environ.get("ORACLE_REPORT")
    # advice r8: an unknown name / stray flag used to silently select
    # zero queries and print a vacuous "0 failures"
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # The driver's canonicalizer pandas-sorts every column and
            # crashes on array/map/struct values (r7 red: jl_projection)
            # — mirror that strictness here so the replica gate can't
            # pass what the driver would fail.
            from pyspark.sql.types import ArrayType, MapType, StructType

            nonatomic = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if nonatomic:
                raise TypeError(
                    f"non-atomic output columns {nonatomic} — the driver's "
                    "pandas canonicalizer cannot hash these"
                )
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            report[name] = f"FAIL spark error: {exc}"[:200]
            print(f"FAIL  {name:28s} spark error: {exc}")
            continue
        if name not in oracles:
            report[name] = "rows"
            print(f"rows  {name:28s} rows={len(srows):7d} (no oracle) [{time.time()-t0:5.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            odf = rel.df()
            orows = [tuple(r) for r in rel.fetchall()]
        except Exception as exc:
            failures.append(name)
            report[name] = f"FAIL duckdb error: {exc}"[:200]
            print(f"FAIL  {name:28s} duckdb error: {exc}")
            continue
        problems = []
        # r8 red-row class: the DRIVER canonicalizes through pandas, where
        # an uncast DuckDB HUGEINT (any un-CAST SUM) becomes float64 and
        # hashes '1234.0' against Spark's '1234'.  fetchall() can't see
        # this (HUGEINT -> Python int), so check the pandas dtypes the
        # driver will actually hash.  float64-with-NaN is fine for an
        # integral Spark column (a nullable long goes float64 on BOTH
        # engines, symmetrically).
        sfam = {
            f.name: (
                "int"
                if f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
                else "float"
                if f.dataType.simpleString() in ("float", "double")
                else "other"
            )
            for f in sdf.schema.fields
        }
        for col in odf.columns:
            dt = str(odf[col].dtype)
            fam = sfam.get(col)
            if fam == "int" and dt.startswith("float") and not odf[col].isna().any():
                problems.append(f"dtype {col}: oracle float64, spark integral (uncast HUGEINT?)")
            elif fam == "float" and (dt.startswith("int") or dt == "bool"):
                problems.append(f"dtype {col}: oracle {dt}, spark floating")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("value hash mismatch")
        if problems:
            failures.append(name)
            report[name] = "FAIL " + "; ".join(problems)[:200]
            print(f"FAIL  {name:28s} {'; '.join(problems)} [{time.time()-t0:5.1f}s]")
            if "value hash mismatch" in problems and len(srows) == len(orows):
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("\x01".join(canon(r[i]) for i in order) for r in srows)
                oset = sorted("\x01".join(canon(r[i]) for i in oorder) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b]
                for a, b in diffs[:3]:
                    print(f"        spark : {a[:160]}")
                    print(f"        duckdb: {b[:160]}")
                print(f"        ({len(diffs)} differing lines)")
        else:
            report[name] = "OK"
            print(f"OK    {name:28s} rows={len(srows):7d} [{time.time()-t0:5.1f}s]")
    if report_path:
        import json

        with open(report_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
