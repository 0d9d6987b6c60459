"""Custom Python DataSource (Spark 4): schema, partitioning,
determinism, and the variant extraction path."""

from __future__ import annotations

from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources import pyds


def _ticks(spark, n=1000, parts=4):
    pyds.register(spark)
    return (
        spark.read.format("synthetic_ticks")
        .option("n", str(n))
        .option("partitions", str(parts))
        .load()
    )


def test_pyds_schema_and_count(spark):
    df = _ticks(spark, n=1000, parts=4)
    assert df.columns == ["event_id", "series", "cents"]
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4


def test_pyds_deterministic_replay(spark):
    a = sorted(tuple(r) for r in _ticks(spark, 500, 3).collect())
    b = sorted(tuple(r) for r in _ticks(spark, 500, 3).collect())
    assert a == b
    # formula check on a few rows
    for i, series, cents in a[:10]:
        assert series == f"s{i % 5}"
        assert cents == (i * pyds.KNUTH) % 100000


def test_pyds_partitioning_is_exhaustive_and_disjoint(spark):
    ids = [r["event_id"] for r in _ticks(spark, 777, 8).collect()]
    assert sorted(ids) == list(range(777))


def test_variant_extract_matches_json_string_path(spark):
    from conftest import SF_SMALL

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import (
        relational as R,
    )
    from pyspark.sql import functions as F

    got = {r["event_id"]: (r["k"], r["k_bucket"])
           for r in R.q_variant_extract(spark, SF_SMALL).collect()}
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    ).collect()
    want = {r["event_id"]: (r["k"], r["k"] % 10) for r in ev if r["k"] is not None}
    assert got == want


def test_jsonl_sink_roundtrip(spark, tmp_path):
    """The Python DataSource WRITER: write an aggregate through the
    custom sink, read the part files back, and match the original —
    plus the manifest two-phase-commit artifact."""
    import json
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources import pyds

    pyds.register(spark)
    pyds.register_sink(spark)
    ticks = (
        spark.read.format("synthetic_ticks")
        .option("n", "1000")
        .option("partitions", "4")
        .load()
    )
    agg = ticks.groupBy("series").count()
    out = str(tmp_path / "sink")
    agg.write.format("jsonl_sink").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
    rows = []
    for fn in sorted(os.listdir(out)):
        if fn.startswith("part-"):
            with open(os.path.join(out, fn)) as fh:
                rows += [json.loads(line) for line in fh]
    got = {(r["series"], r["count"]) for r in rows}
    want = {(r.series, r["count"]) for r in agg.collect()}
    assert got == want
