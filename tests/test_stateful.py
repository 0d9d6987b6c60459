"""Custom stateful streaming operator (applyInPandasWithState):
state accumulates across micro-batches and matches the batch truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_events,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.streaming import events as SE
from project_market_pulse_etl_pipeline_with_llm_integration_spark.streaming.stateful import (
    user_profiles_stateful,
)
from tests.conftest import SF_SMALL


def test_stateful_profiles_match_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    # small user slice: state-store commit overhead dominates runtime,
    # and 50 users across 2 micro-batches already exercise cross-batch
    # accumulation
    read_events(spark, SF_SMALL).filter(F.col("user_id") < 50).repartition(
        2
    ).write.parquet(src)

    stream = SE.read_events_stream(spark, src, max_files=1)  # 2 micro-batches
    q = (
        user_profiles_stateful(stream, timeout_ms=None)  # NoTimeout: query drains and stops
        .writeStream.format("memory")
        .queryName("profiles_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode emits one row per (user, micro-batch it appeared in);
    # the LAST update per user is the accumulated truth
    updates = spark.sql("select * from profiles_out").collect()
    assert updates
    last = {}
    for r in updates:  # memory sink preserves arrival order per batch
        if r.final == 0:
            last[r.user_id] = r
    batch = {
        r.user_id: r
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("value_sum_micro"),
            F.max("ts").alias("last_seen"),
        )
        .collect()
    }
    assert set(last) == set(batch)
    for uid, r in last.items():
        b = batch[uid]
        assert r.n_events == b.n_events, uid
        assert r.value_sum_micro == b.value_sum_micro, uid
        assert r.last_seen == b.last_seen, uid


def test_tws_profiles_match_batch_and_legacy_api(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): replayed
    over the full input it must agree with the batch truth — and with
    the applyInPandasWithState operator, pinning the two stateful APIs
    to identical semantics."""
    import pytest

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.streaming.stateful import (
        tws_available,
        user_profiles_tws,
    )

    if not tws_available():
        pytest.skip("transformWithStateInPandas needs protobuf (absent here)")

    src = str(tmp_path / "tws_src")
    read_events(spark, SF_SMALL).filter(F.col("user_id") < 40).repartition(
        2
    ).write.parquet(src)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = (
        user_profiles_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    updates = spark.sql("select * from tws_out").collect()
    last = {}
    for r in updates:
        # Update mode re-emits per micro-batch; keep the max-count row
        cur = last.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            last[r["user_id"]] = (r["n_events"], r["value_sum_micro"])

    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want_n = {r["user_id"]: r["n"] for r in batch}
    assert {u: v[0] for u, v in last.items()} == want_n
    # micro-unit sums: recompute with the same per-value rounding
    pdf = spark.read.parquet(src).select("user_id", "value").toPandas()
    want_sum = (
        (pdf["value"] * 1_000_000).round().astype("int64")
        .groupby(pdf["user_id"]).sum()
    )
    for u, (_, vsum) in last.items():
        assert vsum == int(want_sum[u])
