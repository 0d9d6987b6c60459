"""Structured Streaming: the streaming forms must agree with their batch
equivalents when the whole input is replayed (availableNow trigger)."""

from __future__ import annotations

import shutil

from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_events,
)
from project_market_pulse_etl_pipeline_with_llm_integration_spark.streaming import events as SE
from tests.conftest import SF_SMALL


def _events_dir(spark, tmp_path) -> str:
    """Stage the events table as a micro-precision parquet dir (the
    nanos->micros normalization happens once at staging, mirroring a
    real ingest layer feeding the stream)."""
    out = str(tmp_path / "events_stream_src")
    read_events(spark, SF_SMALL).repartition(4).write.parquet(out)
    return out


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    stream = SE.read_events_stream(spark, src, max_files=2)
    q = (
        SE.streaming_tumbling_counts(stream, "1 hour", watermark="100 days")
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.cnt, r.sum_value)
        for r in spark.sql("select * from tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, r.sum_value)
        for r in SE.tumbling_counts(spark.read.parquet(src), "1 hour").collect()
    }
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_session_window_runs(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    stream = SE.read_events_stream(spark, src, max_files=4)
    q = (
        SE.session_windows_stateful(stream, gap="30 minutes", watermark="100 days")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sessions_out").collect()
    assert rows
    # session invariants: start <= end, positive event counts
    assert all(r.session_start <= r.session_end and r.n_events > 0 for r in rows)
    # total events across sessions == input rows
    assert sum(r.n_events for r in rows) == spark.read.parquet(src).count()
