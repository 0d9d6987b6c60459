"""Structured Streaming over event streams (SURVEY §2.2 — absent in the
reference, mandated extension).

Transformations are defined once and applied to BOTH batch and streaming
DataFrames (Spark's unified model): the batch forms back the
``queries()``/oracle checks, the streaming forms run under
``readStream`` with watermarks for late data.  Tests execute the stream
with ``trigger(availableNow=True)`` against the driver's events parquet
and assert stream == batch.

Scale notes: windowed aggregations shuffle on (window, key) — bounded
state via watermark eviction; sessionization uses ``session_window``
(native state store) — per-key state, watermark-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources.readers import (
    read_events,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# -- shared transformations (batch == streaming) ----------------------------

def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts+sums per event_type."""
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window counts (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "cnt")
    )


def streaming_tumbling_counts(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: watermark bounds state + drops data later than
    ``watermark`` past the max seen event time."""
    return tumbling_counts(events_stream.withWatermark("ts", watermark), width)


def ohlc_tumbling(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """OHLC candlestick bars as a unified batch/stream transformation:
    open/close via min_by/max_by under the (ts, event_id) total order —
    plain aggregates, so the SAME expression runs under readStream with
    a watermark (unlike the window-rank formulation in
    operators/market.py, which streaming can't run).  Incremental state
    per (window, series) is five scalars — O(1) per bar."""
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            F.count("*").alias("volume"),
        )
        .select(
            F.col("win.start").alias("bar_start"),
            F.col("event_type").alias("series"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def streaming_ohlc(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form of the OHLC bars; watermark closes bars once event
    time passes the bar end + watermark, bounding state store size."""
    return ohlc_tumbling(events_stream.withWatermark("ts", watermark), width)


def session_windows_stateful(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows per user (gap-merged, state-store backed)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def attribute_clicks(
    clicks: DataFrame,
    views: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join (ad-attribution shape): each click joins
    every view by the same user in the preceding ``max_delay``.  The
    SAME code runs batch and streaming (unified model); on streaming
    inputs both sides get watermarks, and the time-range predicate is
    what lets Spark bound the join state — views older than
    watermark+max_delay are evicted, so state stays proportional to the
    recent window, not the stream history.  Without the range condition
    a stream-stream inner join must buffer both streams forever."""
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", watermark)
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (c.user_id == v.view_user)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= v.view_ts + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(v, cond).select("click_id", "view_id", "user_id", "click_ts", "view_ts")


def attribute_clicks_outer(
    clicks: DataFrame,
    views: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT-OUTER twin of :func:`attribute_clicks` — the attribution
    report that also shows the UNattributed clicks (view_id NULL), the
    number every campaign dashboard leads with.  On streaming inputs
    this exercises Structured Streaming's hardest join semantics: an
    unmatched click can only emit its NULL row once the watermark has
    passed its join window (before that, a matching view could still
    arrive), so outer results trail the inner ones by watermark +
    max_delay, and clicks younger than that at stream end stay pending
    — exactly the state-eviction contract the batch form doesn't have.
    The test pins streaming == batch on the CLOSABLE region (clicks
    older than max-event-time − watermark − max_delay)."""
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", watermark)
    if views.isStreaming:
        views = views.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (c.user_id == v.view_user)
        & (c.click_ts >= v.view_ts)
        & (c.click_ts <= v.view_ts + F.expr(f"INTERVAL {max_delay}"))
    )
    return c.join(v, cond, "left_outer").select(
        "click_id", "view_id", "user_id", "click_ts", "view_ts"
    )


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch form of at-least-once ingestion dedup: collapse events that
    share (user_id, event_type, minute) to the earliest occurrence —
    the deterministic-batch analogue of
    ``dropDuplicatesWithinWatermark`` on a composite key (the streaming
    half is ``dedup_events_stream``; state there is watermark-bounded,
    here the window partition IS the bound).  One shuffle on the
    composite key."""
    from pyspark.sql import Window as W

    w = W.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", F.col("ts"))
    ).orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible batch form of the ingestion-dedup operator."""
    return dedup_events_batch(read_events(spark, sf_dir)).select(
        "event_id", "user_id", "event_type", "ts"
    )


def dedup_events_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup on event_id: watermark bounds the
    dedup state (ids older than the watermark are evicted) — the
    streaming half of the dedup story for continuously ingested
    training data."""
    return events_stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_events_stream_within(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` twin of ``dedup_events_stream``:
    collapses records sharing an event_id even when their TIMESTAMPS
    DIFFER (the re-logged/retried duplicate whose second copy carries a
    fresh ts — plain dropDuplicates keyed on event_id alone handles it
    only while its unbounded state happens to remember the id; the
    Within variant GUARANTEES dedup for copies arriving within the
    watermark of each other AND evicts state by event-time, the
    bounded-state contract a forever-running ingest needs).  First
    occurrence wins; state per key lives one watermark interval."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def read_events_stream(spark: SparkSession, path_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream over an events parquet directory (each file =
    one micro-batch with maxFilesPerTrigger)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_dir)
    )


# -- batch/oracle-checkable forms over the events table ---------------------

def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(read_events(spark, sf_dir), "1 hour")


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(read_events(spark, sf_dir), "1 hour", "30 minutes")


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream attribution join (oracle = plain
    range join in SQL); the streaming execution of the identical
    transformation is pinned in tests/test_streaming.py."""
    events = read_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    return attribute_clicks(clicks, views, "30 minutes").select(
        "click_id", "view_id", "user_id"
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) as window algebra — the batch
    equivalent of session_window, exactly replicable in ANSI SQL:
    new-session flag via lag, session id via running sum."""
    events = read_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_sess",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))) > 1800, 1
        ).otherwise(F.when(F.lag("ts", 1).over(w).isNull(), 1).otherwise(0)),
    )
    with_sid = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
