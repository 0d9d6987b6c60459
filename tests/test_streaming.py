"""Structured Streaming: the streaming forms must agree with their batch
equivalents when the whole input is replayed (availableNow trigger)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

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


def test_streaming_dedup_drops_replayed_events(spark, tmp_path):
    """Replay the same events twice (two file copies) -> streaming dedup
    on event_id keeps exactly one of each."""
    src = str(tmp_path / "dup_src")
    ev = read_events(spark, SF_SMALL).filter("user_id < 40").coalesce(1)
    ev.write.parquet(src)
    ev.write.mode("append").parquet(src)  # exact duplicates, second file
    stream = SE.read_events_stream(spark, src, max_files=1)
    q = (
        SE.dedup_events_stream(stream, watermark="365 days")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) c, count(distinct event_id) d from dedup_out").first()
    want = ev.count()
    assert (got.c, got.d) == (want, want)
    shutil.rmtree(src, ignore_errors=True)


def test_foreachbatch_sink_writes_all_batches(spark, tmp_path):
    """foreachBatch custom sink: per-micro-batch parquet appends land
    every input row exactly once."""
    src = str(tmp_path / "fb_src")
    out = str(tmp_path / "fb_out")
    read_events(spark, SF_SMALL).repartition(3).write.parquet(src)

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = stream.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == spark.read.parquet(src).count()
    assert back.select("batch_id").distinct().count() >= 2  # really micro-batched
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


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """The watermarked stream-stream attribution join must produce the
    same pairs as its batch form when the whole input is replayed."""
    src = _events_dir(spark, tmp_path)
    batch = spark.read.parquet(src)
    want = {
        (r.click_id, r.view_id)
        for r in SE.attribute_clicks(
            batch.filter("event_type = 'click'"),
            batch.filter("event_type = 'view'"),
            "30 minutes",
        ).collect()
    }
    clicks = SE.read_events_stream(spark, src, max_files=2).filter("event_type = 'click'")
    views = SE.read_events_stream(spark, src, max_files=2).filter("event_type = 'view'")
    q = (
        SE.attribute_clicks(clicks, views, "30 minutes", watermark="100 days")
        .writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.view_id) for r in spark.sql("select * from attrib_out").collect()
    }
    assert got == want and want
    shutil.rmtree(src, ignore_errors=True)


def test_stream_static_join_enriches_every_event(spark, tmp_path):
    """Stream-static join: a streaming fact joined to a static dimension
    needs no watermark (the static side is re-read per micro-batch) and
    must enrich every event exactly once."""
    src = _events_dir(spark, tmp_path)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "impression"), ("purchase", "conversion")],
        "event_type string, event_class string",
    )
    stream = SE.read_events_stream(spark, src, max_files=2)
    q = (
        stream.join(dim, "event_type", "left")
        .select("event_id", "event_type", "event_class")
        .writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, count(event_class) classified from enriched_out"
    ).first()
    batch = spark.read.parquet(src)
    want_n = batch.count()
    want_classified = batch.filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).count()
    assert (got.n, got.classified) == (want_n, want_classified)
    shutil.rmtree(src, ignore_errors=True)


def test_watermark_drops_too_late_events(spark, tmp_path):
    """Event-time correctness: in append mode an event arriving in a
    later micro-batch with event time older than (max seen - watermark)
    must be excluded from its window's final result."""
    from datetime import datetime

    src = str(tmp_path / "late_src")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def _mk(rows):
        return spark.createDataFrame(rows, schema).coalesce(1)

    # batch 1: window 10:00 has one event; max event time advances to
    # 14:00.  The watermark derived from it (13:00 for a 1-hour delay)
    # only takes effect for FILTERING one batch later, so batch 2 is an
    # innocuous spacer; the late event arrives in batch 3, well after
    # the watermark passed 11:00.  Writes are separated by more than the
    # FS timestamp granularity because the file source orders
    # micro-batches by modification time.
    import time as _time

    _mk(
        [
            (1, datetime(2024, 1, 1, 10, 5), 1, "click", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 14, 0), 1, "click", 1.0, "{}"),
        ]
    ).write.parquet(src)
    _time.sleep(1.5)
    _mk([(4, datetime(2024, 1, 1, 14, 30), 1, "click", 1.0, "{}")]).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.5)
    _mk([(3, datetime(2024, 1, 1, 10, 10), 1, "click", 1.0, "{}")]).write.mode(
        "append"
    ).parquet(src)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = (
        SE.streaming_tumbling_counts(stream, "1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = {
        r.window_start: r.cnt
        for r in spark.sql("select * from late_out").collect()
    }
    # the 10:00 window closed with ONLY the on-time event; whether the
    # 14:00 window has emitted yet depends on the final watermark, so we
    # assert just the closed window
    assert counts.get(datetime(2024, 1, 1, 10, 0)) == 1


def test_streaming_incremental_agg_merge_equals_batch(spark, tmp_path):
    """Incremental rollup maintenance, streaming form: each micro-batch
    is aggregated and MERGED into a stored state table via
    merge_agg_states inside foreachBatch — after replaying the whole
    input, the state must equal the one-shot batch aggregate (the
    streaming twin of the incremental_agg oracle law)."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "inc_src")
    state_dir = str(tmp_path / "inc_state")
    read_events(spark, SF_SMALL).repartition(4).write.parquet(src)

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("val_state"),
        )

    def merge_batch(batch_df, batch_id):
        fresh = agg(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["event_type"])
        else:
            merged = fresh
        # overwrite via tmp to avoid reading & writing the same path
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination(180)

    got = {
        r.event_type: (r.cnt, float(r.val_state))
        for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        r.event_type: (r.cnt, float(r.val_state))
        for r in agg(spark.read.parquet(src)).collect()
    }
    assert got == want and len(want) > 1
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_checkpoint_recovery_no_double_count(spark, tmp_path):
    """Stop/restart with the same checkpoint: the restarted query must
    resume from recorded source offsets and restored aggregation state
    — the first half of the input is neither lost nor double-counted,
    and the final complete-mode aggregate equals the one-shot batch
    aggregate over everything."""
    src = str(tmp_path / "ck_src")
    ck = str(tmp_path / "ck_chk")
    out = str(tmp_path / "ck_out")
    ev = read_events(spark, SF_SMALL)
    first = ev.filter("user_id % 2 = 0").coalesce(1)
    second = ev.filter("user_id % 2 = 1").coalesce(1)
    first.write.parquet(src)

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("val"),
        )

    def sink(batch_df, batch_id):
        batch_df.coalesce(1).write.mode("overwrite").parquet(out)

    def run_once():
        q = (
            agg(SE.read_events_stream(spark, src, max_files=1))
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()                                   # first half only
    mid = {r.event_type: r.cnt for r in spark.read.parquet(out).collect()}
    second.write.mode("append").parquet(src)     # new data arrives
    run_once()                                   # restart, same checkpoint

    got = {
        r.event_type: (r.cnt, float(r.val))
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.event_type: (r.cnt, float(r.val)) for r in agg(ev).collect()
    }
    assert got == want
    # and the first run really was partial (state continuation, not a
    # full reprocess of the directory)
    assert any(mid[k] < got[k][0] for k in mid)


def test_streaming_ohlc_equals_batch_and_market_op(spark, tmp_path):
    """The streaming OHLC replayed over the full input must equal (a)
    its own batch form and (b) the window-rank formulation in
    operators/market.py — two independent code paths, one contract."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import market

    src = _events_dir(spark, tmp_path)
    stream = SE.read_events_stream(spark, src, max_files=2)
    q = (
        SE.streaming_ohlc(stream, "1 hour", watermark="100 days")
        .writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.bar_start, r.series): (r.open, r.high, r.low, r.close, r.volume)
        for r in spark.sql("select * from ohlc_out").collect()
    }
    batch = {
        (r.bar_start, r.series): (r.open, r.high, r.low, r.close, r.volume)
        for r in SE.ohlc_tumbling(spark.read.parquet(src), "1 hour").collect()
    }
    assert got == batch
    via_market = {
        (r.bar_hour, r.series): (r.open, r.high, r.low, r.close, r.volume)
        for r in market.ohlc_bars(spark.read.parquet(src)).collect()
    }
    assert got == via_market
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_through_python_datasource_sink(spark, tmp_path):
    """The Spark 4 Python DataSource WRITER under Structured Streaming:
    per-micro-batch aggregates flow through foreachBatch into the
    custom two-phase-commit jsonl sink, each batch into its own
    manifested directory — the full custom-source->stream->custom-sink
    loop with no built-in format anywhere on the write path."""
    import json
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.sources import pyds

    pyds.register_sink(spark)
    src = str(tmp_path / "pysink_src")
    out = str(tmp_path / "pysink_out")
    read_events(spark, SF_SMALL).repartition(3).write.parquet(src)

    def write_batch(batch_df, batch_id):
        agg = batch_df.groupBy("event_type").count()
        agg.write.format("jsonl_sink").option(
            "path", f"{out}/batch-{batch_id}"
        ).mode("append").save()

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = stream.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination(120)

    batches = sorted(d for d in os.listdir(out) if d.startswith("batch-"))
    assert len(batches) >= 2  # really micro-batched
    total = 0
    for b in batches:
        bdir = os.path.join(out, b)
        assert os.path.exists(os.path.join(bdir, "_MANIFEST.json"))
        for fn in os.listdir(bdir):
            if fn.startswith("part-"):
                with open(os.path.join(bdir, fn)) as fh:
                    total += sum(json.loads(line)["count"] for line in fh)
    assert total == spark.read.parquet(src).count()
    shutil.rmtree(src, ignore_errors=True)



def _replay_state_merge(spark, tmp_path, state_fn, name):
    """Shared incremental-state harness: stream the SF_SMALL event log
    one file per micro-batch, fold each batch's ``state_fn`` partial
    into a parquet state table via merge_agg_states (two-phase .next
    write so the overwrite never reads itself), return the final state
    DataFrame for a readout-from-state-alone comparison."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = _events_dir(spark, tmp_path)
    state_dir = str(tmp_path / name)

    def merge_batch(batch_df, batch_id):
        fresh = state_fn(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["user_id", "arm"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    assert q.awaitTermination(180)
    return spark.read.parquet(state_dir)


def test_streaming_ab_readout_equals_batch(spark, tmp_path):
    """Streaming-native A/B readout (verdict r8 #7): the per-(user, arm)
    spend state is maintained incrementally — each micro-batch's
    ab_user_state partial merges into a stored state table via
    merge_agg_states inside foreachBatch — and after replaying the whole
    event log, the FULL ab_uplift_ci verdict (point uplift, Poisson
    bootstrap band, significance) computed from state alone must equal
    the one-shot batch query row-for-row.  This works because the state
    is a sum-monoid and every downstream quantity (md5 arms, Poisson
    replicate weights, rank-selected band) is a deterministic function
    of the state — the experiment dashboard never rescans history."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        ab_uplift_readout,
        ab_user_state,
        q_ab_uplift_ci,
    )

    state = _replay_state_merge(spark, tmp_path, ab_user_state, "ab_state")
    got = ab_uplift_readout(state).collect()
    want = q_ab_uplift_ci(spark, SF_SMALL).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()


def test_streaming_srm_guardrail_equals_batch(spark, tmp_path):
    """The SRM guardrail maintained incrementally: each micro-batch's
    (user, arm, n_ev) count-monoid partial merges into a state table
    via merge_agg_states, and srm_readout from state alone equals the
    one-shot q_srm_check row — the experiment dashboard's first check
    never rescans history either."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_srm_check,
        srm_readout,
        srm_state,
    )

    state = _replay_state_merge(spark, tmp_path, srm_state, "srm_state")
    got = srm_readout(state).collect()
    want = q_srm_check(spark, SF_SMALL).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()


def _recovery_state_merge(spark, tmp_path, state_fn, name):
    """Two-phase stop/restart harness for the incremental state tables
    (verdict r9 #6): stream HALF the event log into the state table
    with a checkpoint, stop; append the other half; restart with the
    SAME checkpoint.  The restarted query must resume from recorded
    source offsets — the first half neither lost nor re-merged (a
    replayed micro-batch would double-count the sum-monoid state).
    Returns (events merged in phase 1, final state DataFrame)."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    ev = read_events(spark, SF_SMALL)
    src = str(tmp_path / (name + "_src"))
    ck = str(tmp_path / (name + "_ck"))
    state_dir = str(tmp_path / name)
    ev.filter("user_id % 2 = 0").coalesce(1).write.parquet(src)

    def merge_batch(batch_df, batch_id):
        fresh = state_fn(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["user_id", "arm"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    def run_once():
        q = (
            SE.read_events_stream(spark, src, max_files=1)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    mid_rows = spark.read.parquet(state_dir).count()
    ev.filter("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    run_once()
    return mid_rows, spark.read.parquet(state_dir)


def test_ab_state_checkpoint_recovery(spark, tmp_path):
    """Stop/restart recovery for the A/B spend state: after the
    restarted stream absorbs the second half, the FULL uplift verdict
    from state alone equals the one-shot batch query — and phase 1
    really was partial (offset resume, not a directory reprocess)."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        ab_uplift_readout,
        ab_user_state,
        q_ab_uplift_ci,
    )

    mid_n, state = _recovery_state_merge(spark, tmp_path, ab_user_state, "ab_rec")
    got = ab_uplift_readout(state).collect()
    want = q_ab_uplift_ci(spark, SF_SMALL).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    assert mid_n < state.count()


def test_srm_state_checkpoint_recovery(spark, tmp_path):
    """Stop/restart recovery for the SRM guardrail state: the restarted
    stream's merged (user, arm, n_ev) table yields the exact batch
    verdict — no event lost at the stop boundary, none double-counted
    on resume."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_srm_check,
        srm_readout,
        srm_state,
    )

    mid_n, state = _recovery_state_merge(spark, tmp_path, srm_state, "srm_rec")
    got = srm_readout(state).collect()
    want = q_srm_check(spark, SF_SMALL).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()
    assert mid_n < state.count()


def test_streaming_dedup_within_watermark_collapses_relogged(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a retried event re-logged 30 s
    later with the SAME event_id but a DIFFERENT ts still collapses to
    one record (the case an event_id-only dropDuplicates handles only
    by luck of state retention), and distinct ids all survive."""
    from datetime import timedelta

    src = str(tmp_path / "ddw_src")
    ev = read_events(spark, SF_SMALL).filter("user_id < 40").coalesce(1)
    ev.write.parquet(src)
    # second copy: same event_ids, ts shifted +30 s (a re-log, not a replay)
    ev.withColumn(
        "ts", (F.col("ts") + F.expr("INTERVAL 30 SECONDS"))
    ).coalesce(1).write.mode("append").parquet(src)

    stream = SE.read_events_stream(spark, src, max_files=1)
    q = (
        SE.dedup_events_stream_within(stream, watermark="365 days")
        .writeStream.format("memory")
        .queryName("ddw_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) c, count(distinct event_id) d from ddw_out"
    ).first()
    want = ev.count()
    assert (got.c, got.d) == (want, want)


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Watermarked LEFT-OUTER stream-stream join: matched pairs equal
    the batch join, and unmatched clicks emit exactly one NULL
    attribution row once the watermark passes their join window.
    Structured Streaming does NOT flush pending outer results at query
    end (they wait for the watermark), so the test appends a far-future
    sentinel event and restarts from the same checkpoint — the
    watermark jump deterministically closes every real click's window."""
    import os
    from datetime import timedelta

    src = str(tmp_path / "lo_src")
    out = str(tmp_path / "lo_out")
    ck = str(tmp_path / "lo_ck")
    read_events(spark, SF_SMALL).repartition(2).write.parquet(src)
    batch = spark.read.parquet(src)
    clicks_b = batch.filter("event_type = 'click'")
    views_b = batch.filter("event_type = 'view'")
    want_all = {
        (r.click_id, r.view_id)
        for r in SE.attribute_clicks_outer(clicks_b, views_b, "30 minutes").collect()
    }
    assert any(v is None for _, v in want_all)  # corpus has unmatched clicks
    max_ts = batch.agg(F.max("ts")).first()[0]

    def run_once():
        clicks = SE.read_events_stream(spark, src, max_files=2).filter(
            "event_type = 'click'"
        )
        views = SE.read_events_stream(spark, src, max_files=2).filter(
            "event_type = 'view'"
        )
        def sink(bdf, bid):
            if bdf.count():
                bdf.write.mode("append").parquet(out)
        q = (
            SE.attribute_clicks_outer(clicks, views, "30 minutes", watermark="1 hour")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    # sentinel: one far-future click+view pair advances BOTH streams'
    # watermarks far past every real event's join window
    far = max_ts + timedelta(days=30)
    spark.createDataFrame(
        [(90000001, far, 999999991, "click", 0.0, "{}"),
         (90000002, far, 999999992, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    assert os.path.exists(out)
    got = {
        (r.click_id, r.view_id)
        for r in spark.read.parquet(out).collect()
        if r.click_id < 90000000  # sentinel rows excluded
    }
    want_matched = {(c, v) for c, v in want_all if v is not None}
    assert {(c, v) for c, v in got if v is not None} == want_matched
    # after the watermark jump, EVERY batch-unmatched click has emitted
    # its NULL row exactly once
    assert {c for c, v in got if v is None} == {
        c for c, v in want_all if v is None
    }


def _tenure_replay(spark, tmp_path, name, split_recover=False):
    """Replay harness for the per-user (first_day, last_day) MIN/MAX
    monoid (VERDICT r10 item 6): fold each micro-batch's tenure_state
    partial into a parquet state table via merge_tenure_states (the
    min/max sibling of the sum-monoid harness above).  With
    split_recover, phase 1 streams half the log with a checkpoint,
    stops, appends the rest, and restarts from the SAME checkpoint —
    offset resume, no loss, no re-merge (min/max happens to be
    idempotent, so the sharper loss-side check is that phase 1 was
    really partial)."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        merge_tenure_states,
        tenure_state,
    )

    src = str(tmp_path / (name + "_src"))
    ck = str(tmp_path / (name + "_ck"))
    state_dir = str(tmp_path / name)
    ev = read_events(spark, SF_SMALL)
    if split_recover:
        ev.filter("user_id % 2 = 0").coalesce(1).write.parquet(src)
    else:
        ev.repartition(4).write.parquet(src)

    def merge_batch(batch_df, batch_id):
        fresh = tenure_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_tenure_states(prev, fresh)
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    def run_once():
        q = (
            SE.read_events_stream(spark, src, max_files=1)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    mid_rows = spark.read.parquet(state_dir).count()
    if split_recover:
        ev.filter("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        run_once()
    return mid_rows, spark.read.parquet(state_dir)


def test_streaming_tenure_readouts_equal_batch(spark, tmp_path):
    """Streaming twin for the survival family (VERDICT r10 item 6 —
    tenure_hazard is the one of the three named candidates whose state
    is a finite monoid; see tenure_state's docstring for why the
    windowed funnel and the gap histogram are not): after replaying
    the whole event log through the incremental min/max state, BOTH
    the 13-row hazard table and the KM survival curve computed from
    state alone equal the one-shot batch queries row-for-row."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        km_survival_from_state,
        q_km_survival,
        q_tenure_hazard,
        tenure_hazard_from_state,
    )

    _, state = _tenure_replay(spark, tmp_path, "tenure_state")
    got_h = sorted(r.asDict().items() for r in
                   tenure_hazard_from_state(state).collect())
    want_h = sorted(r.asDict().items() for r in
                    q_tenure_hazard(spark, SF_SMALL).collect())
    assert got_h == want_h and len(got_h) == 13
    got_s = sorted(r.asDict().items() for r in
                   km_survival_from_state(state).collect())
    want_s = sorted(r.asDict().items() for r in
                    q_km_survival(spark, SF_SMALL).collect())
    assert got_s == want_s and len(got_s) == 13


def test_tenure_state_checkpoint_recovery(spark, tmp_path):
    """Stop/restart recovery for the tenure state: the restarted
    stream resumes from recorded offsets (phase 1 really partial), and
    the final hazard readout equals the batch query — no user's
    first/last day lost at the stop boundary."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_tenure_hazard,
        tenure_hazard_from_state,
    )

    mid_n, state = _tenure_replay(spark, tmp_path, "tenure_rec",
                                  split_recover=True)
    got = sorted(r.asDict().items() for r in
                 tenure_hazard_from_state(state).collect())
    want = sorted(r.asDict().items() for r in
                  q_tenure_hazard(spark, SF_SMALL).collect())
    assert got == want
    assert mid_n < state.count()


def test_streaming_weekday_hour_heatmap_equals_batch(spark, tmp_path):
    """The 7x24 heatmap is maintainable from the <=168-key COUNT
    sum-monoid: replaying the log through merge_agg_states keyed by
    (dow, hour) and reading the heatmap from state alone equals the
    one-shot batch query row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_weekday_hour_heatmap,
        weekday_hour_from_state,
        weekday_hour_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = _events_dir(spark, tmp_path)
    state_dir = str(tmp_path / "wh_state")

    def merge_batch(batch_df, batch_id):
        fresh = weekday_hour_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["dow", "hour"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        SE.read_events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state = spark.read.parquet(state_dir)
    # tuple-ize before sorting: dict_items compare as SETS (subset
    # partial order), so sorting them directly does not canonicalize
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 weekday_hour_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_weekday_hour_heatmap(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_cohort_ltv_equals_batch(spark, tmp_path):
    """The cohort LTV curve is maintainable from the (customer, month)
    cents SUM-monoid — the cohort assignment itself derives from state
    (min month per customer), so ONE state table suffices: replaying
    the order log through merge_agg_states keyed by (o_custkey, om)
    and reading the curve from state alone equals the one-shot batch
    query row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        cohort_ltv_from_state,
        cohort_ltv_state,
        q_cohort_ltv,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "orders_stream_src")
    spark.read.parquet(SF_SMALL + "/orders.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    state_dir = str(tmp_path / "ltv_state")

    def merge_batch(batch_df, batch_id):
        fresh = cohort_ltv_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["o_custkey", "om"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 cohort_ltv_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_cohort_ltv(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_slo_burn_equals_batch(spark, tmp_path):
    """The SLO burn readout is maintainable from the per-hour
    (events, errors) SUM-monoid: replaying the log through
    merge_agg_states keyed by hour_id and reading the burn table from
    state alone equals the one-shot batch query row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_slo_burn,
        slo_burn_from_state,
        slo_burn_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = _events_dir(spark, tmp_path)
    state_dir = str(tmp_path / "slo_state")

    def merge_batch(batch_df, batch_id):
        fresh = slo_burn_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["hour_id"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        SE.read_events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 slo_burn_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_slo_burn(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_order_size_histogram_equals_batch(spark, tmp_path):
    """The order-shape histogram is maintainable from the per-order
    line-count SUM-monoid — order lines arriving across micro-batches
    accumulate per orderkey: replaying the lineitem table through
    merge_agg_states and reading the histogram from state alone
    equals the one-shot batch query row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        order_size_from_state,
        order_size_state,
        q_order_size_histogram,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "lineitem_stream_src")
    # repartition WITHOUT keying: the same order's lines land in
    # different micro-batch files, exercising the cross-batch merge
    spark.read.parquet(SF_SMALL + "/lineitem.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    state_dir = str(tmp_path / "os_state")

    def merge_batch(batch_df, batch_id):
        fresh = order_size_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["l_orderkey"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 order_size_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_order_size_histogram(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_nation_modularity_equals_batch(spark, tmp_path):
    """A GRAPH readout maintained from streaming state: each lineitem
    micro-batch dim-joins its lines (stream-static joins inside
    foreachBatch) down to a partial (cn, sn) matrix and folds it into
    the <=625-row SUM-monoid; the full modularity table recomputed
    from state alone equals the one-shot batch query row-for-row."""
    import os

    from pyspark.sql import functions as F2

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.graph import (
        nation_modularity_from_matrix,
        q_nation_modularity,
        trade_matrix_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "li_stream_src")
    spark.read.parquet(SF_SMALL + "/lineitem.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    state_dir = str(tmp_path / "tm_state")
    ords = spark.read.parquet(SF_SMALL + "/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(SF_SMALL + "/customer.parquet").select(
        "c_custkey", F2.col("c_nationkey").cast("long").alias("cn")
    )
    supp = spark.read.parquet(SF_SMALL + "/supplier.parquet").select(
        "s_suppkey", F2.col("s_nationkey").cast("long").alias("sn")
    )

    def merge_batch(batch_df, batch_id):
        fresh = trade_matrix_state(
            batch_df.select("l_orderkey", "l_suppkey"), ords, cust, supp
        )
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["cn", "sn"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    nat = spark.read.parquet(SF_SMALL + "/nation.parquet").select(
        F2.col("n_nationkey").cast("long").alias("natkey"),
        F2.col("n_name").alias("nation"),
    )
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 nation_modularity_from_matrix(state, nat).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_nation_modularity(spark, SF_SMALL).collect())
    assert got == want and got


def _conversion_replay(spark, tmp_path, name, split_recover=False):
    """Replay harness for the per-user (first_view, first_purchase)
    MIN-monoid (streaming twin #8, VERDICT r11 item 4): fold each
    micro-batch's conversion_state partial into a parquet state table
    via merge_conversion_states.  The default split (repartition(4),
    one file per trigger) scatters a user's events across micro-batches
    — views and purchases arrive in arbitrary interleavings, the merge
    must commute.  With split_recover, phase 1 streams half the log
    with a checkpoint, stops, appends the rest, and restarts from the
    SAME checkpoint (offset resume, no loss; the loss-side check is
    that phase 1 was really partial)."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        conversion_state,
        merge_conversion_states,
    )

    src = str(tmp_path / (name + "_src"))
    ck = str(tmp_path / (name + "_ck"))
    state_dir = str(tmp_path / name)
    ev = read_events(spark, SF_SMALL)
    if split_recover:
        ev.filter("user_id % 2 = 0").coalesce(1).write.parquet(src)
    else:
        ev.repartition(4).write.parquet(src)

    def merge_batch(batch_df, batch_id):
        fresh = conversion_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_conversion_states(prev, fresh)
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    def run_once():
        q = (
            SE.read_events_stream(spark, src, max_files=1)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run_once()
    mid_rows = spark.read.parquet(state_dir).count()
    if split_recover:
        ev.filter("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        run_once()
    return mid_rows, spark.read.parquet(state_dir)


def test_streaming_first_touch_conversion_equals_batch(spark, tmp_path):
    """Streaming twin #8 (VERDICT r11 item 4): after replaying the
    whole event log through the incremental (first_view,
    first_purchase) min-state, the first-touch conversion histogram
    computed from state alone equals the one-shot batch query
    row-for-row."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        first_touch_conversion_from_state,
        q_first_touch_conversion,
    )

    _, state = _conversion_replay(spark, tmp_path, "conv_state")
    got = sorted(r.asDict().items() for r in
                 first_touch_conversion_from_state(state).collect())
    want = sorted(r.asDict().items() for r in
                  q_first_touch_conversion(spark, SF_SMALL).collect())
    assert got == want and got


def test_conversion_state_checkpoint_recovery(spark, tmp_path):
    """Stop/restart recovery for the conversion state: the restarted
    stream resumes from recorded offsets (phase 1 really partial), and
    the final first-touch readout equals the batch query — no user's
    first view or first purchase lost at the stop boundary."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        first_touch_conversion_from_state,
        q_first_touch_conversion,
    )

    mid_n, state = _conversion_replay(spark, tmp_path, "conv_rec",
                                      split_recover=True)
    got = sorted(r.asDict().items() for r in
                 first_touch_conversion_from_state(state).collect())
    want = sorted(r.asDict().items() for r in
                  q_first_touch_conversion(spark, SF_SMALL).collect())
    assert got == want
    assert mid_n < state.count()


def test_time_to_conversion_exact_semantics_are_non_monoid(spark):
    """The adjudication pin for why twin #8 reads out FIRST-TOUCH
    semantics and not q_time_to_conversion's exact strictly-after-t1
    semantics (conversion_state's docstring): on the counterexample
    user {purchase@2s, view@5s, purchase@10s}, the exact batch answer
    is a 5-second lag (t2 = min purchase AFTER the first view = 10),
    while the (first_view, first_purchase) min-state — the ONLY finite
    per-user state a merge can maintain — holds (5, 2) and necessarily
    reads out 'no view-led conversion'.  Both readings are asserted so
    the divergence (and the reason the exact twin does not exist) is
    pinned, not just narrated."""
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        conversion_state,
        first_touch_conversion_from_state,
    )

    ev = spark.createDataFrame(
        [
            (7, "purchase", "1970-01-01 00:00:02"),
            (7, "view", "1970-01-01 00:00:05"),
            (7, "purchase", "1970-01-01 00:00:10"),
        ],
        "user_id long, event_type string, ts_s string",
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))

    # exact batch semantics (q_time_to_conversion's definition inline)
    t1 = (ev.filter("event_type = 'view'")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    exact = (
        ev.filter("event_type = 'purchase'")
        .select("user_id", F.col("ts").alias("pts"))
        .join(t1, "user_id")
        .filter(F.col("pts") > F.col("t1"))
        .groupBy("user_id", "t1").agg(F.min("pts").alias("t2"))
        .select(F.expr("(unix_micros(t2) - unix_micros(t1)) div 1000000")
                .alias("lag_s"))
        .collect()
    )
    assert [r.lag_s for r in exact] == [5]

    # the min-state view of the same user excludes it: first purchase
    # (t=2) precedes first view (t=5)
    st = conversion_state(ev).collect()
    assert len(st) == 1 and st[0].first_purchase < st[0].first_view
    assert first_touch_conversion_from_state(conversion_state(ev)).count() == 0


def test_streaming_revenue_concentration_equals_batch(spark, tmp_path):
    """Streaming twin #9: the Pareto revenue ladder reads out of the
    per-customer spend SUM-monoid — orders replayed file-by-file, each
    micro-batch's revenue_state partial folded via merge_agg_states
    keyed by o_custkey (a customer's orders deliberately scattered
    across micro-batches by the repartition); the ladder computed from
    state alone equals the one-shot batch query row-for-row."""
    import os

    from pyspark.sql import functions as F2  # noqa: F401

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        q_revenue_concentration,
        revenue_concentration_from_state,
        revenue_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "orders_stream_src")
    spark.read.parquet(SF_SMALL + "/orders.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    state_dir = str(tmp_path / "rev_state")

    def merge_batch(batch_df, batch_id):
        fresh = revenue_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["o_custkey"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 revenue_concentration_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_revenue_concentration(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_degree_distribution_equals_batch(spark, tmp_path):
    """Streaming twin #10: the trade-graph degree histogram reads out
    of the distinct (cust, supp) relationship SET — set union is an
    idempotent commutative monoid, so each lineitem micro-batch
    stream-static joins its orders slice and union+distincts into the
    stored set.  One batch file is delivered TWICE (copied into the
    source dir) to exercise the idempotence: re-delivered lines must
    not change the set.  Histogram from state == one-shot batch query
    row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.graph import (
        degree_distribution_from_rel,
        q_degree_distribution,
        trade_rel,
    )

    src = str(tmp_path / "li_rel_src")
    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet")
    li.repartition(3).write.parquet(src)
    # duplicate one part file -> one micro-batch replays its lines
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    import shutil as _sh
    _sh.copy(os.path.join(src, part), os.path.join(src, "dup-" + part))
    schema = spark.read.parquet(src).schema
    ords = spark.read.parquet(SF_SMALL + "/orders.parquet")
    state_dir = str(tmp_path / "rel_state")

    def merge_batch(batch_df, batch_id):
        fresh = trade_rel(ords, batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = prev.unionByName(fresh).distinct()
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 degree_distribution_from_rel(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_degree_distribution(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_user_activity_histogram_equals_batch(spark, tmp_path):
    """Streaming twin #11: the events-per-user power-of-two histogram
    reads out of the per-user event-count SUM-monoid — events replayed
    file-by-file, each micro-batch's user_activity_state partial folded
    via merge_agg_states keyed by user_id (one user's events scattered
    across micro-batches by the staging repartition, so correctness
    requires the cross-batch fold, not per-batch counting); the
    histogram computed from state alone equals the one-shot batch query
    row-for-row.  Nearly free by design (VERDICT r12 item 5): the
    activity-count state is the same table q_user_activity_histogram
    already factors through, and the readout is its shared
    pow2_histogram close."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        q_user_activity_histogram,
        user_activity_from_state,
        user_activity_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = _events_dir(spark, tmp_path)
    state_dir = str(tmp_path / "ua_state")

    def merge_batch(batch_df, batch_id):
        fresh = user_activity_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["user_id"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        SE.read_events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 user_activity_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_user_activity_histogram(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_degree_assortativity_equals_batch(spark, tmp_path):
    """Streaming twin #12: the trade-graph assortativity number reads
    out of the SAME idempotent relationship SET as twin #10 — zero
    extra state.  One batch file is delivered twice (copied into the
    source dir); idempotent union+distinct absorbs the replay, and the
    signed squared correlation recomputed from state equals the
    one-shot batch query row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.graph import (
        degree_assortativity_from_rel,
        q_degree_assortativity,
        trade_rel,
    )

    src = str(tmp_path / "li_assort_src")
    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet")
    li.repartition(3).write.parquet(src)
    part = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    import shutil as _sh
    _sh.copy(os.path.join(src, part), os.path.join(src, "dup-" + part))
    schema = spark.read.parquet(src).schema
    ords = spark.read.parquet(SF_SMALL + "/orders.parquet")
    state_dir = str(tmp_path / "rel_assort_state")

    def merge_batch(batch_df, batch_id):
        fresh = trade_rel(ords, batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = prev.unionByName(fresh).distinct()
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = [tuple(sorted(r.asDict().items())) for r in
           degree_assortativity_from_rel(state).collect()]
    want = [tuple(sorted(r.asDict().items())) for r in
            q_degree_assortativity(spark, SF_SMALL).collect()]
    assert got == want and got


def test_streaming_tax_rate_equals_batch(spark, tmp_path):
    """Streaming twin #13: the per-nation effective-tax table reads
    out of a DECIMAL sum-monoid state — lineitem replayed file-by-file
    (stream-static supplier/nation joins per micro-batch), partials
    folded via merge_agg_states keyed by n_name.  The cents rounding
    lives in the READOUT, not the state, so the merged state rounds
    identically to the one-shot batch query — pinned row-for-row."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        q_tax_effective_rate,
        tax_rate_from_state,
        tax_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "li_tax_src")
    spark.read.parquet(SF_SMALL + "/lineitem.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    sup = spark.read.parquet(SF_SMALL + "/supplier.parquet")
    nat = spark.read.parquet(SF_SMALL + "/nation.parquet")
    state_dir = str(tmp_path / "tax_state")

    def merge_batch(batch_df, batch_id):
        fresh = tax_state(batch_df, sup, nat)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["n_name"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 tax_rate_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_tax_effective_rate(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_freshness_audit_equals_batch(spark, tmp_path):
    """Streaming twin #14: the ingest-freshness dashboard reads out of
    a per-type MAX x SUM monoid — events replayed file-by-file, each
    micro-batch's freshness_state partial folded via
    merge_freshness_states (GREATEST of last-seen, sum of counts; one
    type's events scattered across micro-batches by the staging
    repartition, so correctness requires the cross-batch max fold);
    the staleness table computed from state alone equals the one-shot
    batch query row-for-row.  The corpus watermark is itself a max
    over the state, so the readout needs no side input."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.analytics import (
        freshness_from_state,
        freshness_state,
        merge_freshness_states,
        q_freshness_audit,
    )

    src = _events_dir(spark, tmp_path)
    state_dir = str(tmp_path / "fresh_state")

    def merge_batch(batch_df, batch_id):
        fresh = freshness_state(batch_df)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_freshness_states(prev, fresh)
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        SE.read_events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 freshness_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_freshness_audit(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_return_rate_equals_batch(spark, tmp_path):
    """Streaming twin #15: the per-brand return-rate table reads out
    of a DECIMAL sum-monoid state — lineitem replayed file-by-file
    (stream-static part join per micro-batch), partials folded via
    merge_agg_states keyed by p_brand.  The cents rounding lives in
    the READOUT, so the merged state rounds identically to the
    one-shot batch query — pinned row-for-row (the batch query keeps
    its original single-agg plan; value identity holds because both
    paths round the same full DECIMAL sum exactly once)."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        q_return_rate_by_brand,
        return_rate_from_state,
        return_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "li_ret_src")
    spark.read.parquet(SF_SMALL + "/lineitem.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    part = spark.read.parquet(SF_SMALL + "/part.parquet")
    state_dir = str(tmp_path / "ret_state")

    def merge_batch(batch_df, batch_id):
        fresh = return_state(batch_df, part)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["p_brand"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 return_rate_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_return_rate_by_brand(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_supply_concentration_equals_batch(spark, tmp_path):
    """Streaming twin #16: the per-brand supplier HHI reads out of the
    per-(brand, supplier) DECIMAL sum-monoid — lineitem replayed
    file-by-file (stream-static part join per micro-batch), partials
    folded via merge_agg_states keyed by (p_brand, l_suppkey).  Cents
    round per CELL in the readout, so merged state rounds identically
    to the one-shot query; the HHI's quadratic sum-of-squares and the
    max_by top-supplier argmax are plain functions of the rounded
    cells — the family's first NON-LINEAR readout over monoid state
    (every prior twin's readout was a histogram/ratio of the sums
    themselves).  Pinned row-for-row against the batch query."""
    import os

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.market import (
        q_supply_concentration,
        supply_concentration_from_state,
        supply_state,
    )
    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators.relational import (
        merge_agg_states,
    )

    src = str(tmp_path / "li_hhi_src")
    spark.read.parquet(SF_SMALL + "/lineitem.parquet").repartition(4) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema
    part = spark.read.parquet(SF_SMALL + "/part.parquet")
    state_dir = str(tmp_path / "hhi_state")

    def merge_batch(batch_df, batch_id):
        fresh = supply_state(batch_df, part)
        if os.path.exists(state_dir):
            prev = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_agg_states(prev, fresh, ["p_brand", "l_suppkey"])
        else:
            merged = fresh
        tmp_out = state_dir + ".next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        out_df = batch_df.sparkSession.read.parquet(tmp_out)
        out_df.coalesce(1).write.mode("overwrite").parquet(state_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    state = spark.read.parquet(state_dir)
    got = sorted(tuple(sorted(r.asDict().items())) for r in
                 supply_concentration_from_state(state).collect())
    want = sorted(tuple(sorted(r.asDict().items())) for r in
                  q_supply_concentration(spark, SF_SMALL).collect())
    assert got == want and got


def test_streaming_enrichment_cache_equals_batch(spark, tmp_path):
    """Streaming enrichment with cross-batch LLM-spend memoization:
    documents replayed file-by-file, each micro-batch enriched through
    enrich_with_cache against a parquet cache table that persists
    between batches — a payload seen in an earlier batch never reaches
    the transport again (the batch-mode poisoned-transport pin covers
    the zero-call contract; here the REPLAY pin covers state
    persistence).  After the replay: the accumulated output equals the
    one-shot batch enrichment row-for-row, and the cache holds exactly
    the corpus's distinct payloads."""
    import os

    from pyspark.sql import functions as F

    from project_market_pulse_etl_pipeline_with_llm_integration_spark.operators import enrich as E

    def make_transport():
        def transport(prompt: str) -> str:
            import json as _json

            return _json.dumps(
                {"sentiment": ["Positive", "Negative", "Neutral"][len(prompt) % 3],
                 "category": "TECH", "summary": f"len {len(prompt)}"}
            )

        return transport

    from datetime import datetime as _dt

    ts = _dt(2024, 1, 1)
    docs = (
        spark.read.parquet(SF_SMALL + "/documents.parquet")
        .select(
            "doc_id",
            F.lit("").alias("title"),
            F.col("text").alias("content"),
        )
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    cache_dir = str(tmp_path / "enr_cache")
    out_dir = str(tmp_path / "enr_out")

    def enrich_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        prev = s.read.parquet(cache_dir) if os.path.exists(cache_dir) else None
        out, new_cache = E.enrich_with_cache(
            batch_df, prev, rate_delay=0.0, run_timestamp=ts,
            transport=make_transport(), disabled=False,
        )
        out.write.mode("append").parquet(out_dir)
        tmp_out = cache_dir + ".next"
        new_cache.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        s.read.parquet(tmp_out).coalesce(1) \
            .write.mode("overwrite").parquet(cache_dir)

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(enrich_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    got = sorted(
        tuple(sorted(r.asDict().items()))
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        tuple(sorted(r.asDict().items()))
        for r in E.enrich(
            docs, rate_delay=0.0, run_timestamp=ts,
            transport=make_transport(), disabled=False,
        ).collect()
    )
    assert got == want and got
    n_unique = docs.select("content").distinct().count()
    assert spark.read.parquet(cache_dir).count() == n_unique
