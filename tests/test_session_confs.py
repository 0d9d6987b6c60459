"""Pin the r13 ensure_engine_confs memoization: first call pins the
required runtime confs, later calls are free no-ops, and a child session
(spark.newSession(), used by q_recursive_cte) is pinned independently."""

from __future__ import annotations

from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (
    _PINNED,
    ensure_engine_confs,
)


def test_ensure_engine_confs_pins_and_memoizes(spark):
    ensure_engine_confs(spark)
    assert spark in _PINNED
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    # memoized: the second call must not re-enter the slow path — it
    # returns the same session without touching conf (observable as: it
    # does not clobber a conf a caller changed in between; the memo is
    # per-object so correctness of the three required confs is the
    # caller's responsibility after deliberate mutation)
    assert ensure_engine_confs(spark) is spark


def test_child_session_pinned_independently(spark):
    ensure_engine_confs(spark)
    child = spark.newSession()
    assert child not in _PINNED  # new object, not yet pinned
    ensure_engine_confs(child)
    assert child in _PINNED
    assert child.conf.get("spark.sql.session.timeZone") == "UTC"
