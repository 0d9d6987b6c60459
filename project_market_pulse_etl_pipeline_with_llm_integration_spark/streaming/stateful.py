"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.2 streaming extension — the escape hatch for semantics the
built-in windowed aggregations can't express).

Operator: **per-user running profile with inactivity timeout** — for
each user_id, maintain (event count, value sum, last event time) across
micro-batches; when the user goes quiet past the timeout, emit a final
"session summary" row and drop the state.  This is the canonical shape
of custom sessionization / feature-accumulation operators in training-
data pipelines.

Scale notes: state lives in Spark's state store keyed by user_id —
partitioned by the grouping key across executors, checkpointed
incrementally; no driver state.  The timeout uses processing time so
idle keys are reaped even with no new input for them.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("value_sum", LongType()),  # micro-units to stay exact
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum_micro", LongType()),
        StructField("last_seen", TimestampType()),
        StructField("final", LongType()),
    ]
)


def make_accumulator(timeout_ms: int | None):
    """Build the per-group stateful function; ``timeout_ms=None`` skips
    timeout scheduling (NoTimeout mode — needed for hermetic availableNow
    tests: with ProcessingTimeTimeout a drained query never goes idle,
    it keeps running empty micro-batches to poll for expired state)."""

    def accumulate(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            cnt, vsum, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [cnt],
                    "value_sum_micro": [vsum],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "final": [1],
                }
            )
            return
        cnt, vsum, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            cnt += len(pdf)
            vsum += int((pdf["value"] * 1_000_000).round().sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((cnt, vsum, last_us))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)  # idle keys finalize + evict
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [cnt],
                "value_sum_micro": [vsum],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
                "final": [0],
            }
        )

    return accumulate


def user_profiles_stateful(
    events_stream: DataFrame, timeout_ms: int | None = 30_000
) -> DataFrame:
    """Streaming per-user running profiles (update mode); idle keys are
    finalized and evicted after ``timeout_ms`` of processing-time
    silence (None disables the timeout — bounded state then relies on
    the key domain)."""
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_accumulator(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
