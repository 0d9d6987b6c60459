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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): the successor API to
# applyInPandasWithState — typed per-key state handles from a
# StatefulProcessorHandle instead of one opaque state tuple.  Same
# operator semantics as user_profiles_stateful so the two APIs are
# differential-testable against each other.
#
# RUNTIME REQUIREMENT: the new API's state protocol rides protobuf
# (pyspark.sql.streaming.proto) — a stock pyspark dependency that this
# hermetic container does not ship.  The operator is therefore gated:
# tws_available() probes for protobuf, the test skips without it, and
# the applyInPandasWithState twin above carries the tested semantics
# here (both operators implement the identical contract).
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, value_sum_micro bigint"
)


def make_profile_processor():
    """Build the StatefulProcessor lazily (import inside, so merely
    importing this module never requires the new API)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        """Per-user running (count, exact micro-unit value sum): the
        state is ONE typed ValueState row — Spark's state store keys it
        by user_id across executors, checkpointed incrementally; the
        handle API replaces applyInPandasWithState's manual tuple
        packing with named, schema'd state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "cnt bigint, value_sum bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            cnt, vsum = 0, 0
            if self._state.exists():
                prev = self._state.get()
                cnt, vsum = int(prev[0]), int(prev[1])
            for pdf in rows:
                cnt += len(pdf)
                # exact integer micro-units, IDENTICAL formula to the
                # applyInPandasWithState twin: round per value, sum ints
                vsum += int((pdf["value"] * 1_000_000).round().sum())
            self._state.update((cnt, vsum))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "value_sum_micro": [vsum],
                }
            )

        def close(self) -> None:
            pass

    return ProfileProcessor()


def user_profiles_tws(events_stream, time_mode: str = "None"):
    """Streaming per-user profiles on the transformWithStateInPandas
    API; output mode Update emits the refreshed profile per key per
    micro-batch."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_profile_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode=time_mode,
    )


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime deps exist
    (protobuf is required by pyspark's state protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
