"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 — the arbitrary-state API for semantics windowed aggs
can't express).

Implemented operator: per-user running activity monitor — cumulative
event count, cumulative value, and a high-water mark, emitted once per
micro-batch per active user. State is one small tuple per user; an
optional processing-time timeout evicts idle users so state stays
bounded on an unbounded stream. (Timeout adds state-cleanup micro-
batches under trigger=availableNow — leave it off for drain-style
batch-parity runs.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_value double, max_value double"
)
STATE_SCHEMA = "total_events long, total_value double, max_value double"


def _make_update(idle_timeout_ms: int | None):
    def _update_user(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        total_events, total_value, max_value = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in batches:
            total_events += len(pdf)
            total_value += float(pdf["value"].sum())
            if len(pdf):
                max_value = max(max_value, float(pdf["value"].max()))
        state.update((total_events, total_value, max_value))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total_events],
                "total_value": [round(total_value, 2)],
                "max_value": [max_value],
            }
        )

    return _update_user


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming per-user running totals. ``idle_timeout_ms`` bounds state
    on unbounded streams (e.g. 3_600_000 = evict after 1h idle)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
