"""Custom stateful operator on Spark 4's transformWithState API
(SURVEY.md §2.10 extension — the successor to applyInPandasWithState,
with TYPED state variables instead of one opaque tuple).

Operator: per-user event-type profile. A MapState holds per-event-type
counts (point lookups/updates — only touched keys are read, unlike the
applyInPandasWithState tuple which round-trips the whole state every
batch) and a ValueState holds the running total. Each micro-batch emits
the user's refreshed profile: total events, distinct event types, and
the modal (most frequent) type with a deterministic lexicographic
tie-break.

Scale story: state lives in the per-partition state store keyed by
user — at 100 TB of events this shards horizontally with the shuffle,
and the MapState's per-key access pattern means a user with millions of
events still only materializes the handful of event-type entries each
batch touches.

ENVIRONMENT GATE: transformWithState's Python worker imports
google.protobuf (pyspark/sql/streaming/proto/StateMessage_pb2), which
is not installed in this container — the drained-stream==batch parity
test (tests/test_streaming.py) auto-skips here and activates on any
deployment with protobuf present. applyInPandasWithState
(streaming/stateful.py) is the fully-exercised stateful path in this
environment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, total_events long, n_event_types long, "
    "modal_type string, modal_count long"
)


class UserTypeProfile(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n long"
        )
        self._total = handle.getValueState("total", "total long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total = self._total.get()[0] if self._total.exists() else 0
        touched: dict[str, int] = {}
        for pdf in rows:
            total += len(pdf)
            # a null event_type still counts toward total_events, so it
            # must also land in the per-type map (pandas groupby drops
            # NaN groups silently) — map it to a sentinel type so
            # total_events == sum(type counts) stays an invariant
            et_col = pdf["event_type"].fillna("<null>")
            for et, n in et_col.groupby(et_col).size().items():
                cur = touched.get(et)
                if cur is None:
                    cur = (
                        self._counts.getValue((et,))[0]
                        if self._counts.containsKey((et,))
                        else 0
                    )
                touched[et] = cur + int(n)
        for et, n in touched.items():
            self._counts.updateValue((et,), (n,))
        self._total.update((total,))
        # profile over the FULL map (all types this user ever sent)
        all_counts = {
            k[0]: v[0] for k, v in self._counts.iterator()
        }
        modal_type, modal_count = min(
            all_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total],
                "n_event_types": [len(all_counts)],
                "modal_type": [modal_type],
                "modal_count": [modal_count],
            }
        )

    def close(self) -> None:
        pass


def user_type_profiles(events: DataFrame) -> DataFrame:
    """Streaming per-user event-type profiles via transformWithState."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeProfile(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
