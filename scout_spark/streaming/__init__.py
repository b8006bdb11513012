from scout_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_value_sums,
    sessionized_activity,
    dedup_within_watermark,
    run_to_memory_sink,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_value_sums",
    "sessionized_activity",
    "dedup_within_watermark",
    "run_to_memory_sink",
]
