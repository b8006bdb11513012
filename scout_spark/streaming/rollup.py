"""Hierarchical time-series rollups (hypertable-style continuous
aggregates — build-brief custom-operator example; no counterpart in the
reference, SURVEY.md §2.10).

A rollup cascade materializes aggregates at increasing granularity,
each level re-aggregated from the previous (10 min → 1 h → 1 d), so a
dashboard query over a year reads the daily table instead of raw
events. Correctness requires every aggregate to be decomposable:
count/sum re-aggregate directly; avg is carried as (sum, count);
min/max compose. ``pick_level`` routes a query range to the coarsest
level that aligns with it.

Batch materialization here; incremental refresh at 100 TB = the same
``rollup_events`` transform inside ``foreachBatch`` appending only the
windows the micro-batch touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# level name → window seconds (each divides the next)
LEVELS: dict[str, int] = {"10min": 600, "1h": 3600, "1d": 86400}


def _bucket(ts_col, seconds: int):
    return F.timestamp_seconds(
        (F.col(ts_col).cast("timestamp_ltz").cast("long") / seconds).cast("long")
        * seconds
    )


def rollup_events(events: DataFrame, seconds: int, ts_col: str = "ts") -> DataFrame:
    """Base-level rollup from raw events: decomposable aggregate state
    per (bucket, event_type)."""
    return events.groupBy(
        _bucket(ts_col, seconds).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def rollup_up(lower: DataFrame, seconds: int) -> DataFrame:
    """Re-aggregate a finer rollup into a coarser one — runs on the
    (small) rollup table, never on raw events."""
    return lower.groupBy(
        _bucket("bucket", seconds).alias("bucket"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def build_rollup_cascade(events: DataFrame) -> dict[str, DataFrame]:
    """events → {level: rollup df}, each level derived from the previous
    (the cascade property: only the finest level ever reads raw data)."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for name, seconds in LEVELS.items():
        cur = rollup_events(events, seconds) if prev is None else rollup_up(prev, seconds)
        out[name] = cur
        prev = cur
    return out


def pick_level(range_seconds: int) -> str:
    """Coarsest level whose window divides the query range, the router a
    dashboard uses to hit the smallest table. Falls back to the FINEST
    level when nothing divides — the answer is then approximate at the
    range edges (off by at most one fine bucket); callers needing exact
    edges must aggregate raw events instead."""
    best = next(iter(LEVELS))
    for name, seconds in LEVELS.items():
        if range_seconds % seconds == 0:
            best = name
    return best


def with_avg(rollup: DataFrame) -> DataFrame:
    """Derive avg from carried (sum, count) state — exact at every level."""
    return rollup.withColumn(
        "avg_value", F.try_divide(F.col("sum_value"), F.col("n_events"))
    )


def merge_rollup_state(existing: DataFrame, partial: DataFrame) -> DataFrame:
    """Merge two decomposable-state rollup tables (same schema) by
    re-aggregating their union: counts and sums add, min/max compose.
    Exactly the property that makes the cascade exact — a refresh
    never needs raw history, only the incoming partial."""
    return existing.unionByName(partial).groupBy("bucket", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def incremental_rollup_sink(
    stream_df: DataFrame,
    target_path: str,
    seconds: int,
    checkpoint: str,
):
    """Incremental continuous-aggregate refresh — the foreachBatch
    realization this module's header promises: each micro-batch is
    rolled up to its OWN decomposable partial (tiny — one row per
    touched (bucket, event_type)) and merged into the persistent base
    rollup table; raw events are never re-read. Coarser cascade levels
    re-derive from the refreshed base via ``rollup_up`` — also without
    touching raw data.

    At 100 TB the merge rewrite touches only the partitions whose
    buckets the batch contains (dynamic partition overwrite on a
    bucket-partitioned table); here the full-table rewrite keeps the
    plain-parquet demo atomic via the staging swap. NOTE exactly-once:
    the merge is additive, so replaying an ALREADY-MERGED micro-batch
    would double-count — availableNow + checkpoint gives effectively-
    once delivery of each batch to foreachBatch, and the swap is
    atomic, but a crash BETWEEN the swap and the checkpoint commit
    re-delivers the batch; production deployments record batch_id in a
    table property / txn log (Delta's txn appId pattern) and skip
    already-applied ids. ``batch_id`` is threaded here for exactly
    that check, demonstrated in tests.
    """
    import os

    from scout_spark.sources.maintenance import atomic_swap, recover_swap

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_swap(target_path)
        applied_marker = os.path.join(
            target_path + ".applied", f"batch-{batch_id}"
        )
        if os.path.exists(applied_marker):
            return  # replay of an already-merged batch: skip, don't double-count
        partial = rollup_events(batch_df, seconds)
        if os.path.exists(target_path):
            merged = merge_rollup_state(
                spark.read.parquet(target_path), partial
            )
        else:
            merged = partial
        staging = target_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).count()  # materialize before swapping
        atomic_swap(target_path, staging)
        os.makedirs(os.path.dirname(applied_marker), exist_ok=True)
        open(applied_marker, "w").close()

    return (
        stream_df.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
