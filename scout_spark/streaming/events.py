"""Structured Streaming over the events stream (SURVEY.md §2.10 — the
reference has no streaming; these are the build-brief extensions, built
on watermarks + windowed state so they run unbounded).

Each transformation takes a streaming DataFrame and returns one, so the
same logic composes under readStream → ... → writeStream. The batch
shapes of these queries live in scout_spark/inventory/temporal.py and
are oracle-checked; streaming parity with those batch results is pinned
by tests/test_streaming.py (availableNow trigger over file source).

Scale notes: watermarks bound state; tumbling/sliding aggs keep one
state row per (window, key); session windows merge state on arrival;
dropDuplicatesWithinWatermark evicts seen-keys past the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet/json drops (at 100 TB this is
    the landing-zone pattern: object-store prefix, bounded per-trigger
    file count to cap micro-batch size)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of inventory item window_tumbling_10min: per-window
    per-type counts and value sums; late rows beyond the watermark drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_sums(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window aggregation — each event lands in window/slide
    overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("window_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "window_value",
        )
    )


def sessionized_activity(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows (gap-close semantics match the batch
    gaps-and-islands item sessionize_30min_gap): state merges as events
    arrive, sessions emit once the watermark passes the gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def purchases_after_clicks(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    clicks in the preceding ``max_gap``. Both sides carry watermarks so
    the join state is bounded — Spark evicts click state once the
    watermark passes click_ts + max_gap.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    gap_expr = f"""
        c_user = user_id AND
        click_ts <= purchase_ts AND
        click_ts >= purchase_ts - INTERVAL {max_gap}
    """
    return purchases.join(clicks, F.expr(gap_expr), "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "value"
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon — the streaming
    variant of exact dedup (state = seen keys, evicted past watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def upsert_sink_foreach_batch(
    stream_df: DataFrame,
    target_path: str,
    key: str,
    order_col: str,
    checkpoint: str,
):
    """foreachBatch merge sink: each micro-batch upserts into a parquet
    table, keeping the max-``order_col`` row per key (e.g. the latest
    event per user). The merge is the anti-join+union from
    etl/incremental.py — on Delta/Iceberg this is MERGE INTO; here the
    staging-swap keeps it atomic on plain parquet.
    """
    import os

    from pyspark.sql.window import Window

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cols = batch_df.columns
        # Tie-breaks beyond order_col keep the merge deterministic under
        # at-least-once replay: on an order_col tie the existing row wins
        # (_src asc), and within a batch the xxhash64 of the full row
        # picks a stable winner — a replayed micro-batch then re-derives
        # the identical table instead of clobbering by partition luck.
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(), F.col("_src").asc(), F.xxhash64(*cols).asc()
        )

        def keep_latest(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )

        from scout_spark.sources.maintenance import atomic_swap, recover_swap

        recover_swap(target_path)  # heal a crash inside a previous swap
        latest = batch_df.withColumn("_src", F.lit(1))
        if os.path.exists(target_path):
            # union then pick max-order per key: a late-arriving batch
            # must not clobber a newer row already in the table
            existing = spark.read.parquet(target_path).withColumn("_src", F.lit(0))
            merged = keep_latest(existing.unionByName(latest))
        else:
            merged = keep_latest(latest)
        staging = target_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).count()  # materialize before swapping
        atomic_swap(target_path, staging)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming DataFrame to completion with the availableNow
    trigger into an in-memory table; returns the materialized result.
    (Test/driver helper — production sinks are writeStream.format(
    'parquet'/'delta') or foreachBatch for merge semantics.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def activity_bitmask(
    events: DataFrame, day0: int, horizon_days: int = 64
) -> DataFrame:
    """Streaming twin of inventory item retention_bitmap_daily's mask
    build: per-user bit-packed activity mask (bit k = any event on day
    offset k from ``day0``). bit_or is a MERGEABLE decomposable state —
    each micro-batch ORs its partial mask into the store, so the
    streaming result is split-invariant by construction (asserted in
    tests/test_streaming.py). Unwindowed complete-mode agg: state is one
    bigint per user, bounded by |users|, never by event volume."""
    day_us = 86_400_000_000
    off = (F.expr(f"unix_micros(ts) div {day_us}") - F.lit(day0)).cast(
        "int"
    )
    return (
        events.select("user_id", off.alias("off"))
        .where((F.col("off") >= 0) & (F.col("off") < horizon_days))
        .groupBy("user_id")
        .agg(F.expr("bit_or(shiftleft(1L, off))").alias("mask"))
    )


def first_touch_conversion(events: DataFrame) -> DataFrame:
    """Streaming twin of inventory item funnel_time_to_convert's
    per-user anchor state: first 'view' and first subsequent
    'purchase' timestamps per user. Both are conditional MINs —
    decomposable, mergeable state (a micro-batch's partial min ORs
    into the store), so the drained stream equals the batch frame
    exactly (tests/test_streaming.py). The delay is derived, not
    stored: min-over-purchases-after-the-view is NOT itself a plain
    min under out-of-order arrival, so the stream keeps the two
    anchor mins (each unconditionally mergeable) and closes the
    funnel at read time — the standard trick for making funnel state
    commutative. State: two bigints per user."""
    us = F.unix_micros(F.col("ts"))
    return (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", us)
            ).alias("first_view_us"),
            F.min(
                F.when(F.col("event_type") == "purchase", us)
            ).alias("first_purchase_us"),
        )
    )


def golden_event_record(events: DataFrame) -> DataFrame:
    """Streaming twin of inventory item er_golden_record's RECORD-LEVEL
    survivorship: per user, the winning event by (integer cents,
    event_id) carried as a single max-of-struct state.  Max over a
    struct compares lexicographically and is decomposable/mergeable
    exactly like max over a scalar — each micro-batch's partial winner
    merges into the store — so the drained stream equals the batch
    merge bit for bit (tests/test_streaming.py) and the tie-break
    lives inside the comparator, not in arrival order.  State: one
    small struct per user, bounded by |users|."""
    return (
        events.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.round(F.col("value") * 100)
                    .cast("long")
                    .alias("cents"),
                    F.col("event_id").alias("event_id"),
                    F.col("event_type").alias("event_type"),
                )
            ).alias("best")
        )
        .select(
            "user_id",
            F.col("best.cents").alias("cents"),
            F.col("best.event_id").alias("event_id"),
            F.col("best.event_type").alias("event_type"),
        )
    )
