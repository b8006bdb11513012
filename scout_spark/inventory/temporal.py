"""Temporal operator inventory over the events table: as-of join,
tumbling-window aggregation (the batch shape of Structured Streaming's
window() — see scout_spark/streaming for the readStream versions), and
gap-based sessionization (batch shape of session_window).

The reference is batch-built and served read-only (SURVEY.md §2.10) —
these are additions required by the build brief, not ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "asof_join_last_purchase_before_error",
    "Backward as-of join (SURVEY.md §2.3 J4): for every 'error' event, "
    "the same user's most recent 'purchase' at or before it. Implemented "
    "as the scalable union+window carry-forward (one shuffle on user_id + "
    "one sort — cost independent of time density, unlike a range "
    "theta-join). Oracle uses DuckDB's native ASOF JOIN.",
    oracle="""
      SELECT e.event_id, e.user_id, e.ts AS error_ts,
             p.ts AS right_ts, round(p.value, 2) AS right_value
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("error_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="error_ts",
        right_ts="ts",
        right_payload=["value"],
        how="inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        "error_ts",
        "right_ts",
        F.round("right_value", 2).alias("right_value"),
    )


@register(
    "join_range_purchases_after_clicks",
    "Time-bounded range join: purchases matched to the same user's "
    "clicks within the preceding 30 minutes — the batch twin of the "
    "watermarked stream-stream join (scout_spark/streaming/events.py::"
    "purchases_after_clicks; equality on user_id carries the shuffle, "
    "the time band is a post-join filter — never a cross product).",
    oracle="""
      SELECT p.event_id AS purchase_id, p.user_id,
             p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
)
def join_range_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


@register(
    "dedup_transitive_groups",
    "Transitive dedup groups: MinHash-LSH near-dup pairs closed under "
    "connectivity (iterative min-label propagation with per-round "
    "lineage checkpoints) → (id, component, keeper, is_duplicate). "
    "Rows-only: iterative algorithm, not SQL-expressible; group "
    "structure pinned on planted chains in tests/test_operators.py.",
    tags=("rows-only",),
)
def dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.dedup import dedup_groups, minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", 16, 4, 0.8)
    return dedup_groups(pairs)


@register(
    "window_tumbling_10min",
    "Tumbling 10-minute window aggregation — the batch shape of "
    "Structured Streaming's window() (SURVEY.md §2.10; streaming version "
    "in scout_spark/streaming/events.py). Epoch-aligned buckets; "
    "low-cardinality groupBy → map-side partial agg carries the shuffle.",
    oracle="""
      SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
               AS window_start,
             event_type,
             count(*) AS n_events,
             round(sum(value), 2) AS total_value
      FROM events
      GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes").alias("w"),
            "event_type",
        )
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


@register(
    "rollup_cascade_hourly",
    "Continuous-aggregate cascade (hypertable-style; scout_spark/"
    "streaming/rollup.py): hourly level RE-AGGREGATED from the 10-minute "
    "level — never from raw events. The oracle aggregates raw directly; "
    "matching results prove the decomposable-state cascade is exact.",
    oracle="""
      SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
               AS bucket,
             event_type,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events
      GROUP BY 1, 2
    """,
)
def rollup_cascade_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.streaming.rollup import rollup_events, rollup_up

    ev = _t(spark, sf_dir, "events")
    ten_min = rollup_events(ev, 600)
    hourly = rollup_up(ten_min, 3600)
    return hourly.select(
        "bucket",
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


@register(
    "sessionize_30min_gap",
    "Gap-based sessionization (batch shape of session_window; SURVEY.md "
    "§2.10): per-user sessions split at >30-minute silence, via "
    "gaps-and-islands (lag + conditional cumulative sum) — two window "
    "passes over one shuffle-by-user.",
    oracle="""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - coalesce(lag(ts) OVER w, ts) > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)::BIGINT
                 AS session_id
        FROM flagged
      )
      SELECT user_id, session_id,
             count(*) AS n_events,
             min(ts) AS session_start,
             max(ts) AS session_end,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS session_value
      FROM sessions
      GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the running sum must use the SAME total order as the flag window —
    # on a ts tie, ordering by ts alone could place the flagged row
    # before/after its tie-mate differently per engine
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts").cast("double") - F.coalesce(
        F.lag("ts").over(w), F.col("ts")
    ).cast("double")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap > 1800, 1).otherwise(0).alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wsum).cast("bigint")
    )
    # session_value sums in exact DECIMAL (value is 2dp-exact in the
    # testdata) so the result is summation-order-insensitive — a plain
    # double sum can land a half-cent tie on different sides per engine
    # (driver hash-red r02; same pattern as tpch_classics2.py Q9/Q11/Q22).
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("session_value"),
    )


@register(
    "window_hopping_10min_5min",
    "Hopping (sliding) 10-minute window with 5-minute slide — each event "
    "contributes to exactly width/slide = 2 windows. Spark expands via "
    "window(ts, '10 minutes', '5 minutes'); the oracle unnests the two "
    "epoch-aligned starts per event. The expansion is row-local "
    "(explode before the shuffle), so shuffle volume is 2× events, "
    "never a range join.",
    oracle="""
      SELECT make_timestamp(s) AS window_start, event_type,
             count(*) AS n_events,
             round(sum(value), 2) AS total_value
      FROM (
        SELECT event_type, value,
               unnest([(epoch_us(ts) // 300000000) * 300000000,
                       (epoch_us(ts) // 300000000) * 300000000 - 300000000]) AS s
        FROM events
      )
      GROUP BY 1, 2
    """,
)
def window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            "event_type",
        )
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


@register(
    "funnel_view_click_purchase",
    "Ordered funnel analysis: per user, the first 'view', the first "
    "'click' strictly after that view, and the first 'purchase' "
    "strictly after that click — stage timestamps plus the reached "
    "stage (0-3). Three per-user min-aggregations chained by join: "
    "every shuffle keys on user_id (one partitioning reused), no "
    "self-theta-join over the event stream — at 100 TB each stage is a "
    "map-side-combined agg over an already-clustered key.",
    oracle="""
      WITH v AS (
        SELECT user_id, min(ts) AS view_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
      ),
      c AS (
        SELECT e.user_id, min(e.ts) AS click_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.view_ts
        GROUP BY e.user_id
      ),
      p AS (
        SELECT e.user_id, min(e.ts) AS purchase_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        GROUP BY e.user_id
      )
      SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
             1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
               AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
              LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("int")
                + F.col("purchase_ts").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


@register(
    "events_transition_matrix",
    "Per-user event-sequence transition counts (Markov-chain edge "
    "weights): lag(event_type) over (user_id ORDER BY ts, event_id) "
    "pairs each event with its predecessor, then a global groupBy "
    "counts (prev, next) transitions and their share of all "
    "transitions. One window shuffle on user_id + one small agg; the "
    "deterministic event_id tie-break makes simultaneous events "
    "reproducible across engines.",
    oracle="""
      WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
      ),
      t AS (
        SELECT prev, event_type AS next, count(*) AS n
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
      )
      SELECT prev, next, n,
             round(n::DOUBLE / sum(n) OVER (), 6) AS share
      FROM t
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull())
    t = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # total via broadcast scalar, not a partitionless window (which
    # single-partitions and sprays WindowExec warnings)
    total = t.agg(F.sum("n").alias("total"))
    return t.crossJoin(F.broadcast(total)).select(
        "prev",
        "next",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


@register(
    "merge_into_upsert_delete",
    "Full MERGE INTO semantics (Delta/Iceberg MERGE shape, no table "
    "format needed — etl/incremental.py::merge_into): customers as "
    "target, a deterministic source batch derived from orders activity; "
    "WHEN MATCHED AND acctbal < 0 THEN DELETE, WHEN MATCHED THEN "
    "UPDATE (comment + acctbal), WHEN NOT MATCHED THEN INSERT. One "
    "full-outer join on the key — co-locatable by bucketing at 100 TB. "
    "Oracle states the same three-way CASE in SQL.",
    oracle="""
      WITH src AS (
        SELECT c_custkey + 100000 AS c_custkey,
               'new customer ' || c_custkey AS c_name,
               round(c_acctbal - 50, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 1
        UNION ALL
        SELECT c_custkey, c_name, round(c_acctbal + 100, 2) AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 3
      ),
      merged AS (
        SELECT coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
               CASE WHEN t.c_custkey IS NULL THEN s.c_name
                    WHEN s.c_custkey IS NOT NULL THEN s.c_name
                    ELSE t.c_name END AS c_name,
               CASE WHEN t.c_custkey IS NULL THEN s.c_acctbal
                    WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                    ELSE round(t.c_acctbal, 2) END AS c_acctbal,
               t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                 AS matched,
               t.c_acctbal AS t_bal
        FROM customer t FULL OUTER JOIN src s
          ON t.c_custkey = s.c_custkey
      )
      SELECT c_custkey, c_name, c_acctbal FROM merged
      WHERE NOT (matched AND t_bal < 0)
    """,
)
def merge_into_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.etl.incremental import merge_into

    c = _t(spark, sf_dir, "customer")
    target = c.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    inserts = c.where(F.col("c_custkey") % 10 == 1).select(
        (F.col("c_custkey") + 100000).alias("c_custkey"),
        F.concat(F.lit("new customer "), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        F.round(F.col("c_acctbal") - 50, 2).alias("c_acctbal"),
    )
    updates = c.where(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
    )
    source = inserts.unionByName(updates)
    return merge_into(
        target,
        source,
        key="c_custkey",
        update_cols=["c_name", "c_acctbal"],
        delete_condition=F.col("t.c_acctbal") < 0,
    )


@register(
    "timeseries_gapfill_locf",
    "Hypertable-style gap-filled resampling: per user, an hourly grid "
    "spanning that user's activity (sequence + explode — row-local "
    "expansion, no driver loop), hourly avg(value) where events exist, "
    "gaps carried forward with last-observation-carried-forward "
    "(last_value IGNORE NULLS over a per-user hour-ordered window). "
    "One shuffle keys the grid build AND the window on user_id; at "
    "100 TB the grid inflates rows by mean-gap-count, not by a "
    "cross join.",
    oracle="""
      WITH b AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
               round(avg(value), 6) AS hr_avg
        FROM events GROUP BY 1, 2
      ),
      span AS (
        SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM b GROUP BY 1
      ),
      grid AS (
        SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM span
      ),
      j AS (
        SELECT g.user_id, g.hr, b.hr_avg,
               b.hr_avg IS NULL AS is_gap
        FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.hr = b.hr
      )
      SELECT user_id, hr, is_gap,
             last_value(hr_avg IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_filled
      FROM j
    """,
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("hr"),
            "value",
        )
        .groupBy("user_id", "hr")
        .agg(F.round(F.avg("value"), 6).alias("hr_avg"))
    )
    span = b.groupBy("user_id").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    j = grid.join(b, ["user_id", "hr"], "left").select(
        "user_id", "hr", "hr_avg", F.col("hr_avg").isNull().alias("is_gap")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hr",
        "is_gap",
        F.last("hr_avg", ignorenulls=True).over(w).alias("value_filled"),
    )


@register(
    "cohort_monthly_retention",
    "Cohort retention matrix over orders: each customer's cohort is "
    "their first order month (one min-agg), activity rows join back "
    "(broadcast-able dim of (customer, cohort)), and the matrix counts "
    "distinct active customers per (cohort_month, months_since). Two "
    "shuffles total — cohort agg on custkey, matrix agg on the "
    "(cohort, offset) pair; months_since via exact month arithmetic "
    "(year*12+month), no date subtraction FP.",
    oracle="""
      WITH first_order AS (
        SELECT o_custkey,
               min(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_m
        FROM orders GROUP BY o_custkey
      ),
      activity AS (
        SELECT o.o_custkey, f.cohort_m,
               (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cohort_m
                 AS months_since
        FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
      )
      SELECT cohort_m, months_since,
             count(DISTINCT o_custkey) AS active_customers
      FROM activity
      WHERE months_since <= 12
      GROUP BY cohort_m, months_since
    """,
)
def cohort_monthly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    month_idx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = o.groupBy("o_custkey").agg(F.min(month_idx).alias("cohort_m"))
    activity = o.join(first, "o_custkey").select(
        "o_custkey",
        "cohort_m",
        (month_idx - F.col("cohort_m")).alias("months_since"),
    )
    return (
        activity.where(F.col("months_since") <= 12)
        .groupBy("cohort_m", "months_since")
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@register(
    "basket_part_cooccurrence",
    "Market-basket co-occurrence (the A-Priori candidate-pair step): "
    "parts appearing in the same order, via an orderkey self-join with "
    "partkey ordering to halve the pair space, counted and top-25 with "
    "a deterministic tie-break. The self-join co-partitions on "
    "orderkey (one shuffle reused by both sides); per-order fanout is "
    "bounded by basket size squared, the algorithm's intrinsic cost.",
    oracle="""
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      )
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      ORDER BY n_orders DESC, part_a, part_b
      LIMIT 25
    """,
)
def basket_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(25)
    )


@register(
    "join_interval_overlap_sessions_busy",
    "Interval-overlap join — the classic range-join shape (session "
    "intervals x corpus-wide busy hours): per-user 30-min-gap sessions "
    "(the sessionize kernel) joined to hours whose event count exceeds "
    "1.1x the average. The Spark side REWRITES the inequality join as "
    "an hour-grid equi-join (sequence-explode each session into its "
    "covered hour buckets, equi-join on the bucket) — the 100 TB shape: "
    "hash-partitionable, no BroadcastNestedLoopJoin growing with either "
    "side, fanout bounded by session duration. The oracle keeps the "
    "direct inequality overlap join, so matching results PROVE the "
    "rewrite. Busy threshold is relative (scale-free) and built from "
    "IEEE exactly-rounded ops only.",
    oracle="""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - coalesce(lag(ts) OVER w, ts) > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)::BIGINT
                 AS session_id,
               ts
        FROM flagged
      ), intervals AS (
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sess GROUP BY user_id, session_id
      ), hourly AS (
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
                 AS hr, count(*) AS c
        FROM events GROUP BY 1
      ), busy AS (
        SELECT hr, c FROM hourly
        WHERE c > 1.1 * (SELECT avg(c) FROM hourly)
      )
      SELECT i.user_id, i.session_id,
             count(*) AS n_busy_hours,
             max(b.c) AS peak_events
      FROM intervals i JOIN busy b
        ON b.hr <= i.session_end
       AND b.hr + INTERVAL 1 HOUR > i.session_start
      GROUP BY i.user_id, i.session_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts").cast("double") - F.coalesce(
        F.lag("ts").over(w), F.col("ts")
    ).cast("double")
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(F.when(gap > 1800, 1).otherwise(0)).over(wsum)
        .cast("bigint")
        .alias("session_id"),
    )
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    hour_bucket = F.timestamp_seconds(
        (F.col("ts").cast("long") / 3600).cast("long") * 3600
    )
    hourly = ev.groupBy(hour_bucket.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    avg_c = hourly.agg(F.avg("c").alias("avg_c"))
    busy = (
        hourly.crossJoin(F.broadcast(avg_c))
        .where(F.col("c") > 1.1 * F.col("avg_c"))
        .select("hr", "c")
    )
    # scale rewrite: explode each session into its covered hour grid,
    # then EQUI-join on the bucket (no inequality/nested-loop join)
    grid = intervals.select(
        "user_id",
        "session_id",
        F.explode(
            F.sequence(
                F.timestamp_seconds(
                    (F.col("session_start").cast("long") / 3600).cast("long")
                    * 3600
                ),
                F.timestamp_seconds(
                    (F.col("session_end").cast("long") / 3600).cast("long")
                    * 3600
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("hr"),
    )
    return (
        grid.join(busy, "hr")
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_busy_hours"),
            F.max("c").alias("peak_events"),
        )
    )
