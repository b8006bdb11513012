"""Round-5 epilogue: sessionization gap sensitivity and
DAU/WAU/MAU stickiness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

_GAPS_MIN = (10, 30, 60)


@register(
    "sessions_gap_sensitivity",
    "Sessionization GAP SENSITIVITY — how many sessions would each "
    "candidate inactivity gap produce (the tuning readout for the "
    f"30-minute default every session entry assumes): gaps of "
    f"{', '.join(str(g) for g in _GAPS_MIN)} minutes evaluated from "
    "ONE per-user lag pass (each threshold is a conditional count "
    "over the SAME interarrival column — never one window pass per "
    "candidate), plus each gap's mean session length. A stable "
    "session count across adjacent gaps means the choice is safe; a "
    "cliff means user activity has inter-burst gaps near the "
    "threshold. 100 TB: one user-window shuffle total, one "
    "map-side-combinable agg.",
    oracle=f"""
      WITH seq AS (
        SELECT epoch_us(ts)
               - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS dt
        FROM events
      ),
      c AS (
        SELECT count(*)::BIGINT AS n_events,
               {", ".join(
                 f"sum(CASE WHEN dt IS NULL OR dt > {g * 60_000_000} "
                 f"THEN 1 ELSE 0 END)::BIGINT AS s{g}"
                 for g in _GAPS_MIN)}
        FROM seq
      )
      {" UNION ALL ".join(
        f'''SELECT {g}::BIGINT AS gap_minutes, s{g} AS n_sessions,
             round(n_events::DOUBLE / s{g}, 6) AS mean_session_events
      FROM c''' for g in _GAPS_MIN)}
      ORDER BY gap_minutes
    """,
)
def sessions_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
        ).alias("dt")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    for g in _GAPS_MIN:
        aggs.append(
            F.sum(
                F.when(
                    F.col("dt").isNull() | (F.col("dt") > g * 60_000_000),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"s{g}")
        )
    c = seq.agg(*aggs)
    outs = [
        c.select(
            F.lit(g).cast("long").alias("gap_minutes"),
            F.col(f"s{g}").alias("n_sessions"),
            F.round(
                F.col("n_events").cast("double") / F.col(f"s{g}"), 6
            ).alias("mean_session_events"),
        )
        for g in _GAPS_MIN
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("gap_minutes")


@register(
    "events_dau_wau_mau_stickiness",
    "DAU / WAU / MAU and the DAU/MAU STICKINESS ratio per day — the "
    "product-analytics staple, computed exactly: per-day distinct "
    "users, then trailing 7- and 28-day distinct via a day-spine "
    "range join over the (day, user) frame (the exact baseline whose "
    "scale limit sketch_hll_rolling_window_distinct's register merge "
    "exists to lift). All counts exact integers; stickiness rounded "
    "6dp. 100 TB: the user-day frame is one distinct pass over "
    "events; the range join fans it out x28 — span-bounded days "
    "times active users, the known exact-sliding-distinct cost.",
    oracle="""
      WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        FROM events
      ),
      spine AS (SELECT DISTINCT day FROM du),
      roll AS (
        SELECT s.day,
               count(DISTINCT CASE WHEN d.day = s.day
                     THEN d.user_id END)::BIGINT AS dau,
               count(DISTINCT CASE WHEN d.day >= s.day - 6
                     THEN d.user_id END)::BIGINT AS wau,
               count(DISTINCT d.user_id)::BIGINT AS mau
        FROM spine s JOIN du d
          ON d.day BETWEEN s.day - 27 AND s.day
        GROUP BY s.day
      )
      SELECT day::BIGINT AS day, dau, wau, mau,
             round(dau::DOUBLE / mau, 6) AS stickiness
      FROM roll
      ORDER BY day
    """,
)
def events_dau_wau_mau_stickiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    du = ev.selectExpr(
        "unix_micros(ts) div 86400000000 as day", "user_id"
    ).distinct()
    spine = du.select("day").distinct().select(F.col("day").alias("d"))
    roll = (
        du.join(
            F.broadcast(spine),
            (F.col("day") >= F.col("d") - 27) & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.count_distinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            )
            .cast("long")
            .alias("dau"),
            F.count_distinct(
                F.when(F.col("day") >= F.col("d") - 6, F.col("user_id"))
            )
            .cast("long")
            .alias("wau"),
            F.count_distinct("user_id").cast("long").alias("mau"),
        )
    )
    return roll.select(
        F.col("d").cast("long").alias("day"),
        "dau",
        "wau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    ).orderBy("day")
