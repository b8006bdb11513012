"""Round-4 time-series additions over the events table: bounded EWMA,
SCD2 dimension build, rolling median, and OHLC bars.

Cross-engine FP discipline (the invariants that keep these hash-green):

- The EWMA is built from ``lag()`` terms folded LEFT-ASSOCIATIVELY with
  IDENTICAL literal weights on both sides (the Python float repr of
  0.7**k round-trips exactly and both engines parse it to the same
  double), so the whole expression is the same IEEE op sequence
  bit-for-bit — no window-frame summation whose order DuckDB's segment
  trees could reorder.
- The rolling median interpolates as (a+b)/2 — one add + one halving of
  2dp-exact doubles, bit-identical on both engines.
- SCD2 and OHLC use only comparisons, row_number, and min/max — no FP
  accumulation at all.

Every per-user window orders by (ts, event_id): ts alone ties under
generated data and an engine-dependent tie order flips lag/lead values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

# identical literal weights on both sides (repr round-trips exactly)
_DECAY = 0.7
_EWMA_TAPS = 8
_W = [repr(_DECAY**k) for k in range(_EWMA_TAPS)]


def _ewma_sql() -> tuple[str, str]:
    """(numerator, denominator) SQL — explicit left-assoc folds."""
    num = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 "
        f"ELSE {w} * lag(value, {k}) OVER w END"
        for k, w in enumerate(_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w} END"
        for k, w in enumerate(_W)
    )
    return num, den


@register(
    "timeseries_ewma_bounded",
    "Bounded exponentially-weighted moving average (8 taps, decay 0.7) "
    "of event values per user — the smoothing pass behind rate/latency "
    "dashboards. Implemented as a fixed lag-tap FIR filter rather than "
    "a frame aggregate: one window shuffle on user_id, zero FP "
    "order-sensitivity (see module docstring), and at 100 TB the plan "
    "is a single hash-partitioned sort per user partition, identical "
    "to any sessionization pass.",
    oracle=f"""
      SELECT user_id, event_id, ts, value,
             round(({_ewma_sql()[0]}) / ({_ewma_sql()[1]}), 6) AS ewma_8
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def timeseries_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k, wk in enumerate(_W):
        lagv = F.lag("value", k).over(w)
        term = F.when(lagv.isNull(), 0.0).otherwise(F.lit(float(wk)) * lagv)
        dterm = F.when(lagv.isNull(), 0.0).otherwise(F.lit(float(wk)))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(num / den, 6).alias("ewma_8"),
    )


@register(
    "scd2_event_type_dimension",
    "Slowly-changing-dimension (type 2) build: collapse each user's "
    "event stream into validity intervals of their event_type attribute "
    "— consecutive equal-type runs become one versioned row with "
    "[valid_from, valid_to) and an is_current flag. Gaps-and-islands "
    "(lag-change flag + running sum) then lead() for the closing "
    "timestamp: two window passes over ONE shuffle on user_id, the "
    "standard warehouse CDC-to-SCD2 pipeline shape at any scale.",
    oracle="""
      WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), runs AS (
        SELECT user_id, ts, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)::BIGINT AS version
        FROM flagged
      ), dim AS (
        SELECT user_id, version,
               min(event_type) AS attr_event_type,
               min(ts) AS valid_from,
               count(*) AS n_events
        FROM runs GROUP BY user_id, version
      )
      SELECT user_id, version, attr_event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
             (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               IS NULL) AS is_current,
             n_events
      FROM dim
    """,
)
def scd2_event_type_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            ~F.col("event_type").eqNullSafe(
                F.lag("event_type").over(w)
            ),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "version", F.sum("chg").over(wsum).cast("bigint")
    )
    dim = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("attr_event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return dim.select(
        "user_id",
        "version",
        "attr_event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


@register(
    "window_rolling_median",
    "Exact rolling median of event values over a 7-row trailing frame "
    "per user — the robust-smoothing twin of the moving average "
    "(medians shrug off the spike outliers that wreck means). Spark "
    "runs the percentile aggregate over a ROWS frame; the oracle uses "
    "quantile_cont. Both interpolate even-count frames as (a+b)/2 — "
    "one add and one exact halving of 2dp doubles, bit-identical "
    "across engines (module docstring). One shuffle on user_id.",
    oracle="""
      SELECT user_id, event_id, ts, value,
             round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_median
      FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
            "rolling_median"
        ),
    )


@register(
    "timeseries_ohlc_hourly",
    "OHLC candlestick bars: per (user, hour) the opening value (first "
    "by (ts, event_id)), high, low, closing value (last), and the "
    "event count. open/close via row_number over one window pass; "
    "high/low/n via the grouped aggregate — comparisons and min/max "
    "only, zero FP accumulation. One shuffle on (user, hour); at scale "
    "this is the canonical pre-aggregation that turns a raw tick "
    "stream into a queryable rollup 1000x smaller.",
    oracle="""
      WITH ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS bar_hour, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
      )
      SELECT user_id, bar_hour,
             min(CASE WHEN rn_a = 1 THEN value END) AS open_v,
             max(value) AS high_v,
             min(value) AS low_v,
             min(CASE WHEN rn_d = 1 THEN value END) AS close_v,
             count(*) AS n_events
      FROM ranked
      GROUP BY user_id, bar_hour
    """,
)
def timeseries_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", "ts").alias("bar_hour"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("user_id", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bar_hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.select(
        "user_id",
        "bar_hour",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("user_id", "bar_hour").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
    )
