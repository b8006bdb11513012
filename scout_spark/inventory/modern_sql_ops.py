"""Round-4 modern-SQL surface: Spark 4 VARIANT (semi-structured
native type) and the ANSI-mode try_* error-tolerant family.

Registered last in load_all so rotation queues these behind the
never-checked backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "scalar_variant_json_path",
    "Spark 4 VARIANT ingestion of the events props JSON: parse_json "
    "into the native semi-structured type once, then typed "
    "variant_get path extraction — the open-format answer to "
    "schema-on-read JSON columns (binary-encoded, no per-query "
    "string re-parse, pushdown-friendly). Aggregates the extracted "
    "value per event_type. The oracle reads the same paths with "
    "DuckDB's JSON extraction.",
    oracle="""
      SELECT event_type,
             count(*) AS n_events,
             count(json_extract(props, '$.k')) AS n_with_k,
             sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
             min(json_extract(props, '$.k')::BIGINT) AS min_k,
             max(json_extract(props, '$.k')::BIGINT) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scalar_variant_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "scalar_try_error_tolerant",
    "ANSI-mode error-tolerant scalar family (this repo runs Spark 4 "
    "with ANSI on, where a bad cast or /0 ABORTS the query): "
    "Column.try_cast turns deterministic parse failures into NULLs "
    "(every 3rd event's rendering is corrupted with a trailing 'x'), "
    "try_divide turns a zero denominator into NULL — the per-row "
    "quarantine pattern for dirty 100 TB inputs, where one malformed "
    "record must not kill a 1000-executor job. Counts good/bad parses "
    "and aggregates the survivors per event_type.",
    oracle="""
      WITH s AS (
        SELECT event_type,
               CASE WHEN event_id % 3 = 0
                    THEN value::VARCHAR || 'x'
                    ELSE value::VARCHAR END AS raw,
               value,
               event_id % 5 AS denom
        FROM events
      )
      SELECT event_type,
             count(*) AS n_rows,
             count(TRY_CAST(raw AS DOUBLE)) AS n_parsed,
             sum(CASE WHEN TRY_CAST(raw AS DOUBLE) IS NULL
                      THEN 1 ELSE 0 END)::BIGINT AS n_quarantined,
             CAST(round(sum(CAST(TRY_CAST(raw AS DOUBLE) AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS sum_parsed,
             count(value / nullif(denom, 0)) AS n_divisible
      FROM s GROUP BY event_type ORDER BY event_type
    """,
)
def scalar_try_error_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(F.col("value").cast("string"), F.lit("x")),
    ).otherwise(F.col("value").cast("string"))
    s = ev.select(
        "event_type",
        raw.alias("raw"),
        "value",
        (F.col("event_id") % 5).alias("denom"),
    )
    parsed = F.col("raw").try_cast("double")
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(parsed).alias("n_parsed"),
            F.sum(F.when(parsed.isNull(), 1).otherwise(0)).alias(
                "n_quarantined"
            ),
            F.round(F.sum(parsed.cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_parsed"),
            F.count(F.try_divide(F.col("value"), F.col("denom"))).alias(
                "n_divisible"
            ),
        )
        .orderBy("event_type")
    )


_TREND_HALF_LIFE_S = 21600.0  # 6 h
_LN2 = 0.6931471805599453


@register(
    "trending_decayed_topk",
    "Exponentially-decayed trending counts (streaming/trending.py's "
    "batch shape): each event-type mention weighs 2^(-age/6h) as of "
    "the corpus max timestamp, so a recent burst outranks a stale "
    "pile — the 'what is trending NOW' primitive. One broadcast "
    "1-row max-ts frame + one groupBy; weights are exp of "
    "non-positive arguments (no overflow), ages in microsecond-exact "
    "double seconds on both engines, identical ln2 literal. "
    "Deterministic top-5 on the rounded count with a token "
    "tie-break.",
    oracle=f"""
      WITH t AS (SELECT max(ts) AS t_end FROM events)
      SELECT event_type,
             count(*) AS n_mentions,
             round(sum(exp((epoch(ts) - epoch(t_end))
                           / {_TREND_HALF_LIFE_S} * {_LN2})), 6)
               AS decayed_count
      FROM events, t
      GROUP BY event_type
      ORDER BY decayed_count DESC, event_type
      LIMIT 5
    """,
)
def trending_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t_end = ev.agg(F.max("ts").alias("t_end"))
    age = F.col("ts").cast("double") - F.col("t_end").cast("double")
    w = F.exp(age / F.lit(_TREND_HALF_LIFE_S) * F.lit(_LN2))
    return (
        ev.crossJoin(F.broadcast(t_end))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.round(F.sum(w), 6).alias("decayed_count"),
        )
        .orderBy(F.desc("decayed_count"), "event_type")
        .limit(5)
    )


@register(
    "udf_cogrouped_pandas_stats",
    "Cogrouped-map applyInPandas (the one pandas-UDF surface the "
    "registry didn't yet pin: two tables cogrouped on a key, the "
    "kernel sees BOTH sides' rows per key as pandas frames): per "
    "BUILDING-segment customer, order count and exact spend (integer-"
    "cent arithmetic inside the kernel — no FP summation-order "
    "drift), including zero-order customers via the empty right "
    "frame. The oracle recomputes with a LEFT JOIN + GROUP BY; the "
    "entry pins the cogroup API and its empty-side edge, not new "
    "relational semantics. Scale notes: (a) the orders side is "
    "semi-joined to the filtered customer keys BEFORE the cogroup — "
    "cogrouped-map invokes the Python kernel once per key, so keys "
    "that can only produce empty output must never reach it; (b) the "
    "deterministic c_custkey%8 slice keeps the per-key-invocation "
    "cost (measured ~3 ms/key here — the cogroup API's cost model) bounded — the "
    "declarative LEFT JOIN (the oracle) is the production plan for "
    "tiny groups; this entry pins the API surface.",
    oracle="""
      SELECT c.c_custkey,
             count(o.o_orderkey) AS n_orders,
             CAST(round(coalesce(sum(CAST(o.o_totalprice
                  AS DECIMAL(18,2))), 0), 2) AS DOUBLE) AS total_spend,
             c.c_acctbal
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey % 8 = 0
      GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def udf_cogrouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    c = _t(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("c_custkey") % 8 == 0)
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        # keys outside the customer filter would invoke the kernel
        # only to return an empty frame — prune them before Python
        .join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        )
    )

    def stats(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if not len(cust):
            # orders for a customer outside the BUILDING filter: the
            # cogroup still delivers the key — emit nothing
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "total_spend", "c_acctbal"]
            )
        # exact integer-cent sum: 2dp doubles -> cents -> back (no
        # FP summation-order drift vs the oracle's DECIMAL sum)
        cents = (
            (orders["o_totalprice"].to_numpy() * 100).round().astype("int64")
        )
        return pd.DataFrame(
            {
                "c_custkey": [int(cust["c_custkey"].iloc[0])],
                "n_orders": [len(orders)],
                "total_spend": [round(int(cents.sum()) / 100.0, 2)],
                "c_acctbal": [float(cust["c_acctbal"].iloc[0])],
            }
        )

    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            stats,
            "c_custkey long, n_orders long, total_spend double,"
            " c_acctbal double",
        )
    )
