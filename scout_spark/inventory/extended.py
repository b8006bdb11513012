"""Extended operator coverage (SURVEY.md §2.4 A4 / §2.5 W2 / §2.8 F18
families beyond the first wave): statistical aggregates, exact
percentiles, manual pivot, per-group top-k, scalar correlated subquery,
array/map scalar functions, haversine as an oracle row, union-distinct,
and approximate distinct (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.functions.geo import haversine_km, proximity_decay
from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "agg_statistical_moments",
    "Statistical aggregates per group (SURVEY.md §2.4 A4): stddev, "
    "variance, correlation, covariance — single shuffle, all computed in "
    "one partial-aggregate pass.",
    oracle="""
      SELECT l_returnflag,
             round(stddev_samp(l_discount), 6)                    AS sd_disc,
             round(var_samp(l_quantity), 6)                       AS var_qty,
             round(corr(l_quantity, l_extendedprice), 6)          AS corr_qty_price,
             round(covar_samp(l_quantity, l_extendedprice), 4)    AS covar_qty_price
      FROM lineitem
      GROUP BY l_returnflag
    """,
)
def agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@register(
    "agg_exact_percentiles",
    "Exact percentiles (linear interpolation) per group (SURVEY.md §2.4 "
    "A4): Spark percentile ≙ DuckDB quantile_cont. The exact form needs "
    "a full sort per group; the 100 TB path swaps in percentile_approx "
    "(see agg_approx_distinct_and_percentile).",
    oracle="""
      SELECT o_orderstatus AS status,
             round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.75), 4) AS p75
      FROM orders
      GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "agg_approx_distinct_and_percentile",
    "Sketch aggregates — approx_count_distinct (HLL++) and "
    "percentile_approx — the 100 TB replacements for exact distinct/"
    "percentile. Rows-only: sketch results are engine-specific by design; "
    "tests pin them within rel-error of the exact values.",
    tags=("rows-only",),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.round(F.percentile_approx("o_totalprice", 0.5), 2).alias("approx_p50"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_pivot_status_by_segment",
    "Pivot (long→wide) aggregation: order counts per market segment "
    "pivoted on order status (SURVEY.md §2.4 A4). Expressed as "
    "conditional aggregation — identical plan shape to groupBy().pivot() "
    "with explicit values, and directly oracle-expressible.",
    oracle="""
      SELECT c.c_mktsegment AS segment,
             count(*) FILTER (o.o_orderstatus = 'F') AS n_f,
             count(*) FILTER (o.o_orderstatus = 'O') AS n_o,
             count(*) FILTER (o.o_orderstatus = 'P') AS n_p
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "segment",
            # pivot emits NULL for absent (segment, status) combos; the
            # oracle's count(*) FILTER emits 0 — pin 0 semantics
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


@register(
    "window_grouped_topk_orders",
    "Per-group top-k via rank window (SURVEY.md §2.5 W2 — the batched "
    "generalization of the reference's global top-k, the shape used when "
    "scoring many geocode requests in one job): top-3 orders per market "
    "segment. One shuffle on the group key; rank prune happens before "
    "any further join.",
    oracle="""
      SELECT segment, o_orderkey, o_totalprice, rn
      FROM (
        SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      ) WHERE rn <= 3
    """,
)
def window_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.topk import grouped_top_k

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("segment", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "subquery_scalar_above_nation_avg",
    "Correlated-aggregate comparison: customers with balance above their "
    "nation's average (SURVEY.md §2.3; decorrelated into a join against "
    "a pre-aggregated build side — the plan Catalyst produces for the "
    "correlated SQL form).",
    oracle="""
      SELECT c.c_custkey, c.c_nationkey
      FROM customer c
      WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg.withColumnRenamed("c_nationkey", "nk")),
               F.col("c_nationkey") == F.col("nk"))
        .where(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey")
    )


@register(
    "scalar_array_map_functions",
    "Array/map scalar family (SURVEY.md §2.8 F18): split → transform → "
    "filter → sort → join over the documents table, plus element access. "
    "Everything codegen'd via higher-order functions.",
    oracle="""
      SELECT doc_id,
             coalesce(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), x -> length(x) > 5))), ','), '')
               AS long_tokens,
             string_split(text, ' ')[1] AS first_token,
             len(string_split(text, ' ')) AS n_raw_tokens
      FROM documents WHERE doc_id < 50
    """,
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.array_distinct(F.filter(toks, lambda x: F.length(x) > 5))
            ),
            ",",
        ).alias("long_tokens"),
        toks.getItem(0).alias("first_token"),
        F.size(toks).cast("bigint").alias("n_raw_tokens"),
    )


@register(
    "scalar_haversine_proximity",
    "Haversine great-circle distance + linear proximity decay as pure "
    "Column math (reference ranking.py:19-28,92; SURVEY.md §2.8 F14/F15) "
    "— zero UDFs, whole-stage codegen. Coordinates synthesized "
    "deterministically from customer keys; distance to the reference's "
    "home region (KL) scored with the 25 km decay.",
    oracle="""
      SELECT c_custkey,
             round(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(((c_custkey % 120) - 60) - 3.139) / 2), 2)
               + cos(radians(3.139)) * cos(radians((c_custkey % 120) - 60))
                 * pow(sin(radians(((c_custkey % 240) - 120) - 101.6869) / 2), 2)
             )), 4) AS dist_km,
             round(greatest(0.0, 1.0 - least(
               2 * 6371.0088 * asin(sqrt(
                 pow(sin(radians(((c_custkey % 120) - 60) - 3.139) / 2), 2)
                 + cos(radians(3.139)) * cos(radians((c_custkey % 120) - 60))
                   * pow(sin(radians(((c_custkey % 240) - 120) - 101.6869) / 2), 2)
               )) / 25.0, 1.0)), 6) AS proximity
      FROM customer
    """,
)
def scalar_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 120 - 60).cast("double")
    lon = (F.col("c_custkey") % 240 - 120).cast("double")
    d = haversine_km(lat, lon, F.lit(3.139), F.lit(101.6869))
    return c.select(
        "c_custkey",
        F.round(d, 4).alias("dist_km"),
        F.round(proximity_decay(d, 25.0), 6).alias("proximity"),
    )


@register(
    "set_union_distinct",
    "UNION (distinct) — completes the set-op family (SURVEY.md §2.7 U2).",
    oracle="""
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "window_range_frame_moving_avg",
    "RANGE-frame window: 7-day moving order count and price extrema per "
    "priority, ordered by orderdate (SURVEY.md §2.5 W2 — value-range "
    "frames, distinct from the ROWS frame in window_rank_lag_running). "
    "Frame aggregates are order-insensitive (count/min/max) because "
    "DuckDB evaluates windowed sums with segment trees — a different FP "
    "summation order that flips rounded sums at the ULP.",
    oracle="""
      SELECT o_orderkey, o_orderpriority,
             count(*) OVER w AS n_7d,
             min(o_totalprice) OVER w AS min_price_7d,
             max(o_totalprice) OVER w AS max_price_7d
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # rangeBetween needs a numeric ordering expression: epoch seconds.
    # o_orderdate reads as TIMESTAMP_NTZ, which won't cast to long
    # directly — go through timestamp_ltz (session tz is UTC).
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_orderdate").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-604800, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.min("o_totalprice").over(w).alias("min_price_7d"),
        F.max("o_totalprice").over(w).alias("max_price_7d"),
    )
