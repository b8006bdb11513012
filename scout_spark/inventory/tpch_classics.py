"""Classic TPC-H query shapes beyond Q1/Q3/Q5 (SURVEY.md §2.3/§2.4
exercise rows): Q4 (EXISTS semi-join + count), Q6 (pure filter-scan
revenue forecast — the simplest scan-bound query, a pushdown benchmark),
Q12 (join + two-way conditional agg), Q14 (conditional revenue ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "tpch_q4_order_priority",
    "TPC-H Q4 shape: orders with ≥1 late lineitem (EXISTS → left-semi "
    "join), counted per priority.",
    oracle="""
      SELECT o_orderpriority AS priority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q6_forecast_revenue",
    "TPC-H Q6 shape: pure filter + scalar aggregate — every predicate "
    "reaches the parquet scan (PushedFilters), zero joins, one shuffle "
    "of a single partial row. The canonical scan-bound benchmark query.",
    oracle="""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 25
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q12_shipmode_priority",
    "TPC-H Q12 shape: lineitem⋈orders with two-way conditional counts "
    "(high/low priority split) per return flag — join + CASE aggregation "
    "in one pass.",
    oracle="""
      SELECT l.l_returnflag,
             sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS high_line_count,
             sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS low_line_count
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue_ratio",
    "TPC-H Q14 shape: join + conditional-revenue ratio (promo share of "
    "total) — two aggregates over one pass, division guarded on both "
    "sides (try_divide ≙ nullif divisor).",
    oracle="""
      SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                    THEN l.l_extendedprice * (1 - l.l_discount)
                                    ELSE 0.0 END)
                   / nullif(sum(l.l_extendedprice * (1 - l.l_discount)), 0), 4)
               AS promo_revenue_pct,
             count(*) AS n_lines
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
        AND l.l_shipdate <  TIMESTAMP '1997-08-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-08-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.try_divide(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)),
                F.sum(rev),
            ),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )
