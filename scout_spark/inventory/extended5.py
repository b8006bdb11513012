"""Fifth extension wave: recursive CTE (Spark 4 WITH RECURSIVE),
unpivot (wide→long reshape), multiset set operations (SURVEY.md §2.7 U2
ALL-variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "recursive_cte_month_series",
    "Recursive CTE (Spark 4.x WITH RECURSIVE): generate a month index "
    "series recursively, join each month to its order volume — the "
    "iterate-until-done SQL shape (series generation, hierarchies, "
    "transitive closure) that needed driver loops before Spark 4.",
    oracle="""
      WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
      )
      SELECT m AS month_num,
             count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS revenue
      FROM months
      LEFT JOIN orders ON CAST(extract(month FROM o_orderdate) AS INTEGER) = m
      GROUP BY m
    """,
)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT 1
          UNION ALL
          SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m AS month_num,
               count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2) AS revenue
        FROM months
        LEFT JOIN orders_rec ON month(o_orderdate) = m
        GROUP BY m
        """
    )


@register(
    "unpivot_lineitem_measures",
    "Unpivot (wide→long reshape): four lineitem measures melted into "
    "(key, measure, value) rows — the inverse of the pivot row. Spark "
    "df.unpivot keeps NULL values; the DuckDB oracle pins the same "
    "semantics with UNPIVOT INCLUDE NULLS (its default drops them).",
    oracle="""
      SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
      FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 100)
      UNPIVOT INCLUDE NULLS
        (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "raw_val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("raw_val", 2).alias("val"),
    )


@register(
    "set_except_all_multiset",
    "EXCEPT ALL — multiset difference preserving duplicate counts "
    "(SURVEY.md §2.7 U2): per-occurrence supplier keys of heavy lines "
    "minus those of discounted lines.",
    oracle="""
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 45).select("l_suppkey")
    b = li.where(F.col("l_discount") > 0.08).select("l_suppkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all_multiset",
    "INTERSECT ALL — multiset intersection (SURVEY.md §2.7 U2).",
    oracle="""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.intersectAll(b)


@register(
    "scalar_levenshtein_rank",
    "Edit-distance candidate ranking — the fuzzy-geocoding core family "
    "(reference ranking.py uses rapidfuzz WRatio; Levenshtein is its "
    "SQL-portable sibling both engines implement natively): distance "
    "from every customer name to a probe string, top 25 by (distance, "
    "name, key) with a fully deterministic tie-break. JVM levenshtein "
    "inside whole-stage codegen — the scan-side compute pattern of the "
    "flagship filter-then-verify query.",
    oracle="""
      SELECT c_custkey, c_name,
             levenshtein(lower(c_name), 'customer#000000999') AS dist
      FROM customer
      ORDER BY dist, c_name, c_custkey
      LIMIT 25
    """,
)
def scalar_levenshtein_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.levenshtein(
                F.lower(F.col("c_name")), F.lit("customer#000000999")
            ).alias("dist"),
        )
        .orderBy("dist", "c_name", "c_custkey")
        .limit(25)
    )


@register(
    "agg_histogram_width_bucket",
    "Equi-width histogram of order totals via width_bucket (oracle "
    "spells out the same edge arithmetic — DuckDB 1.0 lacks the "
    "function) — the "
    "profiling primitive behind every data-distribution dashboard. "
    "Bucket assignment is row-local; one map-side-combined agg on the "
    "bucket id. Identical bucket edges on both engines (integer bucket "
    "count over an explicit [0, 600000) range — no data-dependent "
    "min/max pass needed).",
    oracle="""
      SELECT CASE WHEN o_totalprice < 0 THEN 0
                  WHEN o_totalprice >= 600000 THEN 31
                  ELSE floor(o_totalprice / 20000)::BIGINT + 1 END AS bucket,
             count(*) AS n,
             round(min(o_totalprice), 2) AS lo,
             round(max(o_totalprice), 2) AS hi
      FROM orders
      GROUP BY 1
    """,
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(30)).alias(
                "bucket"
            ),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
