"""Third extension wave: outer-join family completeness (SURVEY.md §2.3
— left/full outer with NULL extension), date/time arithmetic family
(§2.8 F18), and conditional aggregation with FILTER.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "join_left_outer_customer_orders",
    "Left outer join + aggregation with NULL-extension semantics "
    "(SURVEY.md §2.3): every customer appears, order-less customers get "
    "zero counts — coalesce over the null-extended side.",
    oracle="""
      SELECT c.c_custkey,
             count(o.o_orderkey) AS n_big_orders,
             round(coalesce(sum(o.o_totalprice), 0.0), 2) AS big_spend
      FROM customer c
      LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "big_spend"
            ),
        )
    )


@register(
    "join_full_outer_users_customers",
    "Full outer join: event-user activity vs customer order activity on "
    "the shared id space — rows survive from BOTH unmatched sides "
    "(SURVEY.md §2.3).",
    oracle="""
      WITH u AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
           c AS (SELECT o_custkey, count(*) AS n_orders FROM orders
                 WHERE o_custkey <= 30 GROUP BY o_custkey)
      SELECT coalesce(u.user_id, c.o_custkey) AS id,
             coalesce(u.n_events, 0) AS n_events,
             coalesce(c.n_orders, 0) AS n_orders
      FROM u FULL OUTER JOIN c ON u.user_id = c.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 30)
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    c = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        u.join(c, u.user_id == c.o_custkey, "full_outer")
        .select(
            F.coalesce(F.col("user_id"), F.col("o_custkey")).alias("id"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "scalar_date_arithmetic",
    "Date/time arithmetic family (SURVEY.md §2.8 F18): extract parts, "
    "day difference, month shift, truncation — engine-portable forms "
    "(dayofweek numbering differs between engines, so ISO extract is "
    "used on both sides).",
    oracle="""
      SELECT o_orderkey,
             CAST(extract(year  FROM o_orderdate) AS INTEGER) AS y,
             CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
             CAST(extract(day   FROM o_orderdate) AS INTEGER) AS d,
             CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
               AS days_to_2002,
             strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start
      FROM orders WHERE o_orderkey < 200
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
        # string-format dates on both sides: pandas renders DATE columns
        # as midnight timestamps, which breaks value canonicalization
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
    )


@register(
    "scalar_map_functions",
    "Map construction + manipulation family (SURVEY.md §2.8 F12/F18 — "
    "the reference's tags MAP column semantics): map_from_entries over "
    "grouped counts, NULL-safe key lookup (try_element_at ≙ DuckDB "
    "map_extract[1], both NULL→default on missing), sorted key list, "
    "cardinality.",
    oracle="""
      WITH per AS (SELECT user_id, event_type, count(*) AS c
                   FROM events GROUP BY 1, 2),
      m AS (SELECT user_id, map_from_entries(list({'key': event_type, 'value': c}))
                     AS mp
            FROM per GROUP BY user_id)
      SELECT user_id,
             array_to_string(list_sort(map_keys(mp)), ',') AS types,
             coalesce(map_extract(mp, 'purchase')[1], 0) AS n_purchases,
             CAST(cardinality(mp) AS BIGINT) AS n_types
      FROM m
    """,
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col("event_type").alias("key"), F.col("c").alias("value"))
            )
        ).alias("mp")
    )
    return m.select(
        "user_id",
        F.array_join(F.array_sort(F.map_keys("mp")), ",").alias("types"),
        F.coalesce(F.try_element_at(F.col("mp"), F.lit("purchase")), F.lit(0)).alias(
            "n_purchases"
        ),
        F.size("mp").cast("bigint").alias("n_types"),
    )


@register(
    "udtf_python_table_function",
    "Python UDTF (SURVEY.md §2.9 X6 — Spark 3.5+ table function): "
    "expands each document into (doc_id, sentence_index, n_tokens) rows "
    "with per-row Python logic that a scalar UDF can't express "
    "(variable-arity output). Rows-only: Python UDTFs have no oracle "
    "equivalent; output shape pinned here by the deterministic split.",
    tags=("rows-only",),
)
def udtf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, chunk_index: int, n_tokens: int")
    class ChunkCounter:
        def eval(self, doc_id: int, text: str):
            toks = (text or "").split()
            for i in range(0, len(toks), 50):
                yield doc_id, i // 50, len(toks[i : i + 50])

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    d.select("doc_id", "text").createOrReplaceTempView("_udtf_in")
    spark.udtf.register("chunk_counter", ChunkCounter)
    return spark.sql(
        "SELECT c.* FROM _udtf_in, LATERAL chunk_counter(doc_id, text) c"
    )


@register(
    "udaf_grouped_pandas_weighted_avg",
    "Custom UDAF via pandas GROUPED_AGG (SURVEY.md §2.9 X6): "
    "quantity-weighted average price per return flag — Arrow ships each "
    "group's columns as numpy-backed Series, the kernel is vectorized. "
    "Oracle-checked: the same weighted average is SQL-expressible, so "
    "this row also validates the Arrow aggregation path bit-for-bit "
    "(rounded).",
    oracle="""
      SELECT l_returnflag,
             round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
      FROM lineitem
      GROUP BY l_returnflag
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


@register(
    "agg_filtered_conditional",
    "Conditional aggregation with FILTER clauses — multiple disjoint "
    "aggregates in one pass over one shuffle (SURVEY.md §2.4 A4).",
    oracle="""
      SELECT l_linestatus,
             count(*) FILTER (l_discount > 0.05)                 AS n_discounted,
             count(*) FILTER (l_tax = 0)                         AS n_taxfree,
             round(sum(l_extendedprice) FILTER (l_quantity > 25), 2) AS big_qty_price
      FROM lineitem
      GROUP BY l_linestatus
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
        F.round(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 2
        ).alias("big_qty_price"),
    )
