"""Second wave of classic TPC-H query shapes (SURVEY.md §2.3/§2.4
exercise rows): Q5 (local-supplier volume, the cycle join), Q8 (market
share — nested conditional ratio per year), Q9 (product profit by
nation/year; adapted — testdata has no partsupp, so supply cost is
proxied by ``p_retailprice``), Q13 (customer order-count distribution —
left join + double aggregation), Q17 (small-quantity revenue —
correlated per-part average), Q18 (large-volume customers — HAVING
subquery via semi-join).

Scale notes: every dimension (part, supplier, nation, region, customer
at small SF) is explicitly broadcast; only fact-fact lineitem⋈orders
shuffles, and each query has exactly one shuffle-agg after the joins.
Q17's correlated average is a per-part aggregate broadcast back against
the filtered part set — never a self-join of full lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "tpch_q5_local_supplier_volume",
    "TPC-H Q5 shape: revenue from orders where the customer and the "
    "supplier share a nation inside one region — the 6-table cycle join "
    "(customer⋈orders⋈lineitem⋈supplier with c_nationkey = s_nationkey).",
    oracle="""
      SELECT n.n_name AS nation,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_national_market_share",
    "TPC-H Q8 shape: one nation's share of regional revenue for one part "
    "type, per order year — conditional-sum ratio over a 7-table join "
    "(two roles of nation: customer-side region filter, supplier-side "
    "share attribution).",
    oracle="""
      SELECT CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             round(sum(CASE WHEN ns.n_name = 'NATION_3'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0.0 END)
                   / nullif(sum(l.l_extendedprice * (1 - l.l_discount)), 0), 6)
               AS mkt_share
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
      GROUP BY 1
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.try_divide(
                    F.sum(
                        F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                            0.0
                        )
                    ),
                    F.sum(rev),
                ),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    "TPC-H Q9 shape: profit by supplier nation and year for parts "
    "matching a name pattern. Adapted: testdata has no partsupp, so "
    "supply cost is proxied as 50% of p_retailprice per unit "
    "(profit = revenue − 0.5·p_retailprice·l_quantity). The signed sum "
    "cancels, so double summation-order ULPs can cross a 2dp rounding "
    "boundary — both sides therefore sum in exact DECIMAL (inputs are "
    "exact at 2dp / integral, so the decimal sum is order-insensitive) "
    "and only then round and cast to double.",
    oracle="""
      SELECT n.n_name AS nation,
             CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(round(sum(
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                 - CAST(0.5 AS DECIMAL(2,1))
                   * CAST(p.p_retailprice AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(9,0))
             ), 2) AS DOUBLE) AS profit
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
      GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    ) - F.lit(0.5).cast("decimal(2,1)") * F.col("p_retailprice").cast(
        "decimal(18,2)"
    ) * F.col("l_quantity").cast("decimal(9,0)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "tpch_q13_customer_order_distribution",
    "TPC-H Q13 shape: histogram of customers by order count — LEFT join "
    "with an extra join-side predicate (customers with zero qualifying "
    "orders must appear with c_count=0), then a second aggregation over "
    "the first. Adapted: the o_comment NOT LIKE filter becomes an "
    "order-priority exclusion (testdata has no o_comment).",
    oracle="""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
      )
      GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    "TPC-H Q17 shape: revenue from lineitems whose quantity is below "
    "20% of the per-part average — correlated scalar-average subquery, "
    "executed as a per-part aggregate broadcast back (never a self-join "
    "of full lineitem). Brand/size filter substitutes for the missing "
    "p_container column.",
    oracle="""
      SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
             count(*) AS n_lines
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#11' AND p.p_size <= 10
        AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
        )
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 10)
    )
    # Per-part average over ALL lineitems (the correlation target); the
    # part filter prunes it only after the agg, matching the subquery.
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    "TPC-H Q18 shape: customers with orders whose total quantity exceeds "
    "a threshold — HAVING subquery realized as an aggregated semi-join, "
    "then re-join and re-aggregate; deterministic top-100 "
    "(rounded-totalprice desc, orderkey tiebreak).",
    oracle="""
      SELECT c.c_name, c.c_custkey, o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
             round(o.o_totalprice, 2) AS totalprice,
             sum(l.l_quantity) AS total_qty
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
      )
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY totalprice DESC, o.o_orderkey
      LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )
