"""Third wave of classic TPC-H query shapes, adapted where the testdata
lacks a column (no partsupp / l_receiptdate / p_container / c_phone /
o_comment — see each docstring for the substitution):

- Q2  → min-unit-cost supplier per part (correlated MIN subquery), with
        lineitem standing in for partsupp.
- Q11 → important parts by shipped value vs a global-fraction threshold
        (HAVING against a scalar subquery), exact-DECIMAL on both sides.
- Q19 → disjunctive brand/size/quantity predicate join.
- Q20 → nested IN-subqueries (parts → qualifying suppliers → nation).
- Q21 → suppliers who were the sole faulty supplier on multi-supplier
        finished orders (EXISTS + NOT EXISTS with inequality
        correlation), with l_returnflag='R' standing in for
        receipt-after-commit lateness.
- Q22 → above-average-balance customers with no orders (anti join),
        grouped by nation (standing in for phone country code); the
        average threshold is compared in exact decimal cross-multiplied
        form (bal·cnt > total) so no engine ever divides.

Scale notes: each adapted subquery stays an aggregate + broadcast-back
(never a self-join of full lineitem); semi/anti joins carry only the
correlation keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "tpch_q2_min_cost_supplier",
    "TPC-H Q2 shape: for each part in a size/type band, the supplier(s) "
    "offering the minimum unit cost — correlated MIN subquery realized "
    "as a per-part aggregate joined back. Unit cost is emitted RAW (it "
    "is a single per-row division, bit-identical on both engines — "
    "rounding would only add boundary risk).",
    oracle="""
      WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
      ), best AS (
        SELECT l_partkey, min(unit_cost) AS best_cost FROM cost GROUP BY l_partkey
      )
      SELECT p.p_partkey, s.s_suppkey, s.s_name, c.unit_cost
      FROM cost c
      JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
      JOIN part p ON p.p_partkey = c.l_partkey
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'ECONOMY'
      ORDER BY p.p_partkey, s.s_suppkey
      LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "ECONOMY")
    )
    s = _t(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_key")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        cost.join(
            best,
            (cost.l_partkey == F.col("b_key"))
            & (cost.unit_cost == F.col("best_cost")),
        )
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_part_value",
    "TPC-H Q11 shape: parts whose shipped value from two nations' "
    "suppliers exceeds a fraction of the total — HAVING vs a scalar "
    "subquery over the same aggregate. Both sides sum in exact DECIMAL "
    "so the global threshold comparison is order-insensitive.",
    oracle="""
      WITH val AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l.l_partkey
      ), total AS (
        SELECT CAST(sum(value) AS DECIMAL(18,4)) AS t FROM val
      )
      SELECT v.l_partkey AS partkey,
             CAST(round(v.value, 2) AS DOUBLE) AS total_value
      FROM val v, total
      WHERE v.value > CAST(0.001 AS DECIMAL(4,3)) * total.t
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    value = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value"))
    )
    total = val.agg(F.sum("value").cast("decimal(18,4)").alias("t"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value") > F.lit(0.001).cast("decimal(4,3)") * F.col("t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value"), 2).cast("double").alias("total_value"),
        )
    )


@register(
    "tpch_q19_disjunctive_predicates",
    "TPC-H Q19 shape: revenue under a three-way OR of conjunctive "
    "brand/size/quantity bands — the classic disjunctive join predicate "
    "that Catalyst must keep partially pushable (the part-only "
    "conjuncts reach the part scan).",
    oracle="""
      SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             count(*) AS n_lines
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
             AND l.l_quantity BETWEEN 1 AND 11)
         OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
             AND l.l_quantity BETWEEN 10 AND 20)
         OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q20_excess_shippers",
    "TPC-H Q20 shape: suppliers in a nation set who shipped more than a "
    "quantity threshold of one part type in a year — two nested IN "
    "subqueries become a chain of semi-joins over an aggregate.",
    oracle="""
      SELECT s.s_suppkey, s.s_name
      FROM supplier s
      WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
      )
      AND s.s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    shippers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(shippers, s.s_suppkey == shippers.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21_sole_faulty_supplier",
    "TPC-H Q21 shape: suppliers in one nation who were the ONLY supplier "
    "with returned items on a multi-supplier finished order — EXISTS "
    "(another supplier on the order) + NOT EXISTS (another supplier "
    "also at fault), i.e. semi- then anti-join with an inequality "
    "correlation. l_returnflag='R' stands in for receipt-after-commit "
    "lateness (no l_receiptdate in testdata).",
    oracle="""
      SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o    ON o.o_orderkey = l1.l_orderkey
      JOIN nation n    ON s.s_nationkey = n.n_nationkey
      WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND n.n_name IN ('NATION_5', 'NATION_6')
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s.s_name
      ORDER BY numwait DESC, s.s_name
      LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_5", "NATION_6")
    )
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
        .alias("l3")
    )
    faulty = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("o2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("o3"))
            & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        faulty.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count_distinct(F.col("l1.l_orderkey")).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "tpch_q22_idle_rich_customers",
    "TPC-H Q22 shape: customers with above-average positive balance and "
    "no orders at all — scalar-average threshold + anti join, grouped "
    "by nation (standing in for the phone country code). The threshold "
    "compare is cross-multiplied in exact DECIMAL (bal·cnt > total) so "
    "neither engine divides — fully order-insensitive.",
    oracle="""
      WITH stats AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS total,
               CAST(count(*) AS DECIMAL(9,0)) AS cnt
        FROM customer WHERE c_acctbal > 0.0
      )
      SELECT n.n_name AS nation, count(*) AS numcust,
             CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS totacctbal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey, stats
      WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.cnt > stats.total
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      GROUP BY n.n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    stats = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(bal).cast("decimal(28,2)").alias("total"),
            F.count(F.lit(1)).cast("decimal(9,0)").alias("cnt"),
        )
    )
    return (
        c.join(F.broadcast(stats))
        .where(bal * F.col("cnt") > F.col("total"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal), 2).cast("double").alias("totacctbal"),
        )
    )
