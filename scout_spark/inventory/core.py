"""Core relational operator inventory (SURVEY.md §2.2-§2.8).

The reference has no joins, GROUP BY, windows, or set ops (SURVEY.md §2.3
J2-J4, §2.4 A4, §2.5 W2, §2.7 U2); these rows exercise the Spark
primitives those capabilities map to, on the driver's TPC-H-ish tables.
Aggregate doubles are rounded identically on both sides so the
order-insensitive value hash is stable against summation-order ULPs.
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.sources import load_table
from scout_spark.session import tune_for_engine


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_engine(spark)
    return load_table(spark, sf_dir, name)


def _th(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` + ``widen_if_narrow`` — for PER-ROW-HEAVY kernels (pandas
    UDF signatures, JSON parsing, wide scoring expression trees) whose
    cost is row compute, not scan/shuffle. Single-row-group bench files
    arrive as ONE input partition and would serialize the kernel on one
    core; a 100 TB scan has thousands of splits and passes through
    untouched (the gate is the actual partition count)."""
    from scout_spark.sources.tables import widen_if_narrow

    return widen_if_narrow(_t(spark, sf_dir, name))


# ---------------------------------------------------------------- A4: groupBy/agg
@register(
    "agg_pricing_summary",
    "TPC-H Q1-shaped hash aggregate with partial (map-side) combine "
    "(SURVEY.md §2.4 A4). groupBy keys are low-cardinality → the shuffle "
    "moves only 6 partial rows per map task at any scale.",
    oracle="""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                                 AS sum_qty,
             round(sum(l_extendedprice), 2)                            AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2)         AS sum_disc_price,
             round(avg(l_quantity), 6)                                 AS avg_qty,
             round(avg(l_extendedprice), 6)                            AS avg_price,
             round(avg(l_discount), 6)                                 AS avg_disc,
             count(*)                                                  AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------- J2: multi-way equi join
@register(
    "join_revenue_by_nation",
    "TPC-H Q5-shaped 5-way equi join + agg (SURVEY.md §2.3 J2). region/"
    "nation are broadcast by Catalyst (tiny dims); the orders⋈lineitem "
    "shuffle keys on orderkey — co-partitioned at scale by bucketing both "
    "on orderkey.",
    oracle="""
      SELECT n.n_name AS nation,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name IN ('ASIA', 'EUROPE') AND o.o_orderstatus = 'F'
      GROUP BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------- J3: semi / anti joins
@register(
    "join_semi_customers_with_orders",
    "Left-semi join: customers having ≥1 open order (SURVEY.md §2.3 J3). "
    "Semi join never duplicates the probe side and shuffles only the key.",
    oracle="""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_big_orders",
    "Left-anti join: customers with no order above 400k (SURVEY.md §2.3 "
    "J3). The filter keeps the result non-empty so the check is "
    "non-vacuous at every scale factor.",
    oracle="""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------- J1: broadcast range join
@register(
    "join_broadcast_range",
    "Broadcast range (theta) join — the Spark restatement of the "
    "reference's procedural bbox semi-join (reference repo.py:16-45 feeding "
    "repo.py:57-61; SURVEY.md §2.3 J1): a 1-row aggregate build side "
    "restricts the big probe side via BETWEEN. Build side is broadcast → "
    "BroadcastNestedLoopJoin, no shuffle of lineitem.",
    oracle="""
      SELECT l.l_returnflag,
             count(*)                          AS n_items,
             round(sum(l.l_extendedprice), 2)  AS sum_price
      FROM lineitem l
      CROSS JOIN (SELECT round(avg(o_totalprice) * 0.001, 2) AS lo,
                         round(avg(o_totalprice) * 0.010, 2) AS hi
                  FROM orders WHERE o_orderstatus = 'F') b
      WHERE l.l_extendedprice BETWEEN b.lo AND b.hi
      GROUP BY l.l_returnflag
    """,
)
def join_broadcast_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bounds = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .agg(
            F.round(F.avg("o_totalprice") * 0.001, 2).alias("lo"),
            F.round(F.avg("o_totalprice") * 0.010, 2).alias("hi"),
        )
    )
    return (
        li.join(
            F.broadcast(bounds),
            F.col("l_extendedprice").between(F.col("lo"), F.col("hi")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------- A1: argmax per group
@register(
    "agg_argmax_top_customer_per_nation",
    "Per-group argmax via rank-1 window — the grouped generalization of "
    "the reference's largest-area-wins top-1 (reference repo.py:28-31; "
    "SURVEY.md §2.4 A1). Deterministic tie-break on custkey.",
    oracle="""
      SELECT n_name AS nation, c_custkey, c_name, c_acctbal
      FROM (
        SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal,
               row_number() OVER (PARTITION BY n.n_name
                                  ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      ) WHERE rn = 1
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------- A4: rollup / cube / distinct
@register(
    "agg_rollup_region_nation",
    "ROLLUP over (region, nation) with count + sum (SURVEY.md §2.4 A4). "
    "Spark expands grouping sets before the shuffle — partial aggregation "
    "still applies.",
    oracle="""
      SELECT r.r_name AS region, n.n_name AS nation,
             count(*) AS n_customers,
             round(sum(c.c_acctbal), 2) AS total_acctbal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "agg_cube_status_priority",
    "CUBE over (orderstatus, orderpriority) (SURVEY.md §2.4 A4).",
    oracle="""
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "agg_count_distinct",
    "Exact distinct aggregate per group (SURVEY.md §2.4 A4): distinct "
    "customers and order days per market segment via orders⋈customer.",
    oracle="""
      SELECT c.c_mktsegment AS segment,
             count(DISTINCT o.o_custkey)  AS n_customers,
             count(DISTINCT o.o_orderdate) AS n_order_days,
             count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderdate").alias("n_order_days"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------- W1/W2: windows
@register(
    "window_rank_lag_running",
    "Ranking + analytic + frame window functions in one pass over a single "
    "shuffle-by-custkey (SURVEY.md §2.5 W2): rank of each order within its "
    "customer, previous order's price (lag), and running spend "
    "(rows-frame sum). Fully deterministic ordering incl. orderkey.",
    oracle="""
      SELECT o_orderkey, o_custkey,
             rank()       OVER w AS rnk,
             round(coalesce(lag(o_totalprice) OVER w, 0.0), 2) AS prev_price,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND CURRENT ROW), 2)
                 AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_price"
        ),
        F.round(F.sum("o_totalprice").over(wf), 2).alias("running_spend"),
    )


@register(
    "window_global_row_number",
    "ROW_NUMBER over a global order — the reference synthesizes surrogate "
    "ids this way (reference scripts/build_gazetteer.py:42; SURVEY.md §2.5 "
    "W1). Single-partition window: acceptable for build-time id synthesis "
    "only; prefer monotonically_increasing_id when density isn't required.",
    oracle="""
      SELECT row_number() OVER (ORDER BY s_suppkey) AS rid, s_suppkey, s_name
      FROM supplier
    """,
)
def window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        F.row_number().over(Window.orderBy("s_suppkey")).alias("rid"),
        "s_suppkey",
        "s_name",
    )


# ---------------------------------------------------------------- T2: top-k
@register(
    "topk_orders_by_price",
    "Global top-k with deterministic tie-break → TakeOrderedAndProject "
    "(distributed per-partition top-k + driver merge; SURVEY.md §2.6 T2). "
    "Strictly better than the reference's full Python sort "
    "(reference ranking.py:113-114).",
    oracle="""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------- U1/U2: set operations
@register(
    "set_union_all",
    "UNION ALL of two filtered scans (SURVEY.md §2.7 U1 — reference builds "
    "its meta payload this way, build_gazetteer.py:91-99).",
    oracle="""
      SELECT c_custkey AS custkey, 'building' AS src
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey AS custkey, 'rich' AS src
      FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("building").alias("src")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey"), F.lit("rich").alias("src")
    )
    return a.unionAll(b)


@register(
    "set_intersect",
    "INTERSECT (distinct) of two key sets (SURVEY.md §2.7 U2).",
    oracle="""
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 1000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = o.where(F.col("o_totalprice") > 1000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    "EXCEPT (distinct) — customers minus those with any 'F' order "
    "(SURVEY.md §2.7 U2).",
    oracle="""
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # subtract() IS EXCEPT DISTINCT (exceptAll().distinct() is not: for
    # left multiset [x,x] minus [x] it wrongly keeps x)
    return c.select(F.col("c_custkey").alias("custkey")).subtract(
        o.where(F.col("o_orderstatus") == "F").select(
            F.col("o_custkey").alias("custkey")
        )
    )


# ---------------------------------------------------------------- P6/F13: token containment filter
@register(
    "filter_token_like",
    "Dynamic token containment predicate — AND over tokens of OR over "
    "columns of LIKE '%tok%' (reference repo.py:5-13; SURVEY.md §2.2 P6). "
    "Filter is codegen'd and pushed against the parquet scan as a "
    "StringContains.",
    oracle="""
      SELECT doc_id, lang, n_chars
      FROM documents
      WHERE (text LIKE '%spark%' OR source LIKE '%spark%')
        AND (text LIKE '%merge%' OR source LIKE '%merge%')
    """,
)
def filter_token_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tokens, cols = ["spark", "merge"], ["text", "source"]
    pred = reduce(
        and_,
        [reduce(or_, [F.col(c).contains(t) for c in cols]) for t in tokens],
    )
    return d.where(pred).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------- P7: range predicates
@register(
    "filter_range_between",
    "Conjunctive range predicate — the bbox BETWEEN shape "
    "(reference repo.py:57-61; SURVEY.md §2.2 P7). Both bounds reach the "
    "scan as pushed filters + row-group min/max skipping.",
    oracle="""
      SELECT event_id, user_id, value
      FROM events
      WHERE value BETWEEN 50.0 AND 150.0
        AND ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-20'
    """,
)
def filter_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.where(
        F.col("value").between(50.0, 150.0)
        & F.col("ts").between(
            F.lit("2024-01-05").cast("timestamp"),
            F.lit("2024-01-20").cast("timestamp"),
        )
    ).select("event_id", "user_id", "value")


# ---------------------------------------------------------------- P1/F5-F11: projection + scalar funcs
@register(
    "project_scalar_functions",
    "Wide projection with computed columns (reference "
    "sql/migrations/001_pois.sql:16-46; SURVEY.md §2.2 P1): CASE-WHEN kind "
    "derivation + '||' concat (F7/F8), COALESCE/NULLIF (F5/F6), TRY_CAST "
    "(F10), LEAST saturation (F9) — all codegen'd, zero UDFs.",
    oracle="""
      SELECT p_partkey,
             lower(p_name) AS name_lower,
             CASE
               WHEN p_type = 'PROMO'   THEN 'promo:'   || p_brand
               WHEN p_type = 'ECONOMY' THEN 'economy:' || p_brand
               ELSE 'other'
             END AS kind,
             coalesce(nullif(p_type, 'STANDARD'), 'std') AS type_or_std,
             try_cast(substr(p_brand, 7, 2) AS INTEGER) AS brand_num,
             least(1.0, round(p_retailprice / 2000.0, 6)
                        + CASE WHEN p_size > 25 THEN 0.25 ELSE 0.0 END)
               AS importance
      FROM part
    """,
)
def project_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.when(F.col("p_type") == "PROMO", F.concat(F.lit("promo:"), F.col("p_brand")))
        .when(
            F.col("p_type") == "ECONOMY",
            F.concat(F.lit("economy:"), F.col("p_brand")),
        )
        .otherwise("other")
        .alias("kind"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("STANDARD")), F.lit("std")).alias(
            "type_or_std"
        ),
        F.substring("p_brand", 7, 2).try_cast("int").alias("brand_num"),
        F.least(
            F.lit(1.0),
            F.round(F.col("p_retailprice") / 2000.0, 6)
            + F.when(F.col("p_size") > 25, 0.25).otherwise(0.0),
        ).alias("importance"),
    )


# ---------------------------------------------------------------- F18: date + JSON scalar families
@register(
    "scalar_date_trunc_monthly",
    "date_trunc monthly revenue rollup (SURVEY.md §2.8 F18).",
    oracle="""
      SELECT date_trunc('month', o_orderdate) AS month,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders
      GROUP BY 1
    """,
)
def scalar_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "scalar_json_extract",
    "JSON field extraction from the events.props payload (SURVEY.md §2.8 "
    "F18): get_json_object ≙ DuckDB json_extract_string; aggregated so the "
    "extraction runs over every row.",
    oracle="""
      SELECT event_type,
             round(avg(try_cast(json_extract_string(props, '$.k') AS INTEGER)), 6)
               AS avg_k,
             count(*) AS n
      FROM events
      GROUP BY event_type
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _th(spark, sf_dir, "events")  # Jackson parse per row — widen
    k = F.get_json_object("props", "$.k").try_cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.count(F.lit(1)).alias("n")
    )
