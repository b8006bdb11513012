"""Scale-technique demonstrations as first-class inventory rows
(round 2). These operators exist for their PHYSICAL plan, not new
semantics — each is an identity rewrite whose result must equal the
naive formulation (which is exactly what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "join_salted_skew",
    "Salted skewed join (operators/skew.py::salted_join, build-brief "
    "skew mitigation): the fact side gets a deterministic 8-way salt, "
    "the dim side is exploded to all salts, and the join keys on "
    "(key, salt) so one hot key spreads over 8 reducers instead of "
    "stalling one. Semantics-preserving — the oracle is the PLAIN join; "
    "equality under disabled-broadcast SortMergeJoin is pinned in "
    "tests/test_operators.py.",
    oracle="""
      SELECT s.s_nationkey AS nationkey,
             round(sum(l.l_extendedprice), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        salted_join(li, sup, key="s_suppkey", salt=8)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
