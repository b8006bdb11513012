"""Round-5 last wave: cross-table reconciliation and HHI market
concentration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "audit_order_total_reconciliation",
    "Cross-table RECONCILIATION audit — does the order header's total "
    "equal the sum of its lines (the TPC-H invariant "
    "sum(extendedprice*(1+tax)*(1-discount)), and the first thing a "
    "warehouse closes its books on): per-order derived total in "
    "integer cents (each line's amount rounded to cents exactly once "
    "— the same once-per-line rounding a ledger applies, identical "
    "on both engines), full-outer joined against headers so "
    "LINELESS ORDERS and ORPHAN LINES are counted rather than "
    "silently dropped, then match/mismatch counts and the largest "
    "absolute discrepancy with its order key. 100 TB: one map-side-"
    "combinable per-order agg + one key join; the census agg is "
    "tiny.",
    oracle="""
      WITH derived AS (
        SELECT l_orderkey AS k,
               sum(round(l_extendedprice * (1 + l_tax) * (1 - l_discount)
                         * 100)::BIGINT)::BIGINT AS dcents
        FROM lineitem GROUP BY l_orderkey
      ),
      hdr AS (
        SELECT o_orderkey AS k,
               round(o_totalprice * 100)::BIGINT AS hcents
        FROM orders
      ),
      j AS (
        SELECT coalesce(h.k, d.k) AS k, h.hcents, d.dcents,
               CASE WHEN h.hcents IS NULL OR d.dcents IS NULL THEN NULL
                    ELSE abs(h.hcents - d.dcents) END AS adiff
        FROM hdr h FULL OUTER JOIN derived d ON h.k = d.k
      ),
      worst AS (
        SELECT k FROM j WHERE adiff IS NOT NULL
        ORDER BY adiff DESC, k LIMIT 1
      )
      SELECT count(*)::BIGINT AS n_orders,
             sum(CASE WHEN adiff = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_matching,
             sum(CASE WHEN adiff > 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_mismatched,
             sum(CASE WHEN dcents IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_lineless_orders,
             sum(CASE WHEN hcents IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_orphan_line_orders,
             coalesce(max(adiff), 0)::BIGINT AS max_abs_diff_cents,
             (SELECT k FROM worst)::BIGINT AS worst_order_key
      FROM j
    """,
)
def audit_order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    derived = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.expr(
            "sum(cast(round(l_extendedprice * (1 + l_tax)"
            " * (1 - l_discount) * 100) as bigint))"
        ).alias("dcents")
    )
    hdr = o.select(
        F.col("o_orderkey").alias("k"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("hcents"),
    )
    j = (
        hdr.join(derived, "k", "full_outer")
        .select(
            "k",
            "hcents",
            "dcents",
            F.when(
                F.col("hcents").isNull() | F.col("dcents").isNull(),
                F.lit(None).cast("long"),
            )
            .otherwise(F.abs(F.col("hcents") - F.col("dcents")))
            .alias("adiff"),
        )
        .persist()  # census agg + worst-offender argmax overlap
    )
    worst = (
        j.where(F.col("adiff").isNotNull())
        .orderBy(F.col("adiff").desc(), "k")
        .limit(1)
        .select(F.col("k").alias("wk"))
    )
    stats = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("adiff") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_matching"),
        F.sum(F.when(F.col("adiff") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.sum(F.when(F.col("dcents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lineless_orders"),
        F.sum(F.when(F.col("hcents").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphan_line_orders"),
        F.coalesce(F.max("adiff"), F.lit(0))
        .cast("long")
        .alias("max_abs_diff_cents"),
    )
    return stats.crossJoin(F.broadcast(worst)).select(
        "n_orders",
        "n_matching",
        "n_mismatched",
        "n_lineless_orders",
        "n_orphan_line_orders",
        "max_abs_diff_cents",
        F.col("wk").cast("long").alias("worst_order_key"),
    )


@register(
    "agg_hhi_market_concentration",
    "Herfindahl-Hirschman index per region — the antitrust-grade "
    "market-concentration number (sum of squared market shares, x "
    "10,000; the 1,500/2,500 DOJ thresholds): nation revenue within "
    "each region from exact integer cents, shares and HHI in doubles "
    "at the end, plus the effective number of competitors 1/sum(s^2) "
    "— the concentration family's structural complement to "
    "agg_gini_concentration's inequality and the Lorenz points. "
    "100 TB: one map-side-combinable (region, nation) agg; the HHI "
    "re-agg runs on a dimension-bounded frame.",
    oracle="""
      WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
      ),
      tot AS (
        SELECT region, sum(cents)::BIGINT AS rtotal FROM rev GROUP BY 1
      )
      SELECT rev.region,
             count(*)::BIGINT AS n_nations,
             round(sum((rev.cents::DOUBLE / tot.rtotal)
                       * (rev.cents::DOUBLE / tot.rtotal)) * 10000, 6)
               AS hhi,
             round(1.0 / sum((rev.cents::DOUBLE / tot.rtotal)
                             * (rev.cents::DOUBLE / tot.rtotal)), 6)
               AS effective_competitors
      FROM rev JOIN tot USING (region)
      GROUP BY rev.region
      ORDER BY rev.region
    """,
)
def agg_hhi_market_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o.o_custkey == c.c_custkey,
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint))"
            ).alias("cents")
        )
        .persist()  # dimension-bounded; feeds totals AND the HHI agg
    )
    tot = rev.groupBy("region").agg(F.sum("cents").alias("rtotal"))
    share = F.col("cents").cast("double") / F.col("rtotal")
    return (
        rev.join(F.broadcast(tot), "region")
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.round(F.sum(share * share) * 10000, 6).alias("hhi"),
            F.round(1.0 / F.sum(share * share), 6).alias(
                "effective_competitors"
            ),
        )
        .orderBy("region")
    )
