"""Fourth extension wave: distribution-analytic window functions,
ordered string aggregation, regex predicate family (SURVEY.md §2.5 W2,
§2.4 A4, §2.8 F13/F18 completions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "window_distribution_analytics",
    "Distribution analytics in one window pass (SURVEY.md §2.5 W2): "
    "ntile quartiles, percent_rank, cume_dist over account balance per "
    "nation — deterministic total order (balance, custkey).",
    oracle="""
      SELECT c_custkey, c_nationkey,
             ntile(4)       OVER w AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist()    OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    # pct_rank/cume are k/n rationals from identical integers — the raw
    # doubles are bit-identical across engines, while ROUNDING them hits
    # exact .5 boundaries (power-of-two group sizes) where Spark
    # (half-up) and DuckDB disagree. Compare unrounded.
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_first_last_nth",
    "first_value / last_value / nth_value with an explicit full-partition "
    "frame (SURVEY.md §2.5 W2) — cheapest/priciest/second order per "
    "customer attached to every row.",
    oracle="""
      SELECT o_orderkey, o_custkey,
             first_value(o_totalprice) OVER w AS cheapest,
             last_value(o_totalprice)  OVER w AS priciest,
             nth_value(o_totalprice, 2) OVER w AS second_cheapest
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


@register(
    "agg_ordered_string_digest",
    "Ordered string aggregation (SURVEY.md §2.4 A4): sorted region-name "
    "digest per region of nations — collect_list → array_sort → join, "
    "deterministic regardless of shuffle order (DuckDB: list_sort(list)).",
    oracle="""
      SELECT r.r_name AS region,
             array_to_string(list_sort(list(n.n_name)), '|') AS nations,
             count(*) AS n_nations
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name
    """,
)
def agg_string_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "grouped_map_apply_in_pandas_zscore",
    "Grouped-map applyInPandas (SURVEY.md §2.9 X6): per-customer z-score "
    "of order prices — each group's rows arrive as one Arrow-backed "
    "pandas DataFrame, the kernel is vectorized numpy. Oracle-checked "
    "against the SQL window formulation, proving the grouped-map path "
    "produces exactly what the declarative plan does. Scale note: "
    "grouped-map costs one Python invocation per key (measured ~3 ms/key here), so "
    "for tiny per-customer groups the declarative window (the oracle) "
    "IS the production plan; the entry pins the API surface on a "
    "deterministic o_custkey%32 slice to keep the invocation count — "
    "not the kernel work — from dominating.",
    oracle="""
      SELECT o_orderkey, o_custkey,
             round((o_totalprice - avg(o_totalprice) OVER w)
                   / stddev_samp(o_totalprice) OVER w, 6) AS price_z
      FROM orders
      WHERE o_custkey % 32 = 0
      WINDOW w AS (PARTITION BY o_custkey)
      QUALIFY stddev_samp(o_totalprice) OVER w > 0
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["o_totalprice"].std(ddof=1)
        if not sd or sd != sd:  # single-row group or zero variance
            return pdf.iloc[0:0][["o_orderkey", "o_custkey"]].assign(price_z=[])
        mean = pdf["o_totalprice"].mean()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "price_z": ((pdf["o_totalprice"] - mean) / sd).round(6),
            }
        )

    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 32 == 0)
    return o.groupBy("o_custkey").applyInPandas(
        zscore, "o_orderkey long, o_custkey long, price_z double"
    )


@register(
    "filter_regex_predicates",
    "Regex predicate family (SURVEY.md §2.8 F13/F18): rlike filter, "
    "regexp_count, capture extraction — anchored and class patterns "
    "portable between Java regex and RE2.",
    oracle="""
      SELECT p_partkey, p_name,
             CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
             regexp_extract(p_type, '^(ECONOMY|PROMO)', 1) AS type_class
      FROM part
      WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+')
        AND p_type SIMILAR TO '(ECONOMY|PROMO).*'
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_name").rlike("^[a-z]+ [a-z]+")
            & F.col("p_type").rlike("^(ECONOMY|PROMO).*$")
        )
        .select(
            "p_partkey",
            "p_name",
            F.regexp_count(F.col("p_name"), F.lit("a")).cast("bigint").alias("n_a"),
            F.regexp_extract("p_type", "^(ECONOMY|PROMO)", 1).alias("type_class"),
        )
    )
