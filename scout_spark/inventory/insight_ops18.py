"""Round-5 final wave: Spearman rank correlation between per-source
metrics and churn/retention set algebra between periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "stats_spearman_by_source",
    "Spearman rank correlation between two PER-SOURCE metrics (mean "
    "doc length vs distinct-token ratio) — 'are my aggregate metrics "
    "monotonically related across segments', the robust complement "
    "to profile_numeric_correlations' Pearson: both metrics reduce "
    "to one exact value per source first (integer sums / rounded "
    "ratios), ranks are over the BOUNDED |sources| frame (20 rows at "
    "any corpus size — the dimension-window exemption), ties broken "
    "by source name identically on both engines, and rho = 1 - "
    "6*sum(d^2)/(n(n^2-1)) is exact integer arithmetic until the "
    "final division. 100 TB: two map-side-combinable per-source "
    "aggs; everything after runs on |sources| rows.",
    oracle="""
      WITH per AS (
        SELECT source,
               sum(n_chars)::BIGINT AS chars,
               count(*)::BIGINT AS docs,
               sum(len(list_distinct(regexp_extract_all(lower(text),
                                                        '[a-z0-9]+'))))
                 ::BIGINT AS dtoks,
               sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                 ::BIGINT AS toks
        FROM documents GROUP BY source
      ),
      m AS (
        SELECT source,
               round(chars::DOUBLE / docs, 6) AS mean_len,
               round(dtoks::DOUBLE / toks, 6) AS distinct_ratio
        FROM per WHERE toks > 0
      ),
      r AS (
        SELECT source,
               row_number() OVER (ORDER BY mean_len, source) AS r1,
               row_number() OVER (ORDER BY distinct_ratio, source) AS r2,
               count(*) OVER () AS n
        FROM m
      )
      SELECT max(n)::BIGINT AS n_sources,
             sum((r1 - r2) * (r1 - r2))::BIGINT AS sum_d2,
             round(1.0 - 6.0 * sum((r1 - r2) * (r1 - r2))
                   / (max(n)::DOUBLE * (max(n) * max(n) - 1)), 6)
               AS spearman_rho
      FROM r
    """,
)
def stats_spearman_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    per = d.select(
        "source",
        "n_chars",
        F.size(toks).alias("tk"),
        F.size(F.array_distinct(toks)).alias("dtk"),
    ).groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars"),
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("dtk").cast("long").alias("dtoks"),
        F.sum("tk").cast("long").alias("toks"),
    )
    m = per.where(F.col("toks") > 0).select(
        "source",
        F.round(F.col("chars").cast("double") / F.col("docs"), 6).alias(
            "mean_len"
        ),
        F.round(F.col("dtoks").cast("double") / F.col("toks"), 6).alias(
            "distinct_ratio"
        ),
    )
    # ranks over the |sources| dimension frame (20 rows at any scale)
    r = m.select(
        F.row_number().over(Window.orderBy("mean_len", "source")).alias("r1"),
        F.row_number()
        .over(Window.orderBy("distinct_ratio", "source"))
        .alias("r2"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    d2 = (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
    return r.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.sum(d2).cast("long").alias("sum_d2"),
        F.round(
            1.0
            - 6.0
            * F.sum(d2)
            / (
                F.max("n").cast("double")
                * (F.max("n") * F.max("n") - 1)
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "events_churn_retention_periods",
    "Churn / retention set algebra between two halves of the event "
    "horizon — 'who was active before the midpoint, after it, both, "
    "or only before (churned)': per-user period flags from one "
    "conditional agg (never two scans or a distinct-set self-join), "
    "then retained/churned/new counts and the churn/retention rates "
    "as exact integer ratios. The midpoint is the integer mean of "
    "the observed µs range (identical floor arithmetic both "
    "engines). 100 TB: ONE map-side-combinable groupBy(user) with "
    "bit-flag aggregation; the census is a second tiny agg.",
    oracle="""
      WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
      ),
      flags AS (
        SELECT user_id,
               max(CASE WHEN epoch_us(ts) < (lo + hi) // 2
                   THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN epoch_us(ts) >= (lo + hi) // 2
                   THEN 1 ELSE 0 END) AS p2
        FROM events, span
        GROUP BY user_id
      )
      SELECT count(*)::BIGINT AS n_users,
             sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)::BIGINT
               AS retained,
             sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)::BIGINT
               AS churned,
             sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)::BIGINT
               AS new_users,
             round(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                   ::DOUBLE / nullif(sum(p1), 0), 6) AS churn_rate,
             round(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)
                   ::DOUBLE / nullif(sum(p1), 0), 6) AS retention_rate
      FROM flags
    """,
)
def events_churn_retention_periods(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    mid = F.expr("(lo + hi) div 2")
    flags = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.unix_micros("ts") < mid, 1).otherwise(0)
            ).alias("p1"),
            F.max(
                F.when(F.unix_micros("ts") >= mid, 1).otherwise(0)
            ).alias("p2"),
        )
    )
    p1, p2 = F.col("p1"), F.col("p2")
    churn = F.sum(F.when((p1 == 1) & (p2 == 0), 1).otherwise(0))
    ret = F.sum(F.when((p1 == 1) & (p2 == 1), 1).otherwise(0))
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        ret.cast("long").alias("retained"),
        churn.cast("long").alias("churned"),
        F.sum(F.when((p1 == 0) & (p2 == 1), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.round(
            churn.cast("double") / F.nullif(F.sum(p1), F.lit(0)), 6
        ).alias("churn_rate"),
        F.round(
            ret.cast("double") / F.nullif(F.sum(p1), F.lit(0)), 6
        ).alias("retention_rate"),
    )
