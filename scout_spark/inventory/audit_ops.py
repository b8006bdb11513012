"""Round-4 audit additions: snapshot diffing (CDC between table
versions) and the running-distinct window workaround.

Registered last in load_all so rotation queues these behind the
never-checked backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

# Deterministic "v2" simulation of the orders table, derived from the
# same parquet on both engines: every 97th key gets a price bump
# (changed), every 101st is dropped (deleted), and a shifted tail of
# synthetic keys is appended (inserted). Additive arithmetic only (the
# repo's fixture rule: no decimal-midpoint division).
_CHANGED_MOD = 97
_DELETED_MOD = 101
_INSERT_COUNT = 500
_INSERT_OFFSET = 900_000_000


@register(
    "audit_snapshot_diff",
    "Snapshot diff between two table versions — the audit/CDC report "
    "behind every incremental-publish pipeline (which rows appeared, "
    "vanished, or changed since the last run): one full-outer join on "
    "the primary key, change classification from null-sides + value "
    "comparison, then a per-status rollup. At scale both sides are "
    "key-partitioned parquet so the join co-locates; the value "
    "comparison here is an explicit column equality — a production "
    "run hashes the struct of compared columns instead. v2 is "
    "simulated deterministically from the same snapshot on both "
    "engines (bumped price every 97th key, dropped every 101st, "
    "synthetic inserted tail).",
    oracle=f"""
      WITH v1 AS (
        SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
        FROM orders
      ),
      v2 AS (
        SELECT k,
               CASE WHEN k % {_CHANGED_MOD} = 0 THEN price + 1.0
                    ELSE price END AS price,
               st
        FROM v1 WHERE k % {_DELETED_MOD} <> 0
        UNION ALL
        SELECT {_INSERT_OFFSET} + range AS k, 100.0 + range AS price, 'N' AS st
        FROM range({_INSERT_COUNT})
      ),
      diff AS (
        SELECT
          CASE WHEN v1.k IS NULL THEN 'inserted'
               WHEN v2.k IS NULL THEN 'deleted'
               WHEN v1.price <> v2.price OR v1.st <> v2.st THEN 'changed'
               ELSE 'unchanged' END AS status,
          coalesce(v2.price, v1.price) AS price
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
      )
      SELECT status, count(*) AS n_rows,
             round(sum(CAST(price AS DECIMAL(18,2))), 2)::DOUBLE AS sum_price
      FROM diff GROUP BY status ORDER BY status
    """,
)
def audit_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    v1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("st"),
    )
    inserted = spark.range(_INSERT_COUNT).select(
        (F.lit(_INSERT_OFFSET) + F.col("id")).alias("k"),
        (F.lit(100.0) + F.col("id")).alias("price"),
        F.lit("N").alias("st"),
    )
    v2 = (
        v1.where(F.col("k") % _DELETED_MOD != 0)
        .select(
            "k",
            F.when(
                F.col("k") % _CHANGED_MOD == 0, F.col("price") + 1.0
            )
            .otherwise(F.col("price"))
            .alias("price"),
            "st",
        )
        .unionAll(inserted)
    )
    a = v1.alias("a")
    b = v2.alias("b")
    diff = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer").select(
        F.when(F.col("a.k").isNull(), "inserted")
        .when(F.col("b.k").isNull(), "deleted")
        .when(
            (F.col("a.price") != F.col("b.price"))
            | (F.col("a.st") != F.col("b.st")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(F.col("b.price"), F.col("a.price")).alias("price"),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("price").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("status")
    )


@register(
    "window_count_distinct_running",
    "Running COUNT(DISTINCT) over a window — an aggregate Spark does "
    "NOT support natively (DISTINCT window aggregates raise "
    "UNSUPPORTED_EXPR): the standard rewrite marks each key's FIRST "
    "occurrence per partition (row_number over (user, type) = 1) and "
    "running-sums the markers — same one-shuffle cost class, exact "
    "result. The oracle runs DuckDB's native count(DISTINCT ...) OVER, "
    "so the rewrite is verified against the real semantics.",
    oracle="""
      SELECT user_id, ts, event_id, event_type,
             count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS distinct_types_seen
      FROM events
    """,
)
def window_count_distinct_running(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return marked.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("first_seen").over(w_run).cast("bigint").alias(
            "distinct_types_seen"
        ),
    )
