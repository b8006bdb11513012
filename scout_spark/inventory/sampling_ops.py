"""Deterministic sampling / splitting operators for training-data
pipelines, plus TPC-H Q16 (the last of the 22 classic shapes).

Random `TABLESAMPLE` / `df.sample()` is not reproducible across engines
(different PRNGs), so every operator here derives its "randomness" from
a Knuth multiplicative hash of the row key — pure int64 arithmetic that
DuckDB and Spark evaluate bit-identically. At 100 TB this matters
beyond testability: deterministic key-hash sampling is restartable,
auditable (a row's split never changes run-to-run), needs no shuffle
(row-local predicate), and composes with incremental ingest (new rows
hash into strata without resampling old ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

# Knuth's multiplicative constant; doc_id*KNUTH stays well inside int64
# for the testdata id range, and both engines wrap/compare identically.
_KNUTH = 2654435761


@register(
    "tpch_q16_supplier_diversity",
    "TPC-H Q16 shape: distinct-supplier counts per part attribute "
    "triple, with an exclusion predicate — COUNT(DISTINCT) after a "
    "fact⋈dim join (lineitem stands in for partsupp).",
    oracle="""
      SELECT p.p_brand, p.p_type, p.p_size,
             count(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      WHERE p.p_brand <> 'Brand#10' AND p.p_size IN (1, 5, 10, 15, 20)
      GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#10")
        & F.col("p_size").isin(1, 5, 10, 15, 20)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "sample_stratified_deterministic",
    "Stratified deterministic downsample of documents: per-language "
    "keep-rates (percent out of 100) applied via a Knuth-hash bucket of "
    "doc_id — a row-local predicate (no shuffle, fully pushable), "
    "reproducible across engines and incremental loads. Returns "
    "per-stratum kept counts for verification.",
    oracle=f"""
      SELECT lang, count(*) AS kept,
             round(avg(n_chars), 6) AS avg_chars
      FROM (
        SELECT lang, n_chars,
               (doc_id * {_KNUTH}) % 100 AS bucket
        FROM documents
      )
      WHERE bucket < (CASE WHEN lang = 'en' THEN 10
                           WHEN lang = 'de' THEN 25
                           ELSE 50 END)
      GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % 100
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "de", 25)
        .otherwise(50)
    )
    return (
        d.where(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


@register(
    "sample_train_test_split",
    "Deterministic train/val/test split (80/10/10) of documents by "
    "Knuth-hash bucket of doc_id — every row's split assignment is a "
    "pure function of its key (stable under reruns, appends, and "
    "repartitioning; no shuffle to assign). Emits per-split per-source "
    "counts, the shape a dataset card reports.",
    oracle=f"""
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
             source, count(*) AS n_docs
      FROM (SELECT source, (doc_id * {_KNUTH}) % 100 AS bucket
            FROM documents)
      GROUP BY 1, 2
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split"), F.col("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "sample_k_per_group",
    "Deterministic k-per-stratum sample: rank rows inside each "
    "(lang, source) stratum by Knuth-hashed key and keep the first 3 — "
    "the reproducible analogue of reservoir sampling (one shuffle on "
    "the stratum key; rank tie-broken by doc_id so output is unique).",
    oracle=f"""
      SELECT lang, source, doc_id, n_chars
      FROM (
        SELECT lang, source, doc_id, n_chars,
               row_number() OVER (
                 PARTITION BY lang, source
                 ORDER BY (doc_id * {_KNUTH}) % 1000000007, doc_id
               ) AS rk
        FROM documents
      )
      WHERE rk <= 3
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    key = (F.col("doc_id") * F.lit(_KNUTH)) % 1000000007
    w = Window.partitionBy("lang", "source").orderBy(key, F.col("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("lang", "source", "doc_id", "n_chars")
    )
