"""Round-4 embedding analytics: per-dimension feature profile,
distributed PCA, and MMR diversified re-ranking.

Registered after graph_ops/series_ops in load_all so rotation queues
these behind the never-checked backlog in the driver window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.functions.vectors import cosine_similarity
from scout_spark.inventory import register
from scout_spark.inventory.core import _t
from scout_spark.inventory.vector_ops import QUERY_VEC_ID


@register(
    "embedding_dimension_profile",
    "Per-dimension feature profile of the embedding corpus (the sanity "
    "dashboard every vector pipeline runs before training an index: "
    "dead dimensions, scale drift, outlier coordinates): posexplode to "
    "(dim, value), one hash aggregate over 64 keys — map-side combine "
    "collapses the shuffle to 64 partial rows per task at any corpus "
    "size. Spark posexplode is 0-based; +1 aligns with the oracle's "
    "1-based generate_subscripts.",
    oracle="""
      WITH flat AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               unnest(embedding)::DOUBLE AS x
        FROM embeddings
      )
      SELECT dim, count(*) AS n,
             round(avg(x), 6) AS mean_x,
             round(var_samp(x), 6) AS var_x,
             round(min(x), 6) AS min_x,
             round(max(x), 6) AS max_x
      FROM flat GROUP BY dim ORDER BY dim
    """,
)
def embedding_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).alias("dim"), "x")
    return (
        flat.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("x"), 6).alias("mean_x"),
            F.round(F.var_samp("x"), 6).alias("var_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
        .orderBy("dim")
    )


@register(
    "embedding_pca_label_scatter",
    "Distributed PCA (operators/pca.py): one mapInPandas pass computes "
    "the (n, Σx, ΣxxT) sufficient statistics as bounded per-partition "
    "partials, the driver eigendecomposes the 64×64 covariance (O(d³), "
    "corpus-size independent), and the projection is a vectorized "
    "pandas-UDF matmul. Output: per-label count and mean/stddev of the "
    "top-2 principal components — if the labels are real clusters, "
    "they separate in PC space. Rows-only: eigensolver internals are "
    "engine-specific; ground truth vs a dense numpy PCA is pinned in "
    "tests/test_graph.py.",
    tags=("rows-only",),
)
def embedding_pca_label_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.pca import fit_pca, project

    e = _t(spark, sf_dir, "embeddings")
    mu, comps, ratio = fit_pca(e, "embedding", k=2)
    proj = project(e, mu, comps, "embedding")
    return (
        proj.select(
            "label",
            F.col("pc")[0].alias("pc1"),
            F.col("pc")[1].alias("pc2"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("pc1"), 4).alias("mean_pc1"),
            F.round(F.avg("pc2"), 4).alias("mean_pc2"),
            F.round(F.stddev_samp("pc1"), 4).alias("sd_pc1"),
            F.round(F.stddev_samp("pc2"), 4).alias("sd_pc2"),
        )
        .withColumn("explained_ratio_pc1", F.round(F.lit(float(ratio[0])), 4))
        .orderBy("label")
    )


@register(
    "rerank_mmr_diversified",
    "MMR diversified top-10 (Carbonell & Goldstein, SIGIR'98; "
    "operators/mmr.py): distributed relevance pass (joinless cosine "
    "scan + TakeOrderedAndProject top-50 candidate cut — the same "
    "1-job shape as ann_cosine_topk_bruteforce), then the inherently "
    "sequential greedy selection runs driver-side over the BOUNDED "
    "50-row pool (one numpy gram product). Rows-only: the greedy "
    "trace isn't SQL-expressible; ground truth vs an independent "
    "numpy reference is pinned in tests/test_graph.py.",
    tags=("rows-only",),
)
def rerank_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.mmr import mmr_select

    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    schema = "rank INT, vec_id LONG, relevance DOUBLE, mmr_score DOUBLE"
    if not qrows:
        return spark.createDataFrame([], schema)
    qv = qrows[0][0]
    pool = (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            cosine_similarity(F.col("embedding"), F.lit(qv)).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(50)
        .collect()  # bounded candidate pool (50 rows)
    )
    ids = np.array([r["vec_id"] for r in pool])
    vecs = np.array([r["v"] for r in pool])
    rel = np.array([r["rel"] for r in pool])
    picks = mmr_select(ids, vecs, rel, k=10, lam=0.7)
    rows = [
        (i + 1, int(vid), round(r, 6), round(s, 6))
        for i, (vid, r, s) in enumerate(picks)
    ]
    return spark.createDataFrame(rows, schema)


@register(
    "ann_pq_adc_topk",
    "Product-quantized ANN with asymmetric distance computation "
    "(Jégou et al., TPAMI 2011; operators/pq.py) — the billion-vector "
    "production recipe: m=8 subspace codebooks (k=16, trained on a "
    "bounded deterministic driver sample, the faiss practice), corpus "
    "stored as 8 uint8 codes (32x payload cut at d=64), query scored "
    "via one (m x k) lookup table — a joinless codes scan into "
    "TakeOrderedAndProject, no float vector touched at query time. "
    "Rows-only: codebook contents are engine-specific; recall@50>=0.8 "
    "of the float brute-force top-10 (the shortlist a float-rerank "
    "stage would verify) is pinned in tests/test_graph.py.",
    tags=("rows-only",),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.pq import encode_pq, pq_topk, train_codebooks

    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "vec_id long, adc_score double"
        )
    qv = np.array(qrows[0][0])
    books = train_codebooks(e, "embedding", m=8, k=16)
    codes = encode_pq(e, books, "embedding").select("vec_id", "code")
    return pq_topk(codes, qv, books, k_results=10, exclude_id=QUERY_VEC_ID)


@register(
    "ann_ivf_pq_topk",
    "IVF-PQ composite ANN (faiss IndexIVFPQ shape; operators/pq.py::"
    "ivf_pq_topk): coarse quantizer routes vectors to cells, corpus "
    "persists as m=8-byte PQ codes, the query probes nprobe=2 of 8 "
    "cells and ADC-scores only their codes — candidate-fraction and "
    "payload reductions COMPOSE (2/8 of the rows x 32x smaller each). "
    "Rows-only: codebooks and cell sample are engine-specific; "
    "recall and actual-pruning assertions are pinned in "
    "tests/test_graph.py.",
    tags=("rows-only",),
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.pq import ivf_pq_topk

    e = _t(spark, sf_dir, "embeddings")
    topk, _diag = ivf_pq_topk(e, QUERY_VEC_ID, k_results=10)
    return topk
