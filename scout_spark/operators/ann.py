"""Approximate nearest-neighbor search over embedding columns
(build-brief extension).

Two strategies:
  - ``brute_force_topk``: exact cosine scan — the correctness baseline.
    Broadcast query side, zip_with/aggregate dot products, distributed
    top-k. No shuffle; scales linearly with the table.
  - ``lsh_bucket_topk``: random-hyperplane LSH. Signatures are
    deterministic (hyperplane coefficients derived from (dim, plane)
    index arithmetic — reproducible across executors with no RNG state).
    At 100 TB the bucketed table is written partitioned by signature so a
    query probes one partition (partition pruning) instead of scanning.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scout_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    qvec_col: str = "qv",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` against a 1-row ``query``.

    Pass ``exclude_id`` when the query vector comes from the table
    itself, to match the self-excluding convention of ``ivf_topk`` /
    ``lsh_bucket_topk`` (otherwise the query row appears at rank 1 and
    recall@k comparisons are off by one)."""
    if exclude_id is not None:
        embeddings = embeddings.where(F.col(id_col) != exclude_id)
    return (
        embeddings.join(F.broadcast(query))
        .select(
            id_col,
            F.round(
                cosine_similarity(F.col(vec_col), F.col(qvec_col)), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def _plane_coef(dim_index: Column, plane: int) -> Column:
    """Deterministic pseudo-random coefficient in [-1, 1] for
    (dimension, plane) — the fract(sin(x)·C) construction; pure Column
    math, identical on every executor."""
    x = F.sin(dim_index.cast("double") * 12.9898 + F.lit(plane * 78.233)) * 43758.5453
    return (x - F.floor(x)) * 2.0 - 1.0


def hyperplane_signature(vec: Column, n_planes: int) -> Column:
    """LSH bucket id: integer of sign bits of projections onto
    ``n_planes`` deterministic hyperplanes."""
    # transform's optional second lambda parameter is the element index —
    # exactly the (value, dimension) pair the projection needs.
    def _projection(plane: int) -> Column:
        return F.aggregate(
            F.transform(vec, lambda x, i: x.cast("double") * _plane_coef(i, plane)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.lit(0)
    for p in range(n_planes):
        sig = sig + F.when(_projection(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids``: (centroid_id, cv). Broadcast-joined; argmin by cosine
    distance via one grouped max_by — at 100 TB this runs once at index
    build time and the assignment is written partitioned by centroid_id
    so queries prune to nprobe partitions.
    """
    scored = embeddings.join(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine_similarity(F.col(vec_col), F.col("cv")).alias("_sim"),
    )
    # argmax via max_by on (sim, -centroid_id) struct for deterministic ties
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.col("centroid_id"), F.struct(F.col("_sim"), -F.col("centroid_id"))
        ).alias("centroid_id")
    )
    return embeddings.join(best, id_col)


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse centroids: evenly strided sample by id rank.
    (A production index would run k-means; a strided sample is an
    unbiased, fully deterministic stand-in with the same plumbing.)"""
    from pyspark.sql.window import Window

    ranked = embeddings.select(
        id_col, vec_col, F.row_number().over(Window.orderBy(id_col)).alias("_rn")
    )
    total = embeddings.count()
    stride = max(total // n_centroids, 1)
    # deterministic: centroid_id derived from the ordered rank, and the
    # cap keeps ids strictly in [0, n_centroids) — an unordered limit()
    # here would pick an arbitrary subset per evaluation, and ivf_topk
    # instantiates this plan twice (assignment + probe), which must see
    # identical centroids.
    return ranked.select(
        ((F.col("_rn") - 1) / stride).cast("int").alias("centroid_id"),
        F.col(vec_col).alias("cv"),
        F.col("_rn"),
    ).where(
        ((F.col("_rn") - 1) % stride == 0)
        & (F.col("centroid_id") < n_centroids)
    ).drop("_rn")


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroids nearest the
    query, exact cosine within their cells only (candidate fraction ≈
    nprobe/n_centroids)."""
    cents = ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    assigned = ivf_assign(embeddings, cents, vec_col, id_col)
    q = embeddings.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    probe_cells = (
        cents.join(F.broadcast(q))
        .select(
            "centroid_id",
            cosine_similarity(F.col("cv"), F.col("qv")).alias("_sim"),
        )
        .orderBy(F.col("_sim").desc(), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "centroid_id")
        .where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine_similarity(F.col(vec_col), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    exact cosine re-ranks within the bucket. Expected candidate fraction
    ~ 2^-n_planes of the table."""
    sig = hyperplane_signature(F.col(vec_col), n_planes)
    bucketed = embeddings.select(id_col, vec_col, sig.alias("bucket"))
    q = bucketed.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.where(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            id_col,
            F.round(cosine_similarity(F.col(vec_col), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )
