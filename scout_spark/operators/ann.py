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

import pandas as pd
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


def _centroid_matrix(centroids: DataFrame, cv_col: str = "cv"):
    """Collect the (tiny, n_centroids-row) centroid table into a numpy
    matrix — the procedural-resolve shape (reference repo.py:16-45:
    collect a tiny build side, use it as literals/closure) that keeps
    the big-table pass free of joins entirely."""
    import numpy as np

    rows = centroids.orderBy("centroid_id").collect()
    ids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    mat = np.array([r[cv_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms[:, None]


def _sample_centroid_arrays(
    embeddings: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """One TakeOrderedAndProject job → (dense ids, unit-norm matrix)
    driver-side. Shared by ivf_centroids (which persists it as a table)
    and ivf_topk (which uses the arrays directly, skipping a
    createDataFrame→collect round-trip)."""
    import numpy as np

    rows = (
        embeddings.select(
            id_col, vec_col, F.xxhash64(F.col(id_col)).alias("_hk")
        )
        .orderBy("_hk", id_col)
        .limit(n_centroids)
        .collect()
    )
    ids = np.arange(len(rows), dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms[:, None]


def _assign_udf(cent_ids, cent_unit):
    """Arrow-batched nearest-centroid assignment: one matmul per batch
    (batch×dim @ dim×n_centroids), argmax per row. Ties go to the lowest
    centroid index (np.argmax first-occurrence) — deterministic."""
    import numpy as np

    @F.pandas_udf("long")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        sims = (x / xn[:, None]) @ cent_unit.T
        return pd.Series(cent_ids[np.argmax(sims, axis=1)])

    return _assign


def _cosine_to_query_udf(qv):
    """Arrow-batched cosine against one fixed query vector (closure
    broadcast — no join). Rounded at the call site."""
    import numpy as np

    q = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / qn if qn > 0 else q

    @F.pandas_udf("double")
    def _cos(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        return pd.Series((x / xn[:, None]) @ qu)

    return _cos


def _assign_and_cosine_udf(cent_ids, cent_unit, qv):
    """Fused assignment + query-cosine in ONE Arrow eval (one Python
    crossing per batch instead of two): struct<centroid_id, cos_sim>."""
    import numpy as np

    q = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(q)
    qu = q / qn if qn > 0 else q

    @F.pandas_udf("struct<centroid_id: long, cos_sim: double>")
    def _fused(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        xu = x / xn[:, None]
        return pd.DataFrame(
            {
                "centroid_id": cent_ids[np.argmax(xu @ cent_unit.T, axis=1)],
                "cos_sim": xu @ qu,
            }
        )

    # the struct output is referenced by BOTH the probe filter and the
    # score projection; the optimizer inlines a deterministic UDF into
    # each reference, running the kernel twice over the corpus (r7 plan
    # audit). asNondeterministic() forbids the duplication — the
    # function is pure, the marker is purely an optimizer fence, and
    # the probe filter must sit above the assignment anyway.
    return _fused.asNondeterministic()


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids``: (centroid_id, cv) — tiny by construction; collected
    into the UDF closure so the assignment is a single joinless,
    shuffle-free scan (one numpy matmul per Arrow batch). At 100 TB this
    runs once at index build time and the assignment is written
    partitioned by centroid_id so queries prune to nprobe partitions.
    """
    ids, unit = _centroid_matrix(centroids)
    return embeddings.select(
        id_col, vec_col, _assign_udf(ids, unit)(F.col(vec_col)).alias("centroid_id")
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` vectors with
    the smallest ``xxhash64(id)`` — a uniform, fully deterministic
    pseudo-random sample. (A production index would run k-means; this is
    the unbiased stand-in with the same plumbing.)

    Physical shape: TakeOrderedAndProject (per-partition partial top-k,
    merge on the driver) — no global sort, no full-table count() action,
    no window (the round-1 formulation's single-partition row_number and
    driver count are gone).
    """
    rows = (
        embeddings.select(
            id_col, vec_col, F.xxhash64(F.col(id_col)).alias("_hk")
        )
        .orderBy("_hk", id_col)
        .limit(n_centroids)
        .collect()
    )
    # the n_centroids rows round-trip the driver to get dense ids 0..n-1
    # — a window over the post-limit rows would hit the single-partition
    # WindowExec path; materializing the tiny sample avoids it and makes
    # centroid identity trivially stable across the plans that reuse it.
    return embeddings.sparkSession.createDataFrame(
        [(i, list(r[vec_col])) for i, r in enumerate(rows)],
        schema="centroid_id int, cv array<double>",
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_matrix=None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroids nearest the
    query, exact cosine within their cells only (candidate fraction ≈
    nprobe/n_centroids). ``centroid_matrix``: optional pre-TRAINED
    (k × dim) numpy centroids (operators/kmeans.py::kmeans_fit) — when
    given, the hash-ranked sampling stand-in is skipped entirely."""
    import numpy as np

    if centroid_matrix is not None:
        mat = np.asarray(centroid_matrix, dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        cent_ids, cent_unit = (
            np.arange(len(mat), dtype=np.int64),
            mat / norms[:, None],
        )
    else:
        cent_ids, cent_unit = _sample_centroid_arrays(
            embeddings, n_centroids, vec_col, id_col
        )
    qv = embeddings.where(F.col(id_col) == query_vec_id).select(vec_col).head()[
        vec_col
    ]
    # probe-cell ranking is pure driver-side numpy over n_centroids rows
    q = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(q)
    qsims = cent_unit @ (q / qn if qn > 0 else q)
    order = np.lexsort((cent_ids, -qsims))
    probe_ids = [int(cent_ids[i]) for i in order[:nprobe]]
    # one joinless scan: fused assign+cosine numpy UDF (single Arrow
    # eval), filter to the probe cells, distributed top-k merge
    fused = _assign_and_cosine_udf(cent_ids, cent_unit, qv)
    scored = embeddings.where(F.col(id_col) != query_vec_id).select(
        id_col, fused(F.col(vec_col)).alias("_ac")
    )
    return (
        scored.where(F.col("_ac.centroid_id").isin(probe_ids))
        .select(id_col, F.round(F.col("_ac.cos_sim"), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def ivf_build_index(
    embeddings: DataFrame,
    index_path: str,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index: the assignment written PARTITIONED BY
    centroid_id (so a probe reads only its nprobe partitions — physical
    partition pruning, not a post-scan filter) plus the tiny centroid
    table. At 100 TB this runs once per corpus version; queries touch
    ~nprobe/n_centroids of the data via ``ivf_probe``."""
    cents = ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    assigned = ivf_assign(embeddings, cents, vec_col, id_col)
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(
        index_path + "/assign"
    )
    cents.write.mode("overwrite").parquet(index_path + "/centroids")


def ivf_probe(
    spark,
    index_path: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    qvec_col: str = "qv",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Query a prebuilt IVF index: rank centroids against the 1-row
    ``query`` driver-side (the centroid table is tiny — the procedural
    bbox-resolve shape, reference repo.py:16-45), then scan ONLY those
    centroid partitions. The isin() literals reach the parquet source as
    PartitionFilters, so the probe reads ~nprobe/n_centroids of the
    index physically, not post-filter."""
    import numpy as np

    cent_ids, cent_unit = _centroid_matrix(
        spark.read.parquet(index_path + "/centroids")
    )
    qv = query.select(qvec_col).head()[qvec_col]
    q = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(q)
    qsims = cent_unit @ (q / qn if qn > 0 else q)
    order = np.lexsort((cent_ids, -qsims))
    probe_ids = [int(cent_ids[i]) for i in order[:nprobe]]
    cells = spark.read.parquet(index_path + "/assign").where(
        F.col("centroid_id").isin(probe_ids)
    )
    if exclude_id is not None:
        cells = cells.where(F.col(id_col) != exclude_id)
    return (
        cells.select(
            id_col,
            F.round(_cosine_to_query_udf(qv)(F.col(vec_col)), 6).alias("cos_sim"),
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
