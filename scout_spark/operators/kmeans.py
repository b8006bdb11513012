"""Distributed Lloyd's k-means over embedding columns (build-brief
similarity-search scale path: the trained coarse quantizer the IVF
index stand-in (operators/ann.py::ivf_centroids, hash-sampled) defers
to "a production index would run k-means").

Spark-first shape per iteration:
  - centroids live DRIVER-side as a (k × dim) numpy matrix, broadcast
    into an Arrow-batched assignment UDF closure (one matmul+argmax per
    batch — the ann.py `_assign_udf` kernel, reused);
  - the centroid update is a single groupBy(cluster) with ``dim``
    scalar ``avg(embedding[i])`` aggregates — fully JVM, map-side
    partial aggregation, so the shuffle carries k·dim partial sums per
    task, NEVER vectors (no posexplode of the corpus, no Python in the
    reduce);
  - k·dim numbers return to the driver per round (the tiny-build-side
    procedural-resolve shape, reference repo.py:16-45).

Determinism: init = the k vectors with smallest xxhash64(id) (same
deterministic pseudo-random sample as ivf_centroids); assignment ties
break to the lowest centroid index (np.argmax first-occurrence); empty
clusters keep their previous centroid. Iteration count is fixed (no
data-dependent convergence test ⇒ identical plans/results across
runs and engines).

At 100 TB: each iteration is one scan + one k·dim-wide shuffle —
embarrassingly parallel; the driver state is k·dim floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scout_spark.operators.ann import _assign_udf


def _init_centroids(
    embeddings: DataFrame, k: int, vec_col: str, id_col: str
) -> np.ndarray:
    rows = (
        embeddings.select(id_col, vec_col, F.xxhash64(F.col(id_col)).alias("_hk"))
        .orderBy("_hk", id_col)
        .limit(k)
        .collect()
    )
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train k centroids with ``n_iters`` Lloyd rounds; returns the
    (k × dim) centroid matrix. Assignment metric is cosine (unit-norm
    matmul argmax), matching the IVF probe's metric."""
    first = embeddings.select(vec_col).head()
    if first is None:
        raise ValueError("kmeans_fit: embeddings table is empty")
    dim = len(first[vec_col])
    cents = _init_centroids(embeddings, k, vec_col, id_col)
    if len(cents) < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds the {len(cents)} available vectors"
        )
    ids = np.arange(k, dtype=np.int64)
    for _ in range(n_iters):
        norms = np.linalg.norm(cents, axis=1)
        norms[norms == 0.0] = 1.0
        unit = cents / norms[:, None]
        assigned = embeddings.select(
            _assign_udf(ids, unit)(F.col(vec_col)).alias("cid"),
            F.col(vec_col).alias("v"),
        )
        # dim scalar avgs — JVM partial aggregation; the shuffle moves
        # k·dim partial (sum, count) pairs per map task, never vectors
        means = (
            assigned.groupBy("cid")
            .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)])
            .collect()
        )
        new_cents = cents.copy()  # empty clusters keep prior centroid
        for r in means:
            new_cents[r["cid"]] = [r[f"m{i}"] for i in range(dim)]
        cents = new_cents
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster) for every vector under the trained centroids."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0.0] = 1.0
    unit = centroids / norms[:, None]
    ids = np.arange(len(centroids), dtype=np.int64)
    return embeddings.select(
        id_col, _assign_udf(ids, unit)(F.col(vec_col)).alias("cluster")
    )


def kmeans_assign_with_distance(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, cos_dist) — assignment plus the cosine distance
    (1 - similarity) to the assigned centroid, one Arrow pass."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0.0] = 1.0
    unit = centroids / norms[:, None]

    @F.pandas_udf("cluster long, cos_dist double")
    def _assign_dist(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        sims = (x / xn[:, None]) @ unit.T
        return pd.DataFrame(
            {
                "cluster": sims.argmax(axis=1).astype(np.int64),
                "cos_dist": 1.0 - sims.max(axis=1),
            }
        )

    out = embeddings.select(id_col, _assign_dist(F.col(vec_col)).alias("a"))
    return out.select(id_col, F.col("a.cluster").alias("cluster"),
                      F.col("a.cos_dist").alias("cos_dist"))


def inertia(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Mean cosine distance (1 - similarity) to the assigned centroid.

    With argmax-cosine assignment and an UNNORMALIZED arithmetic-mean
    centroid update, monotone decrease is not theoretically guaranteed
    (that argument needs spherical k-means, i.e. re-normalized means) —
    empirically non-increasing on the tested planted-cluster data, which
    is what tests/test_kmeans.py pins."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0.0] = 1.0
    unit = centroids / norms[:, None]

    @F.pandas_udf("double")
    def _dist(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xn = np.linalg.norm(x, axis=1)
        xn[xn == 0.0] = 1.0
        sims = (x / xn[:, None]) @ unit.T
        return pd.Series(1.0 - sims.max(axis=1))

    return embeddings.agg(F.avg(_dist(F.col(vec_col)))).first()[0]
