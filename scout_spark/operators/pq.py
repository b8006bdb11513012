"""Product quantization (PQ) for approximate nearest neighbors.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011) — the billion-vector production recipe: split the
d-dim vector into ``m`` subvectors, learn a tiny k-means codebook
(``k`` centroids) per subspace, store each vector as ``m`` uint8 codes
(d·4 bytes → m bytes; 32× compression at d=64, m=8), and score a query
with Asymmetric Distance Computation (ADC): one (m × k) lookup table
of exact query-subvector-to-centroid similarities, then each corpus
vector's score is ``m`` table lookups — no float vector ever touched
at query time.

Scale split of work:

- TRAINING runs on a bounded deterministic sample collected to the
  driver (hash-selected, ~2k vectors) — codebook fitting is O(sample ×
  k × iters) numpy and, like the IVF centroid sample, independent of
  corpus size.  This is the standard practice (faiss trains PQ on a
  sample too).
- ENCODING is a vectorized pandas UDF: one (batch × k) argmin per
  subspace per Arrow batch; the corpus is touched exactly once and the
  shuffle-free codes column is what persists.
- QUERY is a joinless scan over the codes with a broadcast (m × k)
  numpy table — embarrassingly parallel, no shuffle until the final
  top-k merge (TakeOrderedAndProject).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType


def _kmeans_1sub(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Tiny dense Lloyd's for one subspace (driver-side, sample-sized).
    Deterministic: init by evenly-spaced picks of the sample sorted by
    first coordinate; empty clusters re-seed from the DISTINCT farthest
    points (one per empty cluster — re-seeding them all from the single
    farthest point would collapse them into duplicate centroids that
    never separate)."""
    order = np.argsort(x[:, 0], kind="stable")
    cents = x[order[np.linspace(0, len(x) - 1, k).astype(int)]].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        empties = [j for j in range(k) if not (assign == j).any()]
        farthest = np.argsort(-d2.min(axis=1), kind="stable")
        for j in range(k):
            if j not in empties:
                cents[j] = x[assign == j].mean(axis=0)
        for slot, j in enumerate(empties):
            cents[j] = x[farthest[slot % len(x)]]
    return cents


def train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_mod: int = 3,
    iters: int = 10,
) -> np.ndarray:
    """Fit per-subspace codebooks on a deterministic hash sample.

    Returns an (m, k, d/m) array.  The only collect is the sample:
    rows whose vector xxhash64 lands in the 1/``sample_mod`` slice,
    cut to the 4096 SMALLEST hashes via a distributed top-k
    (TakeOrderedAndProject) — fully deterministic for a given logical
    dataset regardless of partition layout or scan order (a bare
    LIMIT would depend on both).  For 100 TB corpora raise
    ``sample_mod``; codebook quality needs only thousands of rows.
    """
    hashed = df.select(
        F.col(vec_col).cast("array<double>").alias("v"),
        F.abs(F.xxhash64(F.col(vec_col).cast("array<float>"))).alias("h"),
    )
    sample = (
        hashed.where(F.col("h") % sample_mod == 0)
        .orderBy("h")
        .limit(4096)
        .collect()
    )
    if len(sample) < k:
        raise ValueError(f"PQ training sample too small: {len(sample)} < k={k}")
    x = np.array([r["v"] for r in sample])
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.stack(
        [_kmeans_1sub(x[:, j * sub : (j + 1) * sub], k, iters) for j in range(m)]
    )
    return books


def encode_pq(
    df: DataFrame, books: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append a ``code`` array<int> column of m subspace centroid ids."""
    b = books.copy()
    m, k, sub = b.shape

    @F.pandas_udf(ArrayType(IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            # (batch, k) distances via |a|^2 - 2ab + |b|^2 (argmin-safe)
            d2 = (
                (xs**2).sum(axis=1, keepdims=True)
                - 2.0 * xs @ b[j].T
                + (b[j] ** 2).sum(axis=1)
            )
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn("code", _enc(F.col(vec_col).cast("array<double>")))


def adc_table(query_vec: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, k) table of query-subvector · centroid dot products."""
    m, k, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    return np.stack([books[j] @ q[j * sub : (j + 1) * sub] for j in range(m)])


def pq_topk(
    codes: DataFrame,
    query_vec: np.ndarray,
    books: np.ndarray,
    k_results: int = 10,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k over the codes: score = Σ_j table[j, code_j] ≈ q·x.
    Joinless scan + TakeOrderedAndProject; the (m × k) table rides the
    UDF closure (a few hundred doubles)."""
    table = adc_table(query_vec, books)
    m = table.shape[0]

    @F.pandas_udf(DoubleType())
    def _score(code: pd.Series) -> pd.Series:
        c = np.stack(code.to_numpy())
        return pd.Series(table[np.arange(m), c].sum(axis=1))

    out = codes
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return (
        out.select(
            id_col, F.round(_score(F.col("code")), 6).alias("adc_score")
        )
        .orderBy(F.desc("adc_score"), id_col)
        .limit(k_results)
    )
