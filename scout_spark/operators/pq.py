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


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k_results: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_diagnostics: bool = False,
):
    """IVF-PQ composite — the production billion-vector serving shape
    (faiss IndexIVFPQ): a coarse quantizer routes each vector to one of
    ``n_centroids`` cells; vectors are stored ONLY as m-byte PQ codes;
    a query probes the ``nprobe`` nearest cells and ADC-scores just
    their codes.  Candidate fraction ≈ nprobe/n_centroids AND payload
    per candidate is m bytes — the two reductions compose.  This
    variant encodes raw vectors (IVF-Flat-PQ); production faiss
    encodes residuals (x − centroid) for tighter cells — noted, not
    implemented, since the plumbing (route → encode → prune → ADC) is
    identical.

    Returns (topk DataFrame, diagnostics dict).  ``with_diagnostics``
    adds candidate/total counts (one extra job over the route-only
    frame, no PQ encode) so tests can verify the pruning actually
    happened; serving callers leave it off and pay only the final
    top-k job.
    """
    import numpy as np

    from scout_spark.operators.ann import _assign_udf, _sample_centroid_arrays

    qrows = (
        embeddings.where(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if not qrows:
        empty = embeddings.sparkSession.createDataFrame(
            [], f"{id_col} long, adc_score double"
        )
        return empty, {"n_candidates": 0, "n_total": 0}
    qv = np.array(qrows[0][0])
    cent_ids, cent_unit = _sample_centroid_arrays(
        embeddings, n_centroids, vec_col, id_col
    )
    books = train_codebooks(embeddings, vec_col, m=m, k=k_codes)
    assigned = embeddings.select(
        id_col,
        vec_col,
        _assign_udf(cent_ids, cent_unit)(F.col(vec_col)).alias("cell"),
    )
    codes = encode_pq(assigned, books, vec_col).select(id_col, "cell", "code")
    qu = qv / (np.linalg.norm(qv) or 1.0)
    sims = cent_unit @ qu
    probe = cent_ids[np.argsort(-sims, kind="stable")[:nprobe]].tolist()
    cand = codes.where(F.col("cell").isin(probe))
    diag = {"probed_cells": probe}
    if with_diagnostics:
        # one job over the ROUTE-ONLY frame (no PQ encode) yields both
        # counts; counting `cand`/`codes` directly would re-run the
        # assign+encode UDF pipeline once per count on top of the
        # final top-k job (CLAUDE.md cross-job reuse rule)
        cell_counts = {
            r["cell"]: r["n"]
            for r in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        diag["n_total"] = sum(cell_counts.values())
        diag["n_candidates"] = sum(cell_counts.get(c, 0) for c in probe)
    return (
        pq_topk(cand, qv, books, k_results, id_col, exclude_id=query_vec_id),
        diag,
    )
