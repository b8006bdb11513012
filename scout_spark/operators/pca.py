"""Distributed PCA over an embedding column.

Two-pass-free design: ONE distributed pass computes the sufficient
statistics (n, Σx, ΣxxT) via per-partition numpy partials inside
``mapInPandas`` (Arrow batches, no per-row Python), the driver combines
the bounded partials (#partitions × (d + d²) doubles — independent of
row count, so collecting them is scale-safe), eigendecomposes the d×d
covariance with numpy, and the projection runs as a vectorized pandas
UDF matmul against the broadcast (d × k) component matrix.  d is the
embedding width (64 here); the driver-side work is O(d³) regardless of
corpus size, which is exactly how a 100 TB PCA should split
driver/executor work.

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive — eigenvectors are sign-ambiguous and this pins
a deterministic orientation across runs/engines/BLAS builds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _partial_stats(vec_col: str):
    def gen(batches):
        n = 0
        s = None
        xtx = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            g = m.T @ m
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "xtx": [xtx.ravel().tolist()],
                }
            )

    return gen


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA; returns (mean, components (d×k), explained_var_ratio).

    The only ``collect()`` is the per-partition sufficient statistics —
    bounded by partition count, never by row count.
    """
    parts = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(_partial_stats(vec_col), "n long, s array<double>, xtx array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    xtx = np.sum([np.asarray(r["xtx"]).reshape(d, d) for r in parts], axis=0)
    if n < 2:
        raise ValueError("fit_pca: need at least 2 rows")
    mu = s / n
    cov = (xtx - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    comps = evecs[:, order[:k]]
    # deterministic sign: largest-|coordinate| entry positive
    for j in range(comps.shape[1]):
        if comps[np.argmax(np.abs(comps[:, j])), j] < 0:
            comps[:, j] = -comps[:, j]
    total = float(evals.sum())
    ratio = evals[:k] / total if total > 0 else np.zeros(k)
    return mu, comps, ratio


def project(
    df: DataFrame, mu: np.ndarray, comps: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append a ``pc`` array<double> column = (x - mu) @ comps."""
    mu_b = mu.copy()
    comps_b = comps.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def _proj(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        p = (m - mu_b) @ comps_b
        return pd.Series(list(p))

    return df.withColumn("pc", _proj(F.col(vec_col).cast("array<double>")))
