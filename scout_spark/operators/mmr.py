"""Maximal Marginal Relevance (MMR) diversified re-ranking.

Carbonell & Goldstein, SIGIR'98: iteratively pick the candidate that
maximizes λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — relevance
traded against redundancy with what's already picked.

Split of work that survives scale: the RELEVANCE pass (cosine against
the query over the whole corpus + distributed top-N candidate cut) is
a joinless Spark scan; the MMR selection itself is inherently
sequential in k over the candidate pool, so it runs on the driver over
the collected top-N — a BOUNDED collect (N ≤ a few hundred rows of
(id, vec, score)), the same bounded-build-side pattern as the IVF
centroid sample.  numpy does the pairwise cosines in one gram-matrix
product.
"""

from __future__ import annotations

import numpy as np


def mmr_select(
    ids: np.ndarray,
    vecs: np.ndarray,
    relevance: np.ndarray,
    k: int,
    lam: float = 0.7,
) -> list[tuple[int, float, float]]:
    """Greedy MMR over a candidate pool (pure numpy, driver-side).

    Returns [(id, relevance, mmr_score)] in selection order.  The
    pool's pairwise cosine matrix is computed once (one gram product);
    each of the k rounds is a vectorized max over the pool.  Ties are
    broken by candidate id ascending — deterministic across runs.
    """
    n = len(ids)
    if n == 0 or k <= 0:
        return []
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sim = unit @ unit.T  # pairwise cosine
    selected: list[int] = []
    out: list[tuple[int, float, float]] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if selected:
            redundancy = sim[:, selected].max(axis=1)
        else:
            redundancy = np.zeros(n)
        score = lam * relevance - (1.0 - lam) * redundancy
        score_masked = np.where(remaining, score, -np.inf)
        best = score_masked.max()
        # deterministic tie-break: smallest id among the argmax set
        tied = np.flatnonzero(score_masked >= best)
        pick = tied[np.argmin(ids[tied])]
        selected.append(int(pick))
        remaining[pick] = False
        out.append((int(ids[pick]), float(relevance[pick]), float(score[pick])))
    return out
