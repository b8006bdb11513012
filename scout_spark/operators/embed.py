"""Deterministic text embeddings via the hashing trick (build-brief
extension: embedding-cosine near-dup for corpora that arrive WITHOUT
precomputed vectors).

Feature-hashed bag-of-ngrams: each token/shingle hashes (stable crc32)
to one of ``dim`` buckets with a ±1 sign hash; the L2-normalized bucket
counts are the embedding. No model weights, no RNG state — the same
text always embeds identically on every executor, and cosine similarity
of hashed embeddings approximates token-set overlap (the property the
near-dup tests pin). Arrow-batched pandas UDF, numpy kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_embedding_udf(dim: int = 64, ngram: int = 1):
    """pandas UDF: text → array<float> of L2-normalized hashed-ngram
    counts. ``ngram=1`` hashes tokens; >1 hashes word shingles."""
    import numpy as np

    @F.pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        import zlib

        out = []
        for text in texts:
            toks = (text or "").lower().split()
            if ngram > 1:
                toks = [
                    " ".join(toks[i : i + ngram])
                    for i in range(max(len(toks) - ngram + 1, 0))
                ] or [" ".join(toks)]
            vec = np.zeros(dim, dtype=np.float64)
            for t in toks:
                h = zlib.crc32(t.encode("utf-8"))
                vec[h % dim] += 1.0 if (h >> 31) & 1 == 0 else -1.0
            n = np.linalg.norm(vec)
            out.append((vec / n if n > 0 else vec).astype(np.float32))
        return pd.Series(out)

    return _embed


def embed_documents(
    df: DataFrame, text_col: str = "text", dim: int = 64, ngram: int = 1
) -> DataFrame:
    """Attach a deterministic ``embedding`` column."""
    return df.withColumn("embedding", hashed_embedding_udf(dim, ngram)(F.col(text_col)))
