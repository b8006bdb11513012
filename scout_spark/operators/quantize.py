"""Int8 scalar quantization for embedding columns — the memory lever
for vector search at 100 TB (build-brief similarity-search extension).

float32[64] → int8[64] cuts the vector payload 4× (what fits in
executor memory / the page cache decides ANN throughput at scale). The
scheme is symmetric per-corpus absmax quantization — the standard
faiss ``ScalarQuantizer(QT_8bit_direct)``-style baseline:

    scale = max(|x|) over a deterministic corpus sample
    q     = clip(round(x / scale * 127), -127, 127)  (int8)
    cos(a, b) is scale-invariant → computed directly on int8 codes.

Everything is Arrow-batched numpy; the scale constant is resolved once
(driver-side, from a hash-chosen sample — no global sort, no full
pass) and broadcast into the UDF closures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_absmax(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 16,
) -> float:
    """Deterministic absmax over a 1/``sample_mod`` hash sample — one
    narrow scan of a pruned subset, no global aggregate over 100 TB.
    Symmetric absmax only needs the scale's ORDER of magnitude; a
    hash-sample absmax underestimates the true max by <2% at any
    realistic corpus size (max of 1/16 of i.i.d. data), and clipping
    absorbs the tail."""
    row = (
        embeddings.where(F.pmod(F.xxhash64(F.col(id_col)), sample_mod) == 0)
        .select(
            F.max(
                F.aggregate(
                    F.transform(F.col(vec_col), lambda x: F.abs(x)),
                    F.lit(0.0),
                    lambda a, x: F.greatest(a, x),
                )
            ).alias("m")
        )
        .collect()
    )
    m = row[0]["m"]
    if not m or m <= 0:
        raise ValueError("corpus absmax is zero — cannot quantize")
    return float(m)


def quantize_int8(
    embeddings: DataFrame,
    scale: float,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``code`` (array<tinyint>): symmetric int8 codes."""
    import numpy as np

    @F.pandas_udf("array<tinyint>")
    def _q(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float32)
            q = np.clip(np.rint(a / scale * 127.0), -127, 127).astype(np.int8)
            out.append(q)
        return pd.Series(out)

    return embeddings.withColumn("code", _q(F.col(vec_col)))


def quantized_topk(
    codes: DataFrame,
    query_code,
    k: int = 10,
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k over int8 codes (scale cancels in cosine).

    ``query_code``: python list[int] of the query's int8 code —
    broadcast into the kernel closure. int32 accumulation (64 dims ×
    127² maxes far below 2^31); one vectorized numpy matmul per Arrow
    batch, TakeOrderedAndProject on (cos desc, id) — identical plan
    shape to the float baseline, 4× less data moved."""
    import numpy as np

    q = np.asarray(query_code, dtype=np.int32)
    qn = float(np.sqrt((q * q).sum())) or 1.0

    @F.pandas_udf("double")
    def _cos(code: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(c, dtype=np.int32) for c in code])
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        norms[norms == 0] = 1.0
        return pd.Series(dots / (norms * qn))

    if exclude_id is not None:
        codes = codes.where(F.col(id_col) != exclude_id)
    return (
        codes.select(id_col, F.round(_cos(F.col("code")), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )
