"""Embedding / similarity-search inventory (training-data pipeline
extensions per the build brief): brute-force cosine top-k (baseline), an
LSH-bucketed scale path, embedding near-dup pairs, and MinHash/SimHash
near-dup (rows-only — engine hash functions are not portable to the
oracle; their correctness is pinned by tests/test_dedup.py against exact
Jaccard ground truth instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.functions.vectors import cosine_similarity
from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th

QUERY_VEC_ID = 0


@register(
    "ann_cosine_topk_bruteforce",
    "Brute-force cosine top-k over the embedding column — the exact ANN "
    "baseline. The query vector is resolved at plan-build time (one "
    "pushed-down point lookup, the same driver-side parameter-resolve "
    "pattern as the IVF centroid sample; bench.py reports it in "
    "build_sec) and inlined as a literal, so execution is ONE job: a "
    "joinless scan with zip_with/aggregate dot products (JVM-side, no "
    "Python) into a TakeOrderedAndProject per-partition top-k merge. At "
    "100 TB the scan is embarrassingly parallel with no shuffle and no "
    "broadcast-build barrier.",
    oracle=f"""
      SELECT e.vec_id, e.label,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos_sim
      FROM embeddings e
      CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = {QUERY_VEC_ID}) q
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, e.vec_id
      LIMIT 10
    """,
)
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        # regenerated testdata without the probe id: the oracle's CROSS
        # JOIN over an empty query side returns no rows — degrade to
        # the same empty (not an IndexError at plan-build time)
        return e.where(F.lit(False)).select(
            "vec_id", "label", F.lit(0.0).alias("cos_sim")
        )
    qv = qrows[0][0]
    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            F.round(
                cosine_similarity(F.col("embedding"), F.lit(qv)), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


_NEARDUP_THRESHOLD = 0.30
# float64-BLAS-vs-sequential-fold disagreement is bounded by ~dims·eps
# relative (~1e-14 here); 1e-6 is a deep-margin candidate net — every
# candidate re-verifies with the EXACT sequential fold before output
_NEARDUP_MARGIN = 1e-6


def _neardup_label_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-label all-pairs cosine: one BLAS matmul proposes candidates
    above (threshold − margin); each candidate then recomputes cosine
    with the EXACT left-to-right double fold the previous pure-Column
    kernel used (Python float ops are IEEE double, so dot/norm/divide
    reproduce the JVM fold and DuckDB's sequential
    list_cosine_similarity bit-for-bit — the oracle is unchanged)."""
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    rows = [np.asarray(v) for v in pdf["embedding"]]
    if len(rows) < 2:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_raw": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cos_raw": "float64"}
        )
    X = np.stack(rows).astype(np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    G = X @ X.T
    den = np.outer(nrm, nrm)
    with np.errstate(divide="ignore", invalid="ignore"):
        C = np.where(den > 0, G / np.where(den > 0, den, 1.0), np.nan)
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = C[iu, ju] > (_NEARDUP_THRESHOLD - _NEARDUP_MARGIN)
    out_a, out_b, out_c = [], [], []
    for i, j in zip(iu[keep], ju[keep]):
        a, b = rows[i], rows[j]
        dot = na = nb = 0.0
        for k in range(len(a)):
            x = float(a[k])
            y = float(b[k])
            dot += x * y
            na += x * x
            nb += y * y
        d = (na**0.5) * (nb**0.5)
        if d == 0.0:
            continue
        out_a.append(int(ids[i]))
        out_b.append(int(ids[j]))
        out_c.append(dot / d)
    return pd.DataFrame(
        {"vec_a": out_a, "vec_b": out_b, "cos_raw": out_c}
    ).astype({"vec_a": "int64", "vec_b": "int64", "cos_raw": "float64"})


@register(
    "embedding_neardup_pairs",
    "Embedding-cosine near-duplicate pairs, blocked by cluster label "
    "(filter-then-verify at n×m scale: the label blocking prunes the "
    "cross product; cosine verifies). Per-label all-pairs scoring runs "
    "as ONE BLAS matmul per block (the semdedup per-cluster kernel "
    "pattern — the r08 floor capture measured the earlier interpreted "
    "per-pair zip_with fold at 27× a single-thread DuckDB on identical "
    "work, re-evaluated 2× per pair by CollapseProject on top); "
    "candidates above (threshold − 1e-6) re-verify with the exact "
    "sequential double fold, so output values are bit-identical to the "
    "pure-Column kernel and the unchanged oracle. At 100 TB the label "
    "comes from LSH hyperplane signatures (see ann_lsh_bucketed) and "
    "each block is one task — never an all-pairs join row stream.",
    oracle="""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.30
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    pairs = (
        # NULL labels never pair: the oracle's a.label = b.label
        # equi-join drops them, but groupBy treats NULL as a real
        # group — pin the join semantics explicitly (ADVICE r08)
        e.where(F.col("label").isNotNull())
        .select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(
            _neardup_label_kernel,
            "vec_a bigint, vec_b bigint, cos_raw double",
        )
    )
    return pairs.where(F.col("cos_raw") > _NEARDUP_THRESHOLD).select(
        "vec_a",
        "vec_b",
        F.round(F.col("cos_raw"), 6).alias("cos_sim"),
    )


@register(
    "ann_lsh_bucketed",
    "LSH-bucketed approximate nearest neighbors — the 100 TB scale path: "
    "sign-of-projection onto deterministic pseudo-random hyperplanes "
    "(derived from dimension index arithmetic, no RNG state) buckets "
    "vectors; candidates share the query's bucket; exact cosine re-ranks "
    "within it. Recall vs brute force is pinned in tests/test_ann.py. "
    "Rows-only check: bucket membership isn't oracle-expressible.",
    tags=("rows-only",),
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.ann import lsh_bucket_topk

    e = _th(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(e, query_vec_id=QUERY_VEC_ID, k=10, n_planes=4)


_LSH_MD5_PLANES = 4


def _lsh_md5_coef(plane: int, dim: int) -> int:
    """±1 hyperplane coefficient from md5 parity — md5 is md5 in every
    engine, so DuckDB's `('0x'||substr(md5(p||'_'||i),1,1))::INT % 2`
    reproduces this exactly (verified: md5('0_0')[0]='5' → -1)."""
    import hashlib

    return 1 if int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def _lsh_md5_sig_sql(n_planes: int) -> str:
    """DuckDB bucket-id expression over `embedding` (cross-engine twin
    of the Spark kernel below). Projections use EXACT integer
    arithmetic — sum of ±floor(v*1e6) — so the sign is order-free and
    identical across engines (a double-sum dot product could flip sign
    near zero under different summation orders). Literal plane weights
    1/2/4/8, not shifts (DuckDB gives + higher precedence than <<)."""
    terms = []
    for p in range(n_planes):
        proj = (
            "list_sum(list_transform(range(0, len(embedding)), i -> "
            f"(CASE WHEN ('0x'||substr(md5({p} || '_' || i), 1, 1))::INT % 2 = 0 "
            "THEN 1 ELSE -1 END) * floor(embedding[i + 1]::DOUBLE * 1e6)::BIGINT))"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@register(
    "ann_lsh_md5_bucketed",
    "LSH-bucketed ANN with a CROSS-ENGINE bucket kernel — the oracle-"
    "checked twin of ann_lsh_bucketed (whose fract(sin) hyperplanes "
    "are FP-fragile across engines): ±1 hyperplane coefficients from "
    "md5(plane_dim) parity, projections as EXACT integer sums of "
    "±floor(v*1e6) (order-free sign, no summation-order ULP risk), "
    "bucket = sign-bit integer. The query's bucket and vector resolve "
    "driver-side with the identical integer kernel, so execution is "
    "ONE joinless scan → bucket filter → exact cosine rerank → "
    "TakeOrderedAndProject, same 100 TB shape as the brute-force "
    "baseline but touching ~2^-planes of the corpus.",
    oracle=f"""
      WITH sigs AS (
        SELECT vec_id, embedding, {_lsh_md5_sig_sql(_LSH_MD5_PLANES)} AS bucket
        FROM embeddings
      ),
      q AS (
        SELECT embedding::DOUBLE[] AS qv, bucket AS qbucket
        FROM sigs WHERE vec_id = {QUERY_VEC_ID}
      )
      SELECT s.vec_id, s.bucket,
             round(list_cosine_similarity(s.embedding::DOUBLE[], q.qv), 6)
               AS cos_sim
      FROM sigs s, q
      WHERE s.bucket = q.qbucket AND s.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, s.vec_id
      LIMIT 10
    """,
)
def ann_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        return e.where(F.lit(False)).select(
            "vec_id", F.lit(0).alias("bucket"), F.lit(0.0).alias("cos_sim")
        )
    qv = qrows[0][0]
    d = len(qv)
    coefs = [
        [_lsh_md5_coef(p, i) for i in range(d)] for p in range(_LSH_MD5_PLANES)
    ]
    qbucket = sum(
        (1 << p)
        for p in range(_LSH_MD5_PLANES)
        if sum(coefs[p][i] * math.floor(qv[i] * 1e6) for i in range(d)) >= 0
    )

    def _proj(p: int):
        # one array literal per plane, not |dim| py4j lit calls
        # (r12 plan-build chatter fix; ±1 ints -> ArrayType(LongType),
        # the cast("long") below was already the target type)
        cs = F.lit(coefs[p])
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                cs,
                lambda v, c: c.cast("long")
                * F.floor(v.cast("double") * 1e6).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bucket = sum(
        [
            F.when(_proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(_LSH_MD5_PLANES)
        ],
        F.lit(0),
    )
    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            bucket.alias("bucket"),
            F.round(
                cosine_similarity(F.col("embedding"), F.lit(qv)), 6
            ).alias("cos_sim"),
        )
        .where(F.col("bucket") == qbucket)
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "crossmodal_doc_embedding_join",
    "Cross-modal equi join: documents ⋈ embeddings on id, aggregating "
    "embedding L2 norms and doc lengths per language — the shape of a "
    "text+vector training-data pipeline stage (join key co-partitioning "
    "applies at 100 TB: both tables bucketed on the id).",
    oracle="""
      SELECT d.lang,
             count(*) AS n_docs,
             round(avg(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[]))), 6)
               AS avg_l2_norm,
             round(avg(d.n_chars), 4) AS avg_chars
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      GROUP BY d.lang
    """,
)
def crossmodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.functions.vectors import l2_norm

    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(l2_norm(F.col("embedding"))), 6).alias("avg_l2_norm"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@register(
    "embedding_hashed_neardup",
    "Embedding-cosine near-dup WITHOUT precomputed vectors: documents "
    "are embedded on the fly with the deterministic feature-hashing "
    "trick (operators/embed.py — stable crc32 buckets, signed counts, "
    "L2 norm), then blocked by lang and verified by cosine. Rows-only: "
    "hashed embeddings are engine-defined; semantic ordering (near-dups "
    "above unrelated) is pinned in tests/test_operators.py.",
    tags=("rows-only",),
)
def embedding_hashed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.embed import embed_documents

    d = embed_documents(_th(spark, sf_dir, "documents"))
    a, b = d.alias("a"), d.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(cos > 0.95)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


@register(
    "ann_ivf_topk",
    "IVF approximate nearest neighbors — the partition-pruned scale "
    "path: deterministic coarse centroids (hash-ranked sample standing "
    "in for k-means, TakeOrderedAndProject — no global sort, no count), "
    "fused numpy assign+cosine UDF over one joinless scan, probe cells "
    "filtered before the top-k merge. The prebuilt-index twin "
    "(ivf_build_index/ivf_probe, operators/ann.py) writes the "
    "assignment partitioned by centroid_id so a probe reads "
    "~nprobe/n_centroids of the table via PartitionFilters — physical "
    "pruning, proven in tests/test_operators.py. Rows-only; recall "
    "pinned vs brute force.",
    tags=("rows-only",),
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.ann import ivf_topk

    # _t, not _th: the centroid sample + point lookup want the narrow
    # scan; the fused assign+cosine UDF runs once over a small table
    # (measured 0.25s -> 0.46s with the widening exchange)
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, query_vec_id=QUERY_VEC_ID, k=10, n_centroids=8, nprobe=2)


@register(
    "dedup_minhash_lsh",
    "MinHash + LSH banding near-dup candidates over word shingles "
    "(training-data dedup at 100 TB: shingle → k minhashes via seeded "
    "murmur3 → band buckets → bucket equi-join → exact-Jaccard verify). "
    "Rows-only: the fast SipHash/crc32 kernels aren't reproducible in "
    "the oracle; candidate completeness vs exact Jaccard is pinned in "
    "tests, and the full kernel itself is oracle-checked cross-engine "
    "by the md5 twin dedup_minhash_md5_signatures (hash_parity.py).",
    tags=("rows-only",),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.dedup import minhash_lsh_pairs

    d = _th(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, id_col="doc_id", text_col="text", num_hashes=16, bands=4, threshold=0.8
    )


@register(
    "dedup_simhash",
    "SimHash near-dup fingerprints over tokens: 32-bit signature via "
    "per-token murmur3 bit-voting, grouped by signature band for "
    "candidate generation. Arrow-batched pandas UDF computes the bit "
    "votes (numpy-vectorized); everything else stays DataFrame ops. "
    "Rows-only (engine-specific hashing); the md5 twin "
    "dedup_simhash_hamming_pairs (hash_parity.py) oracle-checks the "
    "simhash+banding pipeline end-to-end cross-engine.",
    tags=("rows-only",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.dedup import simhash_signatures

    d = _th(spark, sf_dir, "documents")
    return simhash_signatures(d, id_col="doc_id", text_col="text")


@register(
    "ann_int8_quantized_topk",
    "Int8 scalar-quantized cosine top-k (operators/quantize.py): "
    "symmetric absmax codes (scale from a deterministic 1/16 hash "
    "sample — no full pass, no global sort), 4x smaller vector payload, "
    "cosine computed directly on int8 with int32 accumulation in one "
    "numpy matmul per Arrow batch. Rows-only by design (quantization "
    "rounding is engine-specific); recall>=0.8 vs the float baseline "
    "pinned by tests/test_operators.py::test_int8_quantized_topk_recall.",
)
def ann_int8_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.quantize import (
        corpus_absmax,
        quantize_int8,
        quantized_topk,
    )

    e = _th(spark, sf_dir, "embeddings")
    scale = corpus_absmax(e)
    codes = quantize_int8(e, scale).select("vec_id", "code")
    qcode = codes.where(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["code"]
    return quantized_topk(codes, qcode, k=10, exclude_id=QUERY_VEC_ID)


@register(
    "embedding_mean_pool_by_label",
    "Elementwise mean-pooling of embeddings per label (chunk-to-"
    "document pooling, the standard aggregation for long-doc "
    "embeddings): posexplode to (label, dim, value), one avg shuffle "
    "keyed on (label, dim) with map-side combine, then ordered "
    "re-assembly into a fixed-width array. Scale-safe: the shuffle "
    "carries scalars, never whole vectors, and skew is bounded by "
    "dim-fanout. Oracle rebuilds the same via index unnest + list(). "
    "The pooled vector is serialized as comma-joined micro-scaled "
    "integers (round(mv*1e6)::BIGINT) — the driver's canonicalizer "
    "sorts/hashes with pandas and cannot handle list cells, and "
    "integer serialization sidesteps double-rendering drift between "
    "engines.",
    oracle="""
      WITH x AS (
        SELECT label, unnest(range(1, len(embedding) + 1)) AS dim, embedding
        FROM embeddings
      ),
      v AS (
        SELECT label, dim, embedding[dim]::DOUBLE AS val FROM x
      ),
      m AS (
        SELECT label, dim, round(avg(val), 6) AS mv
        FROM v GROUP BY label, dim
      )
      SELECT label, count(*) AS n_dims,
             string_agg(round(mv * 1e6)::BIGINT::VARCHAR, ','
                        ORDER BY dim) AS pooled
      FROM m GROUP BY label
    """,
)
def embedding_mean_pool_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _th(spark, sf_dir, "embeddings")
    v = e.select(
        "label", F.posexplode("embedding").alias("dim0", "val")
    ).select("label", (F.col("dim0") + 1).alias("dim"), F.col("val").cast("double"))
    m = v.groupBy("label", "dim").agg(F.round(F.avg("val"), 6).alias("mv"))
    return m.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                lambda s: F.round(s.mv * 1e6, 0).cast("long").cast("string"),
            ),
            ",",
        ).alias("pooled"),
    )


@register(
    "ann_int8_codes_exact_topk",
    "Engine-exact int8 quantization twin (VERDICT r04 item 8: integer "
    "codes are engine-exact): symmetric absmax scalar quantization "
    "restated in pure SQL-expressible arithmetic — scale = corpus max "
    "|x| (exact double selection), code_i = sign(x) * "
    "min(floor(|x|/scale*127 + 0.5), 127) (floor on bit-identical "
    "IEEE doubles, so both engines emit the same int8 code arrays) — "
    "then top-10 by INTEGER dot product against the quantized query "
    "vector. Pins both the quantization kernel and integer ADC "
    "scoring that operators/quantize.py's numpy fast path implements "
    "(that one stays rows-only: np.rint rounds half-to-even). 100 TB: "
    "one scan for the scale agg (broadcast back), one joinless scoring "
    "scan into a per-partition top-k merge — same shape as the "
    "brute-force baseline with a 4x smaller payload.",
    oracle=f"""
      WITH s AS (
        SELECT max(list_max(list_transform(embedding, x -> abs(x::DOUBLE))))
               AS s
        FROM embeddings
      ),
      codes AS (
        SELECT vec_id,
               list_transform(embedding, x ->
                 CASE WHEN x::DOUBLE >= 0
                      THEN least(floor(x::DOUBLE / s.s * 127.0 + 0.5),
                                 127)::BIGINT
                      ELSE -least(floor(-(x::DOUBLE) / s.s * 127.0 + 0.5),
                                  127)::BIGINT
                 END) AS code
        FROM embeddings, s
      ),
      q AS (SELECT code AS qc FROM codes WHERE vec_id = {QUERY_VEC_ID})
      SELECT c.vec_id,
             list_sum(list_transform(range(1, len(c.code) + 1),
                                     i -> c.code[i] * q.qc[i]))::BIGINT
               AS dot,
             array_to_string(c.code, ',') AS code_str
      FROM codes c, q
      WHERE c.vec_id <> {QUERY_VEC_ID}
      ORDER BY dot DESC, vec_id
      LIMIT 10
    """,
)
def ann_int8_codes_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _th(spark, sf_dir, "embeddings")
    absmax = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda a, x: F.greatest(a, x),
    )
    scale = e.agg(F.max(absmax).alias("s"))

    def _one(x):
        xd = x.cast("double")
        cap = F.lit(127).cast("bigint")
        pos = F.least(F.floor(xd / F.col("s") * 127.0 + 0.5), cap)
        neg = -F.least(F.floor(-xd / F.col("s") * 127.0 + 0.5), cap)
        return F.when(xd >= 0, pos).otherwise(neg)

    codes = e.crossJoin(F.broadcast(scale)).select(
        "vec_id", F.transform("embedding", _one).alias("code")
    )
    q = codes.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("code").alias("qc")
    )
    dot = F.aggregate(
        F.zip_with("code", "qc", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return (
        codes.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            dot.alias("dot"),
            F.array_join(
                F.transform("code", lambda c: c.cast("string")), ","
            ).alias("code_str"),
        )
        .orderBy(F.desc("dot"), "vec_id")
        .limit(10)
    )


# ------------------------------------- multiprobe filter-then-verify


def lsh_md5_bucket_col(dim: int, n_planes: int = _LSH_MD5_PLANES):
    """Spark Column: the engine-exact md5-parity LSH bucket of
    `embedding` (integer projections of ±floor(v*1e6), sign bits packed
    into an int). Shared by ann_lsh_md5_bucketed, the multiprobe entry,
    and the planted-fixture recall tests."""

    def _proj(p: int):
        # one array literal per plane (r12 plan-build chatter fix)
        cs = F.lit([_lsh_md5_coef(p, i) for i in range(dim)])
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                cs,
                lambda v, c: c.cast("long")
                * F.floor(v.cast("double") * 1e6).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return sum(
        [
            F.when(_proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(n_planes)
        ],
        F.lit(0),
    )


def lsh_md5_bucket_py(vec, n_planes: int = _LSH_MD5_PLANES) -> int:
    """Driver-side twin of lsh_md5_bucket_col (identical integer math)."""
    import math

    return sum(
        (1 << p)
        for p in range(n_planes)
        if sum(
            _lsh_md5_coef(p, i) * math.floor(float(v) * 1e6)
            for i, v in enumerate(vec)
        )
        >= 0
    )


def lsh_md5_multiprobe_topk(
    e: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """LSH multiprobe → exact-verify: candidates come from the query's
    bucket plus every Hamming-distance-1 neighbor bucket (5 of 16 probed
    at 4 planes — the standard multiprobe recall lever), then EXACT
    cosine re-ranks the candidate set. The query bucket and vector
    resolve driver-side, so execution is ONE joinless scan with an
    isin([5 ints]) filter — no broadcast barrier, ~5/16 of the corpus
    touched at 100 TB."""
    qrows = (
        e.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        return e.where(F.lit(False)).select(
            "vec_id", F.lit(0).alias("bucket"), F.lit(0.0).alias("cos_sim")
        )
    qv = qrows[0][0]
    qbucket = lsh_md5_bucket_py(qv)
    probes = [qbucket] + [qbucket ^ (1 << p) for p in range(_LSH_MD5_PLANES)]
    bucket = lsh_md5_bucket_col(len(qv))
    return (
        e.where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            bucket.alias("bucket"),
            F.round(
                cosine_similarity(F.col("embedding"), F.lit(qv)), 6
            ).alias("cos_sim"),
        )
        .where(F.col("bucket").isin(probes))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


@register(
    "ann_lsh_multiprobe_verified",
    "Filter-then-verify ANN, closing the loop the reference's "
    "architecture signature implies at similarity-search scale "
    "(VERDICT r04 item 9): the engine-exact md5-parity LSH bucket "
    "kernel generates CANDIDATES from the query's bucket plus all "
    "Hamming-1 neighbor buckets (multiprobe: 5 of 16 buckets, the "
    "recall lever that costs probes instead of planes), and exact "
    "cosine VERIFIES and re-ranks them. Oracle-backed end to end — "
    "bucket arithmetic is integer (order-free), cosine rounds at 6dp "
    "on both engines; recall==1.0 vs brute force on the planted "
    "fixture is pinned in tests/test_operators.py. 100 TB: one "
    "joinless scan, bucket filter on 5 literal ints, "
    "TakeOrderedAndProject top-k merge — no shuffle, no broadcast "
    "build.",
    oracle=f"""
      WITH sigs AS (
        SELECT vec_id, embedding, {_lsh_md5_sig_sql(_LSH_MD5_PLANES)} AS bucket
        FROM embeddings
      ),
      q AS (
        SELECT embedding::DOUBLE[] AS qv, bucket AS qbucket
        FROM sigs WHERE vec_id = {QUERY_VEC_ID}
      )
      SELECT s.vec_id, s.bucket,
             round(list_cosine_similarity(s.embedding::DOUBLE[], q.qv), 6)
               AS cos_sim
      FROM sigs s, q
      WHERE s.vec_id <> {QUERY_VEC_ID}
        AND bit_count(xor(s.bucket::BIGINT, q.qbucket::BIGINT)) <= 1
      ORDER BY cos_sim DESC, s.vec_id
      LIMIT 10
    """,
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return lsh_md5_multiprobe_topk(e, QUERY_VEC_ID, k=10)


# --------------------------------------- IVF cross-engine integer twin

_IVF_MD5_CELLS = 8
_IVF_MD5_NPROBE = 2


def _ivf_int_vec(vec) -> list[int]:
    """floor(v*1e6) integerization — identical to both engines' casts
    (float32 -> float64 -> *1e6 -> floor)."""
    import math

    return [math.floor(float(v) * 1e6) for v in vec]


@register(
    "ann_ivf_md5_integer_cells",
    "IVF ANN with a CROSS-ENGINE coarse quantizer — closes the last "
    "hash-twinnable similarity family (the r04 pattern: md5 + exact "
    "integers): centroids are the 8 vectors with smallest "
    "md5(vec_id) (engine-portable pseudo-random sample, the "
    "ivf_centroids stand-in for k-means), every vector assigns to its "
    "nearest centroid by EXACT INTEGER squared L2 on floor(v*1e6) "
    "coordinates (order-free, tie-break on cell id), the query probes "
    "its 2 nearest cells (resolved driver-side with the identical "
    "integer kernel), and exact cosine re-ranks the probed cells' "
    "members. The oracle reproduces centroid choice, assignment, "
    "probe, and rerank in SQL, so the hash match pins the FULL index "
    "path — the production variant (operators/ann.py ivf_assign) "
    "keeps its Arrow numpy matmul and stays rows-only. 100 TB: "
    "assignment is one scan against 8 broadcast literals (written "
    "partitioned by cell at index build); queries prune to nprobe "
    "cells.",
    oracle=f"""
      WITH iv AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * 1e6)::BIGINT) AS q
        FROM embeddings
      ),
      cent AS (
        SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)
                 - 1 AS cid,
               q AS cv
        FROM iv ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {_IVF_MD5_CELLS}
      ),
      dist AS (
        SELECT iv.vec_id, c.cid,
               list_sum(list_transform(range(1, len(q) + 1),
                        i -> (q[i] - c.cv[i]) * (q[i] - c.cv[i]))) AS d
        FROM iv, cent c
      ),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d, cid) AS rn
          FROM dist) _r
        WHERE rn = 1
      ),
      qprobe AS (
        SELECT cid FROM dist WHERE vec_id = {QUERY_VEC_ID}
        ORDER BY d, cid LIMIT {_IVF_MD5_NPROBE}
      ),
      qv AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {QUERY_VEC_ID}
      )
      SELECT e.vec_id, a.cid AS cell,
             round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qv), 6)
               AS cos_sim
      FROM embeddings e
      JOIN assign a ON a.vec_id = e.vec_id
      JOIN qprobe p ON a.cid = p.cid
      CROSS JOIN qv
      WHERE e.vec_id <> {QUERY_VEC_ID}
      ORDER BY cos_sim DESC, e.vec_id
      LIMIT 10
    """,
)
def ann_ivf_md5_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    e = _t(spark, sf_dir, "embeddings")
    crows = (
        e.select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("_hk"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .orderBy("_hk", "vec_id")
        .limit(_IVF_MD5_CELLS)
        .collect()
    )
    if not crows:
        return e.where(F.lit(False)).select(
            "vec_id",
            F.lit(0).alias("cell"),
            F.lit(0.0).alias("cos_sim"),
        )
    cents = [(cid, _ivf_int_vec(r["v"])) for cid, r in enumerate(crows)]
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        return e.where(F.lit(False)).select(
            "vec_id",
            F.lit(0).alias("cell"),
            F.lit(0.0).alias("cos_sim"),
        )
    qv = qrows[0][0]
    qi = _ivf_int_vec(qv)
    qdists = sorted(
        (sum((a - b) ** 2 for a, b in zip(qi, cv)), cid)
        for cid, cv in cents
    )
    probe = [cid for _, cid in qdists[:_IVF_MD5_NPROBE]]

    # assignment kernel: Arrow numpy int64 (the interpreted 8-fold HOF
    # formulation measured 2.08 s vs 0.6 s at sf0.1 — CLAUDE.md rule:
    # numpy for per-row-heavy kernels). np.floor on float64 == SQL
    # floor; int64 squared sums are exact (<= 64 * (2e6)^2 ~ 2.6e14);
    # np.argmin returns the FIRST minimum, i.e. the lowest cid on ties
    # — the same order the oracle's ORDER BY d, cid picks.
    cmat = np.array([cv for _, cv in cents], dtype=np.int64)

    @F.pandas_udf("int")
    def _cell(col: pd.Series) -> pd.Series:
        m = np.stack(col.values).astype(np.float64)
        q = np.floor(m * 1e6).astype(np.int64)
        d = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    # referenced by both the probe filter and the projection — the
    # optimizer inlines a deterministic UDF into each reference (2x
    # kernel, r7 plan audit); the nondeterministic marker is a pure
    # optimizer fence (the function itself is deterministic)
    _cell = _cell.asNondeterministic()

    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            _cell(F.col("embedding").cast("array<double>")).alias("cell"),
            F.round(
                cosine_similarity(F.col("embedding"), F.lit(qv)), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cell").isin(probe))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "kmeans_lloyd_round_integer_stats",
    "One Lloyd iteration of k-means with ENGINE-EXACT sufficient "
    "statistics — the cross-engine twin of the kmeans operator's "
    "update step (operators/kmeans.py stays rows-only: its float "
    "centroid means are summation-order-sensitive): starting from the "
    "8 md5-ordered seed centroids (the IVF twin's coarse sample), "
    "every vector assigns by exact int64 squared L2 on floor(v*1e6) "
    "coordinates, and the UPDATE is reported as integer sufficient "
    "stats — member count, the sum of every integer coordinate, and "
    "a dim-weighted checksum — i.e. the numerators of the new "
    "centroids, exact before the one division a float centroid would "
    "need. Pins init + assignment + update aggregation bit-for-bit. "
    "100 TB: one scan against 8 broadcast literals into a "
    "map-side-combined groupBy — the canonical distributed-Lloyd "
    "round with the driver holding only k x dim scalars.",
    oracle=f"""
      WITH iv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * 1e6)::BIGINT) AS q
        FROM embeddings
      ),
      cent AS (
        SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)
                 - 1 AS cid,
               q AS cv
        FROM iv ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {_IVF_MD5_CELLS}
      ),
      dist AS (
        SELECT iv.vec_id, iv.q, c.cid,
               list_sum(list_transform(range(1, len(q) + 1),
                        i -> (q[i] - c.cv[i]) * (q[i] - c.cv[i]))) AS d
        FROM iv, cent c
      ),
      assign AS (
        SELECT vec_id, q, cid FROM (
          SELECT vec_id, q, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d, cid) AS rn
          FROM dist) _r
        WHERE rn = 1
      )
      SELECT cid AS cluster,
             count(*)::BIGINT AS n_members,
             sum(list_sum(q))::BIGINT AS coord_mass,
             sum(list_sum(list_transform(range(1, len(q) + 1),
                                         i -> i * q[i])))::BIGINT
               AS dim_weighted_checksum
      FROM assign GROUP BY cid ORDER BY cid
    """,
)
def kmeans_lloyd_round_integer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    crows = (
        e.select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("_hk"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .orderBy("_hk", "vec_id")
        .limit(_IVF_MD5_CELLS)
        .collect()
    )
    if not crows:
        return e.where(F.lit(False)).select(
            F.lit(0).alias("cluster"),
            F.lit(0).cast("bigint").alias("n_members"),
            F.lit(0).cast("bigint").alias("coord_mass"),
            F.lit(0).cast("bigint").alias("dim_weighted_checksum"),
        )
    cents = [(cid, _ivf_int_vec(r["v"])) for cid, r in enumerate(crows)]
    cmat = np.array([cv for _, cv in cents], dtype=np.int64)

    @F.pandas_udf("int")
    def _cell(col: pd.Series) -> pd.Series:
        m = np.stack(col.values).astype(np.float64)
        q = np.floor(m * 1e6).astype(np.int64)
        d = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1e6).cast("long"),
    )
    coord_mass = F.aggregate(
        F.col("_q"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    # single-parameter HOF lambda rule (CLAUDE.md): the dim index comes
    # from zip_with against a literal 1..d ramp, not a 2-arg transform
    ramp = F.array(
        *[F.lit(i + 1).cast("long") for i in range(len(cents[0][1]))]
    )
    weighted = F.aggregate(
        F.zip_with(F.col("_q"), ramp, lambda x, i: x * i),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return (
        e.select(
            _cell(F.col("embedding").cast("array<double>")).alias(
                "cluster"
            ),
            q.alias("_q"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(coord_mass).alias("coord_mass"),
            F.sum(weighted).alias("dim_weighted_checksum"),
        )
        .orderBy("cluster")
    )


# ------------------------------ PQ ADC cross-engine integer twin

_PQ_M = 4  # subspaces (64-dim embeddings -> 16 dims each)
_PQ_K = 8  # codebook entries per subspace


@register(
    "ann_pq_md5_integer_codes",
    "Product quantization with a CROSS-ENGINE codebook — closes the "
    "last rows-only similarity family that resisted twinning "
    "(operators/pq.py's float ADC hits np.rint half-to-even vs SQL "
    "round; this twin removes rounding entirely): the codebook per "
    "subspace is the 8 md5-ordered sample vectors SLICED to that "
    "subspace, every vector encodes as 4 codes by EXACT int64 "
    "squared L2 on floor(v*1e6) coordinates (argmin's first-minimum "
    "== the oracle's ORDER BY d, cid tie-break), the query's "
    "asymmetric-distance table (4x8 integers) resolves driver-side, "
    "and the top-10 rank by ADC distance is a joinless scan over the "
    "packed codes. The oracle reproduces codebook, encoding, and ADC "
    "lookup in SQL, so the hash match pins the FULL index path — "
    "operators/pq.py keeps the float production variant with its "
    "recall pytest. 100 TB: codes are 4 bytes/vector (16x compression "
    "at 64-dim float32); encoding is one scan against 8 broadcast "
    "literals; queries never touch raw vectors.",
    oracle=f"""
      WITH iv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * 1e6)::BIGINT) AS q
        FROM embeddings
      ),
      cent AS (
        SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)
                 - 1 AS cid,
               q AS cv
        FROM iv ORDER BY md5(vec_id::VARCHAR), vec_id
        LIMIT {_PQ_K}
      ),
      subs AS (SELECT unnest(range(0, {_PQ_M})) AS m),
      dist AS (
        SELECT iv.vec_id, s.m, c.cid,
               list_sum(list_transform(range(1, 1 + len(iv.q) // {_PQ_M}),
                 i -> (iv.q[s.m * (len(iv.q) // {_PQ_M}) + i]
                       - c.cv[s.m * (len(iv.q) // {_PQ_M}) + i])
                    * (iv.q[s.m * (len(iv.q) // {_PQ_M}) + i]
                       - c.cv[s.m * (len(iv.q) // {_PQ_M}) + i]))) AS d
        FROM iv, cent c, subs s
      ),
      codes AS (
        SELECT vec_id, m, cid FROM (
          SELECT vec_id, m, cid,
                 row_number() OVER (PARTITION BY vec_id, m
                                    ORDER BY d, cid) AS rn
          FROM dist) _r
        WHERE rn = 1
      ),
      qd AS (SELECT m, cid, d FROM dist WHERE vec_id = {QUERY_VEC_ID})
      SELECT c.vec_id,
             sum(c.cid * CASE c.m WHEN 0 THEN 1 WHEN 1 THEN 8
                                  WHEN 2 THEN 64 ELSE 512 END)::BIGINT
               AS pq_code,
             sum(q.d)::BIGINT AS adc_dist
      FROM codes c JOIN qd q ON c.m = q.m AND c.cid = q.cid
      WHERE c.vec_id <> {QUERY_VEC_ID}
      GROUP BY c.vec_id
      ORDER BY adc_dist, c.vec_id
      LIMIT 10
    """,
)
def ann_pq_md5_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    crows = (
        e.select(
            "vec_id",
            F.md5(F.col("vec_id").cast("string")).alias("_hk"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .orderBy("_hk", "vec_id")
        .limit(_PQ_K)
        .collect()
    )
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not crows or not qrows:
        return e.where(F.lit(False)).select(
            "vec_id",
            F.lit(0).cast("long").alias("pq_code"),
            F.lit(0).cast("long").alias("adc_dist"),
        )
    cint = np.array([_ivf_int_vec(r["v"]) for r in crows], dtype=np.int64)
    qi = np.array(_ivf_int_vec(qrows[0][0]), dtype=np.int64)
    dim = cint.shape[1]
    ds = dim // _PQ_M
    csub = cint.reshape(_PQ_K, _PQ_M, ds)  # (K, M, ds)
    qsub = qi.reshape(_PQ_M, ds)
    # the 4x8 asymmetric-distance table, exact int64, driver-resolved
    qd = ((qsub[:, None, :] - csub.transpose(1, 0, 2)) ** 2).sum(axis=2)
    pows = 8 ** np.arange(_PQ_M, dtype=np.int64)

    @F.pandas_udf("struct<pq_code: bigint, adc_dist: bigint>")
    def _enc(col: pd.Series) -> pd.DataFrame:
        m = np.stack(col.values).astype(np.float64)
        q = np.floor(m * 1e6).astype(np.int64).reshape(len(m), _PQ_M, ds)
        # (n, M, K) subspace distances; argmin's first-min == lowest cid
        d = ((q[:, :, None, :] - csub.transpose(1, 0, 2)[None, :, :, :]) ** 2).sum(
            axis=3
        )
        codes = np.argmin(d, axis=2)  # (n, M)
        adc = np.take_along_axis(
            np.broadcast_to(qd, (len(m), _PQ_M, _PQ_K)), codes[:, :, None], 2
        )[:, :, 0].sum(axis=1)
        packed = (codes * pows[None, :]).sum(axis=1)
        return pd.DataFrame({"pq_code": packed, "adc_dist": adc})

    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            _enc(F.col("embedding").cast("array<double>")).alias("s"),
        )
        .select("vec_id", F.col("s.pq_code").alias("pq_code"), F.col("s.adc_dist").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )
