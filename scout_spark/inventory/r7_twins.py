"""Round-7 oracle twins for the last convertible rows-only families
(VERDICT r06 items 2 and 4): Borůvka MST and multimodal frame sampling.

Both follow the proven engine-exactness disciplines:

- ``graph_mst_boruvka_unrolled_twin``: Borůvka is deterministic given a
  TOTAL edge order ((w, src, dst) ties — exactly the order
  operators/mst.py uses and tests/test_graph.py pins against Kruskal),
  so a fixed number of rounds unrolls into a DuckDB CTE chain (the BPE
  unrolled-twin discipline, r6_twins.py). Per round the oracle selects
  each component's minimum incident cross edge via the established
  lex-argmin-packed-int64 kernel, breaks the per-group 2-cycle at the
  smaller label (the classic pointer-structure argument: keys strictly
  decrease along selection pointers, so each merge group has exactly
  ONE 2-cycle, at its minimum edge), and contracts with a recursive
  pointer-chase CTE. Extra rounds past convergence are no-ops (no
  cross edges → empty selection → labels unchanged), so a fixed unroll
  ≥ log2(|V|) is exact. Component LABELS differ between engines
  (Spark's driver union-find roots vs the oracle's pointer roots) but
  the selected edge set depends only on the node PARTITION, which
  evolves identically — the forests are equal edge-for-edge.
- ``multimodal_frame_sample_md5_twin``: the frame-sampling plumbing
  (operators/multimodal.py::sample_frames — row-expanding mapInPandas)
  re-run with an INJECTED md5 checksum kernel whose preimage is
  VARCHAR-expressible (DuckDB's sha256 is VARCHAR-only, so the
  production sha-over-raw-bytes default stays rows-only; md5 over
  ``text || '|' || frame_index`` hashes identical UTF-8 bytes on both
  engines — the md5-twin discipline of hash_parity.py). Per-document
  declared_frames (1 + length % 12) varies the sampled index set
  {step·j : step·j < min(d, 4·step)}, step = max(d // 4, 1), so the
  rollup pins the expansion shape, not a constant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t
from scout_spark.inventory.retrieval import _BM25_B, _BM25_K1
from scout_spark.inventory.text_ops import _canon_sql, _tokens_sql

# ------------------------------------------------ Borůvka MST twin

# ceil(log2(|V|)) rounds guarantee convergence (components at least
# halve per round); 16 covers |V| up to 65k — sf0.1's ~20k co-purchase
# nodes included. Converged rounds are no-ops on both engines.
_MST_ROUNDS = 16

# lex-argmin packing: key = (w-1)·2^60 | src·2^40 | dst·2^20 | other.
# 20 bits per field holds part keys < 1,048,576 (sf 5+); w ∈ [1,5].
_MASK20 = (1 << 20) - 1


def _mst_twin_oracle(rounds: int = _MST_ROUNDS) -> str:
    """Generate the unrolled Borůvka CTE chain.

    Round r: cand{r} = cross-component edges under labels lab{r-1};
    inc{r} packs (w, src, dst, other_label) into one BIGINT per
    incident direction (parenthesized shifts — DuckDB gives ``+``/``|``
    higher precedence than ``<<``); sel{r} is the per-component min;
    p{r} breaks the group 2-cycle at the smaller label; reach{r}
    pointer-chases to the root (recursive, UNION-deduped, terminates at
    the self-loop); lab{r} relabels; tree{r} decodes the selected
    (w, src, dst) edges, DISTINCT because both endpoints of a group's
    minimum edge select it.
    """
    pack = (
        "((((w - 1)::BIGINT << 60) | (src::BIGINT << 40)) "
        "| (dst::BIGINT << 20))"
    )
    parts = [
        """
      WITH RECURSIVE edges AS MATERIALIZED (
        SELECT src, dst, 1 + ((src + dst) % 5) AS w FROM (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
        )
      ),
      lab0 AS MATERIALIZED (
        -- DISTINCT over UNION ALL, NOT a top-level UNION: under
        -- WITH RECURSIVE DuckDB parses any CTE whose body is
        -- 'a UNION b' with recursive-CTE grammar, silently dropping
        -- the dedup for non-self-referencing CTEs (measured: 2x|E|
        -- rows -> a 73M-row candidate join at sf0.001)
        SELECT DISTINCT v, v AS l FROM (
          SELECT src AS v FROM edges
          UNION ALL
          SELECT dst AS v FROM edges
        )
      )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
      cand{r} AS MATERIALIZED (
        SELECT ls.l AS cs, ld.l AS cd, e.src, e.dst, e.w
        FROM edges e
        JOIN lab{r - 1} ls ON ls.v = e.src
        JOIN lab{r - 1} ld ON ld.v = e.dst
        WHERE ls.l <> ld.l
      ),
      inc{r} AS (
        SELECT cs AS c, ({pack} | cd) AS k FROM cand{r}
        UNION ALL
        SELECT cd AS c, ({pack} | cs) AS k FROM cand{r}
      ),
      sel{r} AS MATERIALIZED (
        SELECT c, min(k) AS k FROM inc{r} GROUP BY c
      ),
      m{r} AS MATERIALIZED (
        SELECT c, (k & {_MASK20}) AS m FROM sel{r}
      ),
      p{r} AS MATERIALIZED (
        SELECT a.c,
               CASE WHEN b.m = a.c AND a.m > a.c THEN a.c ELSE a.m END
                 AS p
        FROM m{r} a JOIN m{r} b ON b.c = a.m
      ),
      reach{r} AS (
        SELECT c, p AS l FROM p{r}
        UNION
        SELECT rr.c, pp.p AS l
        FROM reach{r} rr JOIN p{r} pp ON pp.c = rr.l
      ),
      newl{r} AS MATERIALIZED (
        SELECT rr.c, rr.l
        FROM reach{r} rr JOIN p{r} pp ON pp.c = rr.l
        WHERE pp.p = rr.l
      ),
      lab{r} AS MATERIALIZED (
        SELECT lv.v, coalesce(f.l, lv.l) AS l
        FROM lab{r - 1} lv LEFT JOIN newl{r} f ON f.c = lv.l
      ),
      tree{r} AS (
        SELECT DISTINCT ((k >> 60) + 1)::BIGINT AS w,
               ((k >> 40) & {_MASK20})::BIGINT AS src,
               ((k >> 20) & {_MASK20})::BIGINT AS dst
        FROM sel{r}
      )"""
        )
    union = "\n        UNION ALL\n        ".join(
        f"SELECT * FROM tree{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f""",
      alltree AS (
        {union}
      )
      SELECT w, count(*)::BIGINT AS n_edges,
             sum(w)::BIGINT AS weight_sum,
             sum(src)::BIGINT AS src_sum,
             sum(dst)::BIGINT AS dst_sum
      FROM alltree GROUP BY w ORDER BY w"""
    )
    return "".join(parts)


@register(
    "graph_mst_boruvka_unrolled_twin",
    "Oracle-exact Borůvka minimum-spanning-forest twin (VERDICT r06 "
    "item 2): the graph_mst_boruvka entry's forest (part co-purchase "
    "graph, deterministic weights 1 + (src+dst) % 5, total edge order "
    "(w, src, dst)) reduced per weight class — edge count and weight "
    "sum, 5 rows. Spark runs operators/mst.py::boruvka_mst (per-round "
    "distributed argmin + bounded driver union-find contraction, the "
    "k-means-precedent shape, Kruskal-pinned in tests/test_graph.py); "
    "the oracle unrolls 16 Borůvka rounds as a generated CTE chain "
    "with a packed-int64 lex argmin and a recursive pointer-chase "
    "contraction — independent formulations of the same unique forest "
    "(ties broken by the shared total order make it unique; extra "
    "rounds are no-ops). 100 TB: rounds = O(log V) with per-round "
    "work one relabel + one map-side-combinable argmin over pruned "
    "edges; contraction state is component-sized, halving per round.",
    oracle=_mst_twin_oracle(),
)
def graph_mst_boruvka_unrolled_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.graph_ops import _edges
    from scout_spark.operators.mst import boruvka_mst

    e = _edges(spark, sf_dir).select(
        "src",
        "dst",
        (F.lit(1) + (F.col("src") + F.col("dst")) % 5).alias("w"),
    )
    # _edges is session-persisted — skip the operator's input
    # checkpoint (a second full copy of the 600k-row edge list; the
    # weight projection re-reads the cache per round either way)
    tree = boruvka_mst(e, max_rounds=_MST_ROUNDS, checkpoint_input=False)
    return (
        tree.groupBy(F.col("w").cast("long").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum("w").cast("long").alias("weight_sum"),
            # endpoint sums pin WHICH edges were chosen, not just how
            # many — the per-w histogram alone is weakly discriminating
            # on a dense graph where w=1 edges span nearly everything
            F.sum("src").cast("long").alias("src_sum"),
            F.sum("dst").cast("long").alias("dst_sum"),
        )
        .orderBy("w")
    )


# ------------------------------------- frame-sample md5 twin

_FS_NFRAMES = 4
_FS_DECL_MOD = 12  # declared_frames = 1 + length(text) % 12 ∈ [1, 12]


def _fs_twin_oracle() -> str:
    return f"""
      WITH f AS (
        SELECT doc_id, coalesce(text, '') AS text,
               1 + (length(coalesce(text, '')) % {_FS_DECL_MOD}) AS d
        FROM documents
      ),
      s AS (
        SELECT doc_id, text, d,
               greatest(d // {_FS_NFRAMES}, 1) AS step
        FROM f
      ),
      frames AS (
        SELECT s.doc_id, (s.step * g.j)::BIGINT AS fi,
               md5(s.text || '|' || (s.step * g.j)::VARCHAR) AS ck
        FROM s CROSS JOIN generate_series(0, {_FS_NFRAMES - 1}) g(j)
        WHERE s.step * g.j < least(s.d, {_FS_NFRAMES} * s.step)
      ),
      per AS (
        SELECT doc_id, count(*)::BIGINT AS n_frames,
               count(DISTINCT ck)::BIGINT AS n_distinct,
               max(fi)::BIGINT AS max_fi,
               min(ck) AS mn, max(ck) AS mx
        FROM frames GROUP BY doc_id
      )
      SELECT n_frames, max_fi AS max_frame_index,
             count(*)::BIGINT AS n_media,
             sum(n_distinct)::BIGINT AS total_distinct_frames,
             min(mn) AS min_checksum, max(mx) AS max_checksum
      FROM per GROUP BY n_frames, max_fi
      ORDER BY n_frames, max_fi
    """


@register(
    "multimodal_frame_sample_md5_twin",
    "Oracle-exact frame-sampling twin (VERDICT r06 item 4): the "
    "multimodal_frame_sample_rollup plumbing — pack text bytes as "
    "video-kind blobs, row-expanding mapInPandas frame sampler "
    "(operators/multimodal.py::sample_frames) — re-run with (a) "
    "per-document declared_frames = 1 + length(text) % 12 so the "
    "sampled index set {step·j < min(d, 4·step)} actually varies, and "
    "(b) an injected md5 checksum over text||'|'||frame_index, the "
    "VARCHAR-expressible md5-twin preimage (DuckDB sha256 is "
    "VARCHAR-only; the production sha-over-raw-bytes default stays in "
    "the rows-only entry). Rollup by (n_frames, max_frame_index) with "
    "min/max checksum per group VALUE-PINNING the per-frame digests "
    "cross-engine, not just their counts. 100 TB: expansion factor "
    "bounded by the sample rate; rollup combines map-side; the Arrow "
    "kernel is batch-columnar, no per-row Python outside the sampler.",
    oracle=_fs_twin_oracle(),
)
def multimodal_frame_sample_md5_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    blobs = d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("documents").alias("source"),
            (F.lit(1) + F.length("text") % _FS_DECL_MOD)
            .cast("int")
            .alias("declared_frames"),
        ).alias("meta"),
    )

    def _md5_ck(payload: bytes, fi: int) -> str:
        return hashlib.md5(
            payload + b"|" + str(fi).encode()
        ).hexdigest()

    frames = sample_frames(
        blobs, n_frames=_FS_NFRAMES, checksum_fn=_md5_ck
    )
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.count_distinct("frame_checksum").cast("long").alias(
            "n_distinct"
        ),
        F.max("frame_index").cast("long").alias("max_frame_index"),
        F.min("frame_checksum").alias("mn"),
        F.max("frame_checksum").alias("mx"),
    )
    return (
        per.groupBy("n_frames", "max_frame_index")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("n_distinct").cast("long").alias(
                "total_distinct_frames"
            ),
            F.min("mn").alias("min_checksum"),
            F.max("mx").alias("max_checksum"),
        )
        .orderBy("n_frames", "max_frame_index")
    )


# --------------------------------- image perceptual-hash dedup

_PH_BANDS = 4
_PH_BANDW = 16
_PH_HAM = 3  # pigeonhole: <= 3 differing bits over 4 bands => a band matches


def _phash_oracle() -> str:
    """63-bit Walsh–Hadamard sign hash + band-blocked Hamming pairs.

    The raster is the deterministic fake image decode recomputed from
    unicode code points (the audio-energy ord() discipline): pixel
    p[k] = code point of the character at 1 + k·stride, stride =
    max(len // 64, 1). The transform is the 8×8 WHT — the integer-
    exact stand-in for pHash's DCT (same sign-of-low-frequency-
    coefficient construction; WHT-based perceptual hashes are the
    standard integer variant) — with sign s_u(i) = (-1)^popcount(u&i).
    Bit (u·8+v)−1 of the hash is [c_uv > 0], DC (0,0) excluded so the
    hash fits 63 bits (bit 63 would overflow BIGINT <<).
    """
    return f"""
      WITH d AS (
        SELECT doc_id, coalesce(text, '') AS t,
               length(coalesce(text, '')) AS n
        FROM documents
      ),
      px AS (
        SELECT d.doc_id, g.k AS k,
          CASE WHEN 1 + (g.k * greatest(d.n // 64, 1)) <= d.n
               THEN unicode(substr(d.t, 1 + (g.k * greatest(d.n // 64, 1)), 1))
               ELSE 0 END AS p
        FROM d CROSS JOIN generate_series(0, 63) g(k)
      ),
      sgn AS (
        SELECT u.u, v.v, g.k,
               (1 - 2 * (bit_count((u.u & (g.k // 8))::BIGINT) % 2))
             * (1 - 2 * (bit_count((v.v & (g.k % 8))::BIGINT) % 2)) AS s
        FROM generate_series(0, 7) u(u),
             generate_series(0, 7) v(v),
             generate_series(0, 63) g(k)
      ),
      coef AS (
        SELECT px.doc_id, sgn.u, sgn.v, sum(sgn.s * px.p)::BIGINT AS c
        FROM px JOIN sgn ON sgn.k = px.k
        GROUP BY px.doc_id, sgn.u, sgn.v
      ),
      h AS (
        SELECT doc_id,
               coalesce(sum(
                 CASE WHEN c > 0 AND u + v > 0
                      THEN (1::BIGINT << ((u * 8 + v) - 1))
                      ELSE 0 END), 0)::BIGINT AS ph
        FROM coef GROUP BY doc_id
      ),
      bands AS (
        SELECT doc_id, ph, g.i AS band,
               ((ph >> (16 * g.i)) & 65535) AS bv
        FROM h CROSS JOIN generate_series(0, {_PH_BANDS - 1}) g(i)
      )
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ph, b.ph)) <= {_PH_HAM}
      ORDER BY doc_a, doc_b
    """


def _phash_udf():
    """Arrow-batched 63-bit WHT perceptual hash (created lazily — a
    pandas_udf return type needs an active session to parse; pandas/
    numpy imported at module level so the type hints resolve under
    postponed annotations)."""
    hmat = np.array(
        [
            [1 - 2 * (bin(u & i).count("1") % 2) for i in range(8)]
            for u in range(8)
        ],
        dtype=np.int64,
    )
    weights = np.zeros(64, dtype=np.int64)
    weights[1:] = np.int64(1) << np.arange(0, 63, dtype=np.int64)

    @F.pandas_udf("long")
    def _ph(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for row, t in enumerate(texts):
            t = t or ""
            n = len(t)
            stride = max(n // 64, 1)
            px = np.zeros(64, dtype=np.int64)
            for k in range(64):
                pos = k * stride  # 0-based == SQL's 1-based 1+k*stride
                if pos < n:
                    px[k] = ord(t[pos])
            c = hmat @ px.reshape(8, 8) @ hmat
            bits = (c > 0).ravel()
            bits[0] = False  # DC excluded — 63-bit hash
            out[row] = int((bits * weights).sum())
        return pd.Series(out)

    return _ph


@register(
    "dedup_image_phash_wht_pairs",
    "Image perceptual-hash near-duplicate pairs (VERDICT r06 item 7a): "
    "a 63-bit Walsh–Hadamard sign hash over the deterministic fake "
    "8×8 raster (code points sampled at stride len//64 — the "
    "multimodal fake-decode contract; WHT is the integer-exact "
    "stand-in for pHash's DCT, same sign-of-coefficient bits, "
    "ord()-recomputable in SQL like the audio-energy twin), then the "
    "proven simhash machinery: 4×16-bit band blocking (pigeonhole-"
    "lossless for hamming <= 3) and a bucket EQUI-JOIN carrying both "
    "hashes so bit_count verifies inside codegen. The hash kernel is "
    "an Arrow pandas_udf (numpy 8×8 matmuls per batch — per-row-heavy "
    "work on the sanctioned slow path; production swaps the fake "
    "raster for a real image decode behind the same signature). "
    "100 TB: shuffles only (doc_id, band, bucket, hash); never "
    "all-pairs; bucket skew bounded by near-identical-raster cluster "
    "size (measured max bucket 3 at sf0.01).",
    oracle=_phash_oracle(),
)
def dedup_image_phash_wht_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.core import _th

    d = _th(spark, sf_dir, "documents")
    ph = _phash_udf()
    # lazy localCheckpoint: the optimizer inlines the Arrow-UDF hash
    # into BOTH the band-explode Generate and the carrying projection
    # on EACH join side (4 ArrowEvalPython kernels measured; a
    # repartition barrier did NOT stop it — projects collapse through
    # RepartitionByExpression). Materializing the narrow (doc_id, ph)
    # frame runs the kernel exactly once; bench lists this entry in
    # E2E_REBUILD so the checkpoint compute stays inside the timed
    # fresh build (the CC/pagerank discipline).
    sigs = d.select(
        "doc_id",
        ph(F.coalesce(F.col("text"), F.lit(""))).alias("ph"),
    ).localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("ph"), b * _PH_BANDW)
                        .bitwiseAND(F.lit((1 << _PH_BANDW) - 1))
                        .alias("bv"),
                    )
                    for b in range(_PH_BANDS)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "ph", "x.band", "x.bv")
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("ph").alias("pa"),
        "band", "bv",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("ph").alias("pb"),
        "band", "bv",
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        a.join(b, ["band", "bv"])
        .where((F.col("doc_a") < F.col("doc_b")) & (ham <= _PH_HAM))
        .select(
            "doc_a", "doc_b", ham.cast("long").alias("hamming")
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------- feature-based LTR rerank twin

_LTR_TERMS = ("spark", "table", "merge", "fast")
_LTR_BIGRAMS = ("spark table", "table merge", "merge fast")
_LTR_ABSENT = 1_000_000_000  # first-match sentinel (candidates match >= 1 term)


@register(
    "rerank_ltr_linear_features",
    "Feature-based learning-to-rank rerank (VERDICT r06 item 7b — the "
    "cross-encoder-style second stage): BM25 selects a deterministic "
    "top-50 candidate set off the SHARED persisted posting frame "
    "(retrieval.py::_bm25_all_scored — the corpus is tokenized once "
    "per session, the BM25-family cache rule), then a fixed linear "
    "model scores five query-document features per candidate: bm25, "
    "term coverage, query-bigram hits (' spark table ' etc. as "
    "whole-token substrings of the padded canon text), earliest "
    "whole-token match position, and document length — the classic "
    "LTR feature template (production swaps the fixed weights for a "
    "trained model over the same feature frame). All features are "
    "integer or 6dp-rounded, the score expression is written in the "
    "identical order on both engines, and ties order by doc_id. "
    "100 TB: feature extraction is candidate-bounded (50 rows joined "
    "back to text), never corpus-bounded — the reference's two-phase "
    "filter-then-verify shape (repo.py:48-71) applied to LTR.",
    oracle=f"""
      WITH dl AS (
        SELECT doc_id, {_tokens_sql("text")} AS toks,
               len({_tokens_sql("text")}) AS dl
        FROM documents
      ),
      stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl WHERE dl > 0
      ),
      posting AS (
        SELECT doc_id, dl, tok, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        WHERE tok IN ('spark', 'table', 'merge', 'fast')
        GROUP BY doc_id, dl, tok
      ),
      dfreq AS (SELECT tok, count(*) AS dfr FROM posting GROUP BY tok),
      bm25_scored AS (
        SELECT p.doc_id,
               round(sum(
                 ln(1.0 + (s.n_docs - f.dfr + 0.5) / (f.dfr + 0.5))
                 * p.tf * ({_BM25_K1} + 1.0)
                 / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * p.dl / s.avgdl))
               ), 6) AS bm25,
               count(*)::BIGINT AS n_terms
        FROM posting p JOIN dfreq f USING (tok) CROSS JOIN stats s
        GROUP BY p.doc_id
      ),
      cand AS (
        SELECT doc_id, bm25, n_terms FROM bm25_scored
        ORDER BY bm25 DESC, doc_id LIMIT 50
      ),
      feats AS (
        SELECT c.doc_id, c.bm25, c.n_terms, l.dl::BIGINT AS dl,
               ' ' || {_canon_sql("d.text")} || ' ' AS pc
        FROM cand c
        JOIN documents d USING (doc_id)
        JOIN dl l USING (doc_id)
      ),
      scored AS (
        SELECT doc_id, bm25, n_terms, dl,
               ({" + ".join(f"CASE WHEN strpos(pc, ' {b} ') > 0 THEN 1 ELSE 0 END" for b in _LTR_BIGRAMS)})::BIGINT
                 AS bigram_hits,
               least({", ".join(f"CASE WHEN strpos(pc, ' {t} ') > 0 THEN strpos(pc, ' {t} ') ELSE {_LTR_ABSENT} END" for t in _LTR_TERMS)})::BIGINT
                 AS first_pos
        FROM feats
      )
      SELECT doc_id, bm25, n_terms, bigram_hits, first_pos, dl,
             round(bm25 + 0.5 * n_terms + 0.8 * bigram_hits
                   - 0.0005 * dl + 2.0 / (1.0 + first_pos), 6)
               AS ltr_score
      FROM scored
      ORDER BY ltr_score DESC, doc_id
      LIMIT 10
    """,
)
def rerank_ltr_linear_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.functions.normalize import canon_ascii
    from scout_spark.inventory.retrieval import (
        _bm25_all_scored,
        _bm25_per_doc,
    )

    cand = (
        _bm25_all_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )
    dl = _bm25_per_doc(spark, sf_dir).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pc = F.concat(F.lit(" "), canon_ascii(F.col("text")), F.lit(" "))
    feats = (
        d.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(dl.join(F.broadcast(cand.select("doc_id")), "doc_id")), "doc_id")
        .select("doc_id", "bm25", "n_terms", "dl", pc.alias("pc"))
    )
    bigram_hits = None
    for b in _LTR_BIGRAMS:
        hit = (F.instr(F.col("pc"), f" {b} ") > 0).cast("long")
        bigram_hits = hit if bigram_hits is None else bigram_hits + hit
    first_pos = F.least(
        *[
            F.when(
                F.instr(F.col("pc"), f" {t} ") > 0,
                F.instr(F.col("pc"), f" {t} "),
            ).otherwise(F.lit(_LTR_ABSENT))
            for t in _LTR_TERMS
        ]
    ).cast("long")
    scored = feats.select(
        "doc_id",
        "bm25",
        F.col("n_terms").cast("long").alias("n_terms"),
        bigram_hits.alias("bigram_hits"),
        first_pos.alias("first_pos"),
        "dl",
    )
    ltr = F.round(
        F.col("bm25")
        + 0.5 * F.col("n_terms")
        + 0.8 * F.col("bigram_hits")
        - 0.0005 * F.col("dl")
        + 2.0 / (1.0 + F.col("first_pos")),
        6,
    )
    return (
        scored.withColumn("ltr_score", ltr)
        .orderBy(F.col("ltr_score").desc(), "doc_id")
        .limit(10)
    )




# ------------------ between-class scatter power-iteration twin

_PCA_SCALE = 1000  # q = floor(1000·x): exact on IEEE doubles
_PCA_VSCALE = 4096  # per-round renormalization target for |v|
_PCA_ROUNDS = 48  # eigengap ~0.80 on this corpus: 0.8^48 ≈ 2e-5


def _pca_twin_oracle(rounds: int = _PCA_ROUNDS) -> str:
    """Unrolled integer power iteration on the between-class (label)
    scatter of the quantized embeddings.

    The RAW covariance of this corpus is near-isotropic (λ2/λ1 ≈ 0.98
    at sf0.1 — power iteration cannot separate a top direction there;
    measured cos 0.01 after 64 rounds), but the label structure gives
    the between-class scatter a 0.80 eigengap at every sf. Integer
    form: d_l = n·S_l − n_l·S (= n·n_l·(μ_l − μ), BIGINT-exact), then
    B[i,j] = Σ_l sgn(d_l[i]d_l[j]) · (|d_l[i]d_l[j]| // (n·n_l)) —
    per-entry truncation ≤ |labels| absolute, relative ~1e-8. Each
    round: w = B·v, renormalize with the cross-engine-unambiguous
    sgn·(|w| // max(max|w| // VSCALE, 1)) (DuckDB ``//`` TRUNCATES
    while Python ``//`` floors — routing through abs makes them
    identical). Bounds measured on this corpus: |B| ≤ 8e8, |w| ≤
    1.5e13 ≪ 2⁶³; the Spark driver loop asserts the bound, DuckDB
    raises on overflow (loud either way). Direction == numpy's true
    top eigenvector of the float between-class scatter (cos = 1.0 at
    sf0.001/0.01/0.1, pinned in tests/test_graph.py).
    """
    parts = [
        f"""
      WITH flat AS MATERIALIZED (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               floor(unnest(embedding)::DOUBLE * {_PCA_SCALE})::BIGINT AS q
        FROM embeddings
      ),
      nn AS (SELECT count(DISTINCT vec_id) AS n FROM flat),
      nl AS (
        SELECT label, count(DISTINCT vec_id) AS c FROM flat
        GROUP BY label
      ),
      sg AS MATERIALIZED (
        SELECT dim, sum(q)::BIGINT AS s FROM flat GROUP BY dim
      ),
      sl AS MATERIALIZED (
        SELECT label, dim, sum(q)::BIGINT AS s FROM flat
        GROUP BY label, dim
      ),
      dvec AS MATERIALIZED (
        SELECT sl.label, sl.dim,
               (nn.n * sl.s - nl.c * sg.s)::BIGINT AS d
        FROM sl CROSS JOIN nn
        JOIN nl USING (label)
        JOIN sg ON sg.dim = sl.dim
      ),
      bmat AS MATERIALIZED (
        SELECT a.dim AS i, b.dim AS j,
               sum(
                 (CASE WHEN a.d * b.d < 0 THEN -1 ELSE 1 END)
                 * (abs(a.d * b.d) // (nn.n * nl.c))
               )::BIGINT AS s
        FROM dvec a
        JOIN dvec b USING (label)
        JOIN nl USING (label)
        CROSS JOIN nn
        GROUP BY a.dim, b.dim
      ),
      v0 AS (SELECT dim AS i, 1::BIGINT AS v FROM sg)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
      w{r} AS MATERIALIZED (
        SELECT m.i, sum(m.s * v.v)::BIGINT AS w
        FROM bmat m JOIN v{r - 1} v ON v.i = m.j
        GROUP BY m.i
      ),
      d{r} AS (
        SELECT greatest(max(abs(w)) // {_PCA_VSCALE}, 1) AS d FROM w{r}
      ),
      v{r} AS MATERIALIZED (
        SELECT i,
               (CASE WHEN w < 0 THEN -1 ELSE 1 END)
               * (abs(w) // dd.d) AS v
        FROM w{r} CROSS JOIN d{r} dd
      )"""
        )
    parts.append(
        f"""
      SELECT v.i::BIGINT AS dim, v.v::BIGINT AS eigvec_q,
             m.s::BIGINT AS bscatter_diag
      FROM v{rounds} v JOIN bmat m ON m.i = v.i AND m.j = v.i
      ORDER BY dim"""
    )
    return "".join(parts)


@register(
    "pca_between_scatter_integer_twin",
    "Oracle-exact principal-direction twin for the last "
    "float-iterative rows-only family (embedding_pca_label_scatter "
    "stays the float production path): top eigendirection of the "
    "BETWEEN-CLASS label scatter via integer power iteration over "
    "floor(1000x) codes — the HITS scaled-integer-iteration "
    "discipline (the raw covariance is near-isotropic on this corpus "
    "and has no recoverable top direction; the label scatter has a "
    "0.80 eigengap, see oracle docstring). Spark runs the "
    "DISTRIBUTED integer moment pass (per-label and global per-dim "
    "sums — map-side combinable; at 100 TB this is the "
    "operators/pca.py sufficient-statistics shape) and contracts the "
    "dimension-bounded 64×64 scatter to the driver for 48 "
    "deterministic renormalized iterations (Python ints == BIGINT "
    "under the asserted no-overflow bound; k-means/MMR "
    "bounded-contraction precedent). Direction == numpy's float "
    "between-class top eigenvector, cos 1.0 at every sf (pinned in "
    "tests/test_graph.py).",
    oracle=_pca_twin_oracle(),
)
def pca_between_scatter_integer_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _PCA_SCALE).cast(
                    "bigint"
                ),
            )
        ).alias("pos", "q"),
    ).select(
        "vec_id", "label", (F.col("pos") + 1).alias("dim"), "q"
    )
    # ONE distributed moment pass: per-(label, dim) integer sums and
    # counts — |labels|×64 rows, dimension-bounded contraction. The
    # global sums, label counts, and n all derive from it exactly
    # (integer sums are order-independent), saving three extra jobs
    # that each paid the local job floor (2.2 s -> 1.2 s at sf0.1).
    sl_rows = (
        flat.groupBy("label", "dim")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    nl = {r["label"]: r["c"] for r in sl_rows if r["dim"] == 1}
    n = sum(nl.values())
    sg: dict[int, int] = {}
    for r in sl_rows:
        sg[r["dim"]] = sg.get(r["dim"], 0) + r["s"]
    dims = sorted(sg)
    dvec: dict[int, dict[int, int]] = {}
    for r in sl_rows:
        dvec.setdefault(r["label"], {})[r["dim"]] = (
            n * r["s"] - nl[r["label"]] * sg[r["dim"]]
        )
    b = {(i, j): 0 for i in dims for j in dims}
    for lab, d in dvec.items():
        den = n * nl[lab]
        for i in dims:
            di = d[i]
            for j in dims:
                p = di * d[j]
                b[(i, j)] += (-1 if p < 0 else 1) * (abs(p) // den)
    v = {i: 1 for i in dims}
    for _ in range(_PCA_ROUNDS):
        w = {i: sum(b[(i, j)] * v[j] for j in dims) for i in dims}
        for x in w.values():  # mirror DuckDB's loud overflow, not wrap
            if abs(x) >= 1 << 63:
                raise OverflowError(
                    "pca twin: |w| exceeds BIGINT — rescale "
                    "_PCA_VSCALE for this corpus size"
                )
        m = max(max(abs(x) for x in w.values()) // _PCA_VSCALE, 1)
        v = {
            i: (-1 if w[i] < 0 else 1) * (abs(w[i]) // m) for i in dims
        }
    rows = [(int(i), int(v[i]), int(b[(i, i)])) for i in dims]
    return spark.createDataFrame(
        rows, "dim bigint, eigvec_q bigint, bscatter_diag bigint"
    ).orderBy("dim")


# ---------------------------- MMR greedy unrolled integer twin

_MMR_POOL = 20
_MMR_PICKS = 5
# λ = 0.7 scaled by 10: score = 7·rel − 3·max_sim_to_selected
_MMR_WREL, _MMR_WSIM = 7, 3


def _mmr_twin_oracle(picks: int = _MMR_PICKS) -> str:
    """Unrolled greedy MMR over a deterministic top-{pool} candidate
    cut: pick r is ONE argmax CTE over the pool minus the selected
    set, scoring 7·rel − 3·max(dot to selected) in exact BIGINT
    (floor(1000x) codes; dot ≤ 64·3079² < 2³⁰, ×7 ≪ 2⁶³). Plain WITH
    (no RECURSIVE), so the sel{r} UNION ALL chains are safe from the
    recursive-grammar footgun documented at the MST twin."""
    head = f"""
      WITH qv AS (
        SELECT list_transform(embedding,
                 x -> floor(x::DOUBLE * {_PCA_SCALE})::BIGINT) AS q
        FROM embeddings WHERE vec_id = 0
      ),
      cand AS (
        SELECT e.vec_id,
               list_transform(e.embedding,
                 x -> floor(x::DOUBLE * {_PCA_SCALE})::BIGINT) AS v
        FROM embeddings e WHERE e.vec_id <> 0
      ),
      relv AS MATERIALIZED (
        SELECT c.vec_id, c.v,
               list_sum(list_transform(range(1, len(c.v) + 1),
                        i -> c.v[i] * qv.q[i]))::BIGINT AS rel
        FROM cand c CROSS JOIN qv
      ),
      pool AS MATERIALIZED (
        SELECT vec_id, v, rel FROM relv
        ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}
      ),
      gram AS MATERIALIZED (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * b.v[i]))::BIGINT AS dot
        FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      ),
      p1 AS (
        SELECT vec_id, rel, ({_MMR_WREL} * rel)::BIGINT AS score
        FROM pool ORDER BY rel DESC, vec_id LIMIT 1
      ),
      sel1 AS (SELECT vec_id FROM p1)"""
    parts = [head]
    for r in range(2, picks + 1):
        parts.append(
            f""",
      p{r} AS (
        SELECT po.vec_id, po.rel,
               ({_MMR_WREL} * po.rel
                - {_MMR_WSIM} * max(g.dot))::BIGINT AS score
        FROM pool po JOIN gram g ON g.ia = po.vec_id
        WHERE g.ib IN (SELECT vec_id FROM sel{r - 1})
          AND po.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
        GROUP BY po.vec_id, po.rel
        ORDER BY score DESC, po.vec_id LIMIT 1
      ),
      sel{r} AS (
        SELECT vec_id FROM sel{r - 1}
        UNION ALL
        SELECT vec_id FROM p{r}
      )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT {r} AS rank, vec_id, rel AS rel_dot, score AS mmr_score"
        f" FROM p{r}"
        for r in range(1, picks + 1)
    )
    parts.append(f"\n      {union}\n      ORDER BY rank")
    return "".join(parts)


@register(
    "mmr_greedy_integer_unrolled_twin",
    "Oracle-exact MMR twin (Carbonell & Goldstein greedy "
    "diversification; rerank_mmr_diversified stays the float "
    "production path): integer relevance = dot of floor(1000x) codes "
    "against query vec 0, deterministic top-20 candidate cut, then "
    "the inherently sequential greedy unrolled as 5 argmax CTEs "
    "(score = 7·rel − 3·max dot to selected, ties on vec_id) — the "
    "BPE/MST fixed-step-unroll discipline applied to a greedy trace. "
    "Spark mirrors the same arithmetic: distributed relevance scan + "
    "TakeOrdered pool cut, then the driver greedy over the BOUNDED "
    "20-row pool with exact Python ints (the numpy pool pattern of "
    "operators/mmr.py, integer-exact here). 100 TB: the scan is the "
    "joinless ann_cosine shape; greedy cost is pool-bounded, never "
    "corpus-bounded.",
    oracle=_mmr_twin_oracle(),
)
def mmr_greedy_integer_unrolled_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == 0)
        .select(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _PCA_SCALE).cast(
                    "bigint"
                ),
            ).alias("q")
        )
        .collect()
    )
    schema = (
        "rank int, vec_id bigint, rel_dot bigint, mmr_score bigint"
    )
    if not qrows:
        return spark.createDataFrame([], schema)
    qv = [int(x) for x in qrows[0]["q"]]
    # ONE array literal (r12): the per-element F.array(*[F.lit(x)
    # .cast(...)]) form paid ~128 py4j round trips of plan-construction
    # chatter per build (A/B: 1.286 -> 1.129 s fresh, rows identical).
    # Python ints infer ArrayType(LongType) — the same bigint type.
    qcol = F.lit(qv)
    cand = e.where(F.col("vec_id") != 0).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _PCA_SCALE).cast(
                "bigint"
            ),
        ).alias("v"),
    )
    rel = F.aggregate(
        F.zip_with("v", qcol, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pool = (
        cand.withColumn("rel", rel)
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_POOL)
        .collect()  # bounded pool — driver greedy over 20 rows
    )
    vecs = {r["vec_id"]: [int(x) for x in r["v"]] for r in pool}
    rels = {r["vec_id"]: int(r["rel"]) for r in pool}

    def dot(a: list[int], b: list[int]) -> int:
        return sum(x * y for x, y in zip(a, b))

    order = sorted(rels, key=lambda i: (-rels[i], i))
    first = order[0]
    picks = [(1, first, rels[first], _MMR_WREL * rels[first])]
    selected = [first]
    for rank in range(2, _MMR_PICKS + 1):
        best = None
        for i in order:
            if i in selected:
                continue
            msim = max(dot(vecs[i], vecs[s]) for s in selected)
            score = _MMR_WREL * rels[i] - _MMR_WSIM * msim
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, rels[i], score)
        picks.append((rank, best[1], best[2], best[3]))
        selected.append(best[1])
    return spark.createDataFrame(picks, schema).orderBy("rank")
