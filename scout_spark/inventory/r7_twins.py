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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

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
    tree = boruvka_mst(e, max_rounds=_MST_ROUNDS)
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
