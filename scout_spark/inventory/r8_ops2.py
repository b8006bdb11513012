"""Round-8 wave 2: dedup-pipeline EVALUATION and curation analytics —
a precision/recall audit of the minhash-LSH candidate generator against
exact Jaccard ground truth, Rocchio pseudo-relevance-feedback query
expansion on top of the BM25 stack, and a cross-source n-gram overlap
matrix (the "which sources leak into each other" curation signal next
to curation_source_mix_report).  All oracle-backed.

Prototype checks before building (CLAUDE.md rule): cross-source 8-gram
overlap is non-vacuous on this corpus (22 source pairs share grams at
sf0.01, max 137 shared, sum 1,125) and the probe-style eval
construction yields exactly 8 true near-dup pairs out of 3,600 — both
signals have real answers, not empty frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.hash_parity import (
    _MINHASH_K,
    _PROBE_BANDS,
    _PROBE_CORPUS_N,
    _PROBE_ROWS_PER_BAND,
    _minhash_md5_signature,
    _probe_band_sql,
    _probe_sig_sql,
    _tokens,
)
from scout_spark.inventory.quality_ops import _TOK
from scout_spark.inventory.retrieval import _BM25_B, _BM25_K1
from scout_spark.inventory.text_ops import _tokens_sql


# --------------------------------------------------- LSH quality eval


def _shingle_set(text: Column) -> Column:
    """Distinct 3-token shingles — the EXACT set the minhash signature
    approximates (same construction as _minhash_md5_signature)."""
    toks = _tokens(text)
    sh = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(sh)


def _shingle_sql(src: str) -> str:
    """DuckDB twin of _shingle_set over ``src`` (id, text)."""
    return f"""
        SELECT id,
               list_distinct(
                 CASE WHEN len(toks) >= 3
                      THEN list_transform(range(1, len(toks) - 1), i ->
                             concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                      ELSE [array_to_string(toks, ' ')] END) AS s
        FROM (
          SELECT id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM ({src}) _t0) _t1
    """


def _probe_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The deterministic (corpus, batch) eval-set construction shared
    with dedup_minhash_md5_incremental_probe: first-token-dropped
    near-copies that SHOULD be found + salted novel docs that should
    not."""
    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.orderBy("doc_id")
        .limit(_PROBE_CORPUS_N)
        .select(F.col("doc_id").alias("id"), "text")
    )
    near = corpus.where(F.col("id") % 20 == 0).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    novel = corpus.where(F.col("id") % 20 == 7).select(
        (F.col("id") + 2_000_000).alias("id"),
        F.concat(
            F.lit("novel"),
            F.col("id").cast("string"),
            F.lit(" isolated vocabulary payload"),
        ).alias("text"),
    )
    return corpus, near.unionByName(novel)


def _band_frame(sig: DataFrame, idname: str) -> DataFrame:
    """Explode a (id, sig) frame into (idname, band, bucket) LSH rows —
    bucket ids are the band's literal signature slice (engine-exact)."""
    w = _PROBE_ROWS_PER_BAND
    return sig.select(
        F.col("id").alias(idname),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.slice("sig", b * w + 1, w), ","
                        ).alias("bucket"),
                    )
                    for b in range(_PROBE_BANDS)
                ]
            )
        ).alias("x"),
    ).select(idname, "x.band", "x.bucket")


_CORPUS_BATCH_SQL = f"""
      corpus_src AS (
        SELECT doc_id AS id, text FROM documents
        ORDER BY doc_id LIMIT {_PROBE_CORPUS_N}
      ),
      batch_src AS (
        -- base_id carries the pre-offset id under an unambiguous name
        -- (ADVICE r08): the old form aliased 'id + 1000000 AS id'
        -- while also referencing bare 'id' in the same SELECT, relying
        -- on DuckDB's base-column-over-lateral-alias precedence
        SELECT base_id + 1000000 AS id,
               regexp_replace(text, '^\\S+\\s+', '') AS text
        FROM (SELECT id AS base_id, text FROM corpus_src)
        WHERE base_id % 20 = 0
        UNION ALL
        SELECT base_id + 2000000 AS id,
               concat('novel', base_id,
                      ' isolated vocabulary payload') AS text
        FROM (SELECT id AS base_id, text FROM corpus_src)
        WHERE base_id % 20 = 7
      )
"""


@register(
    "eval_minhash_lsh_precision_recall",
    "Precision/recall audit of the minhash-LSH candidate generator "
    "against EXACT Jaccard ground truth — the eval a training-data "
    "team runs before trusting banded dedup at corpus scale. Candidates "
    "come from the production path (md5 minhash k=16, 4×4-slice "
    "buckets, band equi-join — dedup_minhash_md5_incremental_probe's "
    "kernel); ground truth is exact 3-shingle Jaccard >= 0.5 over the "
    "full batch×corpus grid of the deterministic probe eval set "
    "(near-copies that must hit + novels that must miss). The >= 0.5 "
    "test is the INTEGER comparison 2·|A∩B| >= |A∪B| — no float "
    "threshold to disagree on. All-pairs is the EVAL harness on the "
    "pinned probe slice (batch×corpus grid, stated bound), not the "
    "production path; at 100 TB this runs on a sampled eval slice "
    "exactly like this while production uses the banded join. "
    "Signatures and shingle sets materialize once (localCheckpoint — "
    "CollapseProject fence).",
    oracle=f"""
      WITH {_CORPUS_BATCH_SQL},
      csig AS ({_probe_sig_sql("SELECT * FROM corpus_src")}),
      bsig AS ({_probe_sig_sql("SELECT * FROM batch_src")}),
      cband AS ({_probe_band_sql("csig")}),
      bband AS ({_probe_band_sql("bsig")}),
      cand AS (
        SELECT DISTINCT bb.id AS batch_id, cb.id AS corpus_id
        FROM bband bb JOIN cband cb
          ON bb.band = cb.band AND bb.bucket = cb.bucket
      ),
      csh AS ({_shingle_sql("SELECT * FROM corpus_src")}),
      bsh AS ({_shingle_sql("SELECT * FROM batch_src")}),
      pairs AS (
        SELECT b.id AS batch_id, c.id AS corpus_id,
               len(list_intersect(b.s, c.s)) AS inter,
               len(b.s) AS lb, len(c.s) AS lc
        FROM bsh b CROSS JOIN csh c
      ),
      flags AS (
        SELECT
          CASE WHEN 2 * p.inter >= p.lb + p.lc - p.inter
               THEN 1 ELSE 0 END AS is_true,
          CASE WHEN cd.batch_id IS NOT NULL THEN 1 ELSE 0 END AS is_cand
        FROM pairs p LEFT JOIN cand cd
          ON p.batch_id = cd.batch_id AND p.corpus_id = cd.corpus_id
      )
      SELECT count(*)::BIGINT AS n_pairs,
             sum(is_true)::BIGINT AS n_true,
             sum(is_cand)::BIGINT AS n_candidates,
             sum(is_true * is_cand)::BIGINT AS tp,
             round(CASE WHEN sum(is_cand) > 0
               THEN sum(is_true * is_cand)::DOUBLE / sum(is_cand) END, 6)
               AS lsh_precision,
             round(CASE WHEN sum(is_true) > 0
               THEN sum(is_true * is_cand)::DOUBLE / sum(is_true) END, 6)
               AS lsh_recall
      FROM flags
    """,
)
def eval_minhash_lsh_precision_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    corpus, batch = _probe_frames(spark, sf_dir)
    # signatures/shingle sets feed banding AND the truth grid — fence
    # once so the fold kernels never inline per downstream reference
    csig = corpus.select(
        "id", _minhash_md5_signature(F.col("text")).alias("sig")
    ).localCheckpoint()
    bsig = batch.select(
        "id", _minhash_md5_signature(F.col("text")).alias("sig")
    ).localCheckpoint()
    cand = (
        _band_frame(csig, "corpus_id")
        .join(F.broadcast(_band_frame(bsig, "batch_id")), ["band", "bucket"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    csh = corpus.select(
        F.col("id").alias("corpus_id"), _shingle_set(F.col("text")).alias("cs")
    ).localCheckpoint()
    bsh = batch.select(
        F.col("id").alias("batch_id"), _shingle_set(F.col("text")).alias("bs")
    ).localCheckpoint()
    # batch×corpus truth grid: bounded by the probe eval-set design
    # (|batch| ≈ |corpus|/10 rows), so the nested-loop join is an
    # accepted bounded pool, never corpus²
    pairs = bsh.crossJoin(F.broadcast(csh)).select(
        "batch_id",
        "corpus_id",
        F.size(F.array_intersect("bs", "cs")).alias("inter"),
        F.size("bs").alias("lb"),
        F.size("cs").alias("lc"),
    )
    flags = pairs.join(
        cand.withColumn("c1", F.lit(1)), ["batch_id", "corpus_id"], "left"
    ).select(
        (2 * F.col("inter") >= F.col("lb") + F.col("lc") - F.col("inter"))
        .cast("long")
        .alias("is_true"),
        F.coalesce("c1", F.lit(0)).cast("long").alias("is_cand"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("is_true").cast("long").alias("n_true"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        F.sum(F.col("is_true") * F.col("is_cand")).cast("long").alias("tp"),
    )
    return agg.select(
        "n_pairs",
        "n_true",
        "n_candidates",
        "tp",
        F.round(
            F.when(
                F.col("n_candidates") > 0,
                F.col("tp").cast("double") / F.col("n_candidates"),
            ),
            6,
        ).alias("lsh_precision"),
        F.round(
            F.when(
                F.col("n_true") > 0,
                F.col("tp").cast("double") / F.col("n_true"),
            ),
            6,
        ).alias("lsh_recall"),
    )


# ------------------------------------------- Rocchio PRF expansion


_PRF_FEEDBACK_K = 10


@register(
    "retrieval_prf_rocchio_expansion",
    "Pseudo-relevance-feedback query expansion (Rocchio 1971 positive "
    "term weights): take the BM25 top-10 feedback docs for the "
    "flagship query (the SAME rounded-score/doc_id deterministic "
    "selection as bm25_topk_retrieval, off the shared persisted "
    "posting frame), then rank non-query terms by "
    "sum_tf_in_feedback × idf with the Robertson idf over corpus "
    "document frequency. The weight is one double expression from two "
    "integers (sum_tf, df) — no float accumulation to disagree on "
    "across engines. 100 TB: feedback set is top-k bounded; term "
    "candidates are feedback-vocabulary bounded and broadcast into "
    "ONE corpus pass for df; deterministic (weight desc, term) "
    "tie-break.",
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
      fb AS (
        SELECT p.doc_id,
               round(sum(
                 ln(1.0 + (s.n_docs - f.dfr + 0.5) / (f.dfr + 0.5))
                 * p.tf * ({_BM25_K1} + 1.0)
                 / (p.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * p.dl / s.avgdl))
               ), 6) AS bm25
        FROM posting p JOIN dfreq f USING (tok) CROSS JOIN stats s
        GROUP BY p.doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {_PRF_FEEDBACK_K}
      ),
      alltoks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      tfs AS (
        SELECT t.tok, count(*)::BIGINT AS sum_tf
        FROM alltoks t JOIN fb USING (doc_id)
        WHERE t.tok NOT IN ('spark', 'table', 'merge', 'fast')
        GROUP BY t.tok
      ),
      dfr2 AS (
        SELECT tok, count(DISTINCT doc_id)::BIGINT AS df
        FROM alltoks WHERE tok IN (SELECT tok FROM tfs)
        GROUP BY tok
      ),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT f.tok AS term, f.sum_tf, d.df,
             round(f.sum_tf
                   * ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5)),
                   6) AS rocchio
      FROM tfs f JOIN dfr2 d USING (tok) CROSS JOIN n
      ORDER BY rocchio DESC, term
      LIMIT 10
    """,
)
def retrieval_prf_rocchio_expansion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens
    from scout_spark.inventory.retrieval import _BM25_TERMS, _bm25_all_scored

    # Top-k feedback doc_ids as a LITERAL cursor (bounded driver
    # contraction, k=10 longs): the lazy broadcast form re-ran the
    # whole BM25-scoring subtree under BOTH consumers' broadcast
    # exchanges (~16 jobs/build, 3.3 s solo — FLOOR_r11); the
    # deterministic rounded-score/doc_id selection is unchanged.
    fb_ids = [
        r.doc_id
        for r in _bm25_all_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_PRF_FEEDBACK_K)
        .select("doc_id")
        .collect()
    ]
    tok = doc_tokens(spark, sf_dir)
    fbt = tok.where(
        F.col("doc_id").isin(fb_ids) & ~F.col("tok").isin(*_BM25_TERMS)
    )
    # feedback vocabulary == tfs's key set; the eager checkpoint of
    # the vocab-bounded agg lets the fterms broadcast read |vocab|
    # rows instead of re-evaluating the fbt lineage a second time
    tfs = (
        fbt.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("sum_tf"))
        .localCheckpoint(eager=True)
    )
    fterms = tfs.select("tok")
    dfr = (
        tok.join(F.broadcast(fterms), "tok")
        .groupBy("tok")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )
    nd = _t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        tfs.join(dfr, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("tok").alias("term"),
            "sum_tf",
            "df",
            F.round(
                F.col("sum_tf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("rocchio"),
        )
        .orderBy(F.col("rocchio").desc(), "term")
        .limit(10)
    )


# ------------------------------------- cross-source n-gram overlap


@register(
    "curation_cross_source_ngram_overlap",
    "Cross-source duplication matrix: for every source pair, the "
    "number of distinct word 8-grams they share, plus containment "
    "(shared / smaller source's gram vocabulary) and Jaccard — the "
    "'which sources leak into each other' signal a curation team reads "
    "next to the per-source mix report before setting dedup scope. "
    "Spark joins distinct (source, xxhash64(gram)) rows on the 8-byte "
    "hash (same accepted 64-bit collision class as the substring-dedup "
    "anchors); the oracle joins gram text — independent formulations. "
    "100 TB: the distinct gram frame localCheckpoints once (it feeds "
    "the totals agg AND both self-join sides), per-source totals "
    "broadcast (|sources| rows), and the gram equi-join is bounded by "
    "cross-source duplication density (8-gram collisions — "
    "prototype-measured rare), never corpus². Deterministic "
    "(shared desc, source_a, source_b) LIMIT 20.",
    oracle="""
      WITH t AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents
      ),
      g AS (
        SELECT DISTINCT source,
               array_to_string(toks[ue.i:ue.i+7], ' ') AS g
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks) - 6, 1)::BIGINT)) ue(i)
      ),
      tot AS (SELECT source, count(*) AS n FROM g GROUP BY source),
      pair AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*)::BIGINT AS shared_grams
        FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
      )
      SELECT p.source_a, p.source_b, p.shared_grams,
             ta.n::BIGINT AS grams_a, tb.n::BIGINT AS grams_b,
             round(p.shared_grams::DOUBLE / least(ta.n, tb.n), 6)
               AS containment,
             round(p.shared_grams::DOUBLE
                   / (ta.n + tb.n - p.shared_grams), 6) AS jaccard
      FROM pair p
      JOIN tot ta ON ta.source = p.source_a
      JOIN tot tb ON tb.source = p.source_b
      ORDER BY shared_grams DESC, source_a, source_b
      LIMIT 20
    """,
)
def curation_cross_source_ngram_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        _th(spark, sf_dir, "documents")
        .select(
            "source",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        # barrier: the tokenizing regex runs once per row, not once per
        # slice reference in the gram zip below (CollapseProject rule)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )
    m = "greatest(size(t) - 7, 0)"
    zip8 = (
        "arrays_zip("
        + ", ".join(f"slice(t, {i}, {m})" for i in range(1, 9))
        + ")"
    )
    cw = ", ".join(f"s['{i}']" for i in range(8))
    g = (
        d.select("source", F.explode(F.expr(zip8)).alias("s"))
        .select(
            "source",
            F.xxhash64(F.expr(f"concat_ws(' ', {cw})")).alias("gh"),
        )
        .distinct()
        # feeds the totals agg and BOTH self-join sides — materialize
        # the distinct gram frame once (simhash banded precedent)
        .localCheckpoint()
    )
    tot = g.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("source").alias("source_a"), "gh")
    b = g.select(F.col("source").alias("source_b"), "gh")
    pairs = (
        a.join(b, "gh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )
    ta = F.broadcast(
        tot.select(
            F.col("source").alias("source_a"), F.col("n").alias("grams_a")
        )
    )
    tb = F.broadcast(
        tot.select(
            F.col("source").alias("source_b"), F.col("n").alias("grams_b")
        )
    )
    return (
        pairs.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.round(
                F.col("shared_grams") / F.least("grams_a", "grams_b"), 6
            ).alias("containment"),
            F.round(
                F.col("shared_grams")
                / (F.col("grams_a") + F.col("grams_b") - F.col("shared_grams")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("shared_grams").desc(), "source_a", "source_b")
        .limit(20)
    )
