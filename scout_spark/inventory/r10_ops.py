"""Round-10 wave: LM-quality scoring + per-source video-dedup KPI.

Two entries from the scoped round-9 queue (PLANS.md), both
prototype-first per the standing discipline:

- trigram Kneser-Ney HELD-OUT document scoring — the CCNet-style
  perplexity filter at trigram order, completing the LM-quality stack
  (bigram train r08 -> trigram train r09 -> held-out score r10).
  Prototype (sf0.01): 400 train / 100 held-out docs, all 20 sources on
  both sides of the split; 4,868 held-out trigram tokens, 0 OOV (the
  31-word corpus vocab — the OOV columns stay as the structural audit
  a real vocab needs); min distance of ln(p)*1e6 from a rounding
  boundary 1.8e-5 across all 3,873 distinct model probabilities —
  four orders of magnitude above cross-engine libm ULP error, so the
  integer round(ln(p)*1e6)::BIGINT recipe cannot flap.
- per-source keyframe dup-rate KPI — the rollup a video-curation team
  acts on, over the r09 keyframe pair machinery (shared
  keyframe_candidate_pairs helper + shared _keyframe_ctes oracle body,
  so the KPI cannot diverge from the pair entry). Prototype (sf0.01):
  rates 0-0.2 across 20 sources, 45 dup media of which 43 cross-source
  (src7 shows a within-source dup, so the cross split is non-vacuous).

No reference analogue (``/root/reference`` is a 673-line DuckDB
geocoder); these are build-brief training-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.quality_ops import _TOK
from scout_spark.inventory.r9_ops import (
    _KF_FRAME,
    _KF_THRESHOLD,
    _keyframe_ctes,
    keyframe_candidate_pairs,
)

# -------------------------- trigram KN held-out document perplexity

# held-out = (doc_id // 20) % 5 == 4 — a 20% split with WITHIN-source
# variation (doc_id % k with k | 20 is CONSTANT per source on this
# corpus: % 20 == source index; the URL-blocklist entry hit that
# collapse). doc_id is non-negative so DuckDB's truncating // and
# Spark's `div` agree. Prototyped: 400/100 docs, 20/20 sources.
_HELD_SQL = "(doc_id // 20) % 5 = 4"


def kn3_doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, w1, w2, w3) token trigrams — the
    tokenize + shifted-slice zip (O(1) references to the derived
    token array, the CollapseProject discipline). Pure-Column, so it
    runs identically on a batch frame and a streaming frame (shared
    by the batch entry and streaming/kn3score.py)."""
    d = docs.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(_TOK), 0
        ).alias("t"),
        # the repartition barrier materializes the token array so the
        # THREE slice references below read the shuffled column — not
        # three CollapseProject-inlined regex evaluations per row
        # (legal on streaming frames too)
    ).repartition(
        max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    )
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                "arrays_zip("
                "slice(t, 1, greatest(size(t) - 2, 0)), "
                "slice(t, 2, greatest(size(t) - 2, 0)), "
                "slice(t, 3, greatest(size(t) - 2, 0)))"
            )
        ).alias("s"),
    ).select(
        "doc_id",
        F.expr("s['0']").alias("w1"),
        F.expr("s['1']").alias("w2"),
        F.expr("s['2']").alias("w3"),
    )


def kn3_model(train_trigrams: DataFrame) -> dict:
    """Train-side interpolated-KN model from a trigram token frame:
    a lazy-checkpointed vocab^3-bounded type frame plus its derived
    dims. The checkpoint is load-bearing: the dim broadcasts
    materialize as SEPARATE jobs with no cross-job subtree reuse (the
    BM25 persist lesson) — without it each dim re-ran the full
    tokenize pipeline (7 parquet scans, 9.5 s at sf0.1; fenced: 1
    scan, 2.2 s). The checkpoint is EAGER: with a lazy one the 5
    broadcast-dim jobs race to materialize it and each recomputes the
    full corpus lineage when the scheduler launches them concurrently
    (AQE-on happened to serialize them; bench runs AQE-off and
    measured 1.7-23 s flapping walls at load 6+). ntot is a collected
    int (1-row bounded driver contraction) so scoring composes with
    Structured Streaming's single-aggregation limit (no 1-row
    crossJoin needed)."""
    tg = (
        train_trigrams.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
        .localCheckpoint(eager=True)
    )
    ctx = tg.groupBy("w1", "w2").agg(
        F.sum("c123").cast("long").alias("c12"),
        F.count(F.lit(1)).cast("long").alias("n3_foll"),
    )
    bt = tg.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("n_prec")
    )
    mid = bt.groupBy("w2").agg(
        F.sum("n_prec").cast("long").alias("nmid_2"),
        F.count(F.lit(1)).cast("long").alias("n23_types"),
    )
    uni = bt.groupBy("w3").agg(
        F.count(F.lit(1)).cast("long").alias("nprec_3")
    )
    ntot = bt.count()
    return {
        "tg": tg,
        "ctx": ctx,
        "bt": bt,
        "mid": mid,
        "uni": uni,
        "ntot": ntot,
    }


def kn3_score_per_doc(trigrams: DataFrame, model: dict) -> DataFrame:
    """Per-doc KN3 log-score over a trigram token stream: 5 broadcast
    dim joins (type-bounded; flip to shuffle joins past the
    autoBroadcast threshold), per-token integer round(ln(p)*1e6)
    micros, then exactly ONE aggregation — token-level scoring skips
    the per-(doc,type) shuffle AND keeps the pipeline legal on a
    streaming frame (Structured Streaming allows one aggregation).
    Integer sums over tokens equal the type-level sum(lnp*cnt)
    exactly."""
    s = (
        trigrams.join(F.broadcast(model["ctx"]), ["w1", "w2"], "left")
        .join(F.broadcast(model["tg"]), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(model["mid"]), ["w2"], "left")
        .join(F.broadcast(model["bt"]), ["w2", "w3"], "left")
        .join(F.broadcast(model["uni"]), ["w3"], "left")
        .withColumn("ntot", F.lit(model["ntot"]).cast("long"))
        .withColumn("c123", F.coalesce(F.col("c123"), F.lit(0)))
        .withColumn("n_prec", F.coalesce(F.col("n_prec"), F.lit(0)))
        .withColumn(
            "scored",
            F.col("c12").isNotNull()
            & F.col("nmid_2").isNotNull()
            & F.col("nprec_3").isNotNull(),
        )
    )
    # the IDENTICAL parenthesized expression as the oracle (and as
    # lm_kneser_ney_trigram — deterministic IEEE ops over identical
    # integers), then integer log-micros
    p_lower = F.greatest(F.col("n_prec") - 0.75, F.lit(0)) / F.col(
        "nmid_2"
    ) + ((0.75 * F.col("n23_types")) / F.col("nmid_2")) * (
        F.col("nprec_3").cast("double") / F.col("ntot")
    )
    p_kn3 = (
        F.greatest(F.col("c123") - 0.75, F.lit(0)) / F.col("c12")
        + ((0.75 * F.col("n3_foll")) / F.col("c12")) * p_lower
    )
    sc = s.select(
        "doc_id",
        "scored",
        F.when(
            F.col("scored"),
            F.round(F.log(p_kn3) * 1e6, 0).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("lnp_micro"),
    )
    agg = sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum(F.when(F.col("scored"), 1).otherwise(0))
        .cast("long")
        .alias("n_scored"),
        F.sum(F.when(F.col("scored"), 0).otherwise(1))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.when(F.col("scored"), F.col("lnp_micro")).otherwise(0))
        .cast("long")
        .alias("total_lnp_micro"),
    )
    avg_lnp = F.when(
        F.col("n_scored") > 0,
        F.round(
            (F.col("total_lnp_micro").cast("double") / 1e6)
            / F.col("n_scored"),
            6,
        ),
    )
    return agg.select(
        "doc_id",
        "n_trigrams",
        "n_scored",
        "n_oov",
        "total_lnp_micro",
        avg_lnp.alias("avg_lnp"),
    )


@register(
    "lm_kn3_heldout_doc_score",
    "Held-out document scoring under the interpolated trigram "
    "Kneser-Ney LM — the CCNet-style perplexity filter: train the "
    "full Chen-Goodman continuation-backoff model on the 80% train "
    "split, score every held-out document's trigrams by per-token "
    "round(ln(p)*1e6)::BIGINT (integer log-probability micros: "
    "integer SUMS are order-insensitive, so the per-doc total is "
    "engine-exact; prototype measured 1.8e-5 min distance from any "
    "rounding boundary vs ~1e-9 libm ULP error). Unseen events fall "
    "through the backoff chain (c123=0 -> continuation bigram -> "
    "continuation unigram); trigrams whose context/continuation is "
    "absent from train count as OOV (0 here by prototype — 31-word "
    "vocab — but the audit columns are what a real vocab needs). "
    "avg_lnp is ONE double division chain over identical integers, "
    "rounded 6dp. Most-surprising (lowest avg_lnp) 20 docs, doc_id "
    "tie-break. 100 TB: model frames are type-bounded dims "
    "(broadcast here; flip to shuffle joins past the autoBroadcast "
    "threshold), the held-out stream joins row-local, one per-doc "
    "shuffle; train/held branches reuse ONE tokenize exchange.",
    oracle=f"""
      WITH t AS (
        SELECT doc_id, {_HELD_SQL} AS held,
               regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      tg0 AS (
        SELECT doc_id, held, toks[ue.i] AS w1, toks[ue.i + 1] AS w2,
               toks[ue.i + 2] AS w3
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks) - 1, 1)::BIGINT)) ue(i)
      ),
      tg AS (
        SELECT w1, w2, w3, count(*)::BIGINT AS c123
        FROM tg0 WHERE NOT held GROUP BY 1, 2, 3
      ),
      ctx AS (
        SELECT w1, w2, sum(c123)::BIGINT AS c12,
               count(*)::BIGINT AS n3_foll
        FROM tg GROUP BY 1, 2
      ),
      bt AS (
        SELECT w2, w3, count(*)::BIGINT AS n_prec FROM tg GROUP BY 1, 2
      ),
      mid AS (
        SELECT w2, sum(n_prec)::BIGINT AS nmid_2,
               count(*)::BIGINT AS n23_types
        FROM bt GROUP BY 1
      ),
      uni AS (
        SELECT w3, count(*)::BIGINT AS nprec_3 FROM bt GROUP BY 1
      ),
      tot AS (SELECT count(*)::BIGINT AS ntot FROM bt),
      h AS (
        SELECT doc_id, w1, w2, w3, count(*)::BIGINT AS cnt
        FROM tg0 WHERE held GROUP BY 1, 2, 3, 4
      ),
      s AS (
        SELECT h.doc_id, h.cnt,
               ctx.c12, ctx.n3_foll, coalesce(tg.c123, 0) AS c123,
               mid.nmid_2, mid.n23_types,
               coalesce(bt.n_prec, 0) AS n_prec,
               uni.nprec_3, tot.ntot,
               (ctx.c12 IS NOT NULL AND mid.nmid_2 IS NOT NULL
                AND uni.nprec_3 IS NOT NULL) AS scored
        FROM h
        LEFT JOIN ctx ON h.w1 = ctx.w1 AND h.w2 = ctx.w2
        LEFT JOIN tg ON h.w1 = tg.w1 AND h.w2 = tg.w2 AND h.w3 = tg.w3
        LEFT JOIN mid ON h.w2 = mid.w2
        LEFT JOIN bt ON h.w2 = bt.w2 AND h.w3 = bt.w3
        LEFT JOIN uni ON h.w3 = uni.w3
        CROSS JOIN tot
      ),
      sc AS (
        SELECT doc_id, cnt, scored,
               CASE WHEN scored THEN round(ln(
                 greatest(c123 - 0.75, 0) / c12
                 + ((0.75 * n3_foll) / c12)
                   * (greatest(n_prec - 0.75, 0) / nmid_2
                      + ((0.75 * n23_types) / nmid_2)
                        * (nprec_3::DOUBLE / ntot))) * 1e6)::BIGINT
               ELSE 0 END AS lnp_micro
        FROM s
      ),
      agg AS (
        SELECT doc_id,
               sum(cnt)::BIGINT AS n_trigrams,
               sum(CASE WHEN scored THEN cnt ELSE 0 END)::BIGINT
                 AS n_scored,
               sum(CASE WHEN scored THEN 0 ELSE cnt END)::BIGINT
                 AS n_oov,
               sum(CASE WHEN scored THEN lnp_micro * cnt
                        ELSE 0 END)::BIGINT AS total_lnp_micro
        FROM sc GROUP BY doc_id
      )
      SELECT doc_id, n_trigrams, n_scored, n_oov, total_lnp_micro,
             CASE WHEN n_scored > 0 THEN
               round((total_lnp_micro::DOUBLE / 1e6) / n_scored, 6)
             END AS avg_lnp
      FROM agg
      ORDER BY avg_lnp ASC, doc_id
      LIMIT 20
    """,
)
def lm_kn3_heldout_doc_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _th(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.expr("doc_id div 20") % 5 == 4).alias("held"),
    )
    # the held filter sits BELOW the tokenize in both pipelines (each
    # pass tokenizes only its split); the train pass materializes the
    # model behind kn3_model's checkpoint, the held pass streams
    # through kn3_score_per_doc's broadcast joins
    model = kn3_model(
        kn3_doc_trigrams(docs.where(~F.col("held")))
    )
    scores = kn3_score_per_doc(
        kn3_doc_trigrams(docs.where(F.col("held"))), model
    )
    # asc_nulls_last, NOT asc (ADVICE r10): avg_lnp is NULL for an
    # all-OOV held-out doc (n_scored=0); Spark asc is NULLS FIRST but
    # DuckDB's ORDER BY avg_lnp ASC is NULLS LAST, so plain asc would
    # flip the top-20 the day a regenerated corpus produces one.
    # Pinned on an all-OOV fixture in tests/test_r11_advice.py.
    return scores.orderBy(
        F.asc_nulls_last("avg_lnp"), "doc_id"
    ).limit(20)


# ----------------------------- per-source keyframe dup-rate KPI


@register(
    "curation_keyframe_dup_rate_by_source",
    "Per-source video keyframe duplication KPI (VERDICT r09 item 5) — "
    "the number a video-data team acts on: for each source, how many "
    "of its media (videos with >= 1 keyframe) share a near-identical "
    "keyframe with ANY other media, and how many of those duplicate "
    "into a DIFFERENT source (cross-source redundancy is what "
    "source-level curation can actually deduplicate). Pairs come from "
    "the r09 keyframe machinery via the SHARED "
    "keyframe_candidate_pairs helper; the oracle shares the SAME "
    "_keyframe_ctes body as the pair entry, so KPI and pair semantics "
    "cannot diverge. dup_media_rate is one double division over "
    "identical integers, rounded 6dp. Prototyped: rates 0-0.2 across "
    "20 sources, 45 dup media / 43 cross-source at sf0.01. 100 TB: "
    "adds two media-keyed equi-joins and a 20-row rollup on top of "
    "the adjudicated pair plan; the source map is a slim (media_id, "
    "source) projection.",
    oracle=f"""
      WITH {_keyframe_ctes()},
      kstats AS (
        SELECT d.source, count(*)::BIGINT AS n_keyframes,
               count(DISTINCT h.doc_id)::BIGINT AS n_media
        FROM h JOIN documents d ON h.doc_id = d.doc_id GROUP BY 1
      ),
      dup AS (
        SELECT DISTINCT m, p FROM (
          SELECT da AS m, db AS p FROM cand
          UNION ALL SELECT db AS m, da AS p FROM cand)
      ),
      dupm AS (
        SELECT dup.m,
               max(CASE WHEN ds.source <> ps.source
                        THEN 1 ELSE 0 END) AS cross_f
        FROM dup
        JOIN documents ds ON dup.m = ds.doc_id
        JOIN documents ps ON dup.p = ps.doc_id
        GROUP BY dup.m
      ),
      dupstats AS (
        SELECT d.source, count(*)::BIGINT AS n_dup_media,
               sum(dupm.cross_f)::BIGINT AS n_dup_media_cross
        FROM dupm JOIN documents d ON dupm.m = d.doc_id GROUP BY 1
      )
      SELECT k.source, k.n_media, k.n_keyframes,
             coalesce(ds.n_dup_media, 0)::BIGINT AS n_dup_media,
             coalesce(ds.n_dup_media_cross, 0)::BIGINT
               AS n_dup_media_cross,
             round(coalesce(ds.n_dup_media, 0)::DOUBLE / k.n_media, 6)
               AS dup_media_rate
      FROM kstats k LEFT JOIN dupstats ds USING (source)
      ORDER BY k.source
    """,
)
def curation_keyframe_dup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.operators.multimodal import (
        pack_blobs,
        shot_keyframe_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    d = (
        _th(spark, sf_dir, "documents")
        .where(F.length("text") == F.octet_length("text"))
        .select(
            "doc_id",
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            "source",
        )
    )
    blobs = pack_blobs(
        d, "doc_id", "payload", kind="video", source_col="source"
    )
    # same CollapseProject fence as the pair entry: without it the
    # Arrow kernel re-runs under the band-explode Generate and on
    # each join side
    sigs = shot_keyframe_hashes(
        blobs, frame_bytes=_KF_FRAME, threshold=_KF_THRESHOLD
    ).localCheckpoint(eager=False)
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    kstats = (
        sigs.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keyframes"),
            F.countDistinct("media_id").cast("long").alias("n_media"),
        )
    )
    cand = keyframe_candidate_pairs(sigs)
    dup = (
        cand.select(F.col("da").alias("m"), F.col("db").alias("p"))
        .unionAll(
            cand.select(F.col("db").alias("m"), F.col("da").alias("p"))
        )
        .distinct()
    )
    dupm = (
        dup.join(
            src.select(
                F.col("media_id").alias("m"),
                F.col("source").alias("m_source"),
            ),
            "m",
        )
        .join(
            src.select(
                F.col("media_id").alias("p"),
                F.col("source").alias("p_source"),
            ),
            "p",
        )
        .groupBy("m", "m_source")
        .agg(
            F.max(
                F.when(
                    F.col("m_source") != F.col("p_source"), 1
                ).otherwise(0)
            ).alias("cross_f")
        )
    )
    dupstats = dupm.groupBy(F.col("m_source").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_media"),
        F.sum("cross_f").cast("long").alias("n_dup_media_cross"),
    )
    return (
        kstats.join(dupstats, "source", "left")
        .select(
            "source",
            "n_media",
            "n_keyframes",
            F.coalesce(F.col("n_dup_media"), F.lit(0))
            .cast("long")
            .alias("n_dup_media"),
            F.coalesce(F.col("n_dup_media_cross"), F.lit(0))
            .cast("long")
            .alias("n_dup_media_cross"),
            F.round(
                F.coalesce(F.col("n_dup_media"), F.lit(0)).cast(
                    "double"
                )
                / F.col("n_media"),
                6,
            ).alias("dup_media_rate"),
        )
        .orderBy("source")
    )
