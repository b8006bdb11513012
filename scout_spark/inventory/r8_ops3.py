"""Round-8 wave 3: the curation filter FUNNEL report (per-stage
survival/rejection bookkeeping every dataset-ablation writeup needs)
and exact intra-document repeated-substring detection (the
self-repetition signal at token-run granularity, completing the
Lee-et-al substring family next to the cross-doc entry).

Prototype checks (CLAUDE.md rule): the funnel stages reject real mass
on this corpus (500 -> 410 -> 394 -> 386 -> 374 docs at sf0.01); 8-gram
intra-doc anchors are ZERO here (random-word docs rarely self-repeat),
so the intra-doc entry anchors on 4-grams (2 anchor pairs at sf0.01,
9 at sf0.1 — sparse but non-vacuous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _th
from scout_spark.inventory.quality_ops import _TOK

# fixed stage order — marginal rejection counts are order-dependent by
# design (that is what a funnel reports)
_FUNNEL_STAGES = (
    ("min_length", "n_chars >= 150"),
    ("min_tokens", "nt >= 30"),
    ("distinct_ratio", "10*nd >= 3*nt"),
    ("has_stopword", "nstop > 0"),
)


@register(
    "curation_filter_funnel",
    "Curation filter funnel — per-stage survivor/rejection bookkeeping "
    "(docs and tokens surviving each filter applied in fixed order, "
    "marginal rejections, cumulative reject rate): the ablation table "
    "every dataset writeup publishes next to the final mix. Stages: "
    "min length (>=150 chars), min tokens (>=30), distinct-token "
    "ratio (integer compare 10·distinct >= 3·tokens — no float "
    "threshold), stopword presence. ONE pass computes per-doc "
    "features; the funnel is a single aggregate of cumulative-flag "
    "sums unpivoted to stage rows — map-side combinable, zero "
    "shuffles beyond the 1-row agg at ANY corpus size.",
    oracle=f"""
      WITH s AS (
        SELECT n_chars, len(toks) AS nt,
               len(list_distinct(toks)) AS nd,
               len(list_filter(toks, x -> x IN ('a', 'the'))) AS nstop
        FROM (
          SELECT n_chars,
                 regexp_extract_all(lower(text), '{_TOK}') AS toks
          FROM documents) t
      ),
      flags AS (
        SELECT nt,
               CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS f1,
               CASE WHEN n_chars >= 150 AND nt >= 30
                    THEN 1 ELSE 0 END AS f2,
               CASE WHEN n_chars >= 150 AND nt >= 30 AND 10*nd >= 3*nt
                    THEN 1 ELSE 0 END AS f3,
               CASE WHEN n_chars >= 150 AND nt >= 30 AND 10*nd >= 3*nt
                         AND nstop > 0
                    THEN 1 ELSE 0 END AS f4
        FROM s
      ),
      a AS (
        SELECT count(*)::BIGINT AS c0,
               sum(f1)::BIGINT AS c1, sum(f2)::BIGINT AS c2,
               sum(f3)::BIGINT AS c3, sum(f4)::BIGINT AS c4,
               sum(nt * f1)::BIGINT AS t1, sum(nt * f2)::BIGINT AS t2,
               sum(nt * f3)::BIGINT AS t3, sum(nt * f4)::BIGINT AS t4
        FROM flags
      )
      SELECT 1::BIGINT AS stage, 'min_length' AS stage_name,
             c1 AS n_docs_surviving, t1 AS n_tokens_surviving,
             (c0 - c1)::BIGINT AS n_rejected_at_stage,
             round((c0 - c1)::DOUBLE / c0, 6) AS cum_reject_rate
      FROM a
      UNION ALL
      SELECT 2, 'min_tokens', c2, t2, (c1 - c2)::BIGINT,
             round((c0 - c2)::DOUBLE / c0, 6) FROM a
      UNION ALL
      SELECT 3, 'distinct_ratio', c3, t3, (c2 - c3)::BIGINT,
             round((c0 - c3)::DOUBLE / c0, 6) FROM a
      UNION ALL
      SELECT 4, 'has_stopword', c4, t4, (c3 - c4)::BIGINT,
             round((c0 - c4)::DOUBLE / c0, 6) FROM a
      ORDER BY stage
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    return funnel_report(funnel_counters(d))


def funnel_flag_frame(docs: DataFrame) -> DataFrame:
    """Per-doc (nt, f1..f4) cumulative-stage flags — shared by the
    batch entry and the streaming twin (streaming/funnel.py) so the
    two can never silently diverge on the filter definitions."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
    s = docs.select(
        "n_chars",
        F.size(toks).alias("nt"),
        F.size(F.array_distinct(toks)).alias("nd"),
        F.size(
            F.filter(toks, lambda x: x.isin("a", "the"))
        ).alias("nstop"),
    )
    f1 = (F.col("n_chars") >= 150).cast("long")
    f2 = f1 * (F.col("nt") >= 30).cast("long")
    f3 = f2 * (10 * F.col("nd") >= 3 * F.col("nt")).cast("long")
    f4 = f3 * (F.col("nstop") > 0).cast("long")
    return s.select(
        "nt",
        f1.alias("f1"),
        f2.alias("f2"),
        f3.alias("f3"),
        f4.alias("f4"),
    )


def funnel_counters(docs: DataFrame) -> DataFrame:
    """One-row funnel counter aggregate (c0..c4 survivor counts,
    t1..t4 surviving-token sums). Plain decomposable sums — MERGEABLE
    streaming state; the streaming twin runs this same aggregate in
    complete mode and drains to an identical row."""
    return funnel_flag_frame(docs).agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        *[
            F.sum(f"f{k}").cast("long").alias(f"c{k}")
            for k in range(1, 5)
        ],
        *[
            F.sum(F.col("nt") * F.col(f"f{k}")).cast("long").alias(f"t{k}")
            for k in range(1, 5)
        ],
    )


def funnel_report(a: DataFrame) -> DataFrame:
    """Finishing step: unpivot the counter row to per-stage funnel
    rows. Pure bounded-frame arithmetic — stream-fed and batch-fed
    counters yield identical reports."""
    names = [n for n, _ in _FUNNEL_STAGES]
    stage_rows = ", ".join(
        f"{k}L, '{names[k - 1]}', c{k}, t{k}, "
        f"cast(c{k - 1} - c{k} as bigint), "
        f"round(cast(c0 - c{k} as double) / c0, 6)"
        for k in range(1, 5)
    )
    return (
        a.select(
            F.expr(
                f"stack(4, {stage_rows}) AS (stage, stage_name, "
                "n_docs_surviving, n_tokens_surviving, "
                "n_rejected_at_stage, cum_reject_rate)"
            )
        )
        .orderBy("stage")
    )


# ----------------------------------------- intra-doc repeated runs


_IK = 4  # intra-doc anchor gram width (tokens): 8-grams never repeat
# within a doc on this corpus (prototype: 0 anchors), 4-grams do


@register(
    "dedup_intra_doc_repeats",
    "EXACT longest repeated token run (>= 4 tokens) WITHIN a document "
    "— the self-repetition signal at substring granularity (the "
    "intra-doc half of Lee et al. 2022 exact-substring dedup; the "
    "cross-doc half is dedup_longest_duplicated_substring, same "
    "diagonal-island machinery): anchor on word 4-grams, self-join "
    "anchor positions within the doc (p1 < p2), and recover maximal "
    "repeats as consecutive-position islands per (doc, diagonal = "
    "p2 - p1). A repeated run of L tokens at a fixed offset yields "
    "exactly L-3 anchors on one diagonal, so max(island)+3 is the "
    "exact repeat length. Spark joins on xxhash64 of the gram (8-byte "
    "keys, accepted 64-bit collision class); the oracle joins gram "
    "text. 100 TB: the self-join is bounded by in-doc gram collisions "
    "(prototype: 9 anchor pairs across the whole sf0.1 corpus) and "
    "partitions on doc_id. Deterministic (run desc, doc_id) LIMIT 20.",
    oracle=f"""
      WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      g AS (
        SELECT doc_id, ue.i AS p,
               array_to_string(toks[ue.i:ue.i+{_IK - 1}], ' ') AS g
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks) - {_IK - 2}, 1)::BIGINT)) ue(i)
      ),
      pr AS (
        SELECT a.doc_id, a.p AS p1, b.p - a.p AS diag
        FROM g a JOIN g b
          ON a.doc_id = b.doc_id AND a.g = b.g AND a.p < b.p
      ),
      isl AS (
        SELECT doc_id, diag, p1 - row_number() OVER (
                 PARTITION BY doc_id, diag ORDER BY p1) AS grp
        FROM pr
      ),
      runs AS (
        SELECT doc_id, count(*) AS c
        FROM isl GROUP BY doc_id, diag, grp
      )
      SELECT doc_id, (max(c) + {_IK - 1})::BIGINT AS repeat_tokens,
             sum(c)::BIGINT AS n_anchor_matches
      FROM runs GROUP BY doc_id
      ORDER BY repeat_tokens DESC, doc_id
      LIMIT 20
    """,
)
def dedup_intra_doc_repeats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        _th(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        # barrier: tokenize once per row, not once per slice reference
        # in the gram zip (CollapseProject rule)
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )
    m = f"greatest(size(t) - {_IK - 1}, 0)"
    zipk = (
        "arrays_zip("
        + ", ".join(f"slice(t, {i}, {m})" for i in range(1, _IK + 1))
        + ")"
    )
    cw = ", ".join(f"s['{i}']" for i in range(_IK))
    g = d.select(
        "doc_id", F.posexplode(F.expr(zipk)).alias("pos0", "s")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("p"),
        F.xxhash64(F.expr(f"concat_ws(' ', {cw})")).alias("gh"),
    )
    a = g.select("doc_id", F.col("p").alias("p1"), "gh")
    b = g.select("doc_id", F.col("p").alias("p2"), "gh")
    pr = (
        a.join(b, ["doc_id", "gh"])
        .where(F.col("p1") < F.col("p2"))
        .select(
            "doc_id", "p1", (F.col("p2") - F.col("p1")).alias("diag")
        )
    )
    isl = pr.select(
        "doc_id",
        "diag",
        (
            F.col("p1")
            - F.row_number().over(
                Window.partitionBy("doc_id", "diag").orderBy("p1")
            )
        ).alias("grp"),
    )
    runs = isl.groupBy("doc_id", "diag", "grp").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        runs.groupBy("doc_id")
        .agg(
            (F.max("c") + (_IK - 1)).cast("long").alias("repeat_tokens"),
            F.sum("c").cast("long").alias("n_anchor_matches"),
        )
        .orderBy(F.col("repeat_tokens").desc(), "doc_id")
        .limit(20)
    )
