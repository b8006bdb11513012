"""Round-11 additions: dup-group keeper-policy audit.

The near-dup CC machinery (trainprep.cc_components + _CC_REACH_CTES)
answers "which docs are duplicates"; the curation decision a training-
data team actually makes next is WHICH copy to keep. The default
min-id keeper is arbitrary; a quality-aware keeper (here: longest doc,
doc_id tiebreak — the stand-in for a model quality score) retains more
usable text from every duplicate group. This entry quantifies that
choice per source: docs and characters retained under each policy over
the IDENTICAL group structure, so the delta is attributable to the
policy alone.

Shared-helper discipline (r10 keyframe-KPI precedent): the engine side
reads trainprep.cc_components and the oracle embeds trainprep.
_CC_REACH_CTES, so this audit and dedup_groups_connected_components
cannot disagree about what a duplicate group is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _th
from scout_spark.inventory.trainprep import _CC_REACH_CTES, cc_components


@register(
    "curation_dedup_keeper_policy_by_source",
    "Dup-group keeper-policy audit (r11): over the driver-green "
    "blocked-Jaccard CC groups (SHARED helper cc_components / "
    "_CC_REACH_CTES — group semantics cannot diverge from "
    "dedup_groups_connected_components), compare the docs and "
    "characters each source retains under the min-id keeper (the CC "
    "default) vs a quality-aware keeper (argmax n_chars, doc_id "
    "tiebreak — the stand-in for a model quality score). Both "
    "policies keep exactly one doc per group, so per-source deltas "
    "are pure policy attribution. Singletons (docs in no pair) are "
    "kept under both. All-integer counts/sums; source coalesced "
    "'unksrc' on both engines (ADVICE r09 NULL discipline). 100 TB: "
    "rides the adjudicated banded pair plan; adds one |components|-"
    "sized argmax agg and a source-bounded rollup.",
    oracle=f"""
      WITH RECURSIVE {_CC_REACH_CTES},
      comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
      j AS (
        SELECT doc.doc_id, coalesce(doc.source, 'unksrc') AS source,
               doc.n_chars,
               coalesce(c.comp, doc.doc_id) AS comp
        FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id
      ),
      kq AS (
        SELECT comp, doc_id AS qkeep FROM (
          SELECT comp, doc_id,
                 row_number() OVER (PARTITION BY comp
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM j) t WHERE rn = 1
      )
      SELECT j.source,
             count(*)::BIGINT AS n_docs,
             sum(CASE WHEN j.doc_id = j.comp THEN 1 ELSE 0 END)::BIGINT
               AS kept_minid,
             sum(CASE WHEN j.doc_id = kq.qkeep THEN 1 ELSE 0 END)::BIGINT
               AS kept_quality,
             sum(CASE WHEN j.doc_id = j.comp THEN j.n_chars
                      ELSE 0 END)::BIGINT AS chars_kept_minid,
             sum(CASE WHEN j.doc_id = kq.qkeep THEN j.n_chars
                      ELSE 0 END)::BIGINT AS chars_kept_quality
      FROM j JOIN kq ON j.comp = kq.comp
      GROUP BY j.source
      ORDER BY j.source
    """,
)
def curation_dedup_keeper_policy_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    comps = cc_components(spark, sf_dir).select("id", "component")
    docs = _th(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("unksrc")).alias("source"),
        "n_chars",
    )
    j = docs.join(
        comps, docs.doc_id == comps.id, "left"
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("comp"),
    )
    # quality keeper: max n_chars, min doc_id tiebreak — max_by over
    # (n_chars, -doc_id) (doc_id is non-negative). |components|-sized.
    kq = j.groupBy("comp").agg(
        F.expr("max_by(doc_id, struct(n_chars, -doc_id))").alias("qkeep")
    )
    kept_m = (F.col("doc_id") == F.col("comp")).cast("int")
    kept_q = (F.col("doc_id") == F.col("qkeep")).cast("int")
    return (
        j.join(kq, "comp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept_m).cast("long").alias("kept_minid"),
            F.sum(kept_q).cast("long").alias("kept_quality"),
            F.sum(F.col("n_chars") * kept_m)
            .cast("long")
            .alias("chars_kept_minid"),
            F.sum(F.col("n_chars") * kept_q)
            .cast("long")
            .alias("chars_kept_quality"),
        )
        .orderBy("source")
    )
