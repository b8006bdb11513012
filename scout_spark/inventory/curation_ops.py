"""Round-3 curation additions: temperature-style mixture resampling,
dedup-group size reporting, and SemDeDup semantic pruning.

Registered LAST in load_all (after retrieval/scale_ops) so rotation
queues these behind the round-2 backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.text_ops import _tokens_sql as _tok_sql

_KNUTH = 2654435761  # Knuth multiplicative hash (sampling_ops pattern)

@register(
    "mixture_temperature_resample",
    "Temperature-style mixture rebalance (the XLM-R/mT5 multilingual-"
    "pretraining recipe, alpha=0.5: downsample head languages toward "
    "sqrt-scaled weights so the rarest language's share rises without "
    "upsampling; sibling of quality_ops::sample_mixture_rebalance, "
    "which targets a FIXED mix — here the weights derive from the "
    "corpus itself): per-lang "
    "keep-threshold 100·sqrt(min_count/count) applied via the Knuth "
    "multiplicative hash bucket of doc_id — a row-local, fully "
    "pushable predicate, reproducible across engines/reruns/appends. "
    "Cross-engine FP safety: the threshold uses only IEEE "
    "exactly-rounded ops (÷, sqrt, ×), so both engines compute the "
    "bit-identical double and the bucket comparison can never "
    "boundary-flip.",
    oracle=f"""
      WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
      m AS (SELECT min(n_before) AS mn FROM c),
      r AS (
        SELECT lang, n_before,
               100.0 * sqrt(mn::DOUBLE / n_before) AS thr
        FROM c, m
      ),
      k AS (
        SELECT d.lang, count(*) AS n_kept
        FROM documents d JOIN r ON d.lang = r.lang
        WHERE (d.doc_id * {_KNUTH}) % 100 < r.thr
        GROUP BY d.lang
      )
      SELECT r.lang, r.n_before,
             coalesce(k.n_kept, 0) AS n_kept,
             round(r.thr, 6) AS keep_thr
      FROM r LEFT JOIN k ON r.lang = k.lang
      ORDER BY r.lang
    """,
)
def mixture_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    mn = cnt.agg(F.min("n_before").alias("mn"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n_before",
        (
            F.lit(100.0)
            * F.sqrt(F.col("mn").cast("double") / F.col("n_before"))
        ).alias("thr"),
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .where((F.col("doc_id") * F.lit(_KNUTH)) % 100 < F.col("thr"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_before",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.round(F.col("thr"), 6).alias("keep_thr"),
        )
        .orderBy("lang")
    )


@register(
    "dedup_component_size_histogram",
    "Dedup-group size distribution — the reporting stage every "
    "production dedup pass ships (how much of the corpus sits in "
    "2-doc groups vs giant near-dup families): the driver-green "
    "blocked-Jaccard pairs closed under connectivity "
    "(operators/dedup.py::connected_components), then two tiny "
    "aggregations (per-component size, then size histogram). Oracle "
    "recomputes via the recursive-CTE transitive closure.",
    oracle=f"""
      WITH RECURSIVE d AS (
        SELECT doc_id, lang, n_chars // 50 AS bkt,
               list_distinct({_tok_sql("text")}) AS toks
        FROM documents
      ),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
              >= 0.8
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
      ),
      reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
      ),
      comp AS (
        SELECT id, min(r) AS component FROM reach GROUP BY id
      ),
      sizes AS (
        SELECT component, count(*) AS group_size FROM comp GROUP BY component
      )
      SELECT group_size,
             count(*) AS n_groups,
             sum(group_size)::BIGINT AS n_docs,
             (sum(group_size) - count(*))::BIGINT AS n_duplicates
      FROM sizes GROUP BY group_size ORDER BY group_size
    """,
)
def dedup_component_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.text_ops import _tokens_col
    from scout_spark.operators.dedup import connected_components, jaccard_pairs

    d = _th(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        d,
        "doc_id",
        _tokens_col(F.col("text")),
        {"lang": F.col("lang"), "bkt": (F.col("n_chars") / 50).cast("long")},
        0.8,
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        sizes.groupBy("group_size")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").alias("n_docs"),
            (F.sum("group_size") - F.count(F.lit(1))).alias("n_duplicates"),
        )
        .orderBy("group_size")
    )


@register(
    "semdedup_embedding_prune",
    "SemDeDup semantic deduplication (Abbas et al., arXiv:2303.09540; "
    "operators/semdedup.py): k-means clusters the embedding corpus, "
    "cosine>=0.95 pairs are generated ONLY within clusters (blocked "
    "quadratic — the paper's tractability trick, an equi-join bucket "
    "at scale), transitive closure keeps one min-id representative "
    "per duplicate ball. Per-cluster keep/drop report. Rows-only: "
    "k-means assignment is engine-defined; planted-duplicate ground "
    "truth is pinned in tests/test_operators.py.",
    tags=("rows-only",),
)
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.semdedup import semdedup

    e = _t(spark, sf_dir, "embeddings")
    marked = semdedup(e, k=8, threshold=0.95)
    return (
        marked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias(
                "n_dropped"
            ),
            F.countDistinct(
                F.when(F.col("is_duplicate"), F.col("keeper"))
            ).alias("n_dup_groups"),
        )
        .orderBy("cluster")
    )
