"""Scale-technique demonstrations as first-class inventory rows
(round 2). These operators exist for their PHYSICAL plan, not new
semantics — each is an identity rewrite whose result must equal the
naive formulation (which is exactly what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "join_salted_skew",
    "Salted skewed join (operators/skew.py::salted_join, build-brief "
    "skew mitigation): the fact side gets a deterministic 8-way salt, "
    "the dim side is exploded to all salts, and the join keys on "
    "(key, salt) so one hot key spreads over 8 reducers instead of "
    "stalling one. Semantics-preserving — the oracle is the PLAIN join; "
    "equality under disabled-broadcast SortMergeJoin is pinned in "
    "tests/test_operators.py.",
    oracle="""
      SELECT s.s_nationkey AS nationkey,
             round(sum(l.l_extendedprice), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        salted_join(li, sup, key="s_suppkey", salt=8)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "quality_outlier_mad",
    "Robust per-group outlier detection: median absolute deviation of "
    "document length per language, flagging docs beyond 2 MADs. Two "
    "tiny per-lang aggregates (exact interpolated medians — Spark "
    "percentile ≙ DuckDB quantile_cont) broadcast back onto the scan; "
    "the corpus-side work is two joinless passes. At 100 TB the exact "
    "median swaps for percentile_approx with the same plan shape.",
    oracle="""
      WITH med AS (
        SELECT lang, quantile_cont(n_chars, 0.50) AS med
        FROM documents GROUP BY lang
      ),
      mad AS (
        SELECT d.lang, any_value(m.med) AS med,
               quantile_cont(abs(d.n_chars - m.med), 0.50) AS mad
        FROM documents d JOIN med m ON d.lang = m.lang
        GROUP BY d.lang
      )
      SELECT d.doc_id, d.lang, d.n_chars,
             round(abs(d.n_chars - s.med) / nullif(s.mad, 0), 4) AS n_mads
      FROM documents d JOIN mad s ON d.lang = s.lang
      WHERE abs(d.n_chars - s.med) > 2 * s.mad
    """,
)
def quality_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.50)).alias("med")
    )
    dev = d.join(F.broadcast(med), "lang").select(
        "lang", "med", F.abs(F.col("n_chars") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("lang").agg(
        F.any_value("med").alias("med"),
        F.percentile("adev", F.lit(0.50)).alias("mad"),
    )
    return (
        d.join(F.broadcast(mad), "lang")
        .where(F.abs(F.col("n_chars") - F.col("med")) > 2 * F.col("mad"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                F.try_divide(
                    F.abs(F.col("n_chars") - F.col("med")),
                    F.nullif(F.col("mad"), F.lit(0.0)),
                ),
                4,
            ).alias("n_mads"),
        )
    )


def _cms_md5_bucket(col, d: int, width: int):
    # DuckDB-reproducible bucket (hash_parity.py md5 discipline):
    # first 8 md5 hex chars of "d:item" as an unsigned 32-bit int,
    # mod width — non-negative on both engines, so % == pmod.
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


@register(
    "sketch_cms_term_frequencies",
    "Count-min sketch term-frequency estimation (operators/sketches.py"
    "::cms_build/cms_estimates): one JVM-only groupBy builds the "
    "depth×width counter table (shuffle bounded by the sketch size, "
    "never the stream), point queries broadcast the sketch and take the "
    "min counter. Emits estimate alongside the exact count for the four "
    "flagship terms. Converted from rows-only in r11 (VERDICT r10 item "
    "5): the injected md5 bucket_fn makes every counter deterministic "
    "on both engines, so the full sketch+probe pipeline is the oracle "
    "(same pure-Column plan shape as the xxhash64 default, which stays "
    "the production hash — its never-undercounts and ≤εN-overcount "
    "bounds remain pinned in tests/test_retrieval.py).",
    oracle="""
      WITH tok AS (
        SELECT unnest(regexp_extract_all(
                 lower(coalesce(text, '')), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      cells AS (SELECT unnest(range(0, 4)) AS d, tok FROM tok),
      sketch AS (
        SELECT d,
               ('0x' || substr(md5(d::VARCHAR || ':' || tok), 1, 8))::BIGINT
                 % 2048 AS bucket,
               count(*) AS n
        FROM cells GROUP BY 1, 2
      ),
      probes(tok) AS (VALUES ('spark'), ('table'), ('merge'), ('fast')),
      pcells AS (
        SELECT p.tok, dd.d,
               ('0x' || substr(md5(dd.d::VARCHAR || ':' || p.tok),
                               1, 8))::BIGINT % 2048 AS bucket
        FROM probes p
        CROSS JOIN (SELECT unnest(range(0, 4)) AS d) dd
      ),
      est AS (
        SELECT pc.tok, min(coalesce(s.n, 0))::BIGINT AS estimate
        FROM pcells pc
        LEFT JOIN sketch s ON pc.d = s.d AND pc.bucket = s.bucket
        GROUP BY pc.tok
      ),
      ex AS (
        SELECT p.tok,
               (SELECT count(*) FROM tok t
                WHERE t.tok = p.tok)::BIGINT AS exact
        FROM probes p
      )
      SELECT e.tok, e.estimate, x.exact,
             e.estimate - x.exact AS overcount
      FROM est e JOIN ex x ON e.tok = x.tok
      ORDER BY e.tok
    """,
)
def sketch_cms_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.core import _th
    from scout_spark.inventory.text_ops import _tokens_col
    from scout_spark.operators.sketches import cms_build, cms_estimates

    d = _th(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tokens_col(F.col("text"))).alias("tok"))
    sketch = cms_build(
        toks, "tok", width=2048, depth=4, bucket_fn=_cms_md5_bucket
    )
    terms = spark.createDataFrame(
        [("spark",), ("table",), ("merge",), ("fast",)], "tok string"
    )
    est = cms_estimates(
        sketch, terms, "tok", width=2048, depth=4,
        bucket_fn=_cms_md5_bucket,
    )
    exact = (
        toks.join(F.broadcast(terms), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok",
            F.col("estimate").cast("long").alias("estimate"),
            F.coalesce("exact", F.lit(0)).cast("long").alias("exact"),
            (
                F.col("estimate") - F.coalesce("exact", F.lit(0))
            ).cast("long").alias("overcount"),
        )
        .orderBy("tok")
    )


@register(
    "ann_ivf_kmeans_topk",
    "IVF ANN probed with TRAINED k-means centroids (operators/kmeans.py "
    "feeding operators/ann.py::ivf_topk) instead of the hash-ranked "
    "sample — the full production shape: Lloyd rounds give tighter "
    "cells, so the same nprobe reads fewer wrong-cell candidates. "
    "Rows-only (iterative training); recall vs brute force pinned in "
    "tests/test_kmeans.py.",
    tags=("rows-only",),
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.ann import ivf_topk
    from scout_spark.operators.kmeans import kmeans_fit

    e = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, n_iters=3)
    return ivf_topk(
        e, query_vec_id=100, k=10, nprobe=2, centroid_matrix=cents
    )


@register(
    "kmeans_cluster_profile",
    "Distributed Lloyd's k-means over the embedding column (operators/"
    "kmeans.py) — the TRAINED coarse quantizer the IVF index's hash-"
    "sampled stand-in defers to. Per iteration: broadcast-closure numpy "
    "assignment (one matmul/argmax per Arrow batch), then a single "
    "groupBy with dim scalar avg() aggregates (JVM map-side partial "
    "agg — the shuffle carries k·dim partial sums, never vectors). "
    "Returns per-cluster sizes, mean intra-cluster cosine distance, and "
    "centroid L2 norm. Rows-only: the training loop is iterative "
    "(driver holds k·dim floats); determinism and inertia behavior "
    "pinned in tests/test_kmeans.py against an exact numpy replica.",
    tags=("rows-only",),
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from scout_spark.operators.kmeans import (
        kmeans_assign_with_distance,
        kmeans_fit,
    )

    e = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, n_iters=4)
    assigned = kmeans_assign_with_distance(e, cents)
    norms = np.linalg.norm(cents, axis=1)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cos_dist"), 6).alias("mean_intra_cosine_dist"),
        )
        .select(
            "cluster",
            "n_vectors",
            "mean_intra_cosine_dist",
            F.round(
                F.element_at(
                    F.array(*[F.lit(float(x)) for x in norms]),
                    F.col("cluster").cast("int") + 1,
                ),
                6,
            ).alias("centroid_l2_norm"),
        )
    )
