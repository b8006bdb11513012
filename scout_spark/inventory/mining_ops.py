"""Round-4 mining additions: contrastive hard-negative mining,
perplexity-decile corpus composition, and the SQL LATERAL join surface.

Registered last in load_all so rotation queues these behind the
never-checked backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t
from scout_spark.inventory.text_ops import _tokens_sql

# Hard-negative mining runs exact over a bounded QUERY BATCH (the
# per-batch shape of contrastive-training data prep); the corpus side
# streams. At 100 TB the candidate cut comes from the ANN index
# (operators/ann.py ivf_probe) instead of the full scan — this query
# is the exact-verify stage.
_HN_QUERY_BATCH = 50


@register(
    "mining_hard_negatives",
    "Hard-negative mining for contrastive training (DPR/Contriever "
    "recipe): for each query vector in a bounded batch (vec_id < "
    f"{_HN_QUERY_BATCH}), the top-3 most-cosine-similar vectors with a "
    "DIFFERENT label — semantically close but wrong — ranked per "
    "query. The query batch rides the kernel closure (bounded by "
    "construction); the corpus side is one streamed mapInPandas scan "
    "doing a single numpy matmul per Arrow batch against all queries "
    "and emitting only each batch's top-8 per query (map-side partial "
    "top-k — the window shuffle sees #batches x 8 rows per query, "
    "never the corpus), then a per-query top-3 window over the "
    "rounded score (ULP-stable rank key; ann_cosine_topk pattern). "
    "At 100 TB the candidate set comes from the IVF index probe "
    "instead of the full scan; this is the exact-verify stage of "
    "that pipeline.",
    oracle=f"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
        FROM embeddings
        WHERE vec_id < {_HN_QUERY_BATCH}
          AND list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
      ),
      scored AS (
        SELECT q.query_id, e.vec_id AS neg_id, e.label AS neg_label,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                 AS cos_sim
        FROM q JOIN embeddings e
          ON e.label <> q.qlabel
        WHERE list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0
      ),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neg_id) AS rnk
        FROM scored
      )
      SELECT query_id, rnk, neg_id, neg_label, cos_sim
      FROM ranked WHERE rnk <= 3
    """,
)
def mining_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") < _HN_QUERY_BATCH)
        .select("vec_id", F.col("embedding").cast("array<double>"), "label")
        .collect()  # bounded query batch (< _HN_QUERY_BATCH rows)
    )
    if not qrows:
        return spark.createDataFrame(
            [],
            "query_id long, rnk int, neg_id long, neg_label int,"
            " cos_sim double",
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows])
    qlabels = np.array([r[2] for r in qrows])
    # zero-norm queries are excluded on BOTH sides (the oracle's q CTE
    # filters list_inner_product > 0): their cosine is undefined, and
    # an asymmetric guard would emit rows the other engine doesn't
    qn = np.linalg.norm(qmat, axis=1)
    keep_q = qn > 0
    qids, qmat, qlabels, qn = qids[keep_q], qmat[keep_q], qlabels[keep_q], qn[keep_q]
    qunit = qmat / qn[:, None]
    nq = len(qids)

    # One matmul per Arrow batch scores the batch against ALL queries
    # (the broadcast-join + interpreted zip_with formulation ran the
    # per-element HOF 3.25M × 64 times: 1.42 s → 0.35 s at sf0.1), and
    # each batch emits only its top-8 candidates per query — map-side
    # partial top-k, so the window shuffle sees #batches × 8 rows per
    # query instead of the whole corpus. 8 > the final 3 so rounded-
    # score ties broken by neg_id can never be cut by the batch bound.
    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy())
            xn = np.linalg.norm(x, axis=1)
            zero_rows = xn == 0
            xn[zero_rows] = 1.0
            raw = (x / xn[:, None]) @ qunit.T  # n × nq
            # round HALF AWAY FROM ZERO: np.round is banker's (half to
            # even) while both Spark's round and DuckDB's round are
            # half-away — a cosine landing exactly on an even .5 at
            # 6dp would otherwise disagree across engines
            s = np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6 * np.sign(raw)
            # zero-norm corpus vectors: undefined cosine, excluded on
            # both sides (oracle filters list_inner_product > 0)
            s[zero_rows, :] = -np.inf
            labels = pdf["label"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            out = {"query_id": [], "neg_id": [], "neg_label": [], "cos_sim": []}
            for j in range(nq):
                col = s[:, j].copy()
                col[labels == qlabels[j]] = -np.inf
                col[ids == qids[j]] = -np.inf
                keep = min(8, len(col))
                # order by (cos desc, neg_id asc) — the global ordering
                idx = np.lexsort((ids, -col))[:keep]
                idx = idx[np.isfinite(col[idx])]
                out["query_id"].extend([qids[j]] * len(idx))
                out["neg_id"].extend(ids[idx].tolist())
                out["neg_label"].extend(labels[idx].tolist())
                out["cos_sim"].extend(col[idx].tolist())
            yield pd.DataFrame(out)

    scored = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    ).mapInPandas(
        score_batches,
        "query_id long, neg_id long, neg_label int, cos_sim double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neg_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", "neg_id", "neg_label", "cos_sim")
    )


@register(
    "quality_perplexity_decile_mix",
    "Corpus composition by perplexity decile — the 'how much of my "
    "data is how surprising' report that drives perplexity-filtered "
    "mixes (CCNet recipe): per-lang unigram neg-logp per doc "
    "(quality_unigram_perplexity's model), docs ranked into ntile(10) "
    "deciles over the ROUNDED score (6dp, doc_id tie-break — the "
    "rank key is cross-engine ULP-stable), then per-decile count, "
    "mean perplexity, and share of total tokens.",
    oracle=f"""
      WITH tok AS (
        SELECT doc_id, lang, unnest({_tokens_sql("text")}) AS tok
        FROM documents
      ),
      model AS (
        SELECT lang, tok, count(*) AS c,
               sum(count(*)) OVER (PARTITION BY lang) AS total
        FROM tok GROUP BY lang, tok
      ),
      scored AS (
        SELECT t.doc_id,
               count(*) AS n_tokens,
               round(avg(-ln(m.c::DOUBLE / m.total)), 6) AS avg_nlp
        FROM tok t JOIN model m ON t.lang = m.lang AND t.tok = m.tok
        GROUP BY t.doc_id
      ),
      ranked AS (
        SELECT *, ntile(10) OVER (ORDER BY avg_nlp, doc_id) AS decile
        FROM scored
      )
      SELECT decile,
             count(*) AS n_docs,
             round(avg(exp(avg_nlp)), 6) AS mean_perplexity,
             sum(n_tokens)::BIGINT AS n_tokens
      FROM ranked GROUP BY decile ORDER BY decile
    """,
)
def quality_perplexity_decile_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted token frame + model helper (quality_ops): the
    # model-broadcast build and the probe scan are separate jobs with
    # no shared exchange, so without the persist the corpus regex
    # tokenization would execute twice per run
    from scout_spark.inventory.quality_ops import doc_tokens, unigram_model

    tok = doc_tokens(spark, sf_dir).select("doc_id", "lang", "tok")
    model = unigram_model(tok)
    scored = (
        # vocab-sized broadcast: flip condition documented on unigram_model
        tok.join(F.broadcast(model), ["lang", "tok"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c").cast("double") / F.col("total"))), 6
            ).alias("avg_nlp"),
        )
    )
    # exact distributed ntile (operators/rank.py): range-shuffle +
    # per-partition row_number + broadcast offsets — same bucket
    # assignment as the oracle's single ntile window, but no
    # single-partition WindowExec funnel at corpus scale
    from scout_spark.operators.rank import global_ntile

    ranked = global_ntile(
        scored, ["avg_nlp", "doc_id"], 10, out="decile"
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.exp("avg_nlp")), 6).alias("mean_perplexity"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("decile")
    )


@register(
    "join_lateral_topk_per_customer",
    "SQL LATERAL correlated subquery (Spark 4 lateral join surface): "
    "each BUILDING-segment customer paired with its top-3 orders by "
    "price via a correlated ORDER BY ... LIMIT subquery. Catalyst "
    "rewrites the lateral into a windowed join (same physical shape "
    "as window_grouped_topk_orders) — the entry pins the SQL surface, "
    "not a new physical operator.",
    oracle="""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
      WHERE c.c_mktsegment = 'BUILDING'
      ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
)
def join_lateral_topk_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c.createOrReplaceTempView("v_lat_customer")
    o.createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM v_lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM v_lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )
