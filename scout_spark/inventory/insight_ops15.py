"""Round-5 eighteenth wave: Dirichlet query-likelihood retrieval,
Kendall tau ranking agreement, and posting-list compression estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t
from scout_spark.inventory.retrieval import _BM25_TERMS, _bm25_per_doc
from scout_spark.inventory.text_ops import _tokens_sql

_QL_MU = 300


@register(
    "retrieval_dirichlet_query_likelihood",
    "Dirichlet-smoothed QUERY-LIKELIHOOD retrieval (Zhai & Lafferty "
    f"2001, mu={_QL_MU}) — the language-modeling scorer that "
    "complements BM25: score = sum over query terms of "
    "ln((tf + mu*cf/|C|) / (dl + mu)), where the collection model "
    "cf/|C| gives unseen terms nonzero mass. Reuses the PERSISTED "
    "per-doc tf frame the BM25 entry materializes (one tokenization "
    "per session — the production posting-index discipline); "
    "collection stats are one broadcast scalar row. Candidate set = "
    "docs matching >=1 term (the posting-driven candidate discipline "
    "— smoothing alone would rank every doc by length). "
    "Deterministic top-10 by (rounded score, doc_id). 100 TB: "
    "scoring is a joinless scan over the persisted frame + "
    "TakeOrdered; stats are one map-side-combined agg.",
    oracle=f"""
      WITH dl AS (
        SELECT doc_id, {_tokens_sql("text")} AS toks,
               len({_tokens_sql("text")}) AS dl
        FROM documents
      ),
      coll AS (SELECT sum(dl)::BIGINT AS clen FROM dl),
      posting AS (
        SELECT doc_id, dl, tok, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        WHERE tok IN ('spark', 'table', 'merge', 'fast')
        GROUP BY doc_id, dl, tok
      ),
      cf AS (SELECT tok, sum(tf)::BIGINT AS cf FROM posting GROUP BY tok),
      cand AS (SELECT DISTINCT doc_id FROM posting),
      terms(tok) AS (VALUES ('spark'), ('table'), ('merge'), ('fast')),
      scored AS (
        SELECT c.doc_id,
               sum(ln((coalesce(p.tf, 0) + {_QL_MU} * cf.cf::DOUBLE
                       / coll.clen)
                      / (dl.dl + {_QL_MU}))) AS s,
               count(CASE WHEN p.tf IS NOT NULL THEN 1 END)::BIGINT
                 AS n_matched
        FROM cand c
        JOIN dl ON dl.doc_id = c.doc_id
        CROSS JOIN terms t
        JOIN cf ON cf.tok = t.tok
        LEFT JOIN posting p ON p.doc_id = c.doc_id AND p.tok = t.tok
        CROSS JOIN coll
        GROUP BY c.doc_id
      )
      SELECT doc_id, round(s, 6) AS ql_score, n_matched
      FROM scored
      ORDER BY round(s, 6) DESC, doc_id
      LIMIT 10
    """,
)
def retrieval_dirichlet_query_likelihood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    per_doc = _bm25_per_doc(spark, sf_dir)
    stats = per_doc.agg(
        F.sum("dl").cast("long").alias("clen"),
        *[
            F.sum(f"tf_{q}").cast("long").alias(f"cf_{q}")
            for q in _BM25_TERMS
        ],
    )
    cand = per_doc.where(
        sum(F.col(f"tf_{q}") for q in _BM25_TERMS) > 0
    )
    j = cand.crossJoin(F.broadcast(stats))
    score = sum(
        F.log(
            (
                F.col(f"tf_{q}")
                + _QL_MU * F.col(f"cf_{q}").cast("double") / F.col("clen")
            )
            / (F.col("dl") + _QL_MU)
        )
        for q in _BM25_TERMS
    )
    matched = sum(
        F.when(F.col(f"tf_{q}") > 0, 1).otherwise(0) for q in _BM25_TERMS
    )
    return (
        j.select(
            "doc_id",
            F.round(score, 6).alias("ql_score"),
            matched.cast("long").alias("n_matched"),
        )
        .orderBy(F.col("ql_score").desc(), "doc_id")
        .limit(10)
    )


# ------------------------------------- Kendall tau rank agreement

_KT_K = 20


@register(
    "eval_kendall_tau_rankings",
    "Kendall tau between two retrieval rankings (BM25 vs Dirichlet "
    f"QL over BM25's top-{_KT_K} candidates) — 'do my two scorers "
    "even agree on order', the rank-agreement companion to "
    "retrieval_eval_ndcg_mrr: tau = (concordant - discordant) / "
    "(n(n-1)/2), with both rankings made TOTAL orders by (rounded "
    "score, doc_id) so there are no ties to correct for and both "
    "engines count identical pairs. The pair enumeration is a "
    f"self-join over the {_KT_K}-row candidate list — bounded by "
    "k^2, never corpus-sized. 100 TB: candidates come from two "
    "TakeOrdered scans; the tau arithmetic is O(k^2) on the driver-"
    "scale frame.",
    oracle=f"""
      WITH dl AS (
        SELECT doc_id, {_tokens_sql("text")} AS toks,
               len({_tokens_sql("text")}) AS dl
        FROM documents
      ),
      stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl,
               sum(dl)::BIGINT AS clen
        FROM dl WHERE dl > 0
      ),
      posting AS (
        SELECT doc_id, dl, tok, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        WHERE tok IN ('spark', 'table', 'merge', 'fast')
        GROUP BY doc_id, dl, tok
      ),
      dfreq AS (
        SELECT tok, count(*) AS dfr, sum(tf)::BIGINT AS cf
        FROM posting GROUP BY tok
      ),
      bm25 AS (
        SELECT p.doc_id,
               round(sum(
                 ln(1.0 + (s.n_docs - f.dfr + 0.5) / (f.dfr + 0.5))
                 * p.tf * 2.2
                 / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
               ), 6) AS b
        FROM posting p JOIN dfreq f USING (tok) CROSS JOIN stats s
        GROUP BY p.doc_id
        ORDER BY b DESC, p.doc_id
        LIMIT {_KT_K}
      ),
      terms(tok) AS (VALUES ('spark'), ('table'), ('merge'), ('fast')),
      ql AS (
        SELECT c.doc_id,
               round(sum(ln((coalesce(p.tf, 0)
                             + {_QL_MU} * f.cf::DOUBLE / s.clen)
                            / (dl.dl + {_QL_MU}))), 6) AS q
        FROM bm25 c
        JOIN dl ON dl.doc_id = c.doc_id
        CROSS JOIN terms t
        JOIN dfreq f ON f.tok = t.tok
        LEFT JOIN posting p ON p.doc_id = c.doc_id AND p.tok = t.tok
        CROSS JOIN stats s
        GROUP BY c.doc_id
      ),
      r AS (
        SELECT b.doc_id,
               row_number() OVER (ORDER BY b.b DESC, b.doc_id) AS r1,
               row_number() OVER (ORDER BY q.q DESC, q.doc_id) AS r2
        FROM bm25 b JOIN ql q USING (doc_id)
      ),
      pairs AS (
        SELECT CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0 THEN 1 ELSE 0
               END AS conc
        FROM r a JOIN r b ON a.doc_id < b.doc_id
      )
      SELECT count(*)::BIGINT AS n_pairs,
             sum(conc)::BIGINT AS concordant,
             (count(*) - sum(conc))::BIGINT AS discordant,
             round((2.0 * sum(conc) - count(*)) / count(*), 6) AS kendall_tau
      FROM pairs
    """,
)
def eval_kendall_tau_rankings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.retrieval import _bm25_all_scored

    bm25 = (
        _bm25_all_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_KT_K)
        .select("doc_id", F.col("bm25").alias("b"))
    )
    # rescore QL over exactly the BM25 candidates (the oracle's shape)
    per_doc = _bm25_per_doc(spark, sf_dir)
    stats = per_doc.agg(
        F.sum("dl").cast("long").alias("clen"),
        *[
            F.sum(f"tf_{q}").cast("long").alias(f"cf_{q}")
            for q in _BM25_TERMS
        ],
    )
    qls = (
        per_doc.join(F.broadcast(bm25.select("doc_id")), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                sum(
                    F.log(
                        (
                            F.col(f"tf_{q}")
                            + _QL_MU
                            * F.col(f"cf_{q}").cast("double")
                            / F.col("clen")
                        )
                        / (F.col("dl") + _QL_MU)
                    )
                    for q in _BM25_TERMS
                ),
                6,
            ).alias("q"),
        )
    )
    r = (
        bm25.join(qls, "doc_id")
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("b").desc(), "doc_id"))
            .alias("r1"),
            F.row_number()
            .over(Window.orderBy(F.col("q").desc(), "doc_id"))
            .alias("r2"),
        )
        .localCheckpoint()  # k rows; self-joined below
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.when(
            (F.col("a.r1") - F.col("b.r1"))
            * (F.col("a.r2") - F.col("b.r2"))
            > 0,
            1,
        )
        .otherwise(0)
        .alias("conc")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        (F.count(F.lit(1)) - F.sum("conc")).cast("long").alias("discordant"),
        F.round(
            (2.0 * F.sum("conc") - F.count(F.lit(1)))
            / F.count(F.lit(1)),
            6,
        ).alias("kendall_tau"),
    )


# --------------------------------- posting-list compression estimate


@register(
    "index_postings_delta_bits",
    "Inverted-index compression estimate by DELTA + Elias-gamma cost "
    "model — the storage-engineering number behind every posting "
    "list format (doc ids are stored as gaps; gamma costs "
    "2*floor(log2(gap)) + 1 bits): per-term sorted postings, "
    "per-gap bit cost from the integer bit length "
    "(length(bin(gap)) - 1 — no FP log), aggregated to total "
    "postings, raw 64-bit size, gamma-coded size, and the "
    "compression ratio. Frequent terms compress best (small gaps) — "
    "exactly the skew that makes delta coding work. The per-term "
    "window partitions by TERM (parallel, posting-list-local). "
    "100 TB: one (term, doc) distinct shuffle — the index build "
    "itself — then window + agg on the posting stream.",
    oracle="""
      WITH posting AS (
        SELECT DISTINCT tok, doc_id
        FROM (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents
        )
      ),
      gaps AS (
        SELECT tok,
               doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                                   ORDER BY doc_id), -1)
                 AS gap
        FROM posting
      ),
      cost AS (
        SELECT tok, gap,
               2 * (length(bin(gap)) - 1) + 1 AS bits
        FROM gaps
      )
      SELECT count(*)::BIGINT AS n_postings,
             (count(*) * 64)::BIGINT AS raw_bits,
             sum(bits)::BIGINT AS gamma_bits,
             round(sum(bits)::DOUBLE / (count(*) * 64), 6)
               AS compression_ratio,
             round(avg(bits), 6) AS avg_bits_per_posting
      FROM cost
    """,
)
def index_postings_delta_bits(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    posting = (
        doc_tokens(spark, sf_dir)
        .select("tok", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    gaps = posting.select(
        "tok",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
        ).alias("gap"),
    )
    bits = 2 * (F.length(F.bin(F.col("gap"))) - 1) + 1
    cost = gaps.select(bits.alias("bits"))
    return cost.agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
        F.sum("bits").cast("long").alias("gamma_bits"),
        F.round(
            F.sum("bits").cast("double") / (F.count(F.lit(1)) * 64), 6
        ).alias("compression_ratio"),
        F.round(F.avg("bits"), 6).alias("avg_bits_per_posting"),
    )
