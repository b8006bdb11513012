"""Retrieval & sketch operators (round-2 pipeline extensions): BM25
ranked retrieval, exact-verified Misra-Gries heavy hitters, and
distributed BPE vocabulary training.

The reference's search surface is fuzzy geocoding (two-phase
filter-then-verify, reference repo.py:48-71); BM25 is the same
filter-then-rank shape over a token posting list — the standard ranked
retrieval an LLM data pipeline uses for corpus search and hard-negative
mining. Heavy hitters and BPE extend the §2.4 aggregation family to the
sketch/tokenizer stages of the training-data story (build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.text_ops import _tokens_col, _tokens_sql

_BM25_TERMS = ("spark", "table", "merge", "fast")
_BM25_K1 = 1.2
_BM25_B = 0.75
_HH_K = 40  # heavy hitter threshold: freq > N/40


@register(
    "bm25_topk_retrieval",
    "BM25 ranked retrieval over the documents token stream (Robertson/"
    "Sparck-Jones idf, k1=1.2 b=0.75): explode tokens -> keep query "
    "terms -> per-(doc,term) tf -> idf from per-term doc frequency "
    "(tiny, broadcast) -> length-normalized score -> top-10. The corpus "
    "stats (N, avgdl) and per-term dfs are 1-row/4-row aggregates "
    "broadcast onto the posting stream; the only wide shuffle keys on "
    "(doc_id, term) AFTER the isin() prune — at 100 TB the pruned "
    "posting stream is query-term-sized, not corpus-sized. Deterministic "
    "top-k: ordered by the ROUNDED score then doc_id.",
    oracle=f"""
      WITH dl AS (
        SELECT doc_id, {_tokens_sql("text")} AS toks,
               len({_tokens_sql("text")}) AS dl
        FROM documents
      ),
      stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl WHERE dl > 0),
      posting AS (
        SELECT doc_id, dl, tok, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
        WHERE tok IN ('spark', 'table', 'merge', 'fast')
        GROUP BY doc_id, dl, tok
      ),
      dfreq AS (SELECT tok, count(*) AS dfr FROM posting GROUP BY tok)
      SELECT p.doc_id,
             round(sum(
               ln(1.0 + (s.n_docs - f.dfr + 0.5) / (f.dfr + 0.5))
               * p.tf * ({_BM25_K1} + 1.0)
               / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * p.dl / s.avgdl))
             ), 6) AS bm25,
             count(*) AS n_terms
      FROM posting p JOIN dfreq f USING (tok) CROSS JOIN stats s
      GROUP BY p.doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id", _tokens_col(F.col("text")).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = dl.where(F.col("dl") > 0).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    posting = (
        dl.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = posting.groupBy("tok").agg(F.count(F.lit(1)).alias("dfr"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfr") + 0.5) / (F.col("dfr") + 0.5)
    )
    w = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        posting.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(w), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@register(
    "sketch_heavy_hitter_tokens",
    "Exact heavy-hitter tokens via a two-pass Misra-Gries sketch "
    "(operators/sketches.py): O(k)-memory per-batch candidate summaries "
    "(superset guarantee by pigeonhole), then exact counts for the "
    "candidate set only — no full-cardinality groupBy ever runs, which "
    "is the 100 TB shape for Zipf token streams. The output equals the "
    "true heavy-hitter set, so the oracle is a plain GROUP BY/HAVING.",
    oracle=f"""
      WITH toks AS (
        SELECT unnest({_tokens_sql("text")}) AS tok FROM documents
      ),
      total AS (SELECT count(*) AS n_total FROM toks)
      SELECT tok, count(*) AS n,
             round(count(*) / any_value(t.n_total), 6) AS share
      FROM toks CROSS JOIN total t
      GROUP BY tok
      HAVING count(*) * {_HH_K} > any_value(t.n_total)
    """,
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.sketches import heavy_hitters_exact

    d = _th(spark, sf_dir, "documents")
    toks = d.select(F.explode(_tokens_col(F.col("text"))).alias("tok"))
    return heavy_hitters_exact(toks, "tok", k=_HH_K)


@register(
    "bpe_train_merges",
    "Distributed BPE vocabulary training (operators/bpe.py, Sennrich "
    "2016): one corpus-wide word count, then iterative most-frequent-"
    "adjacent-pair merges over the distinct-word table (vocabulary-"
    "bounded, not corpus-bounded). Rows-only: the training loop is "
    "iterative with a per-round argmax — not SQL-expressible; the merge "
    "sequence is pinned against a pure-Python reference implementation "
    "in tests/test_bpe.py.",
    tags=("rows-only",),
)
def bpe_train_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.bpe import bpe_train

    d = _th(spark, sf_dir, "documents")
    merges = bpe_train(d, "text", n_merges=12)
    return spark.createDataFrame(
        merges, schema="rank int, left string, right string, pair_freq long"
    )
