"""Round-8 wave 5: term burstiness (Church & Gale dispersion — the
corpus statistic behind stopword/keyword separation) and deterministic
hash-based epoch shuffling (how a training pipeline re-orders 100 TB
per epoch without materializing a permutation).

Prototype check (CLAUDE.md rule): top-term VMR on this corpus spans
1.34-1.47 — measurably over-dispersed vs the Poisson baseline of 1.0,
so the metric discriminates even on synthetic text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "text_term_burstiness",
    "Term burstiness for the top-20 corpus terms: variance-to-mean "
    "ratio (index of dispersion) of per-document counts, zeros "
    "included — Church & Gale's statistic separating bursty content "
    "words from uniformly-sprinkled function words (VMR 1.0 = "
    "Poisson). Everything up to the final ratio is integer moments "
    "(sum x, sum x² over the posting, document count), so the VMR is "
    "one fixed-order double expression per term — no cross-row FP "
    "accumulation. 100 TB: token counts shuffle on the term key "
    "(map-side combinable); the moment frame is vocabulary-sized; "
    "the doc count broadcasts. Deterministic (freq desc, term) "
    "LIMIT 20.",
    oracle="""
      WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        FROM documents
      ),
      cnt AS (SELECT t, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
      mom AS (
        SELECT t, sum(c)::BIGINT AS f, count(*)::BIGINT AS df,
               sum(c * c)::BIGINT AS s2
        FROM cnt GROUP BY t
      ),
      n AS (SELECT count(*)::BIGINT AS nd FROM documents)
      SELECT m.t AS term, m.f AS freq, m.df AS doc_freq,
             round((m.s2::DOUBLE / n.nd
                    - (m.f::DOUBLE / n.nd) * (m.f::DOUBLE / n.nd))
                   / (m.f::DOUBLE / n.nd), 6) AS vmr
      FROM mom m, n
      ORDER BY freq DESC, term
      LIMIT 20
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir)
    cnt = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    mom = cnt.groupBy("tok").agg(
        F.sum("c").cast("long").alias("freq"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    nd = _t(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    mean = F.col("freq").cast("double") / F.col("nd")
    return (
        mom.crossJoin(F.broadcast(nd))
        .select(
            F.col("tok").alias("term"),
            "freq",
            "doc_freq",
            F.round(
                (F.col("s2").cast("double") / F.col("nd") - mean * mean)
                / mean,
                6,
            ).alias("vmr"),
        )
        .orderBy(F.col("freq").desc(), "term")
        .limit(20)
    )


# --------------------------------------------- epoch hash shuffle


_ES_BUCKETS = 16


@register(
    "sample_epoch_shuffle_hash",
    "Deterministic per-epoch training shuffle WITHOUT materializing a "
    "permutation: epoch order = sort by md5(epoch:doc_id) — "
    "reproducible on any engine, re-derivable for any shard, and "
    "decorrelated across epochs (the per-doc 16-bucket assignment "
    "moves for ~15/16 of docs between epochs, reported as "
    "n_moved_bucket16). Surfaced as the first 10 docs of epochs 0 and "
    "1 plus the movement counters. 100 TB: the order key is computed "
    "row-local and the top-k is TakeOrdered — no global sort "
    "materializes unless a sink wants it; the rank window runs over "
    "the 20 surfaced rows only.",
    oracle=f"""
      WITH e0 AS (
        SELECT 0 AS ep, doc_id, md5('0:' || doc_id) AS h
        FROM documents ORDER BY h LIMIT 10
      ),
      e1 AS (
        SELECT 1 AS ep, doc_id, md5('1:' || doc_id) AS h
        FROM documents ORDER BY h LIMIT 10
      ),
      ranked AS (
        SELECT ep, doc_id,
               row_number() OVER (PARTITION BY ep ORDER BY h) AS rnk
        FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1)
      ),
      m AS (
        SELECT count(*)::BIGINT AS n_docs,
               sum(CASE WHEN
                 ('0x' || substr(md5('0:' || doc_id), 1, 8))::BIGINT
                   % {_ES_BUCKETS}
                 <> ('0x' || substr(md5('1:' || doc_id), 1, 8))::BIGINT
                   % {_ES_BUCKETS}
                 THEN 1 ELSE 0 END)::BIGINT AS n_moved_bucket16
        FROM documents
      )
      SELECT r.ep::BIGINT AS epoch, r.rnk::BIGINT AS rank_in_epoch,
             r.doc_id, m.n_docs, m.n_moved_bucket16
      FROM ranked r, m
      ORDER BY epoch, rank_in_epoch
    """,
)
def sample_epoch_shuffle_hash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _top(epoch: int) -> DataFrame:
        h = F.md5(
            F.concat(F.lit(f"{epoch}:"), F.col("doc_id").cast("string"))
        )
        return (
            d.select(
                F.lit(epoch).cast("long").alias("epoch"),
                "doc_id",
                h.alias("h"),
            )
            .orderBy("h")
            .limit(10)
        )

    ranked = (
        _top(0)
        .unionByName(_top(1))
        .withColumn(
            "rank_in_epoch",
            F.row_number()
            .over(Window.partitionBy("epoch").orderBy("h"))
            .cast("long"),
        )
        .drop("h")
    )

    def _bucket(epoch: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{epoch}:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long") % _ES_BUCKETS

    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((_bucket(0) != _bucket(1)).cast("long"))
        .cast("long")
        .alias("n_moved_bucket16"),
    )
    return (
        ranked.crossJoin(F.broadcast(m))
        .select(
            "epoch", "rank_in_epoch", "doc_id", "n_docs", "n_moved_bucket16"
        )
        .orderBy("epoch", "rank_in_epoch")
    )
