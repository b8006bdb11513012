"""Round-4 curation & analysis additions: percentile-band length
filtering, Pareto-skyline extraction, token-entropy quality scoring,
OOV-rate reporting, and deterministic weighted sampling (A-ES).

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


@register(
    "quality_length_percentile_filter",
    "Percentile-band length filter — the 'drop the freakishly short "
    "and long tails' pass of every corpus-curation recipe, with the "
    "cut set PER LANGUAGE so high-resource languages don't set the "
    "thresholds for low-resource ones: percent_rank over n_chars "
    "within lang, keep the [0.05, 0.95] band. percent_rank is pure "
    "integer rank arithmetic ((rank-1)/(n-1): bit-identical across "
    "engines, tie rows get equal rank in both). One window shuffle on "
    "lang + one tiny aggregate.",
    oracle="""
      WITH ranked AS (
        SELECT lang, n_chars,
               percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
        FROM documents
      )
      SELECT lang,
             count(*) AS n_before,
             sum(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN 1 ELSE 0 END)::BIGINT
               AS n_kept,
             min(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN n_chars END)
               AS min_kept_chars,
             max(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN n_chars END)
               AS max_kept_chars
      FROM ranked GROUP BY lang ORDER BY lang
    """,
)
def quality_length_percentile_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    keep = (F.col("pr") >= 0.05) & (F.col("pr") <= 0.95)
    ranked = d.select("lang", "n_chars", F.percent_rank().over(w).alias("pr"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.min(F.when(keep, F.col("n_chars"))).alias("min_kept_chars"),
            F.max(F.when(keep, F.col("n_chars"))).alias("max_kept_chars"),
        )
        .orderBy("lang")
    )


@register(
    "skyline_pareto_orders",
    "2-D Pareto skyline of orders — earliest-date/highest-price "
    "non-dominated frontier (an order is dominated if another has "
    "date <= AND price >= with one strict). The naive formulation is "
    "a quadratic non-equi anti-join (BroadcastNestedLoopJoin — a "
    "scale-killer); the 2-D skyline instead falls out of a running "
    "max: per-date max price, then a date-ordered cummax over STRICTLY "
    "EARLIER dates — frontier dates are where the per-date max exceeds "
    "it, O(n log n) with one window pass, the plan that survives "
    "100x. Comparisons only, no FP accumulation.",
    oracle="""
      WITH dmax AS (
        SELECT o_orderdate AS d, max(o_totalprice) AS pmax
        FROM orders GROUP BY o_orderdate
      ), run AS (
        SELECT d, pmax,
               max(pmax) OVER (ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS cmax
        FROM dmax
      ), fdates AS (
        SELECT d, pmax FROM run WHERE cmax IS NULL OR pmax > cmax
      )
      SELECT o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
             o.o_totalprice
      FROM orders o JOIN fdates f
        ON o.o_orderdate = f.d AND o.o_totalprice = f.pmax
      ORDER BY o.o_orderdate, o.o_orderkey
    """,
)
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    dmax = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("pmax")
    )
    wrun = (
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    )
    run = dmax.withColumn("cmax", F.max("pmax").over(wrun))
    fdates = run.where(
        F.col("cmax").isNull() | (F.col("pmax") > F.col("cmax"))
    ).select("d", "pmax")
    return (
        o.join(
            F.broadcast(fdates),
            (F.col("o_orderdate") == F.col("d"))
            & (F.col("o_totalprice") == F.col("pmax")),
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
        .orderBy("order_date", "o_orderkey")
    )


@register(
    "text_token_entropy",
    "Per-document Shannon entropy of the token distribution plus the "
    "type-token ratio — the lexical-diversity quality signals that "
    "catch keyword-stuffed and boilerplate documents (low entropy) "
    "before training. Tokens via the repo's guarded codegen tokenizer; "
    "one explode + two hash aggregates keyed by doc — the per-doc "
    "totals fold into the SAME agg as the entropy sum via the identity "
    "H = log2(N) - sum(c*log2(c))/N, so there is no cnt-to-totals join "
    "(r03 verdict item 7: was 3 shuffles + join, now 2 shuffles); "
    "map-side combine keeps both shuffles at distinct-key size.",
    oracle=f"""
      WITH tok AS (
        SELECT doc_id, unnest({_tokens_sql("text")}) AS tok FROM documents
      ),
      cnt AS (
        SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
      )
      SELECT doc_id,
             sum(c)::BIGINT AS n_tokens,
             count(*) AS n_distinct,
             round(log2(sum(c)::DOUBLE)
                   - sum(c::DOUBLE * log2(c::DOUBLE)) / sum(c)::DOUBLE,
                   6) AS entropy,
             round(count(*)::DOUBLE / sum(c)::DOUBLE, 6) AS ttr
      FROM cnt GROUP BY doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-job query, but reading the shared persisted token frame
    # means back-to-back rotation runs of the token family tokenize
    # the corpus once, not once per entry
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("doc_id", "tok")
    cnt = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c").cast("double")
    n = F.col("n_tokens").cast("double")
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(c * F.log2(c)).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.log2(n) - F.col("_s") / n, 6).alias("entropy"),
            F.round(F.col("n_distinct").cast("double") / n, 6).alias("ttr"),
        )
    )


@register(
    "text_oov_rate_by_source",
    "Out-of-vocabulary rate per source against a top-16 corpus "
    "vocabulary (count DESC, token ASC — integer-deterministic cut): "
    "the tokenizer-coverage report run before committing to a vocab. "
    "The vocab is broadcast (bounded at vocab size by construction) so "
    "the membership probe is map-side — no shuffle of the token "
    "stream at any corpus size; the only shuffles are the two "
    "aggregations.",
    oracle=f"""
      WITH tok AS (
        SELECT source, unnest({_tokens_sql("text")}) AS tok FROM documents
      ),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, count(*) AS c FROM tok GROUP BY tok
          ORDER BY c DESC, tok LIMIT 16
        )
      )
      SELECT t.source,
             count(*) AS n_tokens,
             sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
             round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS oov_rate
      FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.source ORDER BY t.source
    """,
)
def text_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared persisted token frame (quality_ops.doc_tokens): the vocab
    # broadcast build is a separate job from the probe scan, so the
    # persist keeps the corpus tokenization to one execution
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("source", "tok")
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(16)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        probed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
            F.round(
                F.sum(oov).cast("double") / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


@register(
    "sample_weighted_priority",
    "Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES "
    "priority sampling): each order gets key -ln(u)/w with weight "
    "w = o_totalprice and u a DETERMINISTIC uniform from the md5 of "
    "its key (the hash_parity.py cross-engine pattern) — the k "
    "smallest keys are an exact weighted sample, reproducible across "
    "engines, reruns, and appends, and computable as a distributed "
    "top-k (TakeOrderedAndProject) with no RNG state and no shuffle "
    "beyond the final k-row merge.",
    oracle="""
      SELECT o_orderkey, o_totalprice
      FROM (
        SELECT o_orderkey, o_totalprice,
               round(-ln((('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT
                    + 1.0) / 4294967296.0) / o_totalprice, 10) AS k
        FROM orders
      )
      ORDER BY k, o_orderkey
      LIMIT 100
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    # rank key rounded to 10dp: ln() is only ~1-ulp accurate and the
    # engines' libm may disagree in the last bit — rounding far above
    # ulp scale but far below key resolution (~1e-4) makes the LIMIT
    # boundary cross-engine deterministic (tie-break already present)
    key = F.round(-F.log(u) / F.col("o_totalprice"), 10)
    return (
        o.select("o_orderkey", "o_totalprice", key.alias("k"))
        .orderBy("k", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )
