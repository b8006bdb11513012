"""Round-5 coda: Markov entropy rate and language-ID confusion."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.text_ops import _LANG_SW_SQL


@register(
    "events_markov_entropy_rate",
    "Markov ENTROPY RATE of user behavior — 'how predictable is the "
    "next event given the last one': from the empirical transition "
    "counts (events_transition_matrix's kernel), the conditional "
    "entropy H(next|prev) = -sum p(prev,next) ln p(next|prev), the "
    "marginal H(next), and their difference — which IS the mutual "
    "information between consecutive events (cross-checkable against "
    "stats_mutual_information's formulation; a near-zero gap means "
    "event streams are memoryless and sequence features are wasted). "
    "All probabilities are exact integer-count ratios over the "
    "BOUNDED |types|^2 cell frame; entropy terms are doubles over "
    "those cells, rounded 6dp. 100 TB: one user-window pass + one "
    "map-side-combinable cell agg; everything after runs on <=25 "
    "rows.",
    oracle="""
      WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
      ),
      t AS (
        SELECT prev, event_type AS next, count(*)::BIGINT AS c
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
      ),
      rm AS (SELECT prev, sum(c)::BIGINT AS rc FROM t GROUP BY prev),
      cm AS (SELECT next, sum(c)::BIGINT AS cc FROM t GROUP BY next),
      n AS (SELECT sum(c)::BIGINT AS n FROM t),
      hc AS (
        SELECT -sum((t.c::DOUBLE / n.n) * ln(t.c::DOUBLE / rm.rc)) AS h
        FROM t JOIN rm USING (prev) CROSS JOIN n
      ),
      hm AS (
        SELECT -sum((cc::DOUBLE / n.n) * ln(cc::DOUBLE / n.n)) AS h
        FROM cm CROSS JOIN n
      )
      SELECT n.n AS n_transitions,
             round(hm.h, 6) AS h_next,
             round(hc.h, 6) AS h_next_given_prev,
             round(hm.h - hc.h, 6) AS mi_consecutive
      FROM n, hc, hm
    """,
)
def events_markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        )
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # <=|types|^2 rows; 4 overlapping consumers
    )
    rm = t.groupBy("prev").agg(F.sum("c").cast("long").alias("rc"))
    cm = t.groupBy("next").agg(F.sum("c").cast("long").alias("cc"))
    n = t.agg(F.sum("c").cast("long").alias("n"))
    hc = (
        t.join(F.broadcast(rm), "prev")
        .crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    (F.col("c").cast("double") / F.col("n"))
                    * F.log(F.col("c").cast("double") / F.col("rc"))
                )
            ).alias("hc")
        )
    )
    hm = (
        cm.crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    (F.col("cc").cast("double") / F.col("n"))
                    * F.log(F.col("cc").cast("double") / F.col("n"))
                )
            ).alias("hm")
        )
    )
    return (
        n.crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hm))
        .select(
            F.col("n").alias("n_transitions"),
            F.round("hm", 6).alias("h_next"),
            F.round("hc", 6).alias("h_next_given_prev"),
            F.round(F.col("hm") - F.col("hc"), 6).alias("mi_consecutive"),
        )
    )


@register(
    "eval_langid_confusion",
    "Language-ID confusion matrix — the accuracy audit for the "
    "stopword-voting classifier (text_langid_heuristic): per "
    "(true lang, predicted lang) counts plus each cell's share of "
    "its true-label row (the per-language recall diagonal) and the "
    "overall accuracy carried on every row. Exact integer counts; "
    "the matrix is <=|langs|*(|langs|+1) cells. 100 TB: one scan "
    "with the codegen'd classifier expression + a map-side-"
    "combinable cell agg; the label marginals broadcast back.",
    oracle=f"""
      WITH t AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
      ), s AS (
        SELECT doc_id, lang,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['en']}, x))) AS s_en,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['es']}, x))) AS s_es,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['de']}, x))) AS s_de,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['fr']}, x))) AS s_fr,
               len(list_filter(toks, x -> list_contains({_LANG_SW_SQL['zh']}, x))) AS s_zh
        FROM t
      ),
      pred AS (
        SELECT lang AS lang_label,
               CASE WHEN greatest(s_en,s_es,s_de,s_fr,s_zh) <= 0 THEN 'und'
                    WHEN s_en = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'en'
                    WHEN s_es = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'es'
                    WHEN s_de = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'de'
                    WHEN s_fr = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_guess
        FROM s
      ),
      cells AS (
        SELECT lang_label, lang_guess, count(*)::BIGINT AS n_docs
        FROM pred GROUP BY 1, 2
      ),
      marg AS (
        SELECT lang_label, sum(n_docs)::BIGINT AS label_total
        FROM cells GROUP BY 1
      ),
      acc AS (
        SELECT sum(CASE WHEN lang_label = lang_guess THEN n_docs
                   ELSE 0 END)::DOUBLE / sum(n_docs) AS a
        FROM cells
      )
      SELECT c.lang_label, c.lang_guess, c.n_docs,
             round(c.n_docs::DOUBLE / m.label_total, 6) AS label_share,
             round(acc.a, 6) AS overall_accuracy
      FROM cells c JOIN marg m USING (lang_label) CROSS JOIN acc
      ORDER BY c.lang_label, c.lang_guess
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.functions.text import langid_expr

    d = _th(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("lang_label"),
        langid_expr("text").alias("lang_guess"),
    )
    cells = pred.groupBy("lang_label", "lang_guess").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).localCheckpoint()  # <=|langs|^2 cells; 3 overlapping consumers
    marg = cells.groupBy("lang_label").agg(
        F.sum("n_docs").cast("long").alias("label_total")
    )
    acc = cells.agg(
        (
            F.sum(
                F.when(
                    F.col("lang_label") == F.col("lang_guess"),
                    F.col("n_docs"),
                ).otherwise(0)
            ).cast("double")
            / F.sum("n_docs")
        ).alias("a")
    )
    return (
        cells.join(F.broadcast(marg), "lang_label")
        .crossJoin(F.broadcast(acc))
        .select(
            "lang_label",
            "lang_guess",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("label_total"), 6
            ).alias("label_share"),
            F.round(F.col("a"), 6).alias("overall_accuracy"),
        )
        .orderBy("lang_label", "lang_guess")
    )
