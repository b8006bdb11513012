"""Round-5 sixteenth wave: privacy auditing (k-anonymity/l-diversity)
and exact ROC/AUC ranking evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th


# ----------------------------------------- k-anonymity / l-diversity

_KA_K = 5
_KA_BAL_BUCKET = 1000


@register(
    "privacy_k_anonymity_audit",
    "K-ANONYMITY / L-DIVERSITY audit before a data release — the "
    "privacy counterpart of the PII scrub: group rows by their "
    "quasi-identifier tuple (nation, market segment, account balance "
    f"bucketed to {_KA_BAL_BUCKET}s — bucketing IS the "
    "generalization step of k-anonymization), then report the "
    "dataset's k (the smallest equivalence class), how many classes "
    f"and rows sit below k={_KA_K} (re-identifiable under linkage "
    "attack), and the minimum l-diversity of the sensitive attribute "
    "(distinct order priorities per class via the customers' orders "
    "— a class can be k-anonymous yet leak the sensitive value if "
    "l=1). All exact integer counts. 100 TB: one groupBy on the "
    "quasi-identifier (map-side combinable), one broadcast-dim join, "
    "and a bounded-cardinality class frame after.",
    oracle=f"""
      WITH q AS (
        SELECT c.c_custkey, n.n_name AS nation, c.c_mktsegment AS seg,
               floor(c.c_acctbal / {_KA_BAL_BUCKET})::BIGINT AS balb
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      ),
      classes AS (
        SELECT nation, seg, balb, count(*)::BIGINT AS k
        FROM q GROUP BY 1, 2, 3
      ),
      ldiv AS (
        SELECT q.nation, q.seg, q.balb,
               count(DISTINCT o.o_orderpriority)::BIGINT AS l
        FROM q JOIN orders o ON o.o_custkey = q.c_custkey
        GROUP BY 1, 2, 3
      )
      SELECT (SELECT count(*) FROM classes)::BIGINT AS n_classes,
             (SELECT min(k) FROM classes)::BIGINT AS k_anonymity,
             (SELECT count(*) FROM classes WHERE k < {_KA_K})::BIGINT
               AS n_classes_below_k,
             (SELECT coalesce(sum(k), 0) FROM classes
              WHERE k < {_KA_K})::BIGINT AS n_rows_at_risk,
             (SELECT min(l) FROM ldiv)::BIGINT AS l_diversity_min,
             (SELECT count(*) FROM ldiv WHERE l = 1)::BIGINT
               AS n_classes_l1
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    q = c.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        c.c_nationkey == n.n_nationkey,
    ).select(
        "c_custkey",
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / _KA_BAL_BUCKET)
        .cast("long")
        .alias("balb"),
    )
    # q feeds the class census AND the l-diversity join — overlapping
    # consumers, persist (|customers| rows)
    q = q.persist()
    classes = q.groupBy("nation", "seg", "balb").agg(
        F.count(F.lit(1)).alias("k")
    )
    cstats = classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("k") < _KA_K, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_k"),
        F.coalesce(
            F.sum(F.when(F.col("k") < _KA_K, F.col("k"))), F.lit(0)
        )
        .cast("long")
        .alias("n_rows_at_risk"),
    )
    ldiv = (
        q.join(
            o.select("o_custkey", "o_orderpriority"),
            q.c_custkey == F.col("o_custkey"),
        )
        .groupBy("nation", "seg", "balb")
        .agg(F.count_distinct("o_orderpriority").alias("l"))
    )
    lstats = ldiv.agg(
        F.min("l").cast("long").alias("l_diversity_min"),
        F.sum(F.when(F.col("l") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_l1"),
    )
    return cstats.crossJoin(F.broadcast(lstats)).select(
        "n_classes",
        "k_anonymity",
        "n_classes_below_k",
        "n_rows_at_risk",
        "l_diversity_min",
        "n_classes_l1",
    )


# ------------------------------------------------ exact ROC / AUC

_ROC_TOKENS = 50  # splits this corpus (~60-token median); 150 would yield n1=0


@register(
    "eval_roc_auc_exact",
    "Exact ROC/AUC for the quality scorer — AUC computed as the "
    "rank-sum (Mann-Whitney) statistic, NOT a trapezoid "
    "approximation: AUC = (sum of positive ranks - n1(n1+1)/2) / "
    "(n1*n0), with midranks for tied scores handled by the standard "
    "average-rank correction — and ranks are over round(score, 6) "
    "(the 6dp-rounded score BOTH engines agree on bit-for-bit, so "
    "tie groups are identical; ranking raw libm-exp scores could "
    "split a tie differently per engine). Alongside: ROC operating "
    "points (FPR, TPR, precision) at fixed thresholds 0.3/0.5/0.7 "
    "from exact integer confusion counts. 100 TB: counts are one "
    "map-side-combinable agg; the rank pass partitions by the "
    "6dp-rounded score histogram (bounded distinct values), never a "
    "global per-row sort — sum-of-ranks per tie group = "
    "group_count * (cum_before + (group_count+1)/2), all from the "
    "score histogram.",
    oracle=f"""
      WITH t AS (
        SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks, text
        FROM documents
      ),
      f AS (
        SELECT len(list_distinct(toks))::DOUBLE / nullif(len(toks), 0)
                 AS distinct_ratio,
               list_sum(list_transform(toks, x -> len(x)))::DOUBLE
                 / nullif(len(toks), 0) AS mean_len,
               len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
                 / nullif(len(text), 0) AS digit_frac,
               ln(len(toks) + 1) AS ln_n,
               CASE WHEN len(toks) >= {_ROC_TOKENS} THEN 1 ELSE 0 END
                 AS y
        FROM t WHERE len(toks) > 0
      ),
      s AS (
        SELECT y,
               round(1.0 / (1.0 + exp(-(-2.0 + 3.0 * distinct_ratio
                     + 0.4 * mean_len + -6.0 * digit_frac
                     + 0.35 * ln_n))), 6) AS score
        FROM f
      ),
      hist AS (
        SELECT score, count(*)::BIGINT AS c, sum(y)::BIGINT AS pos
        FROM s GROUP BY score
      ),
      ranked AS (
        SELECT score, c, pos,
               sum(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - c
                 AS below
        FROM hist
      ),
      sums AS (
        SELECT sum(pos * (below + (c + 1) / 2.0)) AS pos_rank_sum,
               sum(pos)::BIGINT AS n1,
               sum(c - pos)::BIGINT AS n0
        FROM ranked
      ),
      auc AS (
        SELECT n1, n0,
               round((pos_rank_sum - n1::DOUBLE * (n1 + 1) / 2)
                     / (n1::DOUBLE * n0), 6) AS v
        FROM sums
      ),
      pts AS (
        SELECT thr,
               sum(CASE WHEN score >= thr THEN pos ELSE 0 END)::BIGINT
                 AS tp,
               sum(CASE WHEN score >= thr THEN c - pos ELSE 0 END)::BIGINT
                 AS fp
        FROM hist, (SELECT unnest([0.3, 0.5, 0.7]) AS thr)
        GROUP BY thr
      )
      SELECT pts.thr AS threshold,
             round(pts.tp::DOUBLE / auc.n1, 6) AS tpr,
             round(pts.fp::DOUBLE / auc.n0, 6) AS fpr,
             round(CASE WHEN pts.tp + pts.fp = 0 THEN 0.0
                   ELSE pts.tp::DOUBLE / (pts.tp + pts.fp) END, 6)
               AS precision_at,
             auc.v AS auc
      FROM pts, auc
      WHERE auc.n1 > 0 AND auc.n0 > 0
      ORDER BY threshold
    """,
)
def eval_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import _QW, _TOK

    d = _th(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
    t = d.select("text", toks.alias("toks")).where(F.size("toks") > 0)
    n = F.size("toks").cast("double")
    distinct_ratio = F.size(F.array_distinct("toks")).cast("double") / n
    mean_len = (
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n
    )
    digit_frac = (
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
        / F.length("text")
    )
    z = (
        F.lit(_QW[0])
        + F.lit(_QW[1]) * distinct_ratio
        + F.lit(_QW[2]) * mean_len
        + F.lit(_QW[3]) * digit_frac
        + F.lit(_QW[4]) * F.log(n + 1)
    )
    s = t.select(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        (F.size("toks") >= _ROC_TOKENS).cast("int").alias("y"),
    )
    hist = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("pos"),
    )
    # distributed prefix sum over the score histogram: 6dp-rounded
    # scores can approach |docs| distinct values, so a single global
    # cum window would funnel the corpus through one partition (the
    # PMI/ntile class the r04 verdict flagged). Instead: 1000 fixed
    # score buckets -> per-bucket cum windows (parallel) + bucket
    # offsets from a <=1000-row window (bounded) broadcast back.
    hb = hist.withColumn(
        "b", F.least(F.floor(F.col("score") * 1000), F.lit(999)).cast("long")
    )
    w_in = Window.partitionBy("b").orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    woff = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        hb.groupBy("b")
        .agg(F.sum("c").alias("bc"))
        .select(
            "b",
            F.coalesce(F.sum("bc").over(woff), F.lit(0)).alias("off"),
        )
    )
    ranked = (
        hb.select(
            "score",
            "b",
            "c",
            "pos",
            (F.sum("c").over(w_in) - F.col("c")).alias("below_in"),
        )
        .join(F.broadcast(offsets), "b")
        .select(
            "score",
            "c",
            "pos",
            (F.col("off") + F.col("below_in")).alias("below"),
        )
        .persist()  # feeds the AUC sums AND the threshold points
    )
    sums = ranked.agg(
        F.sum(
            F.col("pos")
            * (F.col("below") + (F.col("c") + 1) / F.lit(2.0))
        ).alias("pos_rank_sum"),
        F.sum("pos").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("pos")).cast("long").alias("n0"),
    )
    # guard BEFORE the division — ANSI Spark errors on /0 eagerly,
    # where DuckDB's inf would be filtered later anyway
    sums = sums.where((F.col("n1") > 0) & (F.col("n0") > 0))
    auc = sums.select(
        "n1",
        "n0",
        F.round(
            (
                F.col("pos_rank_sum")
                - F.col("n1").cast("double") * (F.col("n1") + 1) / 2
            )
            / (F.col("n1").cast("double") * F.col("n0")),
            6,
        ).alias("v"),
    )
    thr = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,)], "thr double"
    )
    pts = (
        ranked.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when(F.col("score") >= F.col("thr"), F.col("pos"))
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("score") >= F.col("thr"),
                    F.col("c") - F.col("pos"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
        )
    )
    return (
        pts.crossJoin(F.broadcast(auc))
        # degenerate-class guard (one empty class after corpus drift):
        # both engines emit ZERO rows instead of inf-vs-error
        .where((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            F.col("thr").alias("threshold"),
            F.round(F.col("tp").cast("double") / F.col("n1"), 6).alias(
                "tpr"
            ),
            F.round(F.col("fp").cast("double") / F.col("n0"), 6).alias(
                "fpr"
            ),
            F.round(
                F.when(F.col("tp") + F.col("fp") == 0, 0.0).otherwise(
                    F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
                ),
                6,
            ).alias("precision_at"),
            F.col("v").alias("auc"),
        )
        .orderBy("threshold")
    )
