"""Round-5 ninth wave: ANN recall evaluation (approx-vs-exact rank
overlap), sweep-line peak concurrency, and zlib compression-ratio
quality signals.  The first two are oracle-backed with the usual
integer-exact doctrine; the compression entry is rows-only (zlib is
not SQL-expressible) with ground-truth pytests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.graph_ops import _EDGES_SQL as _EDGES_SQL_ASSORT
from scout_spark.inventory.vector_ops import QUERY_VEC_ID


# ----------------------- ANN recall: quantized vs exact ranking

_RECALL_K = 10


@register(
    "ann_recall_eval_quantized_vs_exact",
    "ANN quality evaluation — recall@10 and Jaccard overlap of an "
    "UNNORMALIZED integer dot-product ranking (the floor(v*1e6) "
    "quantization every cross-engine ANN twin here uses) against the "
    "exact cosine ranking: the retrieval-metrics cousin of "
    "retrieval_eval_ndcg_mrr applied to the vector stack, and the "
    "measurement that justifies (or indicts) dropping normalization "
    "at index time. Both rankings are fully deterministic "
    "((rounded score, vec_id) orderings), so the overlap is "
    "oracle-checkable — unlike recall against a float index, which "
    "is rows-only. Query vector resolved at plan-build time "
    "(ann_cosine_topk_bruteforce pattern). 100 TB: two joinless "
    "TakeOrdered scans and a 10x10 intersection.",
    oracle=f"""
      WITH iv AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                              x -> floor(x::DOUBLE * 1e6)::BIGINT) AS q
        FROM embeddings
      ),
      qv AS (
        SELECT embedding::DOUBLE[] AS v, q FROM iv
        WHERE vec_id = {QUERY_VEC_ID}
      ),
      exact AS (
        SELECT e.vec_id FROM iv e, qv
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              qv.v), 6) DESC, e.vec_id
        LIMIT {_RECALL_K}
      ),
      approx AS (
        SELECT e.vec_id FROM iv e, qv
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY list_sum(list_transform(range(1, len(e.q) + 1),
                          i -> e.q[i] * qv.q[i])) DESC, e.vec_id
        LIMIT {_RECALL_K}
      ),
      common AS (
        SELECT count(*)::BIGINT AS n_common
        FROM exact JOIN approx USING (vec_id)
      )
      SELECT {_RECALL_K} AS k,
             n_common,
             round(n_common::DOUBLE / {_RECALL_K}, 6) AS recall_at_k,
             round(n_common::DOUBLE / (2 * {_RECALL_K} - n_common), 6)
               AS jaccard_at_k
      FROM common
    """,
)
def ann_recall_eval_quantized_vs_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import math

    from scout_spark.functions.vectors import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")
    qrows = (
        e.where(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    if not qrows:
        return e.where(F.lit(False)).select(
            F.lit(_RECALL_K).alias("k"),
            F.lit(0).cast("long").alias("n_common"),
            F.lit(0.0).alias("recall_at_k"),
            F.lit(0.0).alias("jaccard_at_k"),
        )
    qv = qrows[0][0]
    qint = [math.floor(x * 1e6) for x in qv]
    base = e.where(F.col("vec_id") != QUERY_VEC_ID)
    exact = (
        base.select(
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.lit(qv)), 6
            ).alias("s"),
        )
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(_RECALL_K)
        .select("vec_id")
    )
    # integer dot product, JVM-side HOFs (bounded by dim=64 per row;
    # the production path uses the numpy matmul in operators/ann.py)
    # one array literal, not 64 py4j lit calls (r12 plan-build chatter
    # fix; Python ints infer ArrayType(LongType) — zip_with promotes
    # identically, values unchanged)
    qarr = F.lit([int(v) for v in qint])
    dot = F.expr(
        "aggregate(zip_with(transform(embedding,"
        " x -> cast(floor(cast(x as double) * 1e6) as bigint)), qarr,"
        " (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    )
    approx = (
        base.withColumn("qarr", qarr)
        .select("vec_id", dot.alias("d"))
        .orderBy(F.col("d").desc(), "vec_id")
        .limit(_RECALL_K)
        .select("vec_id")
    )
    common = exact.join(approx, "vec_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return common.select(
        F.lit(_RECALL_K).alias("k"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(F.col("n_common").cast("double") / _RECALL_K, 6).alias(
            "recall_at_k"
        ),
        F.round(
            F.col("n_common").cast("double")
            / (2 * _RECALL_K - F.col("n_common")),
            6,
        ).alias("jaccard_at_k"),
    )


# ------------------------------- sweep-line peak concurrency

_CONC_GAP_US = 1_800_000_000  # 30-minute session gap


@register(
    "interval_peak_concurrency",
    "Peak concurrency by SWEEP LINE — 'what was the maximum number of "
    "simultaneously active sessions, and when': sessions come from "
    "the standard 30-min-gap sessionization (sessionize_30min_gap's "
    "kernel), each session emits a +1 at its start and a -1 just "
    "past its end (closed intervals), and a running integer sum over "
    "the globally ordered endpoint stream peaks at the answer — the "
    "classic O(n log n) algorithm, vs the O(n^2) 'count overlapping "
    "intervals per interval' join. Fully deterministic endpoint "
    "order ((t, delta, user, session)); first instant attaining the "
    "peak reported. 100 TB: the endpoint stream is 2x|sessions| rows "
    "(already collapsed from raw events); for a truly unsorted-fit "
    "case, bucket the sweep by time range and reconcile boundary "
    "partial sums — the audit_sequence_gaps recipe.",
    oracle=f"""
      WITH seq AS (
        SELECT user_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > {_CONC_GAP_US}
                    OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                       IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      ),
      sess AS (
        SELECT user_id, us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us) AS sid
        FROM seq
      ),
      spans AS (
        SELECT user_id, sid, min(us) AS s, max(us) AS e
        FROM sess GROUP BY user_id, sid
      ),
      endpoints AS (
        SELECT s AS t, 1 AS delta, user_id, sid FROM spans
        UNION ALL
        SELECT e + 1 AS t, -1 AS delta, user_id, sid FROM spans
      ),
      swept AS (
        SELECT t,
               sum(delta) OVER (ORDER BY t, delta DESC, user_id, sid
                                ROWS UNBOUNDED PRECEDING) AS run
        FROM endpoints
      ),
      peak AS (SELECT max(run) AS p FROM swept)
      SELECT (SELECT count(*) FROM spans)::BIGINT AS n_sessions,
             p::BIGINT AS peak_concurrency,
             (SELECT min(t) FROM swept WHERE run = (SELECT p FROM peak))
               ::BIGINT AS peak_at_us
      FROM peak
    """,
)
def interval_peak_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        (
            F.col("ts").isNotNull()
            & (
                F.lag(F.unix_micros("ts")).over(wu).isNull()
                | (
                    F.unix_micros("ts")
                    - F.lag(F.unix_micros("ts")).over(wu)
                    > _CONC_GAP_US
                )
            )
        )
        .cast("int")
        .alias("is_new"),
    )
    sess = seq.select(
        "user_id",
        "us",
        F.sum("is_new")
        .over(Window.partitionBy("user_id").orderBy("us"))
        .alias("sid"),
    )
    # spans feeds both endpoint streams plus the session count, and
    # swept feeds the peak and the argmin — overlapping consumers on
    # both frames, so persist them (CLAUDE.md barrier rule)
    spans = (
        sess.groupBy("user_id", "sid")
        .agg(F.min("us").alias("s"), F.max("us").alias("e"))
        .persist()
    )
    endpoints = spans.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id", "sid"
    ).unionByName(
        spans.select(
            (F.col("e") + 1).alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "sid",
        )
    )
    # distributed sweep: the endpoint stream is 2x|sessions| (grows
    # with data), so the running sum is computed as a BUCKETED prefix
    # sum — per-day windows in parallel + day offsets from a
    # span-bounded (|days|-row) window broadcast back — never one
    # global partition (the audit_sequence_gaps recipe, implemented
    # rather than just cited)
    day_us = 86_400_000_000
    eb = endpoints.withColumn("bkt", F.expr(f"t div {day_us}"))
    w_in = Window.partitionBy("bkt").orderBy(
        "t", F.col("delta").desc(), "user_id", "sid"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        eb.groupBy("bkt")
        .agg(F.sum("delta").alias("bd"))
        .select(
            "bkt",
            F.coalesce(F.sum("bd").over(woff), F.lit(0)).alias("off"),
        )
    )
    swept = (
        eb.select("bkt", "t", F.sum("delta").over(w_in).alias("run_in"))
        .join(F.broadcast(offsets), "bkt")
        .select("t", (F.col("off") + F.col("run_in")).alias("run"))
        .persist()
    )
    n_sessions = spans.agg(F.count(F.lit(1)).alias("n_sessions"))
    peak = swept.agg(F.max("run").alias("p"))
    peak_at = (
        swept.join(F.broadcast(peak), swept.run == peak.p)
        .agg(F.min("t").alias("peak_at_us"))
    )
    return (
        n_sessions.crossJoin(peak)
        .crossJoin(peak_at)
        .select(
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("p").cast("long").alias("peak_concurrency"),
            F.col("peak_at_us").cast("long").alias("peak_at_us"),
        )
    )


# -------------------------------- compression-ratio quality


@register(
    "quality_compression_ratio",
    "Compression-ratio quality signal (Gopher/RefinedWeb rule: text "
    "that zlib squeezes too hard is boilerplate/repetition; too "
    "little is noise): per-document deflate ratio via an "
    "Arrow-batched pandas UDF (zlib level 6 — deterministic given "
    "the level, but NOT SQL-expressible, hence rows-only with "
    "ground-truth pytests in tests/test_operators.py), aggregated "
    "per source with a flag-rate for the Gopher-style keep window "
    "[0.25, 0.95]. 100 TB: the UDF is the per-row-heavy kernel "
    "pattern — Arrow batches, input widened (_th), one map-side "
    "combinable groupBy after.",
    tags=("rows-only",),
)
def quality_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.compressq import compression_ratio_udf

    d = _th(spark, sf_dir, "documents")
    ratio = compression_ratio_udf(F.col("text"))
    flagged = (
        d.select("source", ratio.alias("ratio"))
        .select(
            "source",
            "ratio",
            (
                (F.col("ratio") < 0.25) | (F.col("ratio") > 0.95)
            )
            .cast("int")
            .alias("flagged"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
            F.sum("flagged").cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )


# ----------------------------------- nested (two-level) percentiles


@register(
    "stats_nested_percentiles",
    "Nested percentiles — 'the median user's p95 interarrival', the "
    "two-level quantile every latency/engagement SLO actually means "
    "(a global p95 over raw events is dominated by heavy users; the "
    "per-user-then-across-users form weights users equally): level 1 "
    "picks each user's p95 interarrival seconds as a DISCRETE order "
    "statistic by exact integer rank arithmetic (parallel per-user "
    "windows), level 2 ranks those |users| values and picks the "
    "median and p90 the same way. No interpolation anywhere — both "
    "engines pick identical elements. 100 TB: level 1 partitions by "
    "user (embarrassingly parallel); level 2 sorts |users| rows, "
    "not events.",
    oracle="""
      WITH gaps AS (
        SELECT user_id,
               (epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id))
                 // 1000000 AS dt_s,
               event_id
        FROM events
      ),
      ranked AS (
        SELECT user_id, dt_s,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY dt_s, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM gaps WHERE dt_s IS NOT NULL
      ),
      per_user AS (
        SELECT user_id,
               max(CASE WHEN rn <= greatest(1, (n * 95 + 99) // 100)
                   THEN dt_s END) AS p95_s
        FROM ranked GROUP BY user_id
      ),
      level2 AS (
        SELECT p95_s,
               row_number() OVER (ORDER BY p95_s, user_id) AS rn,
               count(*) OVER () AS nu
        FROM per_user
      )
      SELECT max(nu)::BIGINT AS n_users,
             max(CASE WHEN rn <= greatest(1, (nu * 50 + 99) // 100)
                 THEN p95_s END)::BIGINT AS median_user_p95_s,
             max(CASE WHEN rn <= greatest(1, (nu * 90 + 99) // 100)
                 THEN p95_s END)::BIGINT AS p90_user_p95_s,
             max(p95_s)::BIGINT AS max_user_p95_s
      FROM level2
    """,
)
def stats_nested_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) over"
            " (partition by user_id order by ts, event_id))"
            " div 1000000"
        ).alias("dt_s"),
    ).where(F.col("dt_s").isNotNull())
    wr = Window.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "dt_s",
        F.row_number().over(wu.orderBy("dt_s", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wr).alias("n"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.max(
            F.when(
                F.col("rn")
                <= F.greatest(F.lit(1), F.expr("(n * 95 + 99) div 100")),
                F.col("dt_s"),
            )
        ).alias("p95_s")
    )
    # level 2 as a HISTOGRAM of integer seconds: |users| grows with
    # data, so ranking users through one global window would be the
    # PMI/ntile single-partition class — but the p95 VALUES are
    # span-bounded integer seconds, so collapse to a (p95_s, count)
    # histogram and pick the rank-k value by cumulative count (the
    # lateness-profile discipline); identical discrete order statistic
    l2h = per_user.groupBy("p95_s").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("p95_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall2 = Window.partitionBy()
    cum = l2h.select(
        "p95_s",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall2).alias("nu"),
    )
    rank = lambda p: F.greatest(  # noqa: E731
        F.lit(1), F.expr(f"(nu * {p} + 99) div 100")
    )
    return cum.agg(
        F.max("nu").cast("long").alias("n_users"),
        F.min(F.when(F.col("cum") >= rank(50), F.col("p95_s")))
        .cast("long")
        .alias("median_user_p95_s"),
        F.min(F.when(F.col("cum") >= rank(90), F.col("p95_s")))
        .cast("long")
        .alias("p90_user_p95_s"),
        F.max("p95_s").cast("long").alias("max_user_p95_s"),
    )


# ----------------------------------- degree assortativity


@register(
    "graph_degree_assortativity",
    "Degree assortativity (Newman's r) of the part co-purchase graph "
    "— do hubs connect to hubs? One number that separates social-"
    "style graphs (r > 0) from technological/dependency graphs "
    "(r < 0): the Pearson correlation of endpoint degrees over the "
    "SYMMETRIZED edge list, computed entirely from integer "
    "sufficient sums (n, Sx, Sxy, Sxx over 2|E| orientation rows; "
    "Sy = Sx and Syy = Sxx by symmetry) with the n*Sxy products "
    "taken in doubles (the CUPED overflow rule). Reuses "
    "graph_ops._edges / _EDGES_SQL. 100 TB: degrees are one "
    "map-side-combinable groupBy, the degree lookup is a broadcast "
    "join per endpoint, and the final row is scalar math.",
    oracle=f"""
      WITH e0 AS ({_EDGES_SQL_ASSORT}),
      und AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst, src FROM e0
      ),
      deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM und GROUP BY src),
      pairs AS (
        SELECT da.d AS dx, db.d AS dy
        FROM und u JOIN deg da ON u.src = da.v JOIN deg db ON u.dst = db.v
      ),
      sums AS (
        SELECT count(*)::BIGINT AS n,
               sum(dx)::BIGINT AS sx,
               sum(dx * dy)::BIGINT AS sxy,
               sum(dx * dx)::BIGINT AS sxx
        FROM pairs
      )
      SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
             (SELECT count(*) FROM e0)::BIGINT AS n_edges,
             round((n * sxy - sx::DOUBLE * sx)
                   / (n * sxx - sx::DOUBLE * sx), 6) AS assortativity
      FROM sums
    """,
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.graph_ops import _degrees, _edges, _sym_edges

    # VERDICT r05 #2-3: the edge build + symmetrize + degree agg are
    # the session-cached shared frames (graph_ops), not per-entry
    # rebuilds, and the |V|-sized degree joins carry NO broadcast hint
    # — |V| = |parts| grows with scale, so AQE picks broadcast at bench
    # size and flips to a shuffle join before the driver OOMs.
    e = _edges(spark, sf_dir)
    und = _sym_edges(spark, sf_dir)
    deg = _degrees(spark, sf_dir)
    pairs = (
        und.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("dx")),
            "src",
        )
        .join(
            deg.select(F.col("v").alias("dst"), F.col("d").alias("dy")),
            "dst",
        )
        .select("dx", "dy")
    )
    sums = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    r = (
        F.col("n") * F.col("sxy") - F.col("sx").cast("double") * F.col("sx")
    ) / (
        F.col("n") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return (
        sums.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.round(r, 6).alias("assortativity"),
        )
    )


# --------------------------------------- Cohen's kappa agreement

_KAPPA_CHARS = 900
_KAPPA_TOKENS = 150


@register(
    "stats_cohens_kappa",
    "Inter-rater agreement by COHEN'S KAPPA — chance-corrected "
    "agreement between two deterministic document raters (the "
    "metadata length rule n_chars >= 900 vs the true token-count "
    "rule >= 150; the companion question to quality_score_confusion_"
    "eval's 'is the proxy good' is 'do two proxies even agree beyond "
    "chance'): the 2x2 agreement table is exact integer counts, "
    "observed and expected agreement are single rounded divisions, "
    "and kappa = (po - pe)/(1 - pe) guards the degenerate pe = 1 "
    "case identically on both engines. 100 TB: one scan, "
    "map-side-combinable conditional counts.",
    oracle=f"""
      WITH rated AS (
        SELECT CASE WHEN n_chars >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS a,
               CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
                         >= {_KAPPA_TOKENS} THEN 1 ELSE 0 END AS b
        FROM documents
      ),
      cm AS (
        SELECT count(*)::BIGINT AS n,
               sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS both_pos,
               sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS both_neg,
               sum(a)::BIGINT AS a1,
               sum(b)::BIGINT AS b1
        FROM rated
      )
      SELECT n,
             both_pos + both_neg AS n_agree,
             round((both_pos + both_neg)::DOUBLE / n, 6) AS po,
             round((a1::DOUBLE * b1 + (n - a1)::DOUBLE * (n - b1))
                   / (n::DOUBLE * n), 6) AS pe,
             round(CASE WHEN a1 * b1 + (n - a1) * (n - b1) = n * n
                   THEN 0.0
                   ELSE ((both_pos + both_neg)::DOUBLE / n
                         - (a1::DOUBLE * b1 + (n - a1)::DOUBLE * (n - b1))
                           / (n::DOUBLE * n))
                        / (1 - (a1::DOUBLE * b1
                                + (n - a1)::DOUBLE * (n - b1))
                              / (n::DOUBLE * n)) END, 6) AS kappa
      FROM cm
    """,
)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= _KAPPA_CHARS).cast("int")
    b = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" ")))
        + 1
        >= _KAPPA_TOKENS
    ).cast("int")
    cm = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("long")
        .alias("both_pos"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("long")
        .alias("both_neg"),
        F.sum("a").cast("long").alias("a1"),
        F.sum("b").cast("long").alias("b1"),
    )
    n = F.col("n")
    po = (F.col("both_pos") + F.col("both_neg")).cast("double") / n
    pe = (
        F.col("a1").cast("double") * F.col("b1")
        + (n - F.col("a1")).cast("double") * (n - F.col("b1"))
    ) / (n.cast("double") * n)
    degenerate = (
        F.col("a1") * F.col("b1")
        + (n - F.col("a1")) * (n - F.col("b1"))
        == n * n
    )
    return cm.select(
        "n",
        (F.col("both_pos") + F.col("both_neg")).alias("n_agree"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            F.when(degenerate, 0.0).otherwise((po - pe) / (1 - pe)), 6
        ).alias("kappa"),
    )
