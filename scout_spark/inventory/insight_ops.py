"""Round-4 third wave: event-flow analytics (Markov transitions, top
paths, rolling anomaly detection, linear gap interpolation), corpus
insight (windowed PMI collocations, RAKE keyword extraction), graph
link prediction, ANN range search, grouped OLS regression, weighted
percentiles, and a functional-dependency audit.

Cross-engine FP discipline (same house rules as series_ops):

- Every accumulation that feeds a comparison or a ranking is INTEGER
  (counts, integer cents, integer quantities, epoch micros) — exact and
  order-independent on both engines; doubles appear only in final
  single-expression formulas whose operand order is written identically
  on both sides (same IEEE op sequence -> same bits).
- Sums that can exceed int64 (OLS Sigma-y^2 in cents^2) go through
  decimal(38,0) on Spark / DuckDB's HUGEINT sum — both exact — and are
  cast to double only at the formula boundary.
- Per-user/type windows order by (ts, event_id): ts alone ties under
  generated data and an engine-dependent tie order flips lag values.
- LIMIT queries carry full deterministic tie-breaks.

Registered last in load_all so rotation queues these behind the
never-checked round-4 backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th

# --------------------------------------------------------------- markov


@register(
    "markov_second_order_transitions",
    "SECOND-order Markov model over per-user event streams: condition "
    "the next event on the previous TWO (lag-2, lag-1) states — the "
    "step up from events_transition_matrix's first-order edge counts "
    "that captures momentum patterns (e.g. view>click converts "
    "differently than click>view). Per-context conditional "
    "probabilities are ratios of exact integer counts over a "
    "|types|^2-sized context space. 100 TB: one window shuffle on "
    "user_id (both lags share the single sort) + one map-side-combined "
    "count agg; the context key space stays tiny regardless of data "
    "volume.",
    oracle="""
      WITH p AS (
        SELECT lag(event_type, 2) OVER w AS s2,
               lag(event_type, 1) OVER w AS s1,
               event_type AS dst
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      c AS (
        SELECT s2 || '>' || s1 AS ctx, dst, count(*) AS n
        FROM p WHERE s2 IS NOT NULL GROUP BY 1, 2
      )
      SELECT ctx, dst, n,
             round(n::DOUBLE / sum(n) OVER (PARTITION BY ctx), 6) AS prob
      FROM c
      ORDER BY n DESC, ctx, dst
      LIMIT 20
    """,
)
def markov_second_order_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.lag("event_type", 2).over(w).alias("s2"),
        F.lag("event_type", 1).over(w).alias("s1"),
        F.col("event_type").alias("dst"),
    ).where(F.col("s2").isNotNull())
    c = p.groupBy(
        F.concat_ws(">", "s2", "s1").alias("ctx"), "dst"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("ctx"))
    return (
        c.select(
            "ctx",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / tot, 6).alias("prob"),
        )
        .orderBy(F.col("n").desc(), "ctx", "dst")
        .limit(20)
    )


@register(
    "path_top_sequences",
    "Top entry paths: each user's first three events (ordered by ts, "
    "event_id) joined into an 'a>b>c' path string, counted across "
    "users — the product-analytics 'common journeys' report. Spark "
    "builds the path with array_sort(collect_list(struct(rn, type))) + "
    "a transform/array_join HOF (order pinned by rn, not shuffle "
    "arrival); the oracle uses DuckDB's ordered string_agg — "
    "independent formulations. 100 TB: the row_number window and the "
    "path agg share the user_id partitioning, so the whole plan is one "
    "shuffle + one tiny count agg.",
    oracle="""
      WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ),
      p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id HAVING count(*) = 3
      )
      SELECT path, count(*) AS n_users
      FROM p GROUP BY path
      ORDER BY n_users DESC, path
      LIMIT 15
    """,
)
def path_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 3)
    per_user = (
        first3.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("seq"),
        )
        .where(F.col("n_ev") == 3)
        .select(
            F.expr(
                "array_join(transform(seq, s -> s.event_type), '>')"
            ).alias("path")
        )
    )
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(15)
    )


# -------------------------------------------------------------- anomaly


@register(
    "timeseries_anomaly_zscore",
    "Rolling z-score anomaly detection on hourly event-type counts: "
    "each (type, hour) bucket is scored against the trailing 24 "
    "buckets' mean/std (ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) and "
    "flagged when |z| > 2 with >= 12 history buckets — the volume-spike "
    "monitor every ingest pipeline runs. The rolling sum/sum-of-squares "
    "are INTEGER counts (exact, order-independent — no FP window "
    "accumulation; the variance formula goes double only in the final "
    "expression, written identically on both engines). 100 TB: the "
    "hourly pre-agg collapses the stream 10^5:1 before the window, "
    "which then shuffles only (type, hour, count) triples.",
    oracle="""
      WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
        FROM events GROUP BY 1, 2
      ),
      w AS (
        SELECT event_type, hr, n,
               count(*) OVER win AS m,
               sum(n) OVER win AS s,
               sum(n * n) OVER win AS ss
        FROM h
        WINDOW win AS (PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      )
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour, n,
             round((n - s::DOUBLE / m) /
                   sqrt((ss - s::DOUBLE * s / m) / (m - 1)), 4) AS zscore
      FROM w
      WHERE m >= 12 AND (ss - s::DOUBLE * s / m) > 0
        AND abs((n - s::DOUBLE / m) /
                sqrt((ss - s::DOUBLE * s / m) / (m - 1))) > 2
      ORDER BY event_type, hour
    """,
)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    win = (
        Window.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    )
    w = h.select(
        "event_type",
        "hr",
        "n",
        F.count(F.lit(1)).over(win).alias("m"),
        F.sum("n").over(win).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(win).alias("ss"),
    )
    s_d = F.col("s").cast("double")
    mean = s_d / F.col("m")
    var = (F.col("ss") - s_d * F.col("s") / F.col("m")) / (F.col("m") - 1)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        w.where(
            (F.col("m") >= 12)
            & ((F.col("ss") - s_d * F.col("s") / F.col("m")) > 0)
            & (F.abs(z) > 2)
        )
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
            "n",
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "timeseries_linear_interpolate",
    "Hourly gap-fill with LINEAR interpolation (the sibling of "
    "timeseries_gapfill_locf): per event_type, densify the hourly "
    "avg(value) series onto a complete min..max hour grid and fill "
    "missing hours as prev + (next - prev) * elapsed-fraction, using "
    "last/first IGNORE NULLS windows for the bracketing observations "
    "and exact integer epoch-microsecond arithmetic for the fraction. "
    "100 TB: the grid explode is per-type and the two fill windows "
    "reuse one (type ORDER BY hr) sort — a single shuffle over the "
    "ALREADY hourly-collapsed frame, never the raw stream.",
    oracle="""
      WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               round(avg(value), 6) AS v
        FROM events GROUP BY 1, 2
      ),
      b AS (
        SELECT event_type, min(hr) AS lo, max(hr) AS hi
        FROM h GROUP BY 1
      ),
      grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM b
      ),
      j AS (
        SELECT g.event_type, g.hr, h.v FROM grid g
        LEFT JOIN h ON h.event_type = g.event_type AND h.hr = g.hr
      ),
      f AS (
        SELECT event_type, hr, v,
               last_value(v IGNORE NULLS) OVER
                 (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(v IGNORE NULLS) OVER
                 (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
      )
      SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour,
             CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS observed,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    round(pv + (nv - pv) *
                          ((epoch_us(hr) - epoch_us(pt))::DOUBLE
                           / (epoch_us(nt) - epoch_us(pt))), 6)
                  ELSE coalesce(pv, nv) END AS filled
      FROM f
      ORDER BY event_type, hour
    """,
)
def timeseries_linear_interpolate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Spark formulation avoids the oracle's grid-join entirely: each
    # OBSERVED hour looks ahead to the next observed hour (lead over
    # the one per-type sort) and map-side explodes the gap hours in
    # between, interpolating against the bracketing pair it already
    # holds — one events scan, one window shuffle, no second hourly
    # agg for the bounds and no densify join. Produces exactly the
    # oracle's per-type min..max grid.
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("hr")
    led = h.select(
        "event_type",
        "hr",
        "v",
        F.lead("hr").over(w).alias("nt"),
        F.lead("v").over(w).alias("nv"),
    )
    g = led.select(
        "event_type",
        "hr",
        "v",
        "nt",
        "nv",
        F.explode(
            F.expr(
                "sequence(hr, coalesce(nt - interval 1 hour, hr), "
                "interval 1 hour)"
            )
        ).alias("ghr"),
    )
    frac = (
        (F.unix_micros(F.col("ghr")) - F.unix_micros(F.col("hr"))).cast(
            "double"
        )
        / (F.unix_micros(F.col("nt")) - F.unix_micros(F.col("hr")))
    )
    observed = F.col("ghr") == F.col("hr")
    filled = F.when(observed, F.col("v")).otherwise(
        F.round(F.col("v") + (F.col("nv") - F.col("v")) * frac, 6)
    )
    return g.select(
        "event_type",
        F.date_format("ghr", "yyyy-MM-dd HH:00").alias("hour"),
        F.when(observed, 1).otherwise(0).alias("observed"),
        filled.alias("filled"),
    ).orderBy("event_type", "hour")


# ------------------------------------------------------------------ OLS


@register(
    "agg_ols_by_group",
    "Closed-form simple linear regression (slope / intercept / r^2) of "
    "extended price on quantity per return flag — grouped OLS from the "
    "five classic sufficient statistics. All sums are EXACT integers "
    "(quantity is integral; price in cents; Sigma-y^2 exceeds int64 so "
    "it runs through decimal(38,0) on Spark and DuckDB's HUGEINT sum — "
    "both exact), cast to double only inside the final formulas, which "
    "are written with the identical operand order on both engines. "
    "100 TB: a single map-side-combined agg — sufficient statistics ARE "
    "the mergeable-state formulation of regression, the same shape any "
    "distributed ML preprocessing uses.",
    oracle="""
      WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(l_quantity::BIGINT) AS sx,
               sum(round(l_extendedprice * 100)::BIGINT) AS sy,
               sum(l_quantity::BIGINT
                   * round(l_extendedprice * 100)::BIGINT) AS sxy,
               sum(l_quantity::BIGINT * l_quantity::BIGINT) AS sxx,
               sum(round(l_extendedprice * 100)::BIGINT
                   * round(l_extendedprice * 100)::BIGINT) AS syy
        FROM lineitem GROUP BY 1
      ),
      d AS (
        SELECT l_returnflag, n,
               n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
               sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
        FROM s
      )
      SELECT l_returnflag, n,
             round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) / 100,
                   6) AS slope,
             round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                    * sxd) / nd / 100, 2) AS intercept,
             round((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
                   / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
                   6) AS r2
      FROM d
      ORDER BY l_returnflag
    """,
)
def agg_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    xi = F.col("l_quantity").cast("bigint")
    yi = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum((yi * yi).cast("decimal(38,0)")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    slope_c = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    num2 = (nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
    den2 = (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope_c / 100, 6).alias("slope"),
        F.round((syd - slope_c * sxd) / nd / 100, 2).alias("intercept"),
        F.round(num2 / den2, 6).alias("r2"),
    ).orderBy("l_returnflag")


# ------------------------------------------------------ weighted median


@register(
    "agg_weighted_percentile",
    "Quantity-weighted price percentiles per return flag (weighted "
    "median + weighted p90): pick the first price whose cumulative "
    "quantity weight crosses the target fraction — the inventory-"
    "weighted price statistic BI suites ship as PERCENTILE_CONT("
    "weight). Entirely integer arithmetic (cents, integer quantities, "
    "2*cumw >= tot threshold tests) — zero FP order sensitivity. The "
    "cumulative weight is computed HISTOGRAM-REFINE style: a 64Ki-cent "
    "bin pre-agg gives per-bin prior weights (tiny per-flag window), "
    "then the exact crossing row comes from within-bin running sums — "
    "windows partition on (flag, bin), not the 3-value flag alone, so "
    "parallelism scales with the value range instead of capping at "
    "|flags| (1.9 s -> sub-second at sf0.1; the naive per-flag global "
    "sort is the plan that dies at 100 TB). The oracle keeps the "
    "single-window formulation — independently derived, identical "
    "integer cumsums.",
    oracle="""
      WITH r AS (
        SELECT l_returnflag,
               round(l_extendedprice * 100)::BIGINT AS pc,
               l_quantity::BIGINT AS q,
               sum(l_quantity::BIGINT) OVER
                 (PARTITION BY l_returnflag
                  ORDER BY round(l_extendedprice * 100)::BIGINT,
                           l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
               sum(l_quantity::BIGINT) OVER
                 (PARTITION BY l_returnflag) AS tot
        FROM lineitem
      )
      SELECT l_returnflag,
             round(min(CASE WHEN 2 * cumw >= tot THEN pc END) / 100.0, 2)
               AS weighted_median,
             round(min(CASE WHEN 10 * cumw >= 9 * tot THEN pc END) / 100.0,
                   2) AS weighted_p90,
             min(tot)::BIGINT AS total_weight
      FROM r GROUP BY l_returnflag
      ORDER BY l_returnflag
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q = F.col("l_quantity").cast("bigint")
    base = li.select(
        "l_returnflag",
        pc.alias("pc"),
        q.alias("q"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    ).withColumn("bin", F.shiftright("pc", 16))
    # per-bin weights: the bin frame is ~(price_range / 64Ki) rows per
    # flag, so its per-flag window is trivially small
    w1 = base.groupBy("l_returnflag", "bin").agg(F.sum("q").alias("bw"))
    wprior = (
        Window.partitionBy("l_returnflag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pri = w1.select(
        "l_returnflag",
        "bin",
        F.col("bw"),
        F.coalesce(F.sum("bw").over(wprior), F.lit(0)).alias("prior"),
        F.sum("bw").over(Window.partitionBy("l_returnflag")).alias("tot"),
    )
    # CROSSING-BIN PRUNING (r08 floor capture: the within-bin window
    # over the full fact stream was 4.6× a single-thread DuckDB on
    # identical work): each target fraction crosses in exactly ONE bin
    # per flag — min bin whose end-cumulative reaches the threshold;
    # the exact crossing row then comes from sorting ONLY those bins'
    # rows (2 bins per flag regardless of corpus size). prior < thr <=
    # prior+bw in the crossing bin, so the per-row scan below cannot
    # miss it.
    wflag = Window.partitionBy("l_returnflag")
    crossing = (
        pri.withColumn(
            "med_bin",
            F.min(
                F.when(
                    2 * (F.col("prior") + F.col("bw")) >= F.col("tot"),
                    F.col("bin"),
                )
            ).over(wflag),
        )
        .withColumn(
            "p90_bin",
            F.min(
                F.when(
                    10 * (F.col("prior") + F.col("bw")) >= 9 * F.col("tot"),
                    F.col("bin"),
                )
            ).over(wflag),
        )
        .where(
            (F.col("bin") == F.col("med_bin"))
            | (F.col("bin") == F.col("p90_bin"))
        )
        .select("l_returnflag", "bin", "prior", "tot")
    )
    # exact within-bin running sum over the crossing bins only:
    # partitions on (flag, bin); sorted volume is O(rows-per-bin)
    win_in = (
        Window.partitionBy("l_returnflag", "bin")
        .orderBy("pc", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = base.join(F.broadcast(crossing), ["l_returnflag", "bin"]).select(
        "l_returnflag",
        "pc",
        (F.col("prior") + F.sum("q").over(win_in)).alias("cumw"),
        "tot",
    )
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.round(
                F.min(F.when(2 * F.col("cumw") >= F.col("tot"), F.col("pc")))
                / 100.0,
                2,
            ).alias("weighted_median"),
            F.round(
                F.min(
                    F.when(10 * F.col("cumw") >= 9 * F.col("tot"), F.col("pc"))
                )
                / 100.0,
                2,
            ).alias("weighted_p90"),
            F.min("tot").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------------------------------ PMI


_TOK = "[a-z0-9]+"


@register(
    "text_cooccurrence_pmi",
    "Windowed PMI collocations: token pairs co-occurring within "
    "distance <= 2 inside a document, scored by pointwise mutual "
    "information log2(p(a,b)/(p(a)p(b))) against unigram marginals — "
    "the classic collocation-extraction statistic (Church & Hanks "
    "1990). Spark generates the pair stream with a per-document "
    "slice/transform HOF over the token array (arrays are "
    "document-bounded, so the interpreted per-element cost is O(1); no "
    "positional self-join, no shuffle before the count agg); the "
    "oracle independently derives pairs via a positional unnest "
    "self-join. All counts are exact integers; the PMI ratio is one "
    "fixed-order double expression. 100 TB: token pair generation is "
    "map-side and the aggs are vocabulary-sized, with the marginals "
    "broadcast to the pair join.",
    oracle=f"""
      WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      pos AS (
        SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p, toks
        FROM d
      ),
      tok AS (SELECT doc_id, p, toks[p] AS tok FROM pos),
      pair AS (
        SELECT least(a.tok, b.tok) AS tok_a, greatest(a.tok, b.tok) AS tok_b
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
      ),
      pc AS (
        SELECT tok_a, tok_b, count(*) AS pair_n
        FROM pair GROUP BY 1, 2
      ),
      m AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
      tot AS (
        SELECT (SELECT count(*) FROM tok) AS nn,
               (SELECT count(*) FROM pair) AS pp
      )
      SELECT p.tok_a, p.tok_b, p.pair_n,
             round(log2(p.pair_n::DOUBLE * t.nn * t.nn
                        / (t.pp::DOUBLE * ma.c * mb.c)), 4) AS pmi
      FROM pc p
      JOIN m ma ON ma.tok = p.tok_a
      JOIN m mb ON mb.tok = p.tok_b
      CROSS JOIN tot t
      WHERE p.pair_n >= 5
      ORDER BY pmi DESC, p.tok_a, p.tok_b
      LIMIT 20
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    # Unigram marginals ride the shared persisted doc_tokens frame (one
    # corpus tokenize per session, BM25 pattern); the positional pair
    # stream needs its own single scan (doc_tokens drops positions).
    # The corpus totals nn/pp are 1-row scalar aggs cross-joined back
    # with an explicit broadcast: at web scale the distinct-pair frame
    # is billions of rows, so an unpartitioned window sum over it would
    # funnel everything through one partition — the scalar-agg job costs
    # one extra tiny stage and keeps every stage parallel. The pair
    # frame feeds two jobs (total + main), so it is persisted.
    d = _th(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(_TOK), 0
        ).alias("toks"),
    )
    # pair stream: for 0-based element i, partners are i+1, i+2 ->
    # 1-based slice start i+2, length 2 (slice clamps at array end);
    # _th widens the single-row-group bench scan before the tokenize +
    # interpreted pair-HOF expansion (per-row-heavy kernel)
    pairs = d.select(
        F.explode(
            F.expr(
                "flatten(transform(toks, (x, i) -> "
                "transform(slice(toks, i + 2, 2), y -> "
                "struct(least(x, y) AS a, greatest(x, y) AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("tok_a"), F.col("p.b").alias("tok_b"))
    pc = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .persist()
    )
    pc = pc.crossJoin(
        F.broadcast(pc.agg(F.sum("pair_n").alias("pp")))
    )
    m = (
        doc_tokens(spark, sf_dir)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    m = m.crossJoin(F.broadcast(m.agg(F.sum("c").alias("nn"))))
    ma = m.select(
        F.col("tok").alias("tok_a"), F.col("c").alias("ca"), "nn"
    )
    mb = m.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    j = pc.join(F.broadcast(ma), "tok_a").join(F.broadcast(mb), "tok_b")
    pmi = F.log2(
        F.col("pair_n").cast("double") * F.col("nn") * F.col("nn")
        / (F.col("pp").cast("double") * F.col("ca") * F.col("cb"))
    )
    return (
        j.where(F.col("pair_n") >= 5)
        .select(
            "tok_a", "tok_b", "pair_n", F.round(pmi, 4).alias("pmi")
        )
        .orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
        .limit(20)
    )


# ----------------------------------------------------------------- RAKE


_STOPWORDS = (
    "the,of,and,a,an,in,to,is,was,it,for,on,as,with,at,by,from,that,"
    "this,be,are,or,not,but,have,has,had,were,which,you,we,they,i"
).split(",")
_STOP_RE = r"\b(?:" + "|".join(_STOPWORDS) + r")\b"


@register(
    "text_keyword_rake",
    "RAKE keyword extraction (Rose et al. 2010): candidate phrases are "
    "maximal stopword/punctuation-free word runs; each word scores "
    "deg/freq (deg = total length of phrases it appears in, freq = its "
    "occurrence count) and a phrase scores by its words' aggregate "
    "degree-to-frequency ratio. This implementation keeps the ratio "
    "INTEGER-EXACT — sum(deg)/sum(freq) over the phrase's words, one "
    "double division at the end — instead of summing per-word double "
    "ratios whose order the engines could disagree on. Both engines "
    "run the identical regex pipeline (punctuation -> '|', stopwords "
    "-> '|', split, trim). 100 TB: phrase extraction is map-side; "
    "word-stat aggs are vocabulary-sized and broadcast back to the "
    "phrase-word join.",
    oracle=f"""
      WITH ph0 AS (
        SELECT doc_id,
               unnest(string_split(
                 regexp_replace(regexp_replace(lower(text),
                                               '[^a-z0-9 ]', '|', 'g'),
                                '{_STOP_RE}', '|', 'g'),
                 '|')) AS raw
        FROM documents
      ),
      ph AS (
        SELECT trim(regexp_replace(raw, ' +', ' ', 'g')) AS phrase
        FROM ph0
        WHERE length(trim(regexp_replace(raw, ' +', ' ', 'g'))) > 0
      ),
      inst AS (
        SELECT phrase, string_split(phrase, ' ') AS ws,
               len(string_split(phrase, ' ')) AS plen
        FROM ph
      ),
      k AS (SELECT * FROM inst WHERE plen <= 4),
      iw AS (SELECT unnest(ws) AS w, plen FROM k),
      stats AS (
        SELECT w, count(*) AS freq, sum(plen) AS deg FROM iw GROUP BY w
      ),
      uniq AS (
        SELECT phrase, count(*) AS phrase_freq, min(plen) AS plen
        FROM k GROUP BY phrase
      ),
      uw AS (
        SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM uniq
      ),
      scored AS (
        SELECT u.phrase, sum(s.deg) AS sum_deg, sum(s.freq) AS sum_freq
        FROM uw u JOIN stats s ON s.w = u.w GROUP BY u.phrase
      )
      SELECT q.phrase, q.phrase_freq, q.plen AS n_words,
             round(sc.sum_deg::DOUBLE / sc.sum_freq, 4) AS rake_score
      FROM uniq q JOIN scored sc ON sc.phrase = q.phrase
      WHERE q.phrase_freq >= 2 AND q.plen >= 2
      ORDER BY rake_score DESC, q.phrase
      LIMIT 15
    """,
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single corpus pass: phrase instances collapse to the unique-phrase
    # frame immediately, word freq/deg come from phrase-frequency-
    # weighted sums over the exploded unique-phrase words (identical
    # values to instance-level counting), and the per-word stats attach
    # via a window over w instead of a groupBy+self-join — so no frame
    # is consumed twice and the corpus regex pipeline runs exactly once
    # (the naive stats-join formulation re-evaluated it 3x: 1.47 s ->
    # ~0.5 s at sf0.1). _th widens the single-row-group bench scan
    # before the stopword-alternation regex chain (per-row-heavy
    # kernel, the documented _th case).
    d = _th(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "|"),
        _STOP_RE,
        "|",
    )
    raw = d.select(F.explode(F.split(cleaned, r"\|")).alias("raw"))
    phrase = F.trim(F.regexp_replace(F.col("raw"), " +", " "))
    ph = raw.select(phrase.alias("phrase")).where(F.length(phrase) > 0)
    inst = ph.withColumn("plen", F.size(F.split("phrase", " "))).where(
        F.col("plen") <= 4
    )
    uniq = inst.groupBy("phrase", "plen").agg(
        F.count(F.lit(1)).alias("phrase_freq")
    )
    uw = uniq.select(
        "phrase",
        "plen",
        "phrase_freq",
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wstat = Window.partitionBy("w")
    scored = uw.select(
        "phrase",
        "plen",
        "phrase_freq",
        F.sum("phrase_freq").over(wstat).alias("freq"),
        F.sum(F.col("plen") * F.col("phrase_freq")).over(wstat).alias(
            "deg"
        ),
    )
    agg = scored.groupBy("phrase").agg(
        F.min("phrase_freq").alias("phrase_freq"),
        F.min("plen").alias("plen"),
        F.sum("deg").alias("sum_deg"),
        F.sum("freq").alias("sum_freq"),
    )
    return (
        agg.where((F.col("phrase_freq") >= 2) & (F.col("plen") >= 2))
        .select(
            "phrase",
            "phrase_freq",
            F.col("plen").alias("n_words"),
            F.round(
                F.col("sum_deg").cast("double") / F.col("sum_freq"), 4
            ).alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(15)
    )


# -------------------------------------------------------- link predict


@register(
    "graph_link_prediction",
    "Common-neighbors link prediction over the part co-purchase graph: "
    "among the top-100 hub parts (by degree, id tie-break), score every "
    "NON-adjacent pair by shared-neighbor count and neighborhood "
    "Jaccard — the 'customers who bought these also bought' candidate "
    "generator. The candidate pool is explicitly bounded (hub pairs, "
    "never all-pairs wedge materialization — the dense-graph trap); "
    "common neighbors come from one sorted-array intersect per pair of "
    "broadcast hub adjacency rows. Counts and degrees are integers; "
    "Jaccard is one double division. 100 TB: adjacency build shares "
    "the co-purchase edge shuffle; the 100x100 pair stage is "
    "broadcast-local, O(hub_degree) per intersect.",
    oracle="""
      WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ),
      und AS (
        SELECT src AS u, dst AS v FROM edges
        UNION ALL
        SELECT dst, src FROM edges
      ),
      deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
      hubs AS (SELECT u, d FROM deg ORDER BY d DESC, u LIMIT 100),
      adj AS (
        SELECT und.u, list_sort(list(und.v)) AS vs, any_value(h.d) AS d
        FROM und JOIN hubs h ON h.u = und.u GROUP BY und.u
      ),
      pairs AS (
        SELECT a.u AS pa, b.u AS pb,
               len(list_intersect(a.vs, b.vs)) AS cn,
               a.d AS da, b.d AS db,
               list_contains(a.vs, b.u) AS adjx
        FROM adj a JOIN adj b ON a.u < b.u
      )
      SELECT pa AS part_a, pb AS part_b, cn AS common_neighbors,
             round(cn::DOUBLE / (da + db - cn), 6) AS jaccard
      FROM pairs WHERE NOT adjx AND cn >= 1
      ORDER BY common_neighbors DESC, jaccard DESC, part_a, part_b
      LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.graph_ops import _edges

    edges = _edges(spark, sf_dir)
    und = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    hubs = deg.orderBy(F.col("d").desc(), "u").limit(100)
    adj = (
        und.join(F.broadcast(hubs), "u")
        .groupBy("u")
        .agg(
            F.array_sort(F.collect_list("v")).alias("vs"),
            F.first("d").alias("d"),
        )
    )
    a = adj.select(
        F.col("u").alias("pa"),
        F.col("vs").alias("vs_a"),
        F.col("d").alias("da"),
    )
    b = adj.select(
        F.col("u").alias("pb"),
        F.col("vs").alias("vs_b"),
        F.col("d").alias("db"),
    )
    pairs = a.join(F.broadcast(b), F.col("pa") < F.col("pb")).select(
        "pa",
        "pb",
        F.size(F.array_intersect("vs_a", "vs_b")).alias("cn"),
        "da",
        "db",
        F.array_contains(F.col("vs_a"), F.col("pb")).alias("adjx"),
    )
    return (
        pairs.where(~F.col("adjx") & (F.col("cn") >= 1))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("cn").alias("common_neighbors"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("common_neighbors").desc(),
            F.col("jaccard").desc(),
            "part_a",
            "part_b",
        )
        .limit(20)
    )


# ----------------------------------------------------------- ANN range


_RADIUS_QUERY_ID = 0
_RADIUS_MIN_COS = 0.25


@register(
    "ann_range_search_radius",
    "Range similarity search — ALL vectors within a cosine radius of "
    "the query (threshold 0.25), the dual of top-k ANN: dedup sweeps "
    "and policy filters want 'everything closer than r', not a fixed "
    "k. The query vector rides a broadcast 1-row crossJoin (lazy "
    "cursor — no build-time driver job), JVM-side zip_with dot "
    "product; the threshold test runs on the UNROUNDED similarity on "
    "both engines, so the predicate is the identical double comparison. "
    "100 TB: embarrassingly parallel scan with predicate selectivity "
    "doing the work of top-k's heap — pair with the IVF partition-"
    "pruned variant when the radius is tight.",
    oracle=f"""
      SELECT e.vec_id, e.label,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
               AS cos_sim
      FROM embeddings e
      CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = {_RADIUS_QUERY_ID}) q
      WHERE e.vec_id <> {_RADIUS_QUERY_ID}
        AND list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
            >= {_RADIUS_MIN_COS}
      ORDER BY cos_sim DESC, e.vec_id
    """,
)
def ann_range_search_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.functions.vectors import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")
    # lazy cursor resolution (ADVICE r04 d): the query vector rides a
    # broadcast 1-row crossJoin instead of a build-time collect(), so
    # queries() construction launches zero Spark jobs; a missing query
    # id yields an empty broadcast side and 0 rows — identical to the
    # oracle's empty-subquery semantics
    q = (
        e.where(F.col("vec_id") == _RADIUS_QUERY_ID)
        .select(F.col("embedding").cast("array<double>").alias("__qv"))
    )
    cos = cosine_similarity(F.col("embedding"), F.col("__qv"))
    return (
        e.where(F.col("vec_id") != _RADIUS_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .where(cos >= _RADIUS_MIN_COS)
        .select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
    )


# ------------------------------------------------------------- FD audit


@register(
    "audit_fd_violations",
    "Functional-dependency audit: for each candidate FD lhs -> rhs, "
    "count the lhs keys whose rhs is not unique — the data-contract "
    "check behind 'is this column derivable from that key'. Five "
    "candidates across orders/lineitem/customer/nation, each a "
    "two-level agg (distinct-rhs per key, then violation counts), "
    "UNION'd into one report. 100 TB: each check is one "
    "map-side-combined agg keyed by the lhs — the same shape as any "
    "profiling pass — and the report is a constant-size union.",
    oracle="""
      SELECT 'orders' AS tbl, 'o_custkey' AS lhs, 'o_orderpriority' AS rhs,
             count(*) AS n_keys,
             sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
             CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END AS holds
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY 1)
      UNION ALL
      SELECT 'lineitem', 'l_orderkey', 'l_returnflag', count(*),
             sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT,
             CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END
      FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd
            FROM lineitem GROUP BY 1)
      UNION ALL
      SELECT 'lineitem', 'l_partkey', 'l_suppkey', count(*),
             sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT,
             CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END
      FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
            FROM lineitem GROUP BY 1)
      UNION ALL
      SELECT 'customer', 'c_nationkey', 'c_mktsegment', count(*),
             sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT,
             CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END
      FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd
            FROM customer GROUP BY 1)
      UNION ALL
      SELECT 'nation', 'n_nationkey', 'n_regionkey', count(*),
             sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT,
             CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END
      FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
            FROM nation GROUP BY 1)
      ORDER BY tbl, lhs, rhs
    """,
)
def audit_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    def check(tbl: str, lhs: str, rhs: str) -> DataFrame:
        t = _t(spark, sf_dir, tbl)
        # nd > 1 ⟺ min(rhs) != max(rhs): both countDistinct and
        # min/max ignore NULLs (all-NULL rhs -> NULL != NULL -> not
        # violating, matching nd=0), so the oracle's count(DISTINCT)
        # form is untouched while the engine swaps the exact
        # distinct's two-phase expand for map-side-combinable
        # min/max partials (FLOOR_r11: 6.05 s -> the countDistinct
        # expand was the whole cost; each branch is now ONE exchange
        # of partial min/max pairs keyed by the lhs).
        nd = t.groupBy(lhs).agg(
            (F.min(rhs) != F.max(rhs)).alias("viol")
        )
        viol = F.sum(F.when(F.col("viol"), 1).otherwise(0))
        return nd.agg(
            F.count(F.lit(1)).alias("n_keys"),
            viol.alias("n_violating"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            "n_keys",
            "n_violating",
            F.when(F.col("n_violating") == 0, 1).otherwise(0).alias(
                "holds"
            ),
        )

    out = (
        check("orders", "o_custkey", "o_orderpriority")
        .unionAll(check("lineitem", "l_orderkey", "l_returnflag"))
        .unionAll(check("lineitem", "l_partkey", "l_suppkey"))
        .unionAll(check("customer", "c_nationkey", "c_mktsegment"))
        .unionAll(check("nation", "n_nationkey", "n_regionkey"))
    )
    return out.orderBy("tbl", "lhs", "rhs")


# ----------------------------------------------------- chi-square test


@register(
    "stats_chi_square_independence",
    "Chi-square test of independence for the lang x source contingency "
    "table (+ Cramer's V effect size) — the categorical-association "
    "check behind 'is corpus composition skewed by source'. Observed "
    "and marginal counts are exact integers; each cell's (o-e)^2/e is "
    "one fixed-order double expression, and the cell contributions are "
    "folded in (lang, source) order via a sequential list fold on both "
    "engines (Spark aggregate() vs DuckDB list_reduce — a fold with an "
    "exact +0.0 seed, so the IEEE op sequences agree bit-for-bit; no "
    "engine-ordered SUM over doubles anywhere). 100 TB: one count agg "
    "collapses the corpus to |langs| x |sources| cells; everything "
    "after is constant-size.",
    oracle="""
      WITH o AS (
        SELECT lang, source, count(*) AS n
        FROM documents GROUP BY 1, 2
      ),
      t AS (
        SELECT lang, source, n,
               sum(n) OVER (PARTITION BY lang) AS r,
               sum(n) OVER (PARTITION BY source) AS c,
               sum(n) OVER () AS nn
        FROM o
      ),
      cc AS (
        SELECT lang, source,
               (n - r::DOUBLE * c / nn) * (n - r::DOUBLE * c / nn)
                 / (r::DOUBLE * c / nn) AS contrib
        FROM t
      ),
      agg AS (
        SELECT count(*) AS n_cells,
               list_reduce(list(contrib ORDER BY lang, source),
                           (a, b) -> a + b) AS chi2
        FROM cc
      ),
      dims AS (
        SELECT count(DISTINCT lang) AS nl, count(DISTINCT source) AS ns,
               count(*) AS nn
        FROM documents
      )
      SELECT agg.n_cells,
             (dims.nl - 1) * (dims.ns - 1) AS dof,
             round(agg.chi2, 4) AS chi2,
             round(sqrt(agg.chi2 / (dims.nn::DOUBLE
                                    * least(dims.nl - 1, dims.ns - 1))),
                   6) AS cramers_v
      FROM agg, dims
    """,
)
def stats_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    # unpartitioned windows OK: the frame is the pre-collapsed
    # |lang|x|source| contingency table (tens of rows at ANY corpus
    # size), never the document stream
    t = o.select(
        "lang",
        "source",
        "n",
        F.sum("n").over(Window.partitionBy("lang")).alias("r"),
        F.sum("n").over(Window.partitionBy("source")).alias("c"),
        F.sum("n").over(Window.partitionBy()).alias("nn"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("nn")
    cc = t.select(
        "lang",
        "source",
        "nn",
        ((F.col("n") - e) * (F.col("n") - e) / e).alias("contrib"),
    )
    # dims (nl/ns/nn) come from the SAME cell frame — every lang and
    # source present in the corpus has a cell, so a second documents
    # scan for the distinct counts would be pure waste (review r04)
    agg = cc.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(lang, source, contrib))), s -> s.contrib), "
            "cast(0.0 as double), (a, x) -> a + x)"
        ).alias("chi2"),
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
        F.min("nn").alias("nn"),
    )
    return agg.select(
        "n_cells",
        ((F.col("nl") - 1) * (F.col("ns") - 1)).alias("dof"),
        F.round(F.col("chi2"), 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("nn").cast("double")
                    * F.least(F.col("nl") - 1, F.col("ns") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------- correlation matrix


@register(
    "profile_numeric_correlations",
    "Pairwise Pearson correlation profile of lineitem's numeric "
    "measures (quantity, price, discount, tax) — the profiling pass "
    "behind feature selection and drift monitoring. Each variable is "
    "quantized to its exact integer grid (units / cents / basis "
    "points), so all 14 sufficient statistics are EXACT integer sums "
    "(price-squared exceeds int64 and runs through decimal(38,0) / "
    "HUGEINT); the correlation formula is one fixed-order double "
    "expression per pair. One map-side-combined agg over the fact "
    "table computes every pair simultaneously — never six separate "
    "scans. 100 TB: sufficient statistics are the mergeable-state "
    "formulation; the output is constant-size.",
    oracle="""
      WITH s AS (
        SELECT count(*) AS n,
               sum(l_quantity::BIGINT) AS s_q,
               sum(round(l_extendedprice * 100)::BIGINT) AS s_p,
               sum(round(l_discount * 10000)::BIGINT) AS s_d,
               sum(round(l_tax * 10000)::BIGINT) AS s_t,
               sum(l_quantity::BIGINT * l_quantity::BIGINT) AS s_qq,
               sum(round(l_extendedprice * 100)::BIGINT
                   * round(l_extendedprice * 100)::BIGINT) AS s_pp,
               sum(round(l_discount * 10000)::BIGINT
                   * round(l_discount * 10000)::BIGINT) AS s_dd,
               sum(round(l_tax * 10000)::BIGINT
                   * round(l_tax * 10000)::BIGINT) AS s_tt,
               sum(round(l_discount * 10000)::BIGINT
                   * round(l_extendedprice * 100)::BIGINT) AS s_dp,
               sum(round(l_discount * 10000)::BIGINT
                   * l_quantity::BIGINT) AS s_dq,
               sum(round(l_discount * 10000)::BIGINT
                   * round(l_tax * 10000)::BIGINT) AS s_dt,
               sum(round(l_extendedprice * 100)::BIGINT
                   * l_quantity::BIGINT) AS s_pq,
               sum(round(l_extendedprice * 100)::BIGINT
                   * round(l_tax * 10000)::BIGINT) AS s_pt,
               sum(l_quantity::BIGINT
                   * round(l_tax * 10000)::BIGINT) AS s_qt
        FROM lineitem
      ),
      d AS (
        SELECT n, n::DOUBLE AS nd,
               s_q::DOUBLE AS q, s_p::DOUBLE AS p,
               s_d::DOUBLE AS dd, s_t::DOUBLE AS t,
               s_qq::DOUBLE AS qq, s_pp::DOUBLE AS pp,
               s_dd::DOUBLE AS ddd, s_tt::DOUBLE AS tt,
               s_dp::DOUBLE AS dp, s_dq::DOUBLE AS dq,
               s_dt::DOUBLE AS dt, s_pq::DOUBLE AS pq,
               s_pt::DOUBLE AS pt, s_qt::DOUBLE AS qt
        FROM s
      )
      SELECT var_x, var_y, n, round(corr, 6) AS corr FROM (
        SELECT 'discount' AS var_x, 'price' AS var_y, n,
               (nd * dp - dd * p) / (sqrt(nd * ddd - dd * dd)
                                     * sqrt(nd * pp - p * p)) AS corr
        FROM d
        UNION ALL
        SELECT 'discount', 'quantity', n,
               (nd * dq - dd * q) / (sqrt(nd * ddd - dd * dd)
                                     * sqrt(nd * qq - q * q))
        FROM d
        UNION ALL
        SELECT 'discount', 'tax', n,
               (nd * dt - dd * t) / (sqrt(nd * ddd - dd * dd)
                                     * sqrt(nd * tt - t * t))
        FROM d
        UNION ALL
        SELECT 'price', 'quantity', n,
               (nd * pq - p * q) / (sqrt(nd * pp - p * p)
                                    * sqrt(nd * qq - q * q))
        FROM d
        UNION ALL
        SELECT 'price', 'tax', n,
               (nd * pt - p * t) / (sqrt(nd * pp - p * p)
                                    * sqrt(nd * tt - t * t))
        FROM d
        UNION ALL
        SELECT 'quantity', 'tax', n,
               (nd * qt - q * t) / (sqrt(nd * qq - q * q)
                                    * sqrt(nd * tt - t * t))
        FROM d
      )
      ORDER BY var_x, var_y
    """,
)
def profile_numeric_correlations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    p = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    dc = F.round(F.col("l_discount") * 10000).cast("bigint")
    tx = F.round(F.col("l_tax") * 10000).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s_q"),
        F.sum(p).alias("s_p"),
        F.sum(dc).alias("s_d"),
        F.sum(tx).alias("s_t"),
        F.sum(q * q).alias("s_qq"),
        F.sum(dec(p * p)).alias("s_pp"),
        F.sum(dc * dc).alias("s_dd"),
        F.sum(tx * tx).alias("s_tt"),
        F.sum(dc * p).alias("s_dp"),
        F.sum(dc * q).alias("s_dq"),
        F.sum(dc * tx).alias("s_dt"),
        F.sum(dec(p * q)).alias("s_pq"),
        F.sum(dec(p * tx)).alias("s_pt"),
        F.sum(q * tx).alias("s_qt"),
    )
    cols = {
        "nd": "n",
        "q": "s_q",
        "p": "s_p",
        "dd": "s_d",
        "t": "s_t",
        "qq": "s_qq",
        "pp": "s_pp",
        "ddd": "s_dd",
        "tt": "s_tt",
        "dp": "s_dp",
        "dq": "s_dq",
        "dt": "s_dt",
        "pq": "s_pq",
        "pt": "s_pt",
        "qt": "s_qt",
    }
    d = s.select(
        "n", *[F.col(src).cast("double").alias(dst) for dst, src in cols.items()]
    )

    def corr(sxy: str, sx: str, sy: str, sxx: str, syy: str):
        nd, xy = F.col("nd"), F.col(sxy)
        x, y = F.col(sx), F.col(sy)
        xx, yy = F.col(sxx), F.col(syy)
        return (nd * xy - x * y) / (
            F.sqrt(nd * xx - x * x) * F.sqrt(nd * yy - y * y)
        )

    d = d.select(
        "n",
        corr("dp", "dd", "p", "ddd", "pp").alias("c_dp"),
        corr("dq", "dd", "q", "ddd", "qq").alias("c_dq"),
        corr("dt", "dd", "t", "ddd", "tt").alias("c_dt"),
        corr("pq", "p", "q", "pp", "qq").alias("c_pq"),
        corr("pt", "p", "t", "pp", "tt").alias("c_pt"),
        corr("qt", "q", "t", "qq", "tt").alias("c_qt"),
    )
    return d.selectExpr(
        "stack(6, "
        "'discount', 'price', c_dp, "
        "'discount', 'quantity', c_dq, "
        "'discount', 'tax', c_dt, "
        "'price', 'quantity', c_pq, "
        "'price', 'tax', c_pt, "
        "'quantity', 'tax', c_qt) AS (var_x, var_y, corr_raw)",
        "n",
    ).select(
        "var_x", "var_y", "n", F.round("corr_raw", 6).alias("corr")
    ).orderBy("var_x", "var_y")


# ------------------------------------------------------ keyset paging


@register(
    "page_keyset_orders",
    "Keyset (seek-method) pagination — page 3 of orders under "
    "(o_totalprice DESC, o_orderkey): the cursor (the 40th row) is "
    "resolved at plan-build time as a bounded top-40 point lookup (the "
    "same driver-side parameter-resolve pattern as the ANN query "
    "vector; bench reports it in build_sec), then the page fetch is a "
    "pushed-down keyset predicate + TakeOrderedAndProject top-20. "
    "This is THE scalable pagination shape: OFFSET forces every "
    "executor to produce and discard 40+ rows per partition and the "
    "driver to merge them all, while the keyset predicate prunes at "
    "the scan and the top-k heap never holds more than a page. "
    "Returns empty (like the oracle) when the table has no 40th row.",
    oracle="""
      WITH b AS (
        SELECT o_totalprice AS bp, o_orderkey AS bk FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 40
      ),
      bd AS (SELECT bp, bk FROM b ORDER BY bp ASC, bk DESC LIMIT 1),
      nb AS (SELECT count(*) AS cnt FROM b)
      SELECT o.o_orderkey, o.o_custkey,
             round(o.o_totalprice, 2) AS o_totalprice,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
      FROM orders o, bd, nb
      WHERE nb.cnt = 40
        AND (o.o_totalprice < bd.bp
             OR (o.o_totalprice = bd.bp AND o.o_orderkey > bd.bk))
      ORDER BY o.o_totalprice DESC, o.o_orderkey
      LIMIT 20
    """,
)
def page_keyset_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out_cols = (
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )
    # cursor resolution is a BOUNDED top-40 point lookup collected at
    # plan-build time: keyset pagination's defining property is that
    # the cursor arrives as a LITERAL in the page query — that is what
    # lets the predicate reach the parquet scan (PushedFilters /
    # row-group skipping, asserted in tests/test_scale_layout.py).
    # The r05 lazy-crossJoin variant launched zero build-time jobs but
    # demoted the predicate to a post-scan BroadcastNestedLoopJoin
    # filter — the wrong trade at 100 TB, reverted here (the build-time
    # job is the same driver-side parameter-resolve pattern as the ANN
    # query vector; bench reports it in build_sec).
    b = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_totalprice", "o_orderkey")
        .limit(40)
        .collect()
    )
    if len(b) < 40:  # no 40th row: empty page, like the oracle's guard
        return o.select(*out_cols).where(F.lit(False))
    bp, bk = b[-1]["o_totalprice"], b[-1]["o_orderkey"]
    return (
        o.where(
            (F.col("o_totalprice") < F.lit(bp))
            | (
                (F.col("o_totalprice") == F.lit(bp))
                & (F.col("o_orderkey") > F.lit(bk))
            )
        )
        .select(*out_cols)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ------------------------------------------------- containment dedup


@register(
    "dedup_containment_shingle",
    "Asymmetric containment detection (C4-style quote/subset check): "
    "for document pairs, |shingles(src) ∩ shingles(dst)| / "
    "|shingles(src)| over distinct 5-word shingles — the measure that "
    "catches 'src is mostly contained in dst' where symmetric Jaccard "
    "(dedup_ngram_jaccard_pairs) stays low. Spark builds an inverted "
    "index of hashed shingles and expands shared-doc pairs per shingle "
    "from grouped doc lists (no quadratic pair scan, no index "
    "self-join); the oracle recounts every pair quadratically with "
    "list_intersect — independent formulations. Shingling itself is a "
    "pure Column HOF (no Python). 100 TB: one (hash, doc) shuffle; "
    "per-shingle lists are bounded by duplication density, and the "
    "candidate stream feeds the same banded-LSH escalation path as "
    "the MinHash family when the corpus outgrows the exact index.",
    oracle=f"""
      WITH tk AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS t
        FROM documents
      ),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(t) - 4, 0) + 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                      || t[i+3] || ' ' || t[i+4])) AS sh
        FROM tk
      ),
      p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst,
               len(list_intersect(a.sh, b.sh)) AS shared,
               len(a.sh) AS src_size
        FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      )
      SELECT src, dst, shared,
             round(shared::DOUBLE / src_size, 6) AS containment
      FROM p WHERE shared >= 2
      ORDER BY containment DESC, src, dst
      LIMIT 20
    """,
)
def dedup_containment_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _th(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(_TOK), 0
        ).alias("t"),
    )
    # shingles via arrays_zip of shifted slices, NOT element_at(t, i+k)
    # lookups on the captured outer array inside the lambda — the
    # projection-collapse duplication measured 13 s vs 0.5 s for this
    # formulation at sf0.1 (CLAUDE.md rule). _th widens the single-
    # row-group bench scan before the per-row-heavy shingle kernel.
    shingle_expr = (
        "transform(arrays_zip("
        "slice(t, 1, greatest(size(t) - 4, 0)), "
        "slice(t, 2, greatest(size(t) - 4, 0)), "
        "slice(t, 3, greatest(size(t) - 4, 0)), "
        "slice(t, 4, greatest(size(t) - 4, 0)), "
        "slice(t, 5, greatest(size(t) - 4, 0))), "
        "s -> concat_ws(' ', s['0'], s['1'], s['2'], s['3'], s['4']))"
    )
    sh = d.select(
        "doc_id", F.array_distinct(F.expr(shingle_expr)).alias("sh")
    )
    # SINGLE evaluation of the corpus shingle pipeline: hash the
    # exploded shingles (8-byte index keys — same accepted 64-bit
    # collision class as span dedup's winner key), attach each doc's
    # shingle count with a post-explode window (size(sh) next to the
    # explode would be re-evaluated per output row by projection
    # collapse), and let the totals RIDE the per-shingle doc lists —
    # so the pair expansion (graph-edges pattern, no index self-join,
    # no second corpus scan for sizes) emits src_size directly.
    # Per-shingle lists are bounded by duplication density, never the
    # corpus.
    ex = (
        sh.select("doc_id", F.explode("sh").alias("gs"))
        .select("doc_id", F.xxhash64("gs").alias("g"))
        .withColumn(
            "total", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    )
    lists = ex.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "total"))).alias(
            "ds"
        )
    )
    pairs = (
        lists.where(F.size("ds") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(ds, y -> struct(x.doc_id AS src, "
                    "x.total AS src_size, y.doc_id AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.src_size", "p.dst")
        .where(F.col("src") != F.col("dst"))
    )
    shared = pairs.groupBy("src", "dst", "src_size").agg(
        F.count(F.lit(1)).alias("shared")
    )
    return (
        shared.where(F.col("shared") >= 2)
        .select(
            "src",
            "dst",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.col("src_size"), 6
            ).alias("containment"),
        )
        .orderBy(F.col("containment").desc(), "src", "dst")
        .limit(20)
    )



def _lang_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-length (n_chars) en/de counts — the value-histogram collapse
    shared by the KS and PSI drift entries (one definition so the two
    metrics can never silently diverge on the sample construction).

    Downstream unpartitioned windows over this frame are scale-safe:
    its cardinality is |distinct n_chars| (bounded by the length domain,
    a few thousand rows at ANY corpus size), never the document stream.
    """
    d = _t(spark, sf_dir, "documents").where(
        F.col("lang").isin("en", "de")
    )
    return d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("c2"),
    )


# ------------------------------------------------------------ KS test


@register(
    "stats_ks_two_sample",
    "Exact two-sample Kolmogorov-Smirnov test on document length "
    "(lang en vs de) — the distribution-drift check behind 'did this "
    "source's length profile shift'. ENTIRELY integer until the final "
    "division: per-value counts collapse the corpus first, cumulative "
    "counts are integer window sums over the distinct-value frame, and "
    "the KS statistic maximizes |cum1*n2 - cum2*n1| (an integer!) "
    "before one division by n1*n2 — so the argmax is exact, no FP "
    "comparison anywhere. The asymptotic p-value is one fixed-order "
    "double expression. 100 TB: the value-histogram pre-agg does the "
    "collapse (|distinct lengths| rows); the single-partition "
    "cumulative window only ever sees that tiny frame.",
    oracle="""
      WITH pv AS (
        SELECT n_chars,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c2
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY n_chars
      ),
      c AS (
        SELECT n_chars,
               sum(c1) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum1,
               sum(c2) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum2,
               sum(c1) OVER ()::BIGINT AS n1,
               sum(c2) OVER ()::BIGINT AS n2
        FROM pv
      ),
      d AS (
        SELECT n_chars, n1, n2,
               abs(cum1 * n2 - cum2 * n1) AS diffn
        FROM c
      )
      SELECT n1 AS n_en, n2 AS n_de, n_chars AS at_value,
             round(diffn::DOUBLE / (n1::DOUBLE * n2), 6) AS ks_d,
             round(2 * exp(-2.0 * (n1::DOUBLE * n2 / (n1 + n2))
                           * (diffn::DOUBLE / (n1::DOUBLE * n2))
                           * (diffn::DOUBLE / (n1::DOUBLE * n2))), 6)
               AS p_approx
      FROM d
      WHERE n1 > 0 AND n2 > 0
      ORDER BY diffn DESC, n_chars
      LIMIT 1
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = _lang_length_hist(spark, sf_dir)
    wcum = (
        Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy()
    c = pv.select(
        "n_chars",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    # degenerate-corpus guard (ADVICE r04): a regenerated corpus with
    # zero en or de docs would divide by 0 (Spark NULL vs DuckDB inf —
    # a parity break, not a graceful degrade); both sides filter the
    # empty-sample case identically and return 0 rows instead
    c = c.where((F.col("n1") > 0) & (F.col("n2") > 0))
    diffn = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    n1d = F.col("n1").cast("double")
    dd = F.col("diffn").cast("double") / (n1d * F.col("n2"))
    out = c.select(
        "n_chars", "n1", "n2", diffn.alias("diffn")
    ).select(
        F.col("n1").alias("n_en"),
        F.col("n2").alias("n_de"),
        F.col("n_chars").alias("at_value"),
        F.round(dd, 6).alias("ks_d"),
        F.round(
            2
            * F.exp(
                -2.0 * (n1d * F.col("n2") / (F.col("n1") + F.col("n2")))
                * dd
                * dd
            ),
            6,
        ).alias("p_approx"),
        F.col("diffn"),
    )
    return (
        out.orderBy(F.col("diffn").desc(), "at_value")
        .limit(1)
        .drop("diffn")
    )


# ---------------------------------------------------------------- PSI


@register(
    "stats_psi_drift",
    "Population stability index between en and de document-length "
    "distributions over EXACT en-decile bins — the standard ML-ops "
    "drift gate (PSI > 0.2 = investigate). Decile edges are derived "
    "with pure integer arithmetic (edge_k = min value whose cumulative "
    "en count satisfies 10*cum >= k*n1 — no engine percentile "
    "function, so both engines agree exactly); missing bins are "
    "densified so the 0.5-count smoothing applies uniformly; and the "
    "PSI sum folds the 10 per-bin terms in bin order (left-to-right, "
    "matching DuckDB list_reduce). 100 TB: ONE distributed job — the "
    "value histogram collapses the corpus; edges/bins/fold are a "
    "bounded driver contraction over the collected histogram "
    "(|distinct n_chars| rows).",
    oracle="""
      WITH pv AS (
        SELECT n_chars,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c2
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY n_chars
      ),
      c AS (
        SELECT n_chars, c1, c2,
               sum(c1) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum1,
               sum(c1) OVER ()::BIGINT AS n1,
               sum(c2) OVER ()::BIGINT AS n2
        FROM pv
      ),
      e AS (
        SELECT k, min(CASE WHEN 10 * cum1 >= k * n1 THEN n_chars END)
                 AS edge
        FROM c, unnest(range(1, 10)) AS t(k)
        GROUP BY k
      ),
      ea AS (SELECT list(edge ORDER BY k) AS earr FROM e),
      binned AS (
        SELECT len(list_filter(ea.earr, x -> x <= c.n_chars)) AS bin,
               c.c1, c.c2, c.n1, c.n2
        FROM c, ea
      ),
      bybin AS (
        SELECT bin, sum(c1)::BIGINT AS b1, sum(c2)::BIGINT AS b2,
               min(n1) AS n1, min(n2) AS n2
        FROM binned GROUP BY bin
      ),
      dense AS (
        SELECT g.bin, coalesce(b.b1, 0) AS b1, coalesce(b.b2, 0) AS b2,
               t.n1, t.n2
        FROM (SELECT unnest(range(0, 10)) AS bin) g
        LEFT JOIN bybin b USING (bin)
        CROSS JOIN (SELECT min(n1) AS n1, min(n2) AS n2 FROM bybin) t
      ),
      terms AS (
        SELECT bin,
               ((b1 + 0.5) / (n1::DOUBLE + 5.0)
                - (b2 + 0.5) / (n2::DOUBLE + 5.0))
               * ln(((b1 + 0.5) / (n1::DOUBLE + 5.0))
                    / ((b2 + 0.5) / (n2::DOUBLE + 5.0))) AS term,
               n1, n2
        FROM dense
      )
      SELECT min(n1) AS n_en, min(n2) AS n_de,
             count(*) AS n_bins,
             round(list_reduce(list(term ORDER BY bin),
                               (a, b) -> a + b), 6) AS psi
      FROM terms
      HAVING min(n1) > 0 AND min(n2) > 0
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    # ONE distributed job — the corpus-collapsing histogram (this is
    # the entry's own 100 TB story: everything downstream is
    # length-domain-bounded). The previous all-in-plan form built the
    # same histogram THREE times (once per derived-frame broadcast:
    # edges, bybin, tot) and its r06->r08 bench wall crept 0.49 -> 1.17 s
    # on regenerated data; decile edges, bin assignment, and the
    # 10-term fold are a bounded driver contraction over the collected
    # histogram (|distinct n_chars| rows — the PCA/MMR/keyset-cursor
    # precedent), 1 scan instead of 3 (1.17 -> ~0.45 s at sf0.1).
    # Every arithmetic step mirrors the oracle exactly: integer cumsum
    # thresholds, (b + 0.5)/(n + 5.0) smoothing, ln-ratio terms summed
    # LEFT-TO-RIGHT in bin order, HALF-UP rounding (Python's round()
    # is banker's — not used).
    rows = sorted(
        _lang_length_hist(spark, sf_dir).collect(),
        key=lambda r: r["n_chars"],
    )
    schema = "n_en bigint, n_de bigint, n_bins bigint, psi double"
    n1 = sum(r["c1"] for r in rows)
    n2 = sum(r["c2"] for r in rows)
    if n1 == 0 or n2 == 0:
        # degenerate-corpus guard (ADVICE r04): if either lang has zero
        # docs, drop the meaningless PSI row identically on both sides
        # (oracle HAVING) instead of risking NULL-vs-inf divergence
        return spark.createDataFrame([], schema)
    edges: list[int | None] = [None] * 9
    cum = 0
    for r in rows:
        cum += r["c1"]
        for k in range(1, 10):
            if edges[k - 1] is None and 10 * cum >= k * n1:
                edges[k - 1] = r["n_chars"]
    b1 = [0] * 10
    b2 = [0] * 10
    for r in rows:
        b = sum(1 for e in edges if e is not None and e <= r["n_chars"])
        b1[b] += r["c1"]
        b2[b] += r["c2"]
    psi = 0.0
    for b in range(10):
        p1 = (b1[b] + 0.5) / (float(n1) + 5.0)
        p2 = (b2[b] + 0.5) / (float(n2) + 5.0)
        psi += (p1 - p2) * math.log(p1 / p2)
    # HALF-UP to 6 dp (psi >= 0 by Gibbs' inequality term-wise)
    psi = math.floor(psi * 1e6 + 0.5) / 1e6
    return spark.createDataFrame([(n1, n2, 10, psi)], schema)


# -------------------------------------------------------------- benford


@register(
    "audit_benford_first_digit",
    "Benford's-law first-digit audit of order totals — the classic "
    "fabricated-data / corrupted-feed detector: leading-digit "
    "frequencies vs the log10(1 + 1/d) expectation, with per-digit "
    "deviations. Counts are exact integers; observed shares and the "
    "expectation are single fixed-order double expressions per row "
    "(no cross-row FP accumulation anywhere). 100 TB: one map-side-"
    "combined count agg over a 9-value key — the cheapest possible "
    "full-table audit shape.",
    oracle="""
      WITH d AS (
        SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT
                 AS digit
        FROM orders WHERE o_totalprice >= 1
      ),
      c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      t AS (SELECT sum(n)::BIGINT AS total FROM c)
      SELECT c.digit, c.n,
             round(c.n::DOUBLE / t.total, 6) AS observed_p,
             round(log10(1.0 + 1.0 / c.digit), 6) AS expected_p,
             round(c.n::DOUBLE / t.total
                   - log10(1.0 + 1.0 / c.digit), 6) AS deviation
      FROM c, t
      ORDER BY c.digit
    """,
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    # unpartitioned window OK: the frame is the 9-row first-digit
    # histogram (digits 1-9), collapsed before the window at any scale
    c = c.withColumn("total", F.sum("n").over(Window.partitionBy()))
    obs = F.col("n").cast("double") / F.col("total")
    exp_p = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(exp_p, 6).alias("expected_p"),
        F.round(obs - exp_p, 6).alias("deviation"),
    ).orderBy("digit")


# --------------------------------------------------------- Mann-Whitney


@register(
    "stats_mann_whitney_u",
    "Mann-Whitney U rank-sum test on document length (en vs de) with "
    "EXACT tie handling: midranks over the value histogram stay "
    "integer by carrying 2*midrank = 2*prev + ties + 1, so the doubled "
    "rank sum and doubled U statistic are exact BIGINTs; the normal "
    "approximation (with the full tie-correction term, itself an exact "
    "integer sum of t^3 - t) is one fixed-order double expression. "
    "Completes the drift-test family: KS sees shape, PSI sees binned "
    "mass, U sees stochastic dominance. 100 TB: identical shape to the "
    "KS entry — value-histogram collapse, then constant-size windows.",
    oracle="""
      WITH pv AS (
        SELECT n_chars,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c2
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY n_chars
      ),
      c AS (
        SELECT n_chars, c1, c2, c1 + c2 AS cv,
               sum(c1 + c2) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum,
               sum(c1) OVER ()::BIGINT AS n1,
               sum(c2) OVER ()::BIGINT AS n2
        FROM pv
      ),
      s AS (
        SELECT min(n1) AS n1, min(n2) AS n2,
               sum(c1 * (2 * (cum - cv) + cv + 1))::BIGINT AS r2x,
               sum(cv * cv * cv - cv)::BIGINT AS tie_t
        FROM c
      )
      SELECT n1 AS n_en, n2 AS n_de,
             r2x - n1 * (n1 + 1) AS u2x,
             (r2x - n1 * (n1 + 1)) / 2.0 AS u_stat,
             round(((r2x - n1 * (n1 + 1)) - n1::DOUBLE * n2)
                   / (2 * sqrt((n1::DOUBLE * n2 / 12)
                       * ((n1 + n2 + 1)
                          - tie_t::DOUBLE / ((n1 + n2)
                                             * (n1 + n2 - 1))))),
                   4) AS z_score
      FROM s
      WHERE n1 > 0 AND n2 > 0
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = _lang_length_hist(spark, sf_dir)
    wcum = (
        Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy()
    cv = F.col("c1") + F.col("c2")
    c = pv.select(
        "n_chars",
        "c1",
        "c2",
        cv.alias("cv"),
        F.sum(cv).over(wcum).alias("cum"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    s = c.agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.sum(
            F.col("c1")
            * (2 * (F.col("cum") - F.col("cv")) + F.col("cv") + 1)
        ).alias("r2x"),
        F.sum(
            F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv")
        ).alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    u2x = F.col("r2x") - F.col("n1") * (F.col("n1") + 1)
    n = F.col("n1") + F.col("n2")
    sigma2 = (n1d * F.col("n2") / 12) * (
        (n + 1) - F.col("tie_t").cast("double") / (n * (n - 1))
    )
    return s.select(
        F.col("n1").alias("n_en"),
        F.col("n2").alias("n_de"),
        u2x.alias("u2x"),
        (u2x / 2.0).alias("u_stat"),
        F.round(
            (u2x - n1d * F.col("n2")) / (2 * F.sqrt(sigma2)), 4
        ).alias("z_score"),
    ).where(
        # degenerate-corpus guard (ADVICE r04): zero en or de docs makes
        # sigma 0 (divide-by-zero, NULL-vs-inf across engines) — both
        # sides drop the row identically (oracle WHERE n1>0 AND n2>0)
        (F.col("n_en") > 0) & (F.col("n_de") > 0)
    )


# ----------------------------------------------------------------- Gini


@register(
    "agg_gini_concentration",
    "Gini concentration coefficient of order revenue per order "
    "priority — the inequality/concentration audit ('do 20% of orders "
    "carry 80% of revenue, and does it differ by priority band'). "
    "Computed from the exact rank formula G = 2*Sigma(i*x) / "
    "(n*Sigma x) - (n+1)/n with integer-cent values, row_number ranks "
    "(tie-broken by orderkey; permuting equal values leaves "
    "Sigma i*x unchanged, so the statistic is order-independent), and "
    "decimal(38,0)/HUGEINT for the rank-weighted sum. The per-priority "
    "rank window caps parallelism at |priorities| — at 100 TB this "
    "entry uses the same histogram-refine decomposition the weighted-"
    "percentile entry demonstrates (i = bin prior + within-bin rank). "
    "One double expression at the end, rounded 6dp.",
    oracle="""
      WITH r AS (
        SELECT o_orderpriority,
               round(o_totalprice * 100)::BIGINT AS pc,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY round(o_totalprice * 100)::BIGINT, o_orderkey)
                 AS i
        FROM orders
      ),
      s AS (
        SELECT o_orderpriority,
               count(*) AS n,
               sum(pc) AS sx,
               sum(i::HUGEINT * pc) AS six
        FROM r GROUP BY 1
      )
      SELECT o_orderpriority, n,
             round(sx / 100.0, 2) AS total_revenue,
             round(2.0 * (six::DOUBLE / (n::DOUBLE * sx::DOUBLE))
                   - (n + 1)::DOUBLE / n, 6) AS gini
      FROM s
      ORDER BY o_orderpriority
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pc = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy("pc", "o_orderkey")
    r = o.select(
        "o_orderpriority", pc.alias("pc"), "o_orderkey"
    ).withColumn("i", F.row_number().over(w))
    s = r.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pc").alias("sx"),
        F.sum(
            (F.col("i").cast("decimal(38,0)") * F.col("pc")).cast(
                "decimal(38,0)"
            )
        ).alias("six"),
    )
    nd = F.col("n").cast("double")
    gini = (
        2.0 * (F.col("six").cast("double") / (nd * F.col("sx").cast("double")))
        - (F.col("n") + 1).cast("double") / F.col("n")
    )
    return s.select(
        "o_orderpriority",
        "n",
        F.round(F.col("sx") / 100.0, 2).alias("total_revenue"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("o_orderpriority")


# --------------------------------------------------------- rolling mode


@register(
    "window_rolling_mode",
    "Rolling MODE — each event's most frequent event_type over the "
    "user's trailing 10 events (count desc, type asc tie-break): the "
    "'dominant recent behavior' feature engines rarely ship because "
    "mode doesn't decompose like sum/min. Spark: ONE window pass "
    "collects the trailing types (frame-ordered, deterministic) and a "
    "bounded HOF picks the mode via array_min over (-count, type) "
    "structs — per-row cost is window-sized, never corpus-sized, and "
    "the lambda only references the window-materialized array (safe "
    "from projection-collapse duplication). The oracle independently "
    "recounts via a bounded rn-band self-join + argmax. 100 TB: the "
    "single user_id window shuffle every sessionization pass already "
    "pays; no joins.",
    oracle="""
      WITH r AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ),
      pairs AS (
        SELECT a.user_id, a.rn, b.event_type AS t
        FROM r a JOIN r b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn
      ),
      c AS (
        SELECT user_id, rn, t, count(*) AS cnt
        FROM pairs GROUP BY user_id, rn, t
      ),
      m AS (
        SELECT user_id, rn, t, cnt,
               sum(cnt) OVER (PARTITION BY user_id, rn)::BIGINT AS wn,
               row_number() OVER (PARTITION BY user_id, rn
                                  ORDER BY cnt DESC, t) AS pick
        FROM c
      )
      SELECT user_id, rn, t AS mode_type, cnt AS mode_cnt, wn AS window_n
      FROM m WHERE pick = 1
      ORDER BY user_id, rn
    """,
)
def window_rolling_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wtrail = w.rowsBetween(-9, 0)
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.collect_list("event_type").over(wtrail).alias("arr"),
    )
    # mode = min over (-count, type): highest count first, then the
    # lexicographically smallest type — matches the oracle's ORDER BY
    # cnt DESC, t tie-break exactly. The expression is referenced
    # twice below (projection collapse duplicates it) — deliberate:
    # the HOF scans a <=10-element window array, so the duplicated
    # cost is O(20) per row, not the corpus-derived blowup the
    # CLAUDE.md collapse rule targets.
    mode = F.expr(
        "array_min(transform(array_distinct(arr), x -> "
        "struct(-size(filter(arr, y -> y = x)) AS negc, x AS t)))"
    )
    return base.select(
        "user_id",
        "rn",
        mode.getField("t").alias("mode_type"),
        (-mode.getField("negc")).cast("long").alias("mode_cnt"),
        F.size("arr").cast("long").alias("window_n"),
    ).orderBy("user_id", "rn")


# ------------------------------------------------------ diurnal profile


@register(
    "timeseries_diurnal_profile",
    "Diurnal (hour-of-day) seasonality profile per event type: volume, "
    "share of the type's events, mean value, and a peak-hour flag — "
    "the seasonal component every capacity planner and anomaly "
    "baseline starts from. Counts and shares are exact integers/"
    "ratios; the per-bucket mean is rounded 6dp (the proven hourly-avg "
    "discipline); the peak flag compares integer counts only. 100 TB: "
    "one map-side-combined agg onto a 24x|types| key space, then "
    "constant-size windows.",
    oracle="""
      WITH h AS (
        SELECT event_type, hour(ts) AS hod, count(*) AS n,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
      )
      SELECT event_type, hod, n,
             round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type), 6)
               AS share,
             avg_value,
             CASE WHEN n = max(n) OVER (PARTITION BY event_type)
                  THEN 1 ELSE 0 END AS is_peak_hour
      FROM h
      ORDER BY event_type, hod
    """,
)
def timeseries_diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    wt = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "hod",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias(
            "share"
        ),
        "avg_value",
        F.when(F.col("n") == F.max("n").over(wt), 1)
        .otherwise(0)
        .alias("is_peak_hour"),
    ).orderBy("event_type", "hod")
