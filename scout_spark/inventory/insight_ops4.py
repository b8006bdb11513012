"""Round-5 sixth wave: survival analysis (Kaplan-Meier), multi-touch
attribution, reciprocal-rank fusion, geohash spatial binning, seasonal
decomposition, and time-weighted averages.  Every entry keeps its
running state in exact integers (quantized logs, ppm credit shares,
bit-interleaved codes, 25x-scaled deviations, cents x seconds) so the
DuckDB twins hash-match; doubles appear only in final rounded columns.

Reference parity: these are the analytics a user of the reference
(jollyboss123/scout) runs AROUND its serve path — the reference's own
scan/score/rank shape is covered by retrieval.py and core.py; this
module extends the warehouse-side insight family (cf. reference
repo.py's candidate-scan + app.py's ranked responses for the fusion
entry's two-ranker shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t
from scout_spark.inventory.graph_ops import _EDGES_SQL as _EDGES_SQL_LPA


# --------------------------------------- Kaplan-Meier survival curve

_KM_LN_SCALE = 1_000_000_000  # ln terms quantized to 1e-9 before summing
_KM_ZERO_Q = -100 * _KM_LN_SCALE  # stands in for ln(0): exp(-100) -> 0.0


@register(
    "survival_kaplan_meier",
    "Kaplan-Meier survival estimator — time-to-conversion with RIGHT "
    "CENSORING, the statistic behind retention/churn curves that a "
    "plain funnel (funnel_time_to_convert) gets wrong because users "
    "who have not converted YET are evidence, not missing data. Each "
    "user anchors at first 'view'; the event is first 'purchase' at or "
    "after the anchor; users without one are censored at the corpus "
    "horizon (global max ts). Durations in whole hours (integer-µs "
    "floor division). Per distinct event time: d deaths, n at risk "
    "(reverse-cumulative integer sum), and the product-limit survivor "
    "S(t) = prod(1 - d/n) carried as a RUNNING INTEGER sum of "
    "1e-9-quantized ln terms (d = n contributes a -100 sentinel, i.e. "
    "exp -> 0), so both engines sum exactly and only the final "
    "exp/round is floating point. 100 TB: risk sets come from one "
    "groupBy(duration) plus windows over |distinct durations| rows — "
    "the per-user scan never sorts globally.",
    oracle=f"""
      WITH anchors AS (
        SELECT user_id, min(ts) AS a FROM events
        WHERE event_type = 'view' GROUP BY user_id
      ),
      deaths AS (
        SELECT e.user_id, min(e.ts) AS p
        FROM events e JOIN anchors an ON e.user_id = an.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= an.a
        GROUP BY e.user_id
      ),
      horizon AS (SELECT max(ts) AS mt FROM events),
      subj AS (
        SELECT CASE WHEN d.p IS NOT NULL
                 THEN (epoch_us(d.p) - epoch_us(an.a)) // 3600000000
                 ELSE (epoch_us(h.mt) - epoch_us(an.a)) // 3600000000
               END AS dur,
               CASE WHEN d.p IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM anchors an LEFT JOIN deaths d USING (user_id), horizon h
      ),
      grp AS (
        SELECT dur, sum(ev)::BIGINT AS d, count(*)::BIGINT AS c
        FROM subj GROUP BY dur
      ),
      risk AS (
        SELECT dur, d,
               sum(c) OVER (ORDER BY dur DESC) AS n_risk
        FROM grp
      ),
      km AS (
        SELECT dur, d, n_risk,
               sum(CASE WHEN d = n_risk THEN {_KM_ZERO_Q}
                        ELSE round(ln(1.0 - d::DOUBLE / n_risk)
                                   * {_KM_LN_SCALE})::BIGINT END)
                 OVER (ORDER BY dur) AS cum_q
        FROM risk WHERE d > 0
      )
      SELECT dur::BIGINT AS t_hours,
             n_risk::BIGINT AS n_risk,
             d AS n_events,
             round(exp(cum_q / {_KM_LN_SCALE}.0), 6) AS survival
      FROM km ORDER BY t_hours
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    anchors = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("a"))
    )
    deaths = (
        ev.where(F.col("event_type") == "purchase")
        .join(anchors, "user_id")
        .where(F.col("ts") >= F.col("a"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    horizon = ev.agg(F.max("ts").alias("mt"))
    subj = (
        anchors.join(deaths, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .selectExpr(
            "CASE WHEN p IS NOT NULL"
            " THEN (unix_micros(p) - unix_micros(a)) div 3600000000"
            " ELSE (unix_micros(mt) - unix_micros(a)) div 3600000000"
            " END AS dur",
            "CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev",
        )
    )
    grp = subj.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    # windows below run over |distinct durations| rows, not users
    risk = grp.select(
        "dur",
        "d",
        F.sum("c").over(Window.orderBy(F.col("dur").desc())).alias("n_risk"),
    )
    km = (
        risk.where(F.col("d") > 0)
        .withColumn(
            "q",
            F.when(F.col("d") == F.col("n_risk"), F.lit(_KM_ZERO_Q)).otherwise(
                F.round(
                    F.log(1.0 - F.col("d") / F.col("n_risk")) * _KM_LN_SCALE
                ).cast("long")
            ),
        )
        .withColumn(
            "cum_q",
            F.sum("q").over(
                Window.orderBy("dur").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    return km.select(
        F.col("dur").cast("long").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.round(F.exp(F.col("cum_q") / F.lit(float(_KM_LN_SCALE))), 6).alias(
            "survival"
        ),
    ).orderBy("t_hours")


# ----------------------------------- position-based attribution

_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback
_ATTR_PPM = 1_000_000  # credit is parts-per-million, exact integers


@register(
    "attribution_position_credit",
    "Multi-touch attribution, position-based (U-shaped): every user's "
    "FIRST purchase is a conversion; the view/click touches in the 7 "
    "days before it share the credit — 40% to the first touch, 40% to "
    "the last, 20% split across the middle. Credit is integer PARTS "
    "PER MILLION with div/mod so each conversion distributes exactly "
    "1e6 ppm by construction (remainder to the first touch; a lone "
    "touch takes it all, a 2-touch path splits 60/40) — sums are "
    "exact integers on both engines, and only the final ppm -> "
    "conversions ratio is rounded. Output: credit by channel "
    "(event_type). 100 TB: one window per user's touch list (already "
    "co-partitioned by user_id), then a map-side-combinable groupBy "
    "over channels.",
    oracle=f"""
      WITH conv AS (
        SELECT user_id, min(ts) AS cts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
      ),
      touches AS (
        SELECT e.user_id, e.event_type, e.ts, e.event_id
        FROM events e JOIN conv ON e.user_id = conv.user_id
        WHERE e.event_type IN ('view', 'click')
          AND e.ts < conv.cts
          AND epoch_us(e.ts) >= epoch_us(conv.cts) - {_ATTR_WINDOW_US}
      ),
      pos AS (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               user_id
        FROM touches
      ),
      credit AS (
        SELECT event_type, user_id,
               CASE WHEN n = 1 THEN {_ATTR_PPM}
                    WHEN rn = 1 AND n = 2 THEN 600000
                    WHEN rn = 1 THEN 400000 + 200000 % (n - 2)
                    WHEN rn = n THEN 400000
                    ELSE 200000 // (n - 2) END AS ppm
        FROM pos
      )
      SELECT event_type AS channel,
             count(*) AS n_touches,
             count(DISTINCT user_id) AS n_users,
             round(sum(ppm)::DOUBLE / {_ATTR_PPM}, 6) AS conversions_credited
      FROM credit
      GROUP BY event_type
      ORDER BY conversions_credited DESC, channel
    """,
)
def attribution_position_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .where(
            (F.col("ts") < F.col("cts"))
            & (
                F.unix_micros(F.col("ts"))
                >= F.unix_micros(F.col("cts")) - _ATTR_WINDOW_US
            )
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    wu = Window.partitionBy("user_id")
    pos = touches.select(
        "event_type",
        "user_id",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    credit = pos.selectExpr(
        "event_type",
        "user_id",
        f"CASE WHEN n = 1 THEN {_ATTR_PPM}"
        " WHEN rn = 1 AND n = 2 THEN 600000"
        " WHEN rn = 1 THEN 400000 + 200000 % (n - 2)"
        " WHEN rn = n THEN 400000"
        " ELSE 200000 div (n - 2) END AS ppm",
    )
    return (
        credit.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum("ppm").cast("double") / _ATTR_PPM, 6
            ).alias("conversions_credited"),
        )
        .orderBy(F.col("conversions_credited").desc(), "channel")
    )


# ------------------------------------- reciprocal-rank fusion

_RRF_K = 60
_RRF_CAND = 100
_RRF_TOPK = 15
_RRF_TERMS = ("spark", "table", "merge", "fast")  # == retrieval._BM25_TERMS


def _occ_sql(term: str) -> str:
    # occurrence count of `term` in lower(text): identical text on both
    # engines, exact integer via length difference div term length
    return (
        f"(length(lower(text)) - length(replace(lower(text), '{term}', '')))"
    )


@register(
    "rerank_rrf_fusion",
    "Reciprocal-rank fusion — THE standard hybrid-search combiner "
    "(Cormack et al.; used by every lexical+semantic stack): two "
    "independent rankers each nominate their top-100 candidates, and "
    "a document's fused score is sum over lists of 1/(60 + rank), "
    "absent-from-list contributing nothing. Ranker A is lexical "
    "(total occurrences of the reference's 4 query terms — same "
    "query as bm25_topk_retrieval, cf. reference app.py's ranked "
    "/search responses); ranker B is recency (doc_id descending, the "
    "freshness prior). Ranks are integers with doc_id tie-breaks; the "
    "1/(60+r) terms are single IEEE divisions summed in fixed order, "
    "so both engines produce bit-identical fused scores. 100 TB: each "
    "candidate list is a TakeOrdered top-k (no global shuffle), the "
    "fusion is a full-outer join of two 100-row frames.",
    oracle=f"""
      WITH scored AS (
        SELECT doc_id,
               ({" + ".join(_occ_sql(t) + f" // {len(t)}" for t in _RRF_TERMS)})
                 AS lex
        FROM documents
      ),
      top_a AS (
        SELECT doc_id, lex,
               row_number() OVER (ORDER BY lex DESC, doc_id) AS ra
        FROM scored ORDER BY lex DESC, doc_id LIMIT {_RRF_CAND}
      ),
      top_b AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id DESC) AS rb
        FROM documents ORDER BY doc_id DESC LIMIT {_RRF_CAND}
      )
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             a.ra AS rank_lex,
             b.rb AS rank_fresh,
             round(coalesce(1.0 / ({_RRF_K} + a.ra), 0.0)
                   + coalesce(1.0 / ({_RRF_K} + b.rb), 0.0), 6) AS rrf
      FROM top_a a FULL OUTER JOIN top_b b ON a.doc_id = b.doc_id
      ORDER BY coalesce(1.0 / ({_RRF_K} + a.ra), 0.0)
               + coalesce(1.0 / ({_RRF_K} + b.rb), 0.0) DESC,
               doc_id
      LIMIT {_RRF_TOPK}
    """,
)
def rerank_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    lex = F.expr(
        " + ".join(
            f"(length(lower(text)) - length(replace(lower(text),"
            f" '{t}', ''))) div {len(t)}"
            for t in _RRF_TERMS
        )
    )
    # TakeOrderedAndProject both times: no global shuffle to find the
    # candidate lists; the rank windows then run over <= 100 rows
    top_a = (
        d.select("doc_id", lex.alias("lex"))
        .orderBy(F.col("lex").desc(), "doc_id")
        .limit(_RRF_CAND)
        .select(
            "doc_id",
            "lex",
            F.row_number()
            .over(Window.orderBy(F.col("lex").desc(), "doc_id"))
            .alias("ra"),
        )
    )
    top_b = (
        d.select("doc_id")
        .orderBy(F.col("doc_id").desc())
        .limit(_RRF_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("doc_id").desc()))
            .alias("rb"),
        )
    )
    fused = top_a.join(top_b, "doc_id", "full_outer")
    score = F.coalesce(1.0 / (_RRF_K + F.col("ra")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_K + F.col("rb")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.col("ra").alias("rank_lex"),
            F.col("rb").alias("rank_fresh"),
            F.round(score, 6).alias("rrf"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "doc_id")
        .limit(_RRF_TOPK)
        .drop("_s")
    )


# ----------------------------------------- geohash spatial binning

_GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 20  # per axis -> 40-bit code -> 8 base32 chars
_GH_LON_MUL = 7919
_GH_LAT_MUL = 104729
_GH_TOPK = 15


def _interleave_sql(duck: bool) -> str:
    """The 40-term bit-interleave (lon gets even bits from the MSB),
    generated once and shared by structure: lon bit (19-j) lands at
    code bit (39-2j), lat bit (19-j) at (38-2j)."""
    terms = []
    for j in range(_GH_BITS):
        for src, m in (("lonq", 39 - 2 * j), ("latq", 38 - 2 * j)):
            k = _GH_BITS - 1 - j
            if duck:
                # DuckDB gives + higher precedence than << — every
                # shift term is fully parenthesized (CLAUDE.md rule)
                terms.append(f"((({src} >> {k}) & 1) << {m})")
            else:
                terms.append(f"shiftleft(shiftright({src}, {k}) & 1, {m})")
    return " + ".join(terms)


def _gh_chars_sql(duck: bool) -> str:
    parts = []
    for i in range(8):
        s = 35 - 5 * i
        if duck:
            parts.append(
                f"substr('{_GH_ALPHA}', (((code >> {s}) & 31) + 1)::INT, 1)"
            )
        else:
            parts.append(
                f"substr('{_GH_ALPHA}',"
                f" cast(shiftright(code, {s}) & 31 as int) + 1, 1)"
            )
    return "concat(" + ", ".join(parts) + ")"


@register(
    "spatial_geohash_encode",
    "Geohash encoding + spatial binning — the interleaved-bit space-"
    "filling curve every geo index uses (and the string-prefix cousin "
    "of layout_zorder_key's integer curve; cf. reference repo.py's "
    "lat/lon bounding-box candidate scan, which a geohash prefix "
    "index accelerates): synthetic integer milli-degree coordinates "
    "(custkey scrambles) quantize to 20 bits per axis, interleave to "
    "a 40-bit code (lon on even bits, exactly the geohash standard), "
    "and render as 8 base32 chars. All integer bit arithmetic — both "
    "engines build byte-identical hashes. Output: the 15 densest "
    "4-char cells with their point counts and hash range. 100 TB: "
    "encoding is map-side expression work in whole-stage codegen; the "
    "cell groupBy is map-side combinable and the prefix is a "
    "partition key that co-locates spatial neighbors.",
    oracle=f"""
      WITH pts AS (
        SELECT c_custkey,
               ((c_custkey * {_GH_LON_MUL}) % 360000) * 1048576
                 // 360000 AS lonq,
               ((c_custkey * {_GH_LAT_MUL}) % 180000) * 1048576
                 // 180000 AS latq
        FROM customer
      ),
      coded AS (
        SELECT c_custkey, {_interleave_sql(True)} AS code FROM pts
      ),
      hashed AS (
        SELECT c_custkey, {_gh_chars_sql(True)} AS gh FROM coded
      )
      SELECT substr(gh, 1, 4) AS cell,
             count(*) AS n_points,
             min(gh) AS min_hash,
             max(gh) AS max_hash
      FROM hashed
      GROUP BY substr(gh, 1, 4)
      ORDER BY n_points DESC, cell
      LIMIT {_GH_TOPK}
    """,
)
def spatial_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pts = c.selectExpr(
        "c_custkey",
        f"((c_custkey * {_GH_LON_MUL}) % 360000) * 1048576"
        " div 360000 AS lonq",
        f"((c_custkey * {_GH_LAT_MUL}) % 180000) * 1048576"
        " div 180000 AS latq",
    )
    coded = pts.selectExpr("c_custkey", f"{_interleave_sql(False)} AS code")
    hashed = coded.selectExpr("c_custkey", f"{_gh_chars_sql(False)} AS gh")
    return (
        hashed.groupBy(F.substring("gh", 1, 4).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("gh").alias("min_hash"),
            F.max("gh").alias("max_hash"),
        )
        .orderBy(F.col("n_points").desc(), "cell")
        .limit(_GH_TOPK)
    )


# ------------------------------------- seasonal decomposition

_SEAS_HALF = 12  # centered 25-hour trend window


@register(
    "timeseries_seasonal_decompose",
    "Classical seasonal decomposition (moving-average detrending, the "
    "first step of STL/X-11): hourly event counts, a CENTERED 25-hour "
    "trend window as a RANGE frame over the integer hour index — so "
    "missing hours contribute their true zero instead of shrinking "
    "the window like a ROWS frame would — and the hour-of-day "
    "seasonal index as the mean detrended deviation. Deviations are "
    "kept 25x-scaled integers (25*count - trend_sum), so every "
    "aggregate before the final ratio is exact on both engines; edge "
    "hours without full trend coverage are excluded via min/max "
    "window bounds (count/min/max in unpartitioned windows only — "
    "the RANGE-frame-FP invariant). 100 TB: the series collapses to "
    "|hours| rows at the first groupBy; everything after is windows "
    "over that bounded frame. Complements timeseries_diurnal_profile "
    "(raw hour-of-day means, no detrending) and ewma (recursive "
    "smoother).",
    oracle=f"""
      WITH hours AS (
        SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hi,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1
      ),
      rng AS (
        SELECT hi, cnt,
               sum(cnt) OVER (ORDER BY hi
                 RANGE BETWEEN {_SEAS_HALF} PRECEDING
                 AND {_SEAS_HALF} FOLLOWING) AS tsum,
               min(hi) OVER () AS lo,
               max(hi) OVER () AS hih
        FROM hours
      ),
      dev AS (
        SELECT hi % 24 AS hod,
               cnt,
               25 * cnt - tsum AS dev25
        FROM rng
        WHERE hi >= lo + {_SEAS_HALF} AND hi <= hih - {_SEAS_HALF}
      )
      SELECT hod::BIGINT AS hod,
             count(*) AS n_hours,
             round(sum(cnt)::DOUBLE / count(*), 6) AS mean_count,
             round(sum(dev25)::DOUBLE / (25 * count(*)), 6) AS seasonal
      FROM dev GROUP BY hod ORDER BY hod
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hours = ev.groupBy(
        F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000").alias(
            "hi"
        )
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_rng = (
        Window.orderBy("hi").rangeBetween(-_SEAS_HALF, _SEAS_HALF)
    )
    w_all = Window.partitionBy()
    rng = hours.select(
        "hi",
        "cnt",
        F.sum("cnt").over(w_rng).alias("tsum"),
        F.min("hi").over(w_all).alias("lo"),
        F.max("hi").over(w_all).alias("hih"),
    )
    dev = rng.where(
        (F.col("hi") >= F.col("lo") + _SEAS_HALF)
        & (F.col("hi") <= F.col("hih") - _SEAS_HALF)
    ).select(
        (F.col("hi") % 24).alias("hod"),
        "cnt",
        (25 * F.col("cnt") - F.col("tsum")).alias("dev25"),
    )
    return (
        dev.groupBy(F.col("hod").cast("long").alias("hod"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(
                F.sum("cnt").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_count"),
            F.round(
                F.sum("dev25").cast("double") / (25 * F.count(F.lit(1))), 6
            ).alias("seasonal"),
        )
        .orderBy("hod")
    )


# ------------------------------------------ time-weighted average


@register(
    "timeseries_twap_value",
    "Time-weighted average value (TWAP) — the irregular-sampling mean "
    "where each observation counts for how LONG it held, not how "
    "often it was sampled (the financial TWAP / metrics-rollup "
    "primitive; a plain avg over-weights bursty periods). Each "
    "user-ordered event holds until that user's next event (lead "
    "window, ts+event_id tie-break); weights are integer SECONDS "
    "(µs floor division) times integer CENTS, so the weighted sums "
    "are exact bigints on both engines and only the final "
    "cents-to-units ratio is rounded. Last event per user has no "
    "successor and drops — identically on both sides. 100 TB: one "
    "lead window per user partition (co-partitioned by user_id), "
    "then a map-side-combinable groupBy(event_type); sums stay in "
    "int64 because weights are seconds, not µs.",
    oracle="""
      WITH seq AS (
        SELECT event_type,
               round(value * 100)::BIGINT AS cents,
               (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                - epoch_us(ts)) // 1000000 AS dur_s
        FROM events
      )
      SELECT event_type,
             count(*) AS n_events,
             sum(dur_s)::BIGINT AS total_s,
             round(sum(cents * dur_s)::DOUBLE / (100.0 * sum(dur_s)), 6)
               AS twap
      FROM seq WHERE dur_s IS NOT NULL
      GROUP BY event_type ORDER BY event_type
    """,
)
def timeseries_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros(F.col("ts")).alias("us"),
    ).withColumn("nus", F.lead("us").over(wu)).selectExpr(
        "event_type", "cents", "(nus - us) div 1000000 AS dur_s"
    )
    return (
        seq.where(F.col("dur_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dur_s").cast("long").alias("total_s"),
            F.round(
                F.sum(F.col("cents") * F.col("dur_s")).cast("double")
                / (100.0 * F.sum("dur_s")),
                6,
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


# ---------------------------- Fightin' Words log-odds comparison

_LO_A0 = 1000.0  # Dirichlet prior mass
_LO_MIN = 20  # minimum combined count
_LO_TOPK = 15


@register(
    "text_logodds_dirichlet",
    "Corpus comparison by LOG-ODDS WITH A DIRICHLET PRIOR (Monroe et "
    "al.'s 'Fightin' Words') — the statistically-sound answer to "
    "'which words distinguish corpus A from corpus B', where raw "
    "tf-idf or PMI over-weight rare words: per-token z-scores of the "
    "prior-smoothed log-odds delta between the en and de slices, the "
    "prior drawn from the pooled corpus (alpha_i = a0 * y_all/n_all). "
    "All inputs are exact integer counts off the shared persisted "
    "token frame (quality_ops.doc_tokens, BM25 pattern); the "
    "ln/sqrt scalar math is per-row with no FP aggregation, ordered "
    "by the ROUNDED z so both engines agree. Output: the 15 most "
    "en-distinctive tokens. 100 TB: two map-side-combinable groupBys "
    "(token counts, then totals) and a broadcast of the 1-row totals "
    "frame — vocabulary-bounded, never corpus-bounded.",
    oracle=f"""
      WITH tok AS (
        SELECT lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents WHERE lang IN ('en', 'de')
      ),
      cnt AS (
        SELECT tok,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y_en,
               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS y_de
        FROM tok GROUP BY tok
      ),
      tot AS (
        SELECT sum(y_en)::BIGINT AS n_en, sum(y_de)::BIGINT AS n_de,
               sum(y_en + y_de)::BIGINT AS n_all
        FROM cnt
      ),
      scored AS (
        SELECT tok, y_en, y_de,
               ln((y_en + {_LO_A0} * (y_en + y_de) / n_all)
                  / (n_en + {_LO_A0} - y_en
                     - {_LO_A0} * (y_en + y_de) / n_all))
               - ln((y_de + {_LO_A0} * (y_en + y_de) / n_all)
                    / (n_de + {_LO_A0} - y_de
                       - {_LO_A0} * (y_en + y_de) / n_all)) AS delta,
               1.0 / (y_en + {_LO_A0} * (y_en + y_de) / n_all)
               + 1.0 / (y_de + {_LO_A0} * (y_en + y_de) / n_all) AS v
        FROM cnt, tot
        WHERE y_en + y_de >= {_LO_MIN}
      )
      SELECT tok, y_en, y_de,
             round(delta, 6) AS delta,
             round(delta / sqrt(v), 6) AS z
      FROM scored
      ORDER BY round(delta / sqrt(v), 6) DESC, tok
      LIMIT {_LO_TOPK}
    """,
)
def text_logodds_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).where(F.col("lang").isin("en", "de"))
    cnt = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("y_en"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0))
        .cast("long")
        .alias("y_de"),
    )
    tot = cnt.agg(
        F.sum("y_en").cast("long").alias("n_en"),
        F.sum("y_de").cast("long").alias("n_de"),
        F.sum(F.col("y_en") + F.col("y_de")).cast("long").alias("n_all"),
    )
    a_i = F.lit(_LO_A0) * (F.col("y_en") + F.col("y_de")) / F.col("n_all")
    delta = F.log(
        (F.col("y_en") + a_i)
        / (F.col("n_en") + F.lit(_LO_A0) - F.col("y_en") - a_i)
    ) - F.log(
        (F.col("y_de") + a_i)
        / (F.col("n_de") + F.lit(_LO_A0) - F.col("y_de") - a_i)
    )
    var = 1.0 / (F.col("y_en") + a_i) + 1.0 / (F.col("y_de") + a_i)
    z = F.round(delta / F.sqrt(var), 6)
    return (
        cnt.where(F.col("y_en") + F.col("y_de") >= _LO_MIN)
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "y_en",
            "y_de",
            F.round(delta, 6).alias("delta"),
            z.alias("z"),
        )
        .orderBy(F.col("z").desc(), "tok")
        .limit(_LO_TOPK)
    )


# --------------------------------- golden-record survivorship merge


@register(
    "er_golden_record",
    "Survivorship / golden-record merge — the MDM step AFTER entity "
    "resolution (er_record_linkage finds the duplicates; this entry "
    "merges each group into one canonical record): per "
    "(nation, segment) group, RECORD-LEVEL survivorship picks the "
    "whole winning record by (balance cents, custkey) — a single "
    "max(struct(...)) whose tie-break is built into the comparator, "
    "so no arg-max nondeterminism on either engine — while "
    "FIELD-LEVEL survivorship keeps the longest address and the max "
    "balance independently of the winner. Balance quantized to exact "
    "integer cents before comparison. 100 TB: one map-side-combinable "
    "groupBy; max-of-struct partials merge associatively, so the "
    "shuffle carries one candidate record per partition per group.",
    oracle="""
      SELECT c_nationkey AS nationkey,
             c_mktsegment AS segment,
             count(*) AS n_records,
             (max(struct_pack(b := round(c_acctbal * 100)::BIGINT,
                              k := c_custkey,
                              p := c_name))).k AS golden_custkey,
             (max(struct_pack(b := round(c_acctbal * 100)::BIGINT,
                              k := c_custkey,
                              p := c_name))).p AS golden_name,
             (max(struct_pack(l := length(c_name),
                              a := c_name))).a AS longest_name,
             round(max(c_acctbal), 2) AS max_balance
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
      ORDER BY nationkey, segment
    """,
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    rec = F.max(
        F.struct(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("b"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("p"),
        )
    )
    addr = F.max(
        F.struct(F.length("c_name").alias("l"), F.col("c_name").alias("a"))
    )
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            rec.getField("k").alias("golden_custkey"),
            rec.getField("p").alias("golden_name"),
            addr.getField("a").alias("longest_name"),
            F.round(F.max("c_acctbal"), 2).alias("max_balance"),
        )
        .orderBy("nationkey", "segment")
    )


# ------------------------------------- quantile normalization


@register(
    "quantile_normalize_by_source",
    "Quantile normalization — map every document's length onto the "
    "GLOBAL length distribution by rank (the microarray/feature-"
    "preprocessing standard: after it, every source has an identical "
    "marginal distribution): within-source rank r of n_s maps to "
    "global rank r*(N-1) div (n_s-1) (exact integer arithmetic, "
    "doc_id tie-breaks), and the normalized value is the global "
    "order statistic at that rank, fetched by an equi join on rank. "
    "Means are exact integer sums divided once. Output: per source, "
    "the raw vs normalized mean (normalized means converge across "
    "sources — that is the point). 100 TB: the within-source windows "
    "partition by source; the global order statistics frame is the "
    "one total sort — at real scale swap it for approx quantiles "
    "over a sample (same join shape), as profile_dataset_columns "
    "does for its sketches.",
    oracle="""
      WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) - 1 AS r,
               count(*) OVER (PARTITION BY source) AS ns
        FROM documents
      ),
      gstat AS (
        SELECT n_chars AS gv,
               row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gr
        FROM documents
      ),
      tot AS (SELECT count(*) AS n FROM documents),
      mapped AS (
        SELECT source, n_chars,
               CASE WHEN ns = 1 THEN (n - 1) // 2
                    ELSE (r * (n - 1)) // (ns - 1) END AS mr
        FROM ranked, tot
      )
      SELECT m.source,
             count(*) AS n_docs,
             round(sum(m.n_chars)::DOUBLE / count(*), 6) AS mean_raw,
             round(sum(g.gv)::DOUBLE / count(*), 6) AS mean_normalized
      FROM mapped m JOIN gstat g ON m.mr = g.gr
      GROUP BY m.source
      ORDER BY m.source
    """,
)
def quantile_normalize_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        (F.row_number().over(ws) - 1).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    # exact distributed global rank (operators/rank.py): |docs| grows
    # with data — the former unpartitioned row_number was the
    # single-partition funnel class
    from scout_spark.operators.rank import global_row_number

    glob = global_row_number(
        d.select(F.col("n_chars").alias("gv"), "doc_id"),
        ["gv", "doc_id"],
        out="gr1",
    ).select("gv", (F.col("gr1") - 1).alias("gr"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    mapped = ranked.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_chars",
        "CASE WHEN ns = 1 THEN (n - 1) div 2"
        " ELSE (r * (n - 1)) div (ns - 1) END AS mr",
    )
    return (
        mapped.join(glob, mapped.mr == glob.gr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_raw"),
            F.round(F.sum("gv").cast("double") / F.count(F.lit(1)), 6)
            .alias("mean_normalized"),
        )
        .orderBy("source")
    )


# --------------------------------- label propagation (2 rounds)

_LPA_TOPK = 15


@register(
    "graph_label_propagation",
    "Community detection by SYNCHRONOUS LABEL PROPAGATION (Raghavan "
    "et al.), two unrolled rounds on the part co-purchase graph "
    "(graph_ops._edges): labels start as node ids; each round every "
    "node adopts its neighbors' most frequent label, ties to the "
    "smallest — round 1 therefore reduces to min-neighbor-id, round 2 "
    "is a genuine frequency vote (count desc, label asc via a single "
    "max_by over a (count, -label) struct — no argmax "
    "nondeterminism). The oracle re-votes with a row_number window "
    "pick — two formulations, one answer. Output: the 15 largest "
    "communities after round 2. 100 TB: each round is one "
    "groupBy(node) over the edge list — the Pregel message-passing "
    "shape, same as graph_pagerank_integer_fixedpoint; the edge frame "
    "is checkpointed once because both rounds consume it "
    "(overlapping-consumer barrier rule).",
    oracle=f"""
      WITH e0 AS ({_EDGES_SQL_LPA}),
      und AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
      ),
      l1 AS (
        SELECT dst AS v, min(src) AS lbl FROM und GROUP BY dst
      ),
      cnt AS (
        SELECT u.dst AS v, l.lbl, count(*) AS c
        FROM und u JOIN l1 l ON u.src = l.v
        GROUP BY u.dst, l.lbl
      ),
      pick AS (
        SELECT v, lbl FROM (
          SELECT v, lbl,
                 row_number() OVER (PARTITION BY v
                                    ORDER BY c DESC, lbl) AS rn
          FROM cnt) _r
        WHERE rn = 1
      )
      SELECT lbl AS community, count(*) AS size
      FROM pick GROUP BY lbl
      ORDER BY size DESC, community
      LIMIT {_LPA_TOPK}
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.graph_ops import _edges

    e = _edges(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    l1 = und.groupBy(F.col("dst").alias("v")).agg(F.min("src").alias("lbl"))
    cnt = (
        und.join(l1, und.src == l1.v)
        .groupBy(F.col("dst").alias("node"), "lbl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pick = cnt.groupBy("node").agg(
        F.max_by("lbl", F.struct(F.col("c"), (-F.col("lbl")))).alias("lbl2")
    )
    return (
        pick.groupBy(F.col("lbl2").alias("community"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(_LPA_TOPK)
    )
