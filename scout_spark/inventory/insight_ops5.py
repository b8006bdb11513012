"""Round-5 seventh wave: reset-aware running balances, k-minimum-values
distinct sketching, order-insensitive table fingerprints, winsorized
robust means, and RFM customer segmentation.  Same exactness doctrine
as the rest of the round-5 waves: integer state everywhere (cents,
64-bit md5 prefixes, rank thresholds, quintile labels), doubles only in
final rounded columns, deterministic tie-breaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


# ------------------------------- running balance with resets

_RESET_TOPK = 15


@register(
    "window_reset_cumsum",
    "Running totals that RESET at marker events — the conditional-"
    "cumulative idiom (inventory balances with stock-takes, spend "
    "since last login, error counts since last deploy) that plain "
    "windows can't express directly: a first cumulative window counts "
    "'signup' markers to assign each event a segment id, then the "
    "spend aggregates within (user, segment). All integer cents. "
    "Output: the 15 largest single-segment spends. 100 TB: both the "
    "window and the groupBy partition by user_id — one shuffle, "
    "reused across the two steps (Spark keeps the partitioning), and "
    "the two-window trick replaces an O(n^2) 'latest marker before "
    "me' self-join.",
    oracle=f"""
      WITH seg AS (
        SELECT user_id,
               round(value * 100)::BIGINT AS cents,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS segment
        FROM events
      )
      SELECT user_id, segment::BIGINT AS segment,
             count(*) AS n_events,
             round(sum(cents)::DOUBLE / 100, 2) AS spend
      FROM seg
      GROUP BY user_id, segment
      ORDER BY sum(cents) DESC, user_id, segment
      LIMIT {_RESET_TOPK}
    """,
)
def window_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .over(w)
        .alias("segment"),
    )
    return (
        seg.groupBy("user_id", F.col("segment").cast("long").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("_c"),
        )
        .orderBy(F.col("_c").desc(), "user_id", "segment")
        .limit(_RESET_TOPK)
        .select(
            "user_id",
            "segment",
            "n_events",
            F.round(F.col("_c").cast("double") / 100, 2).alias("spend"),
        )
    )


# ----------------------------------- KMV distinct-count sketch

_KMV_K = 256
_KMV_SPACE = float(1 << 60)  # h is a 60-bit uniform md5 prefix


@register(
    "sketch_kmv_distinct",
    "K-minimum-values distinct-count sketch (Bar-Yossef et al.; the "
    "ancestor of theta sketches) made CROSS-ENGINE EXACT — unlike "
    "approx_count_distinct's HLL (rows-only by design), KMV on a "
    "deterministic md5 hash is reproducible anywhere: hash every "
    "distinct active customer key into a 60-bit uniform value, keep "
    "the k=256 smallest (a TakeOrdered top-k, no global shuffle), and "
    "estimate D = (k-1) * 2^60 / h_(k). The entry AUDITS itself: "
    "output carries the exact distinct count and the realized "
    "relative error next to the estimate. 100 TB: the sketch is k "
    "values regardless of cardinality — mergeable across partitions "
    "(each keeps its local k smallest; merge re-selects), the "
    "standard distributed-sketch contract.",
    oracle=f"""
      WITH keys AS (
        SELECT DISTINCT o_custkey FROM orders
      ),
      hashed AS (
        SELECT ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT
                 AS h
        FROM keys
      ),
      kmin AS (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM hashed ORDER BY h LIMIT {_KMV_K}
      ),
      kth AS (SELECT max(h) AS hk, count(*) AS k FROM kmin),
      truth AS (SELECT count(*) AS d FROM keys)
      SELECT k::BIGINT AS k,
             hk AS kth_hash,
             round(CASE WHEN k < {_KMV_K} THEN k::DOUBLE
                        ELSE ({_KMV_K} - 1) * {_KMV_SPACE} / hk END, 4)
               AS est_distinct,
             d::BIGINT AS true_distinct,
             round(abs(CASE WHEN k < {_KMV_K} THEN k::DOUBLE
                            ELSE ({_KMV_K} - 1) * {_KMV_SPACE} / hk END
                       - d) / d, 6) AS rel_error
      FROM kth, truth
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    keys = o.select("o_custkey").distinct()
    hashed = keys.select(
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
               16, 10)
        .cast("long")
        .alias("h")
    )
    # TakeOrderedAndProject: each partition keeps its local k smallest,
    # the driver merges — the mergeable-sketch contract, no shuffle
    kmin = hashed.orderBy("h").limit(_KMV_K)
    kth = kmin.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k"))
    truth = keys.agg(F.count(F.lit(1)).alias("d"))
    # a sketch holding fewer than k values has seen the WHOLE set —
    # the estimate degrades to the exact count (standard KMV rule)
    est = F.when(F.col("k") < _KMV_K, F.col("k").cast("double")).otherwise(
        (F.lit(_KMV_K - 1) * F.lit(_KMV_SPACE)) / F.col("hk")
    )
    return (
        kth.crossJoin(truth)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("hk").alias("kth_hash"),
            F.round(est, 4).alias("est_distinct"),
            F.col("d").cast("long").alias("true_distinct"),
            F.round(F.abs(est - F.col("d")) / F.col("d"), 6).alias(
                "rel_error"
            ),
        )
    )


# ------------------------------ order-insensitive table fingerprint


def _fp_row_sql(cols: str) -> str:
    return f"('0x' || substr(md5({cols}), 1, 15))::BIGINT"


@register(
    "audit_table_fingerprint",
    "Order-insensitive table fingerprints — the replication/migration "
    "checksum (the datafold/data-diff primitive, and exactly what "
    "this repo's own oracle gate does per query): each row renders "
    "to a canonical '|'-joined string (keys, status, integer cents), "
    "hashes to a 60-bit md5 prefix, and the table collapses to "
    "(count, XOR of hashes, SUM of hashes mod 1e9+7) — commutative "
    "combiners, so the fingerprint is independent of row order AND "
    "partitioning, and any single-row difference flips both digests. "
    "Output: one row per audited table. 100 TB: map-side-combinable "
    "aggregates with constant-size state; the canonical-string render "
    "stays in whole-stage codegen.",
    oracle=f"""
      WITH o AS (
        SELECT count(*) AS n_rows,
               bit_xor(h) AS xor_fp,
               sum(h % 1000000007)::BIGINT AS sum_fp
        FROM (
          SELECT {_fp_row_sql(
            "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || "
            "o_orderstatus || '|' || round(o_totalprice * 100)::BIGINT"
            "::VARCHAR"
          )} AS h
          FROM orders) _r
      ),
      l AS (
        SELECT count(*) AS n_rows,
               bit_xor(h) AS xor_fp,
               sum(h % 1000000007)::BIGINT AS sum_fp
        FROM (
          SELECT {_fp_row_sql(
            "l_orderkey::VARCHAR || '|' || l_partkey::VARCHAR || '|' || "
            "round(l_quantity * 100)::BIGINT::VARCHAR || '|' || "
            "round(l_extendedprice * 100)::BIGINT::VARCHAR"
          )} AS h
          FROM lineitem) _r
      )
      SELECT 'orders' AS table_name, n_rows, xor_fp, sum_fp FROM o
      UNION ALL
      SELECT 'lineitem' AS table_name, n_rows, xor_fp, sum_fp FROM l
      ORDER BY table_name
    """,
)
def audit_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, canon: str, name: str) -> DataFrame:
        h = (
            F.conv(F.substring(F.md5(F.expr(canon)), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        )
        return (
            df.select(h)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.expr("bit_xor(h)").alias("xor_fp"),
                F.sum(F.col("h") % F.lit(1000000007)).cast("long")
                .alias("sum_fp"),
            )
            .select(F.lit(name).alias("table_name"), "n_rows", "xor_fp",
                    "sum_fp")
        )

    o = fp(
        _t(spark, sf_dir, "orders"),
        "concat_ws('|', cast(o_orderkey as string),"
        " cast(o_custkey as string), o_orderstatus,"
        " cast(cast(round(o_totalprice * 100) as bigint) as string))",
        "orders",
    )
    li = fp(
        _t(spark, sf_dir, "lineitem"),
        "concat_ws('|', cast(l_orderkey as string),"
        " cast(l_partkey as string),"
        " cast(cast(round(l_quantity * 100) as bigint) as string),"
        " cast(cast(round(l_extendedprice * 100) as bigint) as string))",
        "lineitem",
    )
    return li.unionByName(o).orderBy("table_name")


# ------------------------------------------- winsorized mean

_WINS_LO = 5  # percent
_WINS_HI = 95


@register(
    "stats_winsorized_mean",
    "Winsorized mean — the robust-location estimator that CLAMPS "
    "instead of dropping (vs quality_outlier_mad's flagging and "
    "quality_length_percentile_filter's trimming): per event_type, "
    "the 5th/95th percentile thresholds are DISCRETE order "
    "statistics picked by exact integer rank arithmetic (rank "
    "ceil(p*n/100) over a (cents, event_id)-ordered window — no "
    "interpolated doubles, so both engines pick the identical "
    "threshold), every value clamps into [lo, hi], and the mean is "
    "one exact integer sum divided once. 100 TB: one sort per "
    "event_type partition shared by both threshold windows, then a "
    "map-side-combinable groupBy.",
    oracle=f"""
      WITH ranked AS (
        SELECT event_type,
               round(value * 100)::BIGINT AS cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY round(value * 100)::BIGINT,
                                           event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
      ),
      thr AS (
        SELECT event_type, n,
               max(CASE WHEN rn <= greatest(1, (n * {_WINS_LO} + 99) // 100)
                   THEN cents END) AS t_lo,
               max(CASE WHEN rn <= greatest(1, (n * {_WINS_HI} + 99) // 100)
                   THEN cents END) AS t_hi
        FROM ranked GROUP BY event_type, n
      )
      SELECT r.event_type,
             r.n AS n_events,
             round(t.t_lo::DOUBLE / 100, 2) AS p05,
             round(t.t_hi::DOUBLE / 100, 2) AS p95,
             round(sum(least(greatest(r.cents, t.t_lo), t.t_hi))::DOUBLE
                   / (100.0 * r.n), 6) AS winsorized_mean,
             round(sum(r.cents)::DOUBLE / (100.0 * r.n), 6) AS raw_mean
      FROM ranked r JOIN thr t ON r.event_type = t.event_type
      GROUP BY r.event_type, r.n, t.t_lo, t.t_hi
      ORDER BY r.event_type
    """,
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        cents.alias("cents"),
        F.row_number()
        .over(wp.orderBy(cents, F.col("event_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    thr = ranked.groupBy("event_type", "n").agg(
        F.max(
            F.when(
                F.col("rn")
                <= F.greatest(
                    F.lit(1),
                    F.expr(f"(n * {_WINS_LO} + 99) div 100"),
                ),
                F.col("cents"),
            )
        ).alias("t_lo"),
        F.max(
            F.when(
                F.col("rn")
                <= F.greatest(
                    F.lit(1),
                    F.expr(f"(n * {_WINS_HI} + 99) div 100"),
                ),
                F.col("cents"),
            )
        ).alias("t_hi"),
    )
    joined = ranked.join(
        F.broadcast(thr.drop("n")), "event_type"
    )
    return (
        joined.groupBy("event_type", "n", "t_lo", "t_hi")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("t_lo")),
                        F.col("t_hi"))
            ).alias("_w"),
            F.sum("cents").alias("_raw"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.round(F.col("t_lo").cast("double") / 100, 2).alias("p05"),
            F.round(F.col("t_hi").cast("double") / 100, 2).alias("p95"),
            F.round(
                F.col("_w").cast("double") / (100.0 * F.col("n")), 6
            ).alias("winsorized_mean"),
            F.round(
                F.col("_raw").cast("double") / (100.0 * F.col("n")), 6
            ).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- RFM segmentation


@register(
    "events_rfm_segmentation",
    "RFM customer segmentation — the classic marketing-analytics "
    "triple (Recency of last purchase, Frequency of purchases, "
    "Monetary total) quintiled into a 3-digit segment code per user: "
    "metrics are exact integers (µs recency vs the corpus horizon, "
    "counts, cents), quintiles are ntile(5) windows with full "
    "deterministic tie-breaks (metric, then user_id), and segments "
    "aggregate to counts + mean monetary. Output: segment code "
    "(e.g. '555' = best), user count, monetary mean. 100 TB: the "
    "per-user rollup is one map-side-combinable groupBy; the ntile "
    "windows run over |users| rows — at real scale swap for "
    "percentile-bucket joins (the quantile_normalize_by_source "
    "shape) to avoid the single-axis sort.",
    oracle="""
      WITH horizon AS (SELECT max(ts) AS mt FROM events),
      per_user AS (
        SELECT user_id,
               epoch_us((SELECT mt FROM horizon)) - epoch_us(max(ts))
                 AS rec_us,
               count(*)::BIGINT AS freq,
               sum(round(value * 100)::BIGINT)::BIGINT AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
      ),
      scored AS (
        SELECT user_id, cents,
               ntile(5) OVER (ORDER BY rec_us DESC, user_id) AS r_score,
               ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
               ntile(5) OVER (ORDER BY cents, user_id) AS m_score
        FROM per_user
      )
      SELECT (r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR)
               AS segment,
             count(*) AS n_users,
             round(sum(cents)::DOUBLE / (100.0 * count(*)), 6)
               AS mean_monetary
      FROM scored
      GROUP BY r_score, f_score, m_score
      ORDER BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # ONE events scan (FLOOR_r11): the corpus horizon max(ts) and the
    # purchase-only RFM metrics come out of the SAME per-user agg
    # (conditional aggregates); the horizon is then the max over the
    # |users|-sized rollup — value-identical to max(ts) over events,
    # and the second full scan disappears (at 100 TB that is a whole
    # corpus pass saved, not just a job floor).
    per_user_all = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("all_ts"),
            F.max(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("last_ts"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("freq"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    horizon = per_user_all.agg(F.max("all_ts").alias("mt"))
    per_user = (
        per_user_all.where(F.col("freq") > 0)
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (F.unix_micros(F.col("mt")) - F.unix_micros(F.col("last_ts")))
            .alias("rec_us"),
            "freq",
            "cents",
        )
    )
    # exact distributed ntiles (operators/rank.py): |users| grows with
    # data, so three unpartitioned ntile windows would be the
    # decile-mix single-partition class the r04 verdict flagged; each
    # axis gets the range-shuffle + per-partition rank + broadcast-
    # offset formulation with IDENTICAL bucket assignment. The
    # per-user rollup is persisted once (three axes would otherwise
    # re-run the events scan) and its count — a bounded driver scalar,
    # |purchase users| — feeds global_ntile's measured small-frame
    # gate (FLOOR_r11: the 3-axis distributed machinery was ~14 job
    # floors on a few-thousand-row frame, sp1 3.09 s vs duck 16 ms;
    # the gate is a no-op past 2M users — the distributed path stays
    # the production plan).
    from scout_spark.operators.rank import global_ntile

    # per_user_all is already eagerly checkpointed above (checkpoint,
    # not persist: repeated fresh builds would leak persisted frames —
    # the FLOOR_r11 capture-session trap), so this count is a cheap
    # job over the materialized |users| frame
    n_users = per_user.count()
    scored = per_user
    for cols, out in [
        ([F.col("rec_us").desc(), "user_id"], "r_score"),
        (["freq", "user_id"], "f_score"),
        (["cents", "user_id"], "m_score"),
    ]:
        scored = global_ntile(
            scored, cols, 5, out=out, known_count=n_users
        )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("cents").cast("double")
                / (100.0 * F.count(F.lit(1))),
                6,
            ).alias("mean_monetary"),
        )
        .select(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment"),
            "n_users",
            "mean_monetary",
        )
        .orderBy("segment")
    )


# -------------------------------------- MoM / YoY growth rollup


@register(
    "timeseries_mom_yoy_growth",
    "Month-over-month and year-over-year growth — the standard BI "
    "rollup pair: orders collapse to monthly revenue (exact integer "
    "cents, month rendered as a yyyy-MM string per the date-output "
    "invariant), then two lag windows over the |months|-bounded frame "
    "compute MoM (lag 1) and YoY (lag 12) percentage growth; first "
    "months yield NULL identically on both engines. 100 TB: the fact "
    "scan collapses at the first map-side-combinable groupBy; "
    "everything after runs over dozens of rows.",
    oracle="""
      WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        FROM orders GROUP BY 1
      ),
      lagged AS (
        SELECT month, cents,
               lag(cents, 1) OVER (ORDER BY month) AS prev_m,
               lag(cents, 12) OVER (ORDER BY month) AS prev_y
        FROM monthly
      )
      SELECT month,
             round(cents::DOUBLE / 100, 2) AS revenue,
             round((cents - prev_m) * 100.0 / prev_m, 6) AS mom_pct,
             round((cents - prev_y) * 100.0 / prev_y, 6) AS yoy_pct
      FROM lagged
      ORDER BY month
    """,
)
def timeseries_mom_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "cents",
        F.lag("cents", 1).over(w).alias("prev_m"),
        F.lag("cents", 12).over(w).alias("prev_y"),
    )
    return lagged.select(
        "month",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.round(
            (F.col("cents") - F.col("prev_m")) * 100.0 / F.col("prev_m"), 6
        ).alias("mom_pct"),
        F.round(
            (F.col("cents") - F.col("prev_y")) * 100.0 / F.col("prev_y"), 6
        ).alias("yoy_pct"),
    ).orderBy("month")


# --------------------------------- nearest-event as-of join

_NEAR_TOL_US = 3_600_000_000  # ±1 hour
_NEAR_TOPK = 15


@register(
    "asof_join_nearest_tolerance",
    "NEAREST-event join with tolerance — the bidirectional cousin of "
    "the backward-only as-of join (asof_join_last_purchase_before_"
    "error): every 'error' event matches the closest 'purchase' by "
    "the same user within ±1 hour, nearest by absolute µs gap, ties "
    "to the earlier purchase. Spark blocks by HOUR BUCKET: with "
    "tolerance == bucket width, each error probes exactly its 3 "
    "neighboring buckets (explode x3) and purchases stay on their "
    "home bucket, so candidates meet on a (user, bucket) equi key — "
    "zero false negatives by the triangle bound, the "
    "spatial_radius_pairs_grid recipe applied to time. The oracle "
    "keeps the quadratic per-user join. Output: the 15 widest "
    "matched gaps. 100 TB: the join shuffles on (user, bucket) — "
    "bounded candidate fan-out per event instead of per-user "
    "cartesian blowup on power users.",
    oracle=f"""
      WITH err AS (
        SELECT event_id AS err_id, user_id, epoch_us(ts) AS eus
        FROM events WHERE event_type = 'error'
      ),
      pur AS (
        SELECT event_id AS pur_id, user_id, epoch_us(ts) AS pus
        FROM events WHERE event_type = 'purchase'
      ),
      cand AS (
        SELECT e.err_id, e.user_id, p.pur_id,
               abs(e.eus - p.pus) AS gap_us,
               row_number() OVER (
                 PARTITION BY e.err_id
                 ORDER BY abs(e.eus - p.pus), p.pus, p.pur_id) AS rn
        FROM err e JOIN pur p ON e.user_id = p.user_id
        WHERE abs(e.eus - p.pus) <= {_NEAR_TOL_US}
      )
      SELECT err_id, user_id, pur_id,
             (gap_us // 1000000)::BIGINT AS gap_s
      FROM cand WHERE rn = 1
      ORDER BY gap_us DESC, err_id
      LIMIT {_NEAR_TOPK}
    """,
)
def asof_join_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.unix_micros("ts").alias("eus"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pur_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("pus"),
    )
    # errors probe their 3 neighboring hour buckets; purchases stay home
    probe = err.select(
        "err_id",
        "user_id",
        "eus",
        F.explode(
            F.array(
                *[
                    F.expr(f"eus div {_NEAR_TOL_US}") + d
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("bkt"),
    )
    home = pur.withColumn("bkt", F.expr(f"pus div {_NEAR_TOL_US}"))
    cand = (
        probe.join(
            home,
            (probe.user_id == home.p_user) & (probe.bkt == home.bkt),
        )
        .withColumn("gap_us", F.abs(F.col("eus") - F.col("pus")))
        .where(F.col("gap_us") <= _NEAR_TOL_US)
    )
    w = Window.partitionBy("err_id").orderBy("gap_us", "pus", "pur_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "err_id",
            "user_id",
            "pur_id",
            F.expr("gap_us div 1000000").alias("gap_s"),
            "gap_us",
        )
        .orderBy(F.col("gap_us").desc(), "err_id")
        .limit(_NEAR_TOPK)
        .drop("gap_us")
    )
