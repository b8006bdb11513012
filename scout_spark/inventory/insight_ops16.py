"""Round-5 nineteenth wave: join-fanout audit and top-k-plus-other
reporting rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


@register(
    "audit_join_fanout",
    "Join-FANOUT audit — the pre-join diagnostic that predicts "
    "whether orders JOIN lineitem explodes: per-key multiplicities "
    "on each side, the EXACT output cardinality as sum over keys of "
    "cA*cB (computable from the two per-key histograms WITHOUT "
    "running the join — the same inner product the CMS entry "
    "estimates from sketches), max/mean fanout, and the top offender "
    "key. A key present on one side only contributes zero — the "
    "full-outer histogram join makes that explicit. 100 TB: two "
    "map-side-combinable per-key counts + one histogram-sized join; "
    "never the join itself.",
    oracle="""
      WITH ca AS (
        SELECT o_orderkey AS k, count(*)::BIGINT AS ca
        FROM orders GROUP BY 1
      ),
      cb AS (
        SELECT l_orderkey AS k, count(*)::BIGINT AS cb
        FROM lineitem GROUP BY 1
      ),
      h AS (
        SELECT coalesce(ca.k, cb.k) AS k,
               coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        FROM ca FULL OUTER JOIN cb ON ca.k = cb.k
      ),
      top AS (
        SELECT k FROM h ORDER BY ca * cb DESC, k LIMIT 1
      )
      SELECT count(*)::BIGINT AS n_keys,
             sum(ca * cb)::BIGINT AS exact_join_rows,
             max(ca * cb)::BIGINT AS max_fanout,
             round(avg(ca * cb), 6) AS mean_fanout,
             sum(CASE WHEN ca = 0 OR cb = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_unmatched_keys,
             (SELECT k FROM top)::BIGINT AS top_offender_key
      FROM h
    """,
)
def audit_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ca = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    h = (
        ca.join(cb, "k", "full_outer")
        .select(
            "k",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .persist()  # feeds the census agg AND the top-offender argmax
    )
    fan = F.col("ca") * F.col("cb")
    top = (
        h.orderBy(fan.desc(), "k").limit(1).select(F.col("k").alias("tk"))
    )
    stats = h.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(fan).cast("long").alias("exact_join_rows"),
        F.max(fan).cast("long").alias("max_fanout"),
        F.round(F.avg(fan), 6).alias("mean_fanout"),
        F.sum(
            F.when((F.col("ca") == 0) | (F.col("cb") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_unmatched_keys"),
    )
    return stats.crossJoin(F.broadcast(top)).select(
        "n_keys",
        "exact_join_rows",
        "max_fanout",
        "mean_fanout",
        "n_unmatched_keys",
        F.col("tk").cast("long").alias("top_offender_key"),
    )


_TKO_K = 3


@register(
    "agg_topk_plus_other_rollup",
    f"Top-{_TKO_K}-plus-OTHER reporting rollup — per nation, the "
    f"top-{_TKO_K} customers by exact revenue cents each get a row, "
    "and everyone else collapses into one 'OTHER' row carrying the "
    "remainder (count + revenue) — the shape every dashboard 'top N "
    "+ other' widget needs, done in ONE window pass + conditional "
    "re-aggregation instead of a top-k query plus a second full "
    "scan for the remainder. Rank ties broken by custkey; revenue "
    "in integer cents. 100 TB: per-nation windows parallelize by "
    "nation; WindowGroupLimit prunes rank > k+remainder map-side "
    "for the ranked branch, and the OTHER branch is a "
    "map-side-combinable re-agg of the same shuffled partition "
    "(one exchange total).",
    oracle=f"""
      WITH rev AS (
        SELECT c.c_nationkey AS nk, c.c_custkey,
               sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS cents,
               count(*)::BIGINT AS n_orders
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
      ),
      ranked AS (
        SELECT nk, c_custkey, cents, n_orders,
               row_number() OVER (PARTITION BY nk
                                  ORDER BY cents DESC, c_custkey) AS rk
        FROM rev
      ),
      tops AS (
        SELECT nk, 'cust:' || c_custkey AS who, rk,
               cents, n_orders
        FROM ranked WHERE rk <= {_TKO_K}
      ),
      other AS (
        SELECT nk, 'OTHER' AS who, {_TKO_K + 1} AS rk,
               sum(cents)::BIGINT AS cents,
               sum(n_orders)::BIGINT AS n_orders
        FROM ranked WHERE rk > {_TKO_K}
        GROUP BY nk
      )
      SELECT nk AS nationkey, who, rk AS rank, cents, n_orders
      FROM (SELECT * FROM tops UNION ALL SELECT * FROM other)
      ORDER BY nationkey, rank
    """,
)
def agg_topk_plus_other_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(F.col("c_nationkey").alias("nk"), "c_custkey")
        .agg(
            F.expr(
                "sum(cast(round(o_totalprice * 100) as bigint))"
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy("nk").orderBy(
        F.col("cents").desc(), "c_custkey"
    )
    ranked = rev.select(
        "nk",
        "c_custkey",
        "cents",
        "n_orders",
        F.row_number().over(w).alias("rk"),
    ).persist()  # top branch + OTHER re-agg read the same window pass
    tops = ranked.where(F.col("rk") <= _TKO_K).select(
        "nk",
        F.concat(F.lit("cust:"), F.col("c_custkey")).alias("who"),
        F.col("rk").alias("rank"),
        "cents",
        "n_orders",
    )
    other = (
        ranked.where(F.col("rk") > _TKO_K)
        .groupBy("nk")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .select(
            "nk",
            F.lit("OTHER").alias("who"),
            F.lit(_TKO_K + 1).alias("rank"),
            "cents",
            "n_orders",
        )
    )
    return (
        tops.unionByName(other)
        .select(
            F.col("nk").alias("nationkey"),
            "who",
            "rank",
            F.col("cents").cast("long").alias("cents"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("nationkey", "rank")
    )


# ------------------------------------------- audio energy profile

_AE_WIN = 256


@register(
    "multimodal_audio_energy_windows",
    "Audio feature extraction surfaced to the driver — per-window "
    "signal energy over 8-bit PCM (the VAD/silence-trim primitive), "
    "computed in a numpy-vectorized Arrow mapInPandas kernel on the "
    "REAL payload bytes, and — uniquely in the multimodal family — "
    "ORACLE-BACKED: every intermediate is dyadic-exact ((b-128)^2 "
    "sums are integers < 2^53, window means divide by the power-of-"
    f"two {_AE_WIN}, and partial sums of those means stay exact "
    "multiples of 1/256 far below 2^53), so numpy's pairwise "
    "summation and DuckDB's sequential sum agree BIT-FOR-BIT and "
    "the SQL twin recomputes the kernel from ord() code points. "
    "Docs shorter than one window are excluded identically. "
    "100 TB: Arrow batches in, one map-side-combinable per-source "
    "rollup out.",
    oracle=f"""
      WITH b AS (
        SELECT source, doc_id, text,
               (length(text) // {_AE_WIN})::INT AS n
        FROM documents WHERE length(text) >= {_AE_WIN}
      ),
      w AS (
        SELECT source, doc_id, n, unnest(range(0, n)) AS wi, text
        FROM b
      ),
      e AS (
        SELECT source, doc_id, n,
               list_sum(list_transform(range(1, {_AE_WIN} + 1),
                 i -> (ascii(substr(text, (wi * {_AE_WIN})::INT + i, 1))
                       - 128.0) ^ 2)) / {_AE_WIN} AS energy
        FROM w
      ),
      per AS (
        SELECT source, doc_id, max(n) AS n_windows,
               sum(energy) / max(n) AS mean_energy,
               max(energy) AS peak_energy
        FROM e GROUP BY source, doc_id
      )
      SELECT source, count(*)::BIGINT AS n_media,
             sum(n_windows)::BIGINT AS total_windows,
             round(avg(mean_energy), 6) AS avg_mean_energy,
             round(max(peak_energy), 6) AS max_peak_energy
      FROM per GROUP BY source
      ORDER BY source
    """,
)
def multimodal_audio_energy_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from scout_spark.inventory.core import _th
    from scout_spark.operators.multimodal import audio_energy, pack_blobs

    d = _th(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), "source"
    )
    blobs = pack_blobs(
        d, "doc_id", "payload", kind="audio", source_col="source"
    )
    feats = audio_energy(blobs, window_bytes=_AE_WIN).where(
        F.col("n_windows") > 0
    )
    src = d.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(src, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum("n_windows").cast("long").alias("total_windows"),
            F.round(F.avg("mean_energy"), 6).alias("avg_mean_energy"),
            F.round(F.max("peak_energy"), 6).alias("max_peak_energy"),
        )
        .orderBy("source")
    )
