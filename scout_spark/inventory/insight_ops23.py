"""Round-5 finale: sliding-window distinct counting via mergeable HLL
registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.analytics_ops import _HLL_ALPHA_M2, _HLL_B, _HLL_M
from scout_spark.inventory.core import _t

_RW_DAYS = 7


@register(
    "sketch_hll_rolling_window_distinct",
    f"ROLLING {_RW_DAYS}-day distinct users via mergeable HLL "
    "registers — the problem exact distinct counting cannot do at "
    "scale without re-scanning each window (distinct is not "
    "decomposable; sliding windows overlap): per-DAY register banks "
    "(bounded: <= m rows per day regardless of events) merge by "
    "max(rho) across each day's trailing window, so every window's "
    "estimate costs |window| * m register rows instead of a pass "
    "over raw events. CROSS-ENGINE md5 kernel (the "
    "sketch_hll_md5_distinct constants), so the per-day estimates "
    "are value-hash exact; the EXACT rolling distinct rides along "
    "for the realized per-day error. 100 TB: events reduce to "
    "(day, bucket, max rho) once; the window merge is a range join "
    "over the days x m register frame — span-bounded, never "
    "event-bounded (the exact twin's user-day range join is the "
    "cost this sketch exists to avoid).",
    oracle=f"""
      WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
               user_id
        FROM events
      ),
      h AS (
        SELECT day, user_id,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        FROM du
      ),
      regs AS (
        SELECT day, hv % {_HLL_M} AS bucket,
               max(CASE WHEN (hv >> {_HLL_B}) > 0
                   THEN 53 - length(bin(hv >> {_HLL_B}))
                   ELSE 53 END) AS r
        FROM h GROUP BY 1, 2
      ),
      spine AS (SELECT DISTINCT day FROM du),
      merged AS (
        SELECT s.day, rg.bucket, max(rg.r) AS r
        FROM spine s JOIN regs rg
          ON rg.day BETWEEN s.day - {_RW_DAYS - 1} AND s.day
        GROUP BY s.day, rg.bucket
      ),
      est AS (
        SELECT day, count(*) AS n_regs,
               sum(1.0 / (1::BIGINT << r)) AS s_present
        FROM merged GROUP BY day
      ),
      exact AS (
        SELECT s.day, count(DISTINCT d.user_id)::BIGINT AS exact_distinct
        FROM spine s JOIN du d
          ON d.day BETWEEN s.day - {_RW_DAYS - 1} AND s.day
        GROUP BY s.day
      )
      SELECT e.day::BIGINT AS day,
             x.exact_distinct,
             round(CASE WHEN {_HLL_ALPHA_M2}
                             / (e.s_present + ({_HLL_M} - e.n_regs))
                             <= 2.5 * {_HLL_M}
                         AND e.n_regs < {_HLL_M}
                        THEN {_HLL_M}
                             * ln({_HLL_M}::DOUBLE / ({_HLL_M} - e.n_regs))
                        ELSE {_HLL_ALPHA_M2}
                             / (e.s_present + ({_HLL_M} - e.n_regs))
                   END, 2) AS hll_estimate
      FROM est e JOIN exact x ON e.day = x.day
      ORDER BY day
    """,
)
def sketch_hll_rolling_window_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # du feeds BOTH the HLL register build and the exact range-join
    # twin — two independent subtrees in one action re-run the events
    # scan + distinct without a fence (FLOOR_r11); eager checkpoint,
    # not persist (capture-session leak trap). |days x users|-bounded.
    du = ev.selectExpr(
        "unix_micros(ts) div 86400000000 as day", "user_id"
    ).distinct().localCheckpoint(eager=True)
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = F.shiftright(hv, _HLL_B)
    # single-reference rho (see analytics_ops.sketch_hll_md5): avoids
    # the 3x md5 CollapseProject inline; identical integers
    rho = F.lit(54) - F.length(F.bin(F.shiftleft(w, 1) + 1))
    regs = (
        du.select("day", (hv % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("r"))
        .localCheckpoint()  # days x m rows; feeds spine + range join
    )
    spine = regs.select("day").distinct().select(F.col("day").alias("d"))
    merged = (
        spine.join(
            F.broadcast(regs),
            (F.col("day") >= F.col("d") - (_RW_DAYS - 1))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est = merged.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), r)")).alias(
            "s_present"
        ),
    )
    raw = F.lit(float(_HLL_ALPHA_M2)) / (
        F.col("s_present") + (_HLL_M - F.col("n_regs"))
    )
    small = (raw <= 2.5 * _HLL_M) & (F.col("n_regs") < _HLL_M)
    linear = _HLL_M * F.log(
        F.lit(float(_HLL_M)) / (_HLL_M - F.col("n_regs"))
    )
    exact = (
        spine.join(
            du,
            (F.col("day") >= F.col("d") - (_RW_DAYS - 1))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        est.join(exact, "d")
        .select(
            F.col("d").cast("long").alias("day"),
            "exact_distinct",
            F.round(F.when(small, linear).otherwise(raw), 2).alias(
                "hll_estimate"
            ),
        )
        .orderBy("day")
    )
