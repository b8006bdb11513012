"""Round-5 eleventh wave: trigram-index substring search, sketch-based
self-join cardinality estimation, Benjamini-Hochberg FDR, rolling
correlation, Simpson's-paradox audit, Jensen-Shannon divergence, and
mutual information.  All seven are oracle-backed: search and the CMS
estimate are deterministic by construction (lossless filter /
md5 kernel), the stats entries are closed-form over exact integer
counts with final-step rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th


# ---------------------------------- trigram-index substring search

_TRGM_PATTERN = "big query"


def _trgm_sql_list() -> str:
    from scout_spark.operators.trigram import pattern_trigrams

    return ", ".join(f"('{t}')" for t in pattern_trigrams(_TRGM_PATTERN))


@register(
    "search_trigram_index_like",
    "Substring search through a TRIGRAM index (the pg_trgm / Lucene "
    "n-gram pattern): a '%pat%' predicate can never use a btree or "
    "minmax index, but a doc contains the pattern only if it contains "
    "every trigram of the pattern — so a trigram posting index prunes "
    "to a lossless candidate SUPERSET that a cheap contains() pass "
    "verifies. The same filter-then-verify discipline as the LSH/IVF "
    "ANN family, applied to text search; superset/equality pinned in "
    "tests/test_operators.py::TestTrigramSearch. The oracle is the "
    "ground truth the index must reproduce exactly: a plain LIKE "
    "scan. 100 TB: the (trigram, doc_id) posting frame is prebuilt "
    "and bucketed BY TRIGRAM, so a query seeks |trigrams(pattern)| "
    "posting lists instead of scanning the corpus; the row-local "
    "array_intersect probe here is that algebra against a live scan.",
    oracle=f"""
      SELECT doc_id, source, n_chars
      FROM documents
      WHERE text LIKE '%{_TRGM_PATTERN}%'
      ORDER BY doc_id
    """,
)
def search_trigram_index_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.trigram import trigram_search

    d = _t(spark, sf_dir, "documents")
    return (
        trigram_search(d, "text", _TRGM_PATTERN)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------- self-join cardinality via CMS sketches

_SJ_D = 4
_SJ_W = 1024


@register(
    "estimate_selfjoin_cardinality_cms",
    "Join-size estimation from a count-min sketch (Cormode & "
    "Muthukrishnan 2005, inner-product estimate; the AGMS classic is "
    "the SELF-join size sum c(k)^2 — the statistic every query "
    "optimizer needs before picking a join strategy): per depth d, "
    "est_d = sum over buckets of cnt^2 >= exact, estimate = min over "
    f"depths. CROSS-ENGINE md5 kernel (depth {_SJ_D} x width {_SJ_W}, "
    "bucket = md5(d:key) mod width) makes the estimate value-hash "
    "verifiable, not just plausible. 100 TB: the sketch is a "
    "(d, bucket) -> count table of at most d*w rows regardless of "
    "data size — one map-side-combined shuffle; the exact twin "
    "(shipped alongside for the overcount ratio) is itself one "
    "groupBy(key) agg.",
    oracle=f"""
      WITH c AS (
        SELECT l_partkey, count(*)::BIGINT AS c
        FROM lineitem GROUP BY l_partkey
      ),
      exact AS (SELECT sum(c * c)::BIGINT AS exact_size FROM c),
      cells AS (
        SELECT d.d,
               ('0x' || substr(md5(d.d::VARCHAR || ':' || l_partkey::VARCHAR),
                               1, 8))::BIGINT % {_SJ_W} AS bucket,
               count(*)::BIGINT AS cnt
        FROM lineitem, (SELECT unnest(range(0, {_SJ_D})) AS d) d
        GROUP BY 1, 2
      ),
      perd AS (
        SELECT d, sum(cnt * cnt)::BIGINT AS est FROM cells GROUP BY d
      ),
      est AS (SELECT min(est)::BIGINT AS cms_estimate FROM perd)
      SELECT exact_size, cms_estimate,
             round(cms_estimate::DOUBLE / exact_size, 6) AS overcount_ratio
      FROM exact, est
    """,
)
def estimate_selfjoin_cardinality_cms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # _th: the 4-row md5+conv explode is a per-row-heavy kernel; the
    # bench file's single row group would serialize it on 3 cores
    # (measured 3.4 -> 1.6 s at sf0.1)
    li = _th(spark, sf_dir, "lineitem").select("l_partkey")
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_size"))
    )

    def _bucket(d):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{d}:"), F.col("l_partkey").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _SJ_W
        )

    cells = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), _bucket(d).alias("bucket")
                        )
                        for d in range(_SJ_D)
                    ]
                )
            ).alias("c")
        )
        .select("c.d", "c.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    est = (
        cells.groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("est"))
        .agg(F.min("est").cast("long").alias("cms_estimate"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "cms_estimate",
        F.round(
            F.col("cms_estimate").cast("double") / F.col("exact_size"), 6
        ).alias("overcount_ratio"),
    )


# ----------------------------------- Benjamini-Hochberg FDR control

_BH_Q_NUM = 10  # q = 0.10 kept as integer 10/100 for exact thresholds
_BH_BAL = 5000


@register(
    "stats_bh_fdr_discoveries",
    "Multiple-testing control by BENJAMINI-HOCHBERG — run one "
    "independence test per nation (BUILDING-vs-AUTOMOBILE segment x "
    "acctbal > 5000, the 2x2 chi-square of stats_chi_square_"
    "independence) and control the false-discovery rate at q = 0.10 "
    "across the 25 simultaneous tests: rank p ascending, find the "
    "largest k with p_k <= k*q/m, reject ranks 1..k. P-values use the "
    "closed-form Chernoff tail bound exp(-chi2/2) for 1 dof — "
    "monotone in chi2 and exactly computable on both engines (no "
    "incomplete-gamma dependency), which is what BH needs "
    "(any common monotone transform preserves the ranking and the "
    "procedure's structure; bound documented in-column as p_bound). "
    "Degenerate strata (a zero margin) get chi2 = 0. 100 TB: the 2x2 "
    "tables are one map-side-combinable conditional agg; the BH "
    "window sorts |nations| rows (25 — bounded by the dimension "
    "table, not the fact table).",
    oracle=f"""
      WITH cm AS (
        SELECT n.n_name AS nation,
               sum(CASE WHEN c_mktsegment = 'BUILDING'
                        AND c_acctbal > {_BH_BAL} THEN 1 ELSE 0 END)::BIGINT AS a,
               sum(CASE WHEN c_mktsegment = 'BUILDING'
                        AND c_acctbal <= {_BH_BAL} THEN 1 ELSE 0 END)::BIGINT AS b,
               sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                        AND c_acctbal > {_BH_BAL} THEN 1 ELSE 0 END)::BIGINT AS c,
               sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                        AND c_acctbal <= {_BH_BAL} THEN 1 ELSE 0 END)::BIGINT AS d
        FROM customer JOIN nation n ON c_nationkey = n.n_nationkey
        GROUP BY 1
      ),
      chi AS (
        SELECT nation,
               CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0
                    ELSE (a+b+c+d)::DOUBLE * (a*d - b*c)::DOUBLE * (a*d - b*c)
                         / ((a+b)::DOUBLE * (c+d) * (a+c) * (b+d)) END AS chi2
        FROM cm
      ),
      ranked AS (
        -- rank by chi2 DESC == p ASC (exp is monotone), but the sort
        -- key is the bit-identical integer-derived chi2, never the
        -- engine-libm exp value
        SELECT nation, chi2, exp(-chi2 / 2) AS p,
               row_number() OVER (ORDER BY chi2 DESC, nation) AS k,
               count(*) OVER () AS m
        FROM chi
      ),
      kstar AS (
        SELECT max(CASE WHEN p * m * 100 <= k * {_BH_Q_NUM} * 1.0
                   THEN k END) AS ks
        FROM ranked
      )
      SELECT nation, round(chi2, 6) AS chi2, round(p, 6) AS p_bound, k,
             CASE WHEN k <= coalesce((SELECT ks FROM kstar), 0)
                  THEN 1 ELSE 0 END AS rejected
      FROM ranked
      ORDER BY k
    """,
)
def stats_bh_fdr_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cm = (
        cust.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            cust.c_nationkey == nat.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            *[
                F.sum(
                    F.when(
                        (F.col("c_mktsegment") == seg) & cond, 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias(al)
                for seg, cond, al in [
                    ("BUILDING", F.col("c_acctbal") > _BH_BAL, "a"),
                    ("BUILDING", F.col("c_acctbal") <= _BH_BAL, "b"),
                    ("AUTOMOBILE", F.col("c_acctbal") > _BH_BAL, "c"),
                    ("AUTOMOBILE", F.col("c_acctbal") <= _BH_BAL, "d"),
                ]
            ]
        )
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    margins = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = F.when(margins == 0, F.lit(0.0)).otherwise(
        (a + b + c + d).cast("double")
        * (a * d - b * c).cast("double")
        * (a * d - b * c)
        / ((a + b).cast("double") * (c + d) * (a + c) * (b + d))
    )
    chi = cm.select("nation", chi2.alias("chi2"))
    p = F.exp(-F.col("chi2") / 2)
    # BH window sorts |nations| rows — bounded by the dimension table
    # (25 at any fact-table scale), so the global order is fine
    ranked = chi.select(
        "nation",
        "chi2",
        p.alias("p"),
        F.row_number()
        .over(Window.orderBy(F.col("chi2").desc(), "nation"))
        .alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    flagged = ranked.withColumn(
        "ks",
        F.max(
            F.when(
                F.col("p") * F.col("m") * 100
                <= F.col("k") * _BH_Q_NUM * F.lit(1.0),
                F.col("k"),
            )
        ).over(Window.partitionBy()),
    )
    return flagged.select(
        "nation",
        F.round("chi2", 6).alias("chi2"),
        F.round("p", 6).alias("p_bound"),
        "k",
        F.when(F.col("k") <= F.coalesce(F.col("ks"), F.lit(0)), 1)
        .otherwise(0)
        .alias("rejected"),
    ).orderBy("k")


# --------------------------------------------- rolling correlation

_RCORR_WIN = 7


@register(
    "window_rolling_correlation",
    f"Rolling {_RCORR_WIN}-day Pearson correlation between two daily "
    "series (order count vs revenue) — the lead-lag / co-movement "
    "primitive behind every 'are these metrics coupled this week' "
    "dashboard. The frame carries INTEGER sufficient statistics "
    "(n, Sx, Sy, Sxy, Sxx, Syy as BIGINTs over exact cent-derived "
    "dollars), so DuckDB's segment-tree window and Spark's running "
    "frame agree bit-for-bit (the RANGE-frame FP-order rule from "
    "CLAUDE.md, applied by making every frame sum integral); r is "
    "assembled from the sums in doubles at the end, zero-variance "
    "frames guarded to NULL with an exact integer test on both "
    "engines. 100 TB: the window runs over the DAILY series "
    "(pre-collapsed, |days| rows), not raw orders.",
    oracle=f"""
      WITH daily AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS day,
               count(*)::BIGINT AS x,
               (sum(round(o_totalprice * 100)::BIGINT)::BIGINT // 100)
                 ::BIGINT AS y
        FROM orders GROUP BY 1
      ),
      win AS (
        SELECT day, x, y,
               count(*) OVER w::BIGINT AS n,
               sum(x) OVER w::BIGINT AS sx,
               sum(y) OVER w::BIGINT AS sy,
               sum(x * y) OVER w::BIGINT AS sxy,
               sum(x * x) OVER w::BIGINT AS sxx,
               sum(y * y) OVER w::BIGINT AS syy
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {_RCORR_WIN - 1} PRECEDING AND CURRENT ROW)
      )
      SELECT day, x, y,
             CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                  THEN NULL
                  ELSE round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                             / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                                    * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6)
             END AS r
      FROM win
      WHERE n = {_RCORR_WIN}
      ORDER BY day
    """,
)
def window_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # day bucketing and cents->dollars must FLOOR identically on both
    # engines: integer div, never double division (CLAUDE.md rule)
    daily = o.selectExpr(
        "unix_micros(o_orderdate) div 86400000000 as day",
        "o_totalprice",
    ).groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.expr(
            "sum(cast(round(o_totalprice * 100) as bigint)) div 100"
        )
        .cast("long")
        .alias("y"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-(_RCORR_WIN - 1), Window.currentRow)
    )
    # global window over the pre-collapsed DAILY series (|days| rows,
    # ~2.4k at any orders scale in this corpus shape)
    win = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    ).where(F.col("n") == _RCORR_WIN)
    n, sx, sy, sxy, sxx, syy = (
        F.col(x) for x in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    degenerate = (n * sxx - sx * sx == 0) | (n * syy - sy * sy == 0)
    r = (n.cast("double") * sxy - sx.cast("double") * sy) / F.sqrt(
        (n.cast("double") * sxx - sx.cast("double") * sx)
        * (n.cast("double") * syy - sy.cast("double") * sy)
    )
    return win.select(
        "day",
        "x",
        "y",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(r, 6))
        .alias("r"),
    ).orderBy("day")


# ------------------------------------------ Simpson's paradox audit

_SP_BAL = 5000


@register(
    "stats_simpsons_paradox_audit",
    "Simpson's-paradox audit — does the pooled comparison of two "
    "groups (BUILDING vs AUTOMOBILE high-balance rate) point the same "
    "way inside every stratum (nation)? The direction test is the "
    "INTEGER cross-product sign(xa*nb - xb*na) — no per-stratum "
    "division, so no FP ambiguity near rate ties; strata missing "
    "either group are excluded identically on both engines. Reports "
    "the pooled rates plus how many strata agree with / flip against "
    "/ tie with the pooled direction — the aggregation-bias smoke "
    "alarm for any metric rollup. 100 TB: one conditional-count agg "
    "per stratum (map-side combinable), then arithmetic over "
    "|strata| rows.",
    oracle=f"""
      WITH s AS (
        SELECT c_nationkey,
               sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                 ::BIGINT AS na,
               sum(CASE WHEN c_mktsegment = 'BUILDING'
                        AND c_acctbal > {_SP_BAL} THEN 1 ELSE 0 END)
                 ::BIGINT AS xa,
               sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                 ::BIGINT AS nb,
               sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                        AND c_acctbal > {_SP_BAL} THEN 1 ELSE 0 END)
                 ::BIGINT AS xb
        FROM customer GROUP BY 1
      ),
      pooled AS (
        SELECT sum(na)::BIGINT AS na, sum(xa)::BIGINT AS xa,
               sum(nb)::BIGINT AS nb, sum(xb)::BIGINT AS xb
        FROM s
      ),
      per AS (
        SELECT sign(s.xa * s.nb - s.xb * s.na) AS d,
               sign(p.xa * p.nb - p.xb * p.na) AS dp
        FROM s, pooled p
        WHERE s.na > 0 AND s.nb > 0
      )
      SELECT round(p.xa::DOUBLE / p.na, 6) AS pooled_rate_a,
             round(p.xb::DOUBLE / p.nb, 6) AS pooled_rate_b,
             sign(p.xa * p.nb - p.xb * p.na)::BIGINT AS pooled_direction,
             (SELECT count(*) FROM per)::BIGINT AS n_strata,
             (SELECT count(*) FROM per WHERE d = dp AND d <> 0)::BIGINT
               AS n_agree,
             (SELECT count(*) FROM per WHERE d = -dp AND d <> 0)::BIGINT
               AS n_flip,
             (SELECT count(*) FROM per WHERE d = 0)::BIGINT AS n_tie
      FROM pooled p
    """,
)
def stats_simpsons_paradox_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    s = cust.groupBy("c_nationkey").agg(
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(
            F.when(
                (F.col("c_mktsegment") == "BUILDING")
                & (F.col("c_acctbal") > _SP_BAL),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("xa"),
        F.sum(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(
            F.when(
                (F.col("c_mktsegment") == "AUTOMOBILE")
                & (F.col("c_acctbal") > _SP_BAL),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("xb"),
    )
    # s (|strata| rows) feeds the pooled agg AND the per-stratum signs
    # — overlapping consumers on a derived frame, so persist it
    s = s.persist()
    pooled = s.agg(
        F.sum("na").alias("pna"),
        F.sum("xa").alias("pxa"),
        F.sum("nb").alias("pnb"),
        F.sum("xb").alias("pxb"),
    )
    per = (
        s.where((F.col("na") > 0) & (F.col("nb") > 0))
        .crossJoin(F.broadcast(pooled))
        .select(
            F.signum(
                (F.col("xa") * F.col("nb") - F.col("xb") * F.col("na"))
                .cast("double")
            )
            .cast("long")
            .alias("d"),
            F.signum(
                (F.col("pxa") * F.col("pnb") - F.col("pxb") * F.col("pna"))
                .cast("double")
            )
            .cast("long")
            .alias("dp"),
        )
    )
    counts = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(
            F.when((F.col("d") == F.col("dp")) & (F.col("d") != 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
        F.sum(
            F.when((F.col("d") == -F.col("dp")) & (F.col("d") != 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_flip"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
    )
    return pooled.crossJoin(F.broadcast(counts)).select(
        F.round(F.col("pxa").cast("double") / F.col("pna"), 6).alias(
            "pooled_rate_a"
        ),
        F.round(F.col("pxb").cast("double") / F.col("pnb"), 6).alias(
            "pooled_rate_b"
        ),
        F.signum(
            (F.col("pxa") * F.col("pnb") - F.col("pxb") * F.col("pna"))
            .cast("double")
        )
        .cast("long")
        .alias("pooled_direction"),
        "n_strata",
        "n_agree",
        "n_flip",
        "n_tie",
    )


# ------------------------------------- Jensen-Shannon divergence

_JSD_BIN = 100


@register(
    "stats_jensen_shannon_divergence",
    "Jensen-Shannon divergence between two corpora's length "
    "distributions (en vs de n_chars, bin width "
    f"{_JSD_BIN}) — the symmetric, bounded [0, ln 2] cousin of KL "
    "that drift monitoring should usually use instead of PSI (no "
    "smoothing constant, defined even when a bin is empty on one "
    "side): zero-count bins contribute exactly their surviving term. "
    "Histogram counts are exact integers; the per-bin p*ln(p/m) "
    "terms are doubles summed over a BOUNDED bin set (|range|/width "
    "bins regardless of corpus size) and rounded at 6dp, far above "
    "summation-order ULPs. Degenerate empty corpora excluded "
    "identically on both engines. 100 TB: one map-side-combinable "
    "histogram agg, then arithmetic over the bounded bin frame.",
    oracle=f"""
      WITH h AS (
        SELECT n_chars // {_JSD_BIN} AS bin,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c1,
               sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS c2
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY 1
      ),
      tot AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM h),
      terms AS (
        SELECT
          CASE WHEN c1 > 0 THEN (c1::DOUBLE / n1)
               * ln((c1::DOUBLE / n1)
                    / ((c1::DOUBLE / n1 + c2::DOUBLE / n2) / 2))
               ELSE 0 END AS t1,
          CASE WHEN c2 > 0 THEN (c2::DOUBLE / n2)
               * ln((c2::DOUBLE / n2)
                    / ((c1::DOUBLE / n1 + c2::DOUBLE / n2) / 2))
               ELSE 0 END AS t2
        FROM h, tot
        WHERE n1 > 0 AND n2 > 0
      )
      SELECT (SELECT n1 FROM tot) AS n_en,
             (SELECT n2 FROM tot) AS n_de,
             count(*)::BIGINT AS n_bins,
             round(sum(t1) / 2 + sum(t2) / 2, 6) AS jsd_nats,
             round((sum(t1) / 2 + sum(t2) / 2) / ln(2), 6) AS jsd_bits
      FROM terms
      HAVING count(*) > 0
    """,
)
def stats_jensen_shannon_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("lang").isin("en", "de"))
    h = d.groupBy(
        F.expr(f"n_chars div {_JSD_BIN}").alias("bin")
    ).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    # h is a bounded histogram (|n_chars range| / bin width rows at
    # any corpus size) feeding totals AND the term sum — persist
    h = h.persist()
    tot = h.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    j = h.crossJoin(F.broadcast(tot)).where(
        (F.col("n1") > 0) & (F.col("n2") > 0)
    )
    p = F.col("c1").cast("double") / F.col("n1")
    q = F.col("c2").cast("double") / F.col("n2")
    m = (p + q) / 2
    t1 = F.when(F.col("c1") > 0, p * F.log(p / m)).otherwise(0.0)
    t2 = F.when(F.col("c2") > 0, q * F.log(q / m)).otherwise(0.0)
    sums = j.agg(
        F.sum(t1).alias("s1"),
        F.sum(t2).alias("s2"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max("n1").alias("n_en"),
        F.max("n2").alias("n_de"),
    )
    sums = sums.where(F.col("n_bins") > 0)
    jsd = F.col("s1") / 2 + F.col("s2") / 2
    return sums.select(
        "n_en",
        "n_de",
        "n_bins",
        F.round(jsd, 6).alias("jsd_nats"),
        F.round(jsd / F.log(F.lit(2.0)), 6).alias("jsd_bits"),
    )


# --------------------------------------------- mutual information


@register(
    "stats_mutual_information",
    "Mutual information (and normalized MI) between event type and "
    "hour-of-day — 'does WHAT users do depend on WHEN': the "
    "feature-relevance / dependency measure chi-square doesn't give "
    "you (MI is in nats, comparable across tables). Hour is the "
    "engine-neutral integer epoch_us // 3600000000 % 24 (no calendar "
    "functions to disagree on); the contingency table is exact "
    "integer counts over a BOUNDED |types| x 24 cell set; MI terms "
    "and the entropies for NMI = MI/sqrt(H_row*H_col) are doubles "
    "over those cells, rounded 6dp. The cell frame is "
    "localCheckpoint'd — it feeds row margins, column margins, the "
    "total, and the term sum (4 overlapping consumers). 100 TB: one "
    "map-side-combinable agg to <=|types|*24 rows; everything after "
    "is arithmetic on a frame that no longer scales with data.",
    oracle="""
      WITH cells AS (
        SELECT event_type AS et, (epoch_us(ts) // 3600000000) % 24 AS hr,
               count(*)::BIGINT AS c
        FROM events GROUP BY 1, 2
      ),
      rm AS (SELECT et, sum(c)::BIGINT AS r FROM cells GROUP BY et),
      cm AS (SELECT hr, sum(c)::BIGINT AS col FROM cells GROUP BY hr),
      n AS (SELECT sum(c)::BIGINT AS n FROM cells),
      mi AS (
        SELECT sum((c.c::DOUBLE / n.n)
                   * ln(c.c::DOUBLE * n.n / (rm.r::DOUBLE * cm.col))) AS mi
        FROM cells c JOIN rm USING (et) JOIN cm USING (hr) CROSS JOIN n
      ),
      hrow AS (
        SELECT -sum((r::DOUBLE / n.n) * ln(r::DOUBLE / n.n)) AS h
        FROM rm CROSS JOIN n
      ),
      hcol AS (
        SELECT -sum((col::DOUBLE / n.n) * ln(col::DOUBLE / n.n)) AS h
        FROM cm CROSS JOIN n
      )
      SELECT n.n AS n_events,
             (SELECT count(*) FROM cells)::BIGINT AS n_cells,
             round(mi.mi, 6) AS mi_nats,
             round(hrow.h, 6) AS h_type,
             round(hcol.h, 6) AS h_hour,
             CASE WHEN hrow.h = 0 OR hcol.h = 0 THEN NULL
                  ELSE round(mi.mi / sqrt(hrow.h * hcol.h), 6) END AS nmi
      FROM n, mi, hrow, hcol
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.selectExpr(
            "event_type as et",
            "(unix_micros(ts) div 3600000000) % 24 as hr",
        )
        .groupBy("et", "hr")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # <=|types|*24 rows; 4 overlapping consumers
    )
    rm = cells.groupBy("et").agg(F.sum("c").cast("long").alias("r"))
    cm = cells.groupBy("hr").agg(F.sum("c").cast("long").alias("col"))
    n = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    joined = (
        cells.join(F.broadcast(rm), "et")
        .join(F.broadcast(cm), "hr")
        .crossJoin(F.broadcast(n))
    )
    mi = joined.agg(
        F.sum(
            (F.col("c").cast("double") / F.col("n"))
            * F.log(
                F.col("c").cast("double")
                * F.col("n")
                / (F.col("r").cast("double") * F.col("col"))
            )
        ).alias("mi")
    )
    hrow = (
        rm.crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    (F.col("r").cast("double") / F.col("n"))
                    * F.log(F.col("r").cast("double") / F.col("n"))
                )
            ).alias("h_type")
        )
    )
    hcol = (
        cm.crossJoin(F.broadcast(n))
        .agg(
            (
                -F.sum(
                    (F.col("col").cast("double") / F.col("n"))
                    * F.log(F.col("col").cast("double") / F.col("n"))
                )
            ).alias("h_hour")
        )
    )
    out = (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hrow))
        .crossJoin(F.broadcast(hcol))
    )
    nmi = F.when(
        (F.col("h_type") == 0) | (F.col("h_hour") == 0),
        F.lit(None).cast("double"),
    ).otherwise(
        F.round(F.col("mi") / F.sqrt(F.col("h_type") * F.col("h_hour")), 6)
    )
    return out.select(
        F.col("n").alias("n_events"),
        "n_cells",
        F.round("mi", 6).alias("mi_nats"),
        F.round("h_type", 6).alias("h_type"),
        F.round("h_hour", 6).alias("h_hour"),
        nmi.alias("nmi"),
    )
