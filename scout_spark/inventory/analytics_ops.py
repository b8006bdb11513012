"""Round-4 second wave: cross-engine sketch twins (HyperLogLog, CMS),
corpus statistics (TF-IDF, bigram LM perplexity, vocabulary growth),
referential-integrity audit, and event inter-arrival profiling.

The sketch twins follow the repo's md5 cross-engine pattern
(hash_parity.py, ann_lsh_md5_bucketed): md5 is md5 in every engine, so
the full register/bucket state is oracle-reproducible and the value
hash pins the whole kernel — unlike the engine-specific
approx_count_distinct / CMS entries, which stay rows-only by design.

Registered last in load_all so rotation queues these behind the
never-checked backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t

# ---------------------------------------------------------------- HLL

_HLL_B = 8  # 2^8 = 256 registers
_HLL_M = 1 << _HLL_B
# Flajolet et al. 2007 bias constant for m >= 128; the literal is
# inlined identically into both engines so the doubles agree bit-wise.
_HLL_ALPHA_M2 = repr(0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M)

# 15 hex chars = 60 bits keeps the hash positive in a signed BIGINT on
# both engines; low 8 bits pick the register, the remaining 52 feed the
# leading-zero rank. rho = 53 - bitlength(w) because bin(w) has no
# leading zeros, so len(bin(w)) = floor(log2 w) + 1 — integer-exact,
# no FP log anywhere in the register state.
_HLL_SQL = f"""
      WITH tok AS (
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      h AS (
        SELECT source, tok,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
        FROM tok
      ),
      rr AS (
        SELECT source, hv % {_HLL_M} AS bucket,
               CASE WHEN (hv >> {_HLL_B}) > 0
                    THEN 53 - length(bin(hv >> {_HLL_B}))
                    ELSE 53 END AS rho
        FROM h
      ),
      regs AS (
        SELECT source, bucket, max(rho) AS r
        FROM rr GROUP BY source, bucket
      ),
      est AS (
        SELECT source,
               count(*) AS n_regs,
               sum(1.0 / (1::BIGINT << r)) AS s_present
        FROM regs GROUP BY source
      ),
      ex AS (
        SELECT source, count(DISTINCT tok) AS exact_distinct FROM tok GROUP BY source
      )
      SELECT e.source,
             x.exact_distinct,
             round(CASE WHEN {_HLL_ALPHA_M2} / (e.s_present + ({_HLL_M} - e.n_regs))
                             <= 2.5 * {_HLL_M}
                         AND e.n_regs < {_HLL_M}
                        THEN {_HLL_M} * ln({_HLL_M}::DOUBLE / ({_HLL_M} - e.n_regs))
                        ELSE {_HLL_ALPHA_M2} / (e.s_present + ({_HLL_M} - e.n_regs))
                   END, 2) AS hll_estimate,
             round(abs(CASE WHEN {_HLL_ALPHA_M2} / (e.s_present + ({_HLL_M} - e.n_regs))
                                 <= 2.5 * {_HLL_M}
                             AND e.n_regs < {_HLL_M}
                            THEN {_HLL_M} * ln({_HLL_M}::DOUBLE / ({_HLL_M} - e.n_regs))
                            ELSE {_HLL_ALPHA_M2} / (e.s_present + ({_HLL_M} - e.n_regs))
                       END - x.exact_distinct) / x.exact_distinct, 4) AS rel_error
      FROM est e JOIN ex x ON e.source = x.source
      ORDER BY e.source
"""


@register(
    "sketch_hll_md5_distinct",
    "HyperLogLog distinct-count sketch with a CROSS-ENGINE md5 kernel "
    "(Flajolet et al. 2007): 60-bit md5 hash, 256 registers, "
    "integer-exact leading-zero ranks via bitlength (no FP log in the "
    "register state), harmonic-mean estimate + small-range linear "
    "counting, compared against the exact per-source distinct token "
    "count. The oracle reproduces every register, so the value hash "
    "pins the whole sketch — the engine-native approx_count_distinct "
    "entry stays rows-only by design; this is its verifiable twin. "
    "100 TB: registers are a mergeable (source, bucket)->max(rho) "
    "state — one map-side-combined shuffle of at most m rows per "
    "group, the textbook distributed-sketch shape.",
    oracle=_HLL_SQL,
)
def sketch_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("source", "tok")
    hv = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    w = F.shiftright(hv, _HLL_B)
    # single-reference rho: 54 - bitlength(2w+1) == (w>0 ? 53 -
    # bitlength(w) : 53) for all w >= 0 — the conditional form
    # referenced w TWICE, so CollapseProject inlined the md5 chain 3x
    # per row (bucket + both w refs); this form evaluates it 2x
    # (measured 1.29 -> 1.01 s at sf0.1, r10). Oracle unchanged —
    # identical integers.
    rho = F.lit(54) - F.length(F.bin(F.shiftleft(w, 1) + 1))
    regs = (
        tok.select(
            "source", "tok", (hv % _HLL_M).alias("bucket"), rho.alias("rho")
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    est = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr("1.0 / shiftleft(cast(1 as bigint), r)")
        ).alias("s_present"),
    )
    ex = tok.groupBy("source").agg(
        F.count_distinct("tok").alias("exact_distinct")
    )
    alpha_m2 = F.lit(float(_HLL_ALPHA_M2))
    raw = alpha_m2 / (F.col("s_present") + (_HLL_M - F.col("n_regs")))
    small = (raw <= 2.5 * _HLL_M) & (F.col("n_regs") < _HLL_M)
    linear = _HLL_M * F.log(
        F.lit(float(_HLL_M)) / (_HLL_M - F.col("n_regs"))
    )
    hll = F.when(small, linear).otherwise(raw)
    return (
        est.join(ex, "source")
        .select(
            "source",
            "exact_distinct",
            F.round(hll, 2).alias("hll_estimate"),
            F.round(
                F.abs(hll - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_error"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- CMS

_CMS_D = 4
_CMS_W = 512
_CMS_PROBES = ("data", "model", "learning", "spark", "quick", "zebra")


def _cms_probe_values() -> str:
    return ", ".join(f"('{p}')" for p in _CMS_PROBES)


@register(
    "sketch_cms_md5_frequencies",
    "Count-min sketch (Cormode & Muthukrishnan 2005) with a CROSS-"
    f"ENGINE md5 kernel: depth {_CMS_D} x width {_CMS_W}, row-d bucket "
    "= md5(d:token) mod width, point estimate = min over rows — an "
    "upper bound that equals the exact count unless every row "
    "collides. Probes a fixed word list and reports estimate vs exact "
    "overcount. The engine-native CMS entry (operators/sketches.py) "
    "stays rows-only; this twin makes the sketch family value-hash "
    "verifiable. 100 TB: the sketch is a (d, bucket)->count table of "
    "at most d*w rows regardless of corpus size — one map-side-"
    "combined shuffle, then an O(d) broadcast probe.",
    oracle=f"""
      WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      cells AS (
        SELECT unnest(range(0, {_CMS_D})) AS d, tok FROM tok
      ),
      sketch AS (
        SELECT d,
               ('0x' || substr(md5(d::VARCHAR || ':' || tok), 1, 8))::BIGINT
                 % {_CMS_W} AS bucket,
               count(*) AS n
        FROM cells GROUP BY 1, 2
      ),
      probes(tok) AS (VALUES {_cms_probe_values()}),
      pcells AS (
        SELECT p.tok, d.d,
               ('0x' || substr(md5(d.d::VARCHAR || ':' || p.tok), 1, 8))::BIGINT
                 % {_CMS_W} AS bucket
        FROM probes p, (SELECT unnest(range(0, {_CMS_D})) AS d) d
      ),
      est AS (
        SELECT pc.tok, min(coalesce(s.n, 0)) AS cms_estimate
        FROM pcells pc LEFT JOIN sketch s
          ON pc.d = s.d AND pc.bucket = s.bucket
        GROUP BY pc.tok
      ),
      ex AS (
        SELECT p.tok,
               (SELECT count(*) FROM tok t WHERE t.tok = p.tok) AS exact_n
        FROM probes p
      )
      SELECT e.tok AS token, x.exact_n, e.cms_estimate,
             e.cms_estimate - x.exact_n AS overcount
      FROM est e JOIN ex x ON e.tok = x.tok
      ORDER BY token
    """,
)
def sketch_cms_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("tok")

    def _bucket(d, c):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{d}:"), c)), 1, 8), 16, 10
            ).cast("long")
            % _CMS_W
        )

    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(d, F.col("tok")).alias("bucket"),
                    )
                    for d in range(_CMS_D)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.bucket")
    sketch = cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("n"))

    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], schema="tok string"
    )
    pcells = probes.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(d, F.col("tok")).alias("bucket"),
                    )
                    for d in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("tok", "c.d", "c.bucket")
    est = (
        pcells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_estimate"))
    )
    ex = (
        probes.join(
            tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")),
            "tok",
            "left",
        )
        .select("tok", F.coalesce("cnt", F.lit(0)).alias("exact_n"))
    )
    return (
        est.join(ex, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("token")
    )


# ------------------------------------------------------------- TF-IDF


@register(
    "text_tfidf_top_terms",
    "Per-document top-3 terms by smoothed TF-IDF (sklearn form: "
    "idf = ln((1+N)/(1+df)) + 1) — the classic keyword-extraction / "
    "feature-weighting kernel. Reads the shared persisted doc_tokens "
    "frame; term counts and document frequencies are two map-side-"
    "combined aggs, the idf join broadcasts the df table, and the "
    "per-doc top-3 is a rank window (WindowGroupLimit pushes the "
    "cutoff map-side). Ties broken by term text so the LIMIT-like "
    "cut is deterministic. 100 TB: shuffles carry (doc, term) and "
    "(term) counts only; df is vocabulary-sized.",
    oracle="""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      cnt AS (
        SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
      ),
      df AS (
        SELECT tok, count(*) AS df FROM cnt GROUP BY tok
      ),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT c.doc_id, c.tok,
               c.c * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) AS tfidf
        FROM cnt c JOIN df USING (tok) CROSS JOIN n
      ),
      ranked AS (
        SELECT doc_id, tok, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, tok) AS rk
        FROM scored
      )
      SELECT doc_id, rk, tok AS term, round(tfidf, 6) AS tfidf
      FROM ranked WHERE rk <= 3
      ORDER BY doc_id, rk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    d = _t(spark, sf_dir, "documents")
    tok = doc_tokens(spark, sf_dir).select("doc_id", "tok")
    cnt = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    df = cnt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        # df is VOCABULARY-sized (grows ~Heaps' law with the corpus);
        # the hint holds while the distinct-token frame fits the
        # driver/executor broadcast budget. Past that, drop the hint —
        # cnt is already token-keyed, so AQE falls back to a shuffle
        # join on `tok` with no extra exchange on the cnt side.
        cnt.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (
                F.col("c")
                * (
                    F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df")))
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "doc_id",
            "rk",
            F.col("tok").alias("term"),
            F.round("tfidf", 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rk")
    )


# ------------------------------------------- referential integrity


@register(
    "audit_referential_orphans",
    "Referential-integrity audit across the star schema: orphan-row "
    "counts and rates for the four FK edges (orders->customer, "
    "lineitem->orders, lineitem->part, lineitem->supplier) — the "
    "pre-training-join data-quality gate that catches broken "
    "extraction before a silent inner-join row loss. Each edge is a "
    "left join against the distinct parent keys folded into one agg "
    "(count + sum-of-missing in a single pass, no separate anti-join "
    "job); small dims broadcast, the lineitem->orders edge shuffles "
    "on the key as it would at 100 TB.",
    oracle="""
      SELECT 'lineitem->orders' AS fk_edge,
             (SELECT count(*) FROM lineitem) AS n_rows,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
             round((SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))::DOUBLE
                   / (SELECT count(*) FROM lineitem), 6) AS orphan_rate
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             round((SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM part p
                                      WHERE p.p_partkey = l.l_partkey))::DOUBLE
                   / (SELECT count(*) FROM lineitem), 6)
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)),
             round((SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                      WHERE s.s_suppkey = l.l_suppkey))::DOUBLE
                   / (SELECT count(*) FROM lineitem), 6)
      UNION ALL
      SELECT 'orders->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             round((SELECT count(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey))::DOUBLE
                   / (SELECT count(*) FROM orders), 6)
      ORDER BY fk_edge
    """,
)
def audit_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")

    def edge(name, child, ck, parent, pk, bcast):
        keys = parent.select(F.col(pk).alias("_k")).distinct().withColumn(
            "_hit", F.lit(1)
        )
        if bcast:
            keys = F.broadcast(keys)
        j = child.select(F.col(ck).alias("_k")).join(keys, "_k", "left")
        return j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("_hit").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        ).select(
            F.lit(name).alias("fk_edge"),
            "n_rows",
            "n_orphans",
            F.round(
                F.col("n_orphans").cast("double") / F.col("n_rows"), 6
            ).alias("orphan_rate"),
        )

    return (
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey", False)
        .unionAll(edge("lineitem->part", li, "l_partkey", p, "p_partkey", True))
        .unionAll(
            edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey", True)
        )
        .unionAll(edge("orders->customer", o, "o_custkey", c, "c_custkey", True))
        .orderBy("fk_edge")
    )


# ---------------------------------------------- event inter-arrival


@register(
    "events_interarrival_stats",
    "Per-event-type inter-arrival profile (median / p95 / max gap "
    "seconds between consecutive events of the same type for the same "
    "user) — the stream-health statistic behind watermark and session-"
    "gap tuning. One lag window per (user, type) partition ordered by "
    "(ts, event_id) (the id tie-break makes equal-timestamp ordering "
    "deterministic), gaps in integer microseconds, then one agg with "
    "interpolated percentiles. 100 TB: single shuffle on the window "
    "key; percentile_approx swaps in where exact sorting is too "
    "expensive (see agg_approx_distinct_and_percentile).",
    oracle="""
      WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS gap_us
        FROM events
      )
      SELECT event_type,
             count(*) AS n_gaps,
             round(quantile_cont(gap_us, 0.5) / 1e6, 4) AS p50_s,
             round(quantile_cont(gap_us, 0.95) / 1e6, 4) AS p95_s,
             round(max(gap_us) / 1e6, 4) AS max_s
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type ORDER BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
    )
    us = F.expr("unix_micros(ts)")
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 4).alias(
                "p50_s"
            ),
            F.round(F.percentile("gap_us", F.lit(0.95)) / 1e6, 4).alias(
                "p95_s"
            ),
            F.round(F.max("gap_us") / 1e6, 4).alias("max_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------- bigram LM perplexity


@register(
    "quality_bigram_lm_perplexity",
    "Bigram language-model perplexity per document, trained on the "
    "corpus itself with add-one smoothing: p(w2|w1) = (c(w1,w2)+1) / "
    "(c(w1,*)+V) — the n-gram-LM quality score (KenLM-style, one "
    "order up from quality_unigram_perplexity) that separates fluent "
    "text from keyword soup. Bigrams via one lead() window over "
    "positions; corpus counts are two map-side-combined aggs; the "
    "per-doc score joins bigrams to their counts on (w1, w2) — the "
    "join shuffle is bigram-vocabulary-sized, never corpus-sized, "
    "and V is a 1-row broadcast. Docs with < 2 tokens have no "
    "bigrams and drop out on both sides.",
    oracle="""
      WITH t AS (
        SELECT doc_id, tok, pos FROM (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
                 unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
          FROM documents)
      ),
      bg AS (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM t
      ),
      bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM bgn GROUP BY w1, w2),
      c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
      v AS (SELECT count(DISTINCT tok) AS v FROM t),
      scored AS (
        SELECT b.doc_id,
               ln((c2.c2 + 1.0) / (c1.c1 + v.v)) AS lp
        FROM bgn b
        JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        JOIN c1 ON b.w1 = c1.w1
        CROSS JOIN v
      )
      SELECT doc_id,
             count(*) AS n_bigrams,
             round(exp(-sum(lp) / count(*)), 2) AS ppl
      FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def quality_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import _TOK

    d = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
    t = d.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        t.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = t.agg(F.count_distinct("tok").alias("v"))
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))).alias(
                "lp"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.exp(-F.sum("lp") / F.count(F.lit(1))), 2
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- vocabulary growth curve


_VOCAB_BUCKET = 50


@register(
    "text_vocab_growth_curve",
    "Vocabulary growth curve (Heaps' law profile): distinct tokens "
    f"first seen per {_VOCAB_BUCKET}-doc ingest bucket and the running "
    "cumulative vocabulary — the corpus-diversity diagnostic that "
    "shows when additional data stops adding new types (dedup/"
    "saturation signal for training-data collection). First-occurrence "
    "doc per token is one min-agg (map-side combined), bucketing is "
    "row-local integer division, the cumulative sum is a bucket-count "
    "window — state after the first agg is vocabulary-sized, never "
    "corpus-sized.",
    oracle=f"""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
      ),
      first AS (
        SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok
      ),
      bk AS (
        SELECT first_doc // {_VOCAB_BUCKET} AS bucket, count(*) AS new_tokens
        FROM first GROUP BY 1
      )
      SELECT bucket, new_tokens,
             sum(new_tokens) OVER (ORDER BY bucket
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)::BIGINT AS cum_tokens
      FROM bk ORDER BY bucket
    """,
)
def text_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.quality_ops import doc_tokens

    tok = doc_tokens(spark, sf_dir).select("doc_id", "tok")
    first = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    bk = (
        first.select(
            (F.col("first_doc") / _VOCAB_BUCKET)
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return bk.select(
        "bucket",
        "new_tokens",
        F.sum("new_tokens").over(w).alias("cum_tokens"),
    ).orderBy("bucket")
