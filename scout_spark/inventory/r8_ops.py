"""Round-8 wave: exact substring-level dedup beyond spans (sorted
k-gram anchoring → diagonal runs), duplicated-content coverage, the
source-mix curation report, a tokenizer/packing throughput audit, and a
Kneser-Ney-smoothed bigram LM (VERDICT r07 "What's missing" item 3 +
"Next round" item 1).  All oracle-backed.

Empirical shape check before committing to the anchor design (CLAUDE.md
prototype-first rule): word 8-grams on this corpus are nearly unique
(max corpus frequency 4 at sf0.1; pair-join bound 44,631 rows from
235k gram occurrences), so the anchor self-join is bounded by genuine
duplication density, never corpus², at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.hash_parity import _md5_32
from scout_spark.inventory.quality_ops import (
    _PACK_CAPACITY,
    _PACK_SHARDS,
    _TOK,
)

_K = 8  # anchor gram width (tokens); every duplicated run of >= _K
# tokens contributes run_len-_K+1 shared grams on ONE diagonal, so the
# diagonal-island scan below recovers the EXACT maximal run length —
# the relational form of sorted-k-gram-anchored suffix scanning.


def _gram_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, p, g) word 8-gram occurrences, 1-based positions.

    Grams via arrays_zip of SHIFTED SLICES (O(1) refs to the token
    array per gram — CLAUDE.md CollapseProject rule), behind a
    repartition barrier so the tokenizing regex runs once per row, not
    once per slice reference."""
    d = (
        _th(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )
    m = "greatest(size(t) - 7, 0)"
    zip8 = (
        "arrays_zip("
        + ", ".join(f"slice(t, {i}, {m})" for i in range(1, _K + 1))
        + ")"
    )
    cw = ", ".join(f"s['{i}']" for i in range(_K))
    return d.select(
        "doc_id", F.posexplode(F.expr(zip8)).alias("pos0", "s")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("p"),
        F.expr(f"concat_ws(' ', {cw})").alias("g"),
    )


_GRAM_SQL = f"""
      t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      g AS (
        SELECT doc_id, ue.i AS p,
               array_to_string(toks[ue.i:ue.i+7], ' ') AS g
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks) - 6, 1)::BIGINT)) ue(i)
      )
"""


@register(
    "dedup_longest_duplicated_substring",
    "EXACT longest duplicated token run (>= 8 tokens) per document "
    "pair — substring-level dedup beyond span/shingle granularity "
    "(RefinedWeb/Lee et al. 2022 exact-substring dedup, re-expressed "
    "relationally): anchor on word 8-grams (nearly unique on this "
    "corpus — prototype-measured before building), self-join anchors "
    "across docs, and recover maximal runs as consecutive-position "
    "islands per (pair, diagonal = p1-p2). A duplicated run of L "
    "tokens yields exactly L-7 anchors on one diagonal, so "
    "max(island)+7 is the exact run length. Spark joins on xxhash64 "
    "of the gram (8-byte shuffle keys, same accepted 64-bit collision "
    "class as span dedup); the oracle joins the gram text — "
    "independent formulations. 100 TB: anchor join volume is bounded "
    "by duplication density (8-gram collisions), never corpus²; the "
    "island window partitions on (d1,d2,diag) — run-bounded frames. "
    "Deterministic LIMIT tie-break (run desc, d1, d2).",
    oracle=f"""
      WITH {_GRAM_SQL},
      pr AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, a.p AS p1,
               a.p - b.p AS diag
        FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
      ),
      isl AS (
        SELECT d1, d2, diag, p1 - row_number() OVER (
                 PARTITION BY d1, d2, diag ORDER BY p1) AS grp
        FROM pr
      ),
      runs AS (
        SELECT d1, d2, count(*) AS c
        FROM isl GROUP BY d1, d2, diag, grp
      )
      SELECT d1, d2, (max(c) + 7)::BIGINT AS run_tokens,
             sum(c)::BIGINT AS n_gram_matches
      FROM runs GROUP BY d1, d2
      ORDER BY run_tokens DESC, d1, d2
      LIMIT 20
    """,
)
def dedup_longest_duplicated_substring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ex = _gram_frame(spark, sf_dir).select(
        "doc_id", "p", F.xxhash64("g").alias("h")
    )
    a, b = ex.alias("a"), ex.alias("b")
    # self-join on the hashed anchor: both branches share an identical
    # subtree up to the join-key exchange, so ReuseExchange evaluates
    # the gram pipeline once
    pr = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("d1"),
        F.col("b.doc_id").alias("d2"),
        F.col("a.p").alias("p1"),
        (F.col("a.p") - F.col("b.p")).alias("diag"),
    )
    # islands of consecutive p1 per (pair, diagonal): window frames are
    # bounded by the longest duplicated run, never the corpus
    w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
    isl = pr.select(
        "d1",
        "d2",
        "diag",
        (F.col("p1") - F.row_number().over(w)).alias("grp"),
    )
    runs = isl.groupBy("d1", "d2", "diag", "grp").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        runs.groupBy("d1", "d2")
        .agg(
            (F.max("c") + 7).cast("long").alias("run_tokens"),
            F.sum("c").cast("long").alias("n_gram_matches"),
        )
        .orderBy(F.desc("run_tokens"), "d1", "d2")
        .limit(20)
    )


@register(
    "dedup_duplicated_ngram_coverage",
    "Per-document duplicated-content coverage: the fraction of a "
    "doc's token positions covered by word 8-grams that occur >= 2 "
    "times corpus-wide (the RefinedWeb-style 'how much of this doc is "
    "duplicated text' curation signal; within-doc repetition counts — "
    "it is duplicated training text either way). Coverage = |union of "
    "[p, p+7] intervals over duplicated anchors| / n_tokens, computed "
    "exactly by exploding covered positions and counting distinct. "
    "100 TB: explode volume = duplicated occurrences x 8 — bounded by "
    "duplication density; the per-gram frequency attach is a hash-"
    "partitioned window (|grams| groups, no global sort). "
    "Deterministic LIMIT tie-break (coverage desc, doc_id).",
    oracle=f"""
      WITH {_GRAM_SQL},
      dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
      cov AS (
        SELECT DISTINCT g.doc_id, ue2.cp
        FROM g JOIN dup USING (g),
             LATERAL unnest(range(g.p, g.p + 8)) ue2(cp)
      ),
      n AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{_TOK}'))::BIGINT
                 AS n_tok
        FROM documents
      )
      SELECT n.doc_id, n.n_tok,
             count(cov.cp)::BIGINT AS covered_tokens,
             round(count(cov.cp)::DOUBLE / n.n_tok, 6) AS dup_coverage
      FROM n JOIN cov ON n.doc_id = cov.doc_id
      GROUP BY n.doc_id, n.n_tok
      ORDER BY dup_coverage DESC, n.doc_id
      LIMIT 20
    """,
)
def dedup_duplicated_ngram_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ex = _gram_frame(spark, sf_dir).select(
        "doc_id", "p", F.xxhash64("g").alias("h")
    )
    # corpus frequency rides the occurrence stream via a hash-
    # partitioned window keyed on the 8-byte gram hash (slim shuffle;
    # same accepted 64-bit collision class) — no gram-list self-join
    freq = ex.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    cov = (
        freq.where(F.col("cnt") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + 7)
            ).alias("cp"),
        )
        .distinct()
    )
    n = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
        )
        .cast("long")
        .alias("n_tok"),
    )
    return (
        n.join(cov, "doc_id")
        .groupBy("doc_id", "n_tok")
        .agg(F.count(F.lit(1)).cast("long").alias("covered_tokens"))
        .select(
            "doc_id",
            "n_tok",
            "covered_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("n_tok"),
                6,
            ).alias("dup_coverage"),
        )
        .orderBy(F.desc("dup_coverage"), "doc_id")
        .limit(20)
    )


@register(
    "curation_source_mix_report",
    "Domain/source-mix curation report (the source-mix gap next to "
    "mixture_temperature_resample — VERDICT r07 item 1c): per source, "
    "doc/token/char volumes, token share of corpus, cumulative share "
    "in descending-volume order, and an over-representation flag "
    "(share > 2x uniform — compared in INTEGERS: n_tokens*n_sources > "
    "2*total_tokens, no FP threshold flap). Cumulative share divides "
    "AFTER an exact integer ROWS-frame cumsum (CLAUDE.md window "
    "invariant). 100 TB: one map-side-combined agg to |sources| rows; "
    "the ranking window is |sources|-bounded.",
    oracle=f"""
      WITH s AS (
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(len(regexp_extract_all(lower(text), '{_TOK}')))::BIGINT
                 AS n_tokens,
               sum(n_chars)::BIGINT AS n_chars
        FROM documents GROUP BY source
      ),
      tot AS (
        SELECT sum(n_tokens)::BIGINT AS tot_tok,
               count(*)::BIGINT AS n_sources
        FROM s
      )
      SELECT s.source, s.n_docs, s.n_tokens, s.n_chars,
             round(s.n_tokens::DOUBLE / tot.tot_tok, 6) AS token_share,
             round(sum(s.n_tokens) OVER (
                     ORDER BY s.n_tokens DESC, s.source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::DOUBLE / tot.tot_tok, 6) AS cum_token_share,
             round(s.n_tokens::DOUBLE / s.n_docs, 6) AS mean_doc_tokens,
             (CASE WHEN s.n_tokens * tot.n_sources > 2 * tot.tot_tok
                   THEN 1 ELSE 0 END)::INT AS over_represented
      FROM s, tot
      ORDER BY s.n_tokens DESC, s.source
    """,
)
def curation_source_mix_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOK), 0
                )
            )
        )
        .cast("long")
        .alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("long").alias("tot_tok"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    # 1-row scalar attach (accepted pattern); the ranking window is
    # |sources|-bounded — integer cumsum, divide after
    w = (
        Window.orderBy(F.desc("n_tokens"), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.round(
                F.col("n_tokens").cast("double") / F.col("tot_tok"), 6
            ).alias("token_share"),
            F.round(
                F.sum("n_tokens").over(w).cast("double")
                / F.col("tot_tok"),
                6,
            ).alias("cum_token_share"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("mean_doc_tokens"),
            F.when(
                F.col("n_tokens") * F.col("n_sources")
                > 2 * F.col("tot_tok"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("over_represented"),
        )
        .orderBy(F.desc("n_tokens"), "source")
    )


@register(
    "audit_packing_efficiency_by_lang",
    "Tokenizer-throughput / sequence-packing audit (VERDICT r07 item "
    "1b — joins the pack_chunks_training packing model with corpus "
    "token/char stats): per lang, docs, tokens, training chunks the "
    "concat-then-chunk packer emits (per (lang, md5-shard): "
    "ceil(tokens/capacity), summed — ceil as (x+C-1)//C on POSITIVE "
    "integers, where DuckDB truncation == floor), packing efficiency "
    "= tokens/(chunks*capacity), tail waste, and chars-per-token "
    "(tokenizer compression proxy). 100 TB: two map-side-combined "
    "aggs (|lang x shard| then |lang| rows); no windows.",
    oracle=f"""
      WITH t AS (
        SELECT lang,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                 % {_PACK_SHARDS} AS shard,
               len(regexp_extract_all(lower(text), '{_TOK}'))::BIGINT
                 AS n_tok,
               n_chars
        FROM documents
      ),
      sh AS (
        SELECT lang, shard,
               count(*)::BIGINT AS n_docs,
               sum(n_tok)::BIGINT AS tok,
               sum(n_chars)::BIGINT AS chars,
               ((sum(n_tok) + {_PACK_CAPACITY - 1})
                 // {_PACK_CAPACITY})::BIGINT AS chunks
        FROM t GROUP BY lang, shard
      )
      SELECT lang,
             sum(n_docs)::BIGINT AS n_docs,
             sum(tok)::BIGINT AS n_tokens,
             sum(chunks)::BIGINT AS n_chunks,
             (sum(chunks) * {_PACK_CAPACITY} - sum(tok))::BIGINT
               AS tail_waste_tokens,
             round(sum(tok)::DOUBLE
                   / (sum(chunks) * {_PACK_CAPACITY}), 6)
               AS pack_efficiency,
             round(sum(chars)::DOUBLE / sum(tok), 6)
               AS chars_per_token
      FROM sh GROUP BY lang
      ORDER BY lang
    """,
)
def audit_packing_efficiency_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        (_md5_32(F.col("doc_id").cast("string")) % _PACK_SHARDS).alias(
            "shard"
        ),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK), 0)
        )
        .cast("long")
        .alias("n_tok"),
        "n_chars",
    )
    sh = t.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tok"),
        F.sum("n_chars").cast("long").alias("chars"),
    ).withColumn(
        # ceil on POSITIVE integers via integer floor division (the
        # cross-engine `div` invariant — double division here could
        # flap the floor at large sums)
        "chunks",
        F.expr(f"(tok + {_PACK_CAPACITY - 1}) div {_PACK_CAPACITY}"),
    )
    return (
        sh.groupBy("lang")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
            F.sum("chunks").cast("long").alias("n_chunks"),
            (
                F.sum("chunks") * _PACK_CAPACITY - F.sum("tok")
            )
            .cast("long")
            .alias("tail_waste_tokens"),
            F.round(
                F.sum("tok").cast("double")
                / (F.sum("chunks") * _PACK_CAPACITY),
                6,
            ).alias("pack_efficiency"),
            F.round(
                F.sum("chars").cast("double") / F.sum("tok"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


@register(
    "lm_kneser_ney_bigram",
    "Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the "
    "standard n-gram smoothing beyond the existing add-one LM — "
    "VERDICT r07 'What's missing' item 3): P(w2|w1) = max(c12-d,0)/c1 "
    "+ (d*N1+(w1,.)/c1) * N1+(.,w2)/N1+(..), discount d = 0.75. All "
    "counts are exact integers from ONE bigram aggregate; the four "
    "continuation statistics ride hash-partitioned windows over the "
    "vocab²-bounded bigram frame (31-word vocab here; at 100 TB the "
    "bigram frame is vocab-bounded, never corpus-sized). The final "
    "probability is the IDENTICAL parenthesized double expression on "
    "both engines over identical integers — deterministic IEEE ops, "
    "no summation-order hazard. Deterministic LIMIT tie-break.",
    oracle=f"""
      WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOK}') AS toks
        FROM documents
      ),
      bg0 AS (
        SELECT toks[ue.i] AS w1, toks[ue.i + 1] AS w2
        FROM t, LATERAL unnest(
          range(1, greatest(len(toks), 1)::BIGINT)) ue(i)
      ),
      bg AS (
        SELECT w1, w2, count(*)::BIGINT AS c12
        FROM bg0 GROUP BY w1, w2
      ),
      st AS (
        SELECT w1, w2, c12,
               sum(c12) OVER (PARTITION BY w1)::BIGINT AS c1,
               count(*) OVER (PARTITION BY w1)::BIGINT AS n1p_foll,
               count(*) OVER (PARTITION BY w2)::BIGINT AS n1p_prec,
               count(*) OVER ()::BIGINT AS n1p_total
        FROM bg
      )
      SELECT w1, w2, c12,
             round(greatest(c12 - 0.75, 0) / c1
                   + ((0.75 * n1p_foll) / c1)
                     * (n1p_prec::DOUBLE / n1p_total), 6) AS p_kn
      FROM st
      ORDER BY p_kn DESC, w1, w2
      LIMIT 20
    """,
)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _th(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(_TOK), 0
            ).alias("t"),
        )
        .repartition(max(spark.sparkContext.defaultParallelism, 8))
    )
    bg0 = d.select(
        F.explode(
            F.expr(
                "arrays_zip("
                "slice(t, 1, greatest(size(t) - 1, 0)), "
                "slice(t, 2, greatest(size(t) - 1, 0)))"
            )
        ).alias("s")
    ).select(
        F.expr("s['0']").alias("w1"), F.expr("s['1']").alias("w2")
    )
    bg = bg0.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    # windows over the vocab²-bounded bigram frame (hash-partitioned;
    # the one global count is over the same bounded frame)
    st = bg.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(Window.partitionBy("w1")).alias("c1"),
        F.count(F.lit(1))
        .over(Window.partitionBy("w1"))
        .alias("n1p_foll"),
        F.count(F.lit(1))
        .over(Window.partitionBy("w2"))
        .alias("n1p_prec"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n1p_total"),
    )
    p_kn = F.round(
        F.greatest(F.col("c12") - 0.75, F.lit(0)) / F.col("c1")
        + ((0.75 * F.col("n1p_foll")) / F.col("c1"))
        * (F.col("n1p_prec").cast("double") / F.col("n1p_total")),
        6,
    )
    return (
        st.select("w1", "w2", "c12", p_kn.alias("p_kn"))
        .orderBy(F.desc("p_kn"), "w1", "w2")
        .limit(20)
    )
