"""Round-4 linkage additions: exact prefix-filtered set-similarity
join (PPJoin) and blocked record linkage (entity resolution).

Registered last in load_all so rotation queues these behind the
never-checked backlog in the driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t, _th
from scout_spark.inventory.text_ops import _tokens_col, _tokens_sql

# PPJoin entry bound: the oracle recomputes the EXACT unblocked result
# with the naive quadratic join, which is only feasible on a bounded
# slice — the operator itself has no such bound (prefix filtering IS
# its scale mechanism; tests/test_graph.py pins it against brute force
# and the oracle pins it against DuckDB here).
_PP_BOUND = 800
_PP_T = 0.8


@register(
    "dedup_ppjoin_prefix",
    "EXACT set-similarity self-join via prefix filtering (SSJoin/"
    "PPJoin; operators/setjoin.py): tokens ordered by global rarity, "
    "only the (1-t)·|s|+1 rarest per record enter the candidate "
    "equi-join — complete by the pigeonhole prefix principle, so "
    "unlike MinHash-LSH there are NO false negatives, and the "
    "frequent tokens that would explode the join sit outside every "
    f"prefix. Jaccard ≥ {_PP_T} over doc_id < {_PP_BOUND} (the bound "
    "exists for the oracle's naive quadratic recount, not the "
    "operator).",
    oracle=f"""
      WITH d AS (
        SELECT doc_id, list_distinct({_tokens_sql("text")}) AS toks
        FROM documents WHERE doc_id < {_PP_BOUND}
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.toks, b.toks))::DOUBLE
                   / (len(a.toks) + len(b.toks)
                      - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            >= {_PP_T}
    """,
)
def dedup_ppjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.operators.setjoin import prefix_filter_join

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _PP_BOUND)
        .select("doc_id", _tokens_col(F.col("text")).alias("toks"))
    )
    return prefix_filter_join(d, "doc_id", "toks", _PP_T).select(
        F.col("id_a"), F.col("id_b"), "jaccard"
    )


# Deterministic "dirty" second source for the linkage demo: every 3rd
# key's name gains a trailing char (edit distance 1), every 7th gains
# two (distance 2, stacking), every 5th's balance drifts +0.01
# (additive only — repo fixture rule), every 11th vanishes.
_ER_NAME1_MOD = 3
_ER_NAME2_MOD = 7
_ER_BAL_MOD = 5
_ER_DROP_MOD = 11


@register(
    "er_record_linkage",
    "Blocked record linkage (Fellegi-Sunter shape): match a clean "
    "customer source against a deterministically dirtied second "
    "source (typo'd names, drifted balances, dropped rows) — "
    "candidates generated ONLY within (nation, segment) blocks (the "
    "equi-join that replaces the quadratic cross product at scale), "
    "field agreements scored (levenshtein ≤ 2 on names, |Δbalance| ≤ "
    "0.02), pairs above threshold declared matches. Because the true "
    "identity (custkey) is known, the report includes per-nation "
    "precision — TPC-H-style names differ by a digit, so near-miss "
    "false positives are real, which is the point of the demo.",
    oracle=f"""
      WITH v2 AS (
        SELECT c_custkey AS k2, c_nationkey, c_mktsegment,
               c_name
                 || CASE WHEN c_custkey % {_ER_NAME1_MOD} = 0 THEN 'x' ELSE '' END
                 || CASE WHEN c_custkey % {_ER_NAME2_MOD} = 0 THEN 'zz' ELSE '' END
                 AS name2,
               c_acctbal + CASE WHEN c_custkey % {_ER_BAL_MOD} = 0
                                THEN 0.01 ELSE 0.0 END AS bal2
        FROM customer WHERE c_custkey % {_ER_DROP_MOD} <> 0
      ),
      cand AS (
        SELECT c.c_nationkey AS nation, c.c_custkey AS k1, v2.k2,
               CASE WHEN levenshtein(lower(c.c_name), lower(v2.name2)) <= 2
                    THEN 2 ELSE 0 END
               + CASE WHEN abs(c.c_acctbal - v2.bal2) <= 0.02
                      THEN 1 ELSE 0 END AS score
        FROM customer c
        JOIN v2 ON c.c_nationkey = v2.c_nationkey
               AND c.c_mktsegment = v2.c_mktsegment
      )
      SELECT nation,
             count(*) AS n_candidates,
             sum(CASE WHEN score >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_matched,
             sum(CASE WHEN score >= 2 AND k1 = k2 THEN 1 ELSE 0 END)::BIGINT
               AS n_true,
             round(sum(CASE WHEN score >= 2 AND k1 = k2 THEN 1 ELSE 0 END)::DOUBLE
                   / nullif(sum(CASE WHEN score >= 2 THEN 1 ELSE 0 END), 0), 6)
               AS precision
      FROM cand GROUP BY nation ORDER BY nation
    """,
)
def er_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe side widened (_th): the banded-levenshtein loop over the
    # ~1.65M block pairs runs inside the probe scan's codegen stage, and
    # bench parquet arrives as ONE row group — without the widen the
    # whole pair loop lands on a single core (measured 3.0 s -> 0.7 s
    # at sf0.1). The broadcast build side stays narrow.
    c = _th(spark, sf_dir, "customer")
    v2 = _t(spark, sf_dir, "customer").where(
        F.col("c_custkey") % _ER_DROP_MOD != 0
    ).select(
        F.col("c_custkey").alias("k2"),
        F.col("c_nationkey").alias("nk2"),
        F.col("c_mktsegment").alias("seg2"),
        F.concat(
            F.col("c_name"),
            F.when(F.col("c_custkey") % _ER_NAME1_MOD == 0, "x").otherwise(""),
            F.when(F.col("c_custkey") % _ER_NAME2_MOD == 0, "zz").otherwise(""),
        ).alias("name2"),
        (
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % _ER_BAL_MOD == 0, 0.01).otherwise(
                0.0
            )
        ).alias("bal2"),
    )
    # 3-arg levenshtein abandons the DP once the distance exceeds the
    # threshold (returns -1) — a banded O(threshold·n) computation per
    # pair instead of O(n²); only the ≤ 2 predicate matters here, so
    # "within threshold" ≡ "result != -1". Measured 4.7 s → ~2 s on
    # the 1.8M-pair candidate set at sf0.1. Edit distance is invariant
    # under a shared prefix (ed(xu, xv) = ed(u, v)), so when BOTH names
    # carry the corpus-constant 'customer#' prefix the DP runs on the
    # 9-12 char tails instead of the full 18-21 — half the band cells;
    # the guard keeps the predicate exact for arbitrary names. (An
    # ED-Join q-gram prefix filter was measured here and cut the block
    # pairs only 1.1-2.1x: every record's rare-gram prefix gets padded
    # with corpus-universal grams on these fixed-shape names — see
    # PLANS.md round-4 notes.)
    _pfx = "customer#"
    nm1, nm2 = F.lower(F.col("c_name")), F.lower(F.col("name2"))
    both_pfx = nm1.startswith(_pfx) & nm2.startswith(_pfx)
    _cut = len(_pfx) + 1
    name_agree = (
        F.when(
            both_pfx,
            F.levenshtein(
                F.substring(nm1, _cut, 64), F.substring(nm2, _cut, 64), 2
            ),
        ).otherwise(F.levenshtein(nm1, nm2, 2))
        != -1
    )
    bal_agree = F.abs(F.col("c_acctbal") - F.col("bal2")) <= 0.02
    cand = c.join(
        v2,
        (F.col("c_nationkey") == F.col("nk2"))
        & (F.col("c_mktsegment") == F.col("seg2")),
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_custkey").alias("k1"),
        "k2",
        (
            F.when(name_agree, 2).otherwise(0)
            + F.when(bal_agree, 1).otherwise(0)
        ).alias("score"),
    )
    matched = F.when(F.col("score") >= 2, 1).otherwise(0)
    true_m = F.when(
        (F.col("score") >= 2) & (F.col("k1") == F.col("k2")), 1
    ).otherwise(0)
    return (
        cand.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(matched).alias("n_matched"),
            F.sum(true_m).alias("n_true"),
            F.round(
                F.sum(true_m).cast("double")
                / F.nullif(F.sum(matched), F.lit(0)),
                6,
            ).alias("precision"),
        )
        .orderBy("nation")
    )


_JW_PROBE = "Customer#000000500"


@register(
    "scalar_jaro_winkler_rank",
    "Jaro-Winkler fuzzy ranking (functions/jaro.py — Spark has no "
    "built-in JW): top-20 customer names by similarity to a probe "
    "string. The Python implementation is verified CHARACTER-EXACT "
    "against DuckDB's jaro_winkler_similarity (same match window, "
    "half-transposition, and prefix-bonus semantics), so this scalar "
    "is oracle-checked, not rows-only; it runs as an Arrow pandas UDF "
    "over a joinless scan into TakeOrderedAndProject. Rank key "
    "rounded to 6dp with custkey tie-break (ULP-stable LIMIT).",
    oracle=f"""
      SELECT c_custkey, c_name,
             round(jaro_winkler_similarity(c_name, '{_JW_PROBE}'), 6) AS jw
      FROM customer
      ORDER BY jw DESC, c_custkey
      LIMIT 20
    """,
)
def scalar_jaro_winkler_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.functions.jaro import jaro_winkler_to

    c = _t(spark, sf_dir, "customer")
    jw = jaro_winkler_to(_JW_PROBE)
    return (
        c.select(
            "c_custkey",
            "c_name",
            F.round(jw(F.col("c_name")), 6).alias("jw"),
        )
        .orderBy(F.desc("jw"), "c_custkey")
        .limit(20)
    )
