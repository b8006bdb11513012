"""Exact set-similarity join with prefix filtering (PPJoin-style).

Chaudhuri/Ganti/Kaushik's SSJoin + Xiao et al.'s PPJoin family: to
find all pairs with Jaccard ≥ t WITHOUT the all-pairs product, order
every record's distinct tokens by GLOBAL rarity (ascending frequency)
and emit only the first ``|s| - ceil(t·|s|) + 1`` tokens (the prefix).
Two records can only reach Jaccard ≥ t if their prefixes share a
token — so an equi-join on prefix tokens generates a complete
candidate set, and rare-token-first ordering makes that join's
fan-out per token tiny exactly where frequency is high (frequent
tokens sit at the END of records and rarely enter prefixes).  The
MinHash-LSH path (operators/dedup.py) is the probabilistic sibling;
this one is EXACT — no false negatives by construction, candidates
verified with the true Jaccard.

Shuffle census: one groupBy for the frequency dictionary, one shuffle
to sort tokens per record (row-local transform after a broadcast
dictionary join), one equi-join on prefix token, one distinct on the
pair, and the verify join back to the token arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_filter_join(
    records: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
) -> DataFrame:
    """All (id_a < id_b, jaccard) pairs with Jaccard ≥ ``threshold``.

    ``records`` must carry a distinct-token array column.  The global
    frequency dictionary is aggregated once and joined back via the
    exploded token stream.  The dictionary join is deliberately NOT
    broadcast-FORCED: at 100 TB the dictionary is itself large, and
    the plan degrades gracefully to a token-keyed shuffle join (the
    same key the prefix join shuffles on); at bench scale the planner
    broadcasts the tiny dictionary on its own — both are the right
    plan at their size.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    base = records.select(
        F.col(id_col).alias("rid"),
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    flat = base.select("rid", F.explode("toks").alias("tok"))
    freq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    # rank tokens by (freq, tok): a total order, so every record sorts
    # its tokens identically; the sort key packs into one struct array
    ranked = (
        flat.join(freq, "tok")
        .groupBy("rid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("freq", "tok"))
            ).alias("ordered")
        )
        .select(
            "rid",
            F.transform(F.col("ordered"), lambda s: s["tok"]).alias("toks"),
        )
    )
    n = F.size("toks")
    # integer-EXACT ceil(t*n): the threshold is snapped to the rational
    # p/1e6 it was written as (Fraction.limit_denominator guards inputs
    # like 1/3), then ceil(p*n/q) = (p*n + q - 1) div q in pure bigint
    # arithmetic — no double rounding anywhere, so the documented
    # no-false-negative guarantee holds for EVERY threshold, including
    # adversarial ones where double ceil(t*n) lands one high (ADVICE
    # r03/r04; property test: tests/test_operators.py).
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    p, q = frac.numerator, frac.denominator
    ceil_tn = ((F.lit(p) * n.cast("bigint") + F.lit(q - 1)) - (
        (F.lit(p) * n.cast("bigint") + F.lit(q - 1)) % F.lit(q)
    )) / F.lit(q)
    prefix_len = n - ceil_tn.cast("int") + 1
    prefixes = ranked.select(
        "rid",
        "toks",
        F.explode(F.slice("toks", 1, prefix_len)).alias("ptok"),
    )
    a = prefixes.alias("a")
    b = prefixes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.col("a.toks").alias("toks_a"),
            F.col("b.toks").alias("toks_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
