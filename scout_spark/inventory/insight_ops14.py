"""Round-5 seventeenth wave: Borůvka MST and bipartite butterfly
counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scout_spark.inventory import register
from scout_spark.inventory.core import _t


# ------------------------------------------------ Borůvka MST


@register(
    "graph_mst_boruvka",
    "Minimum spanning forest by distributed BORŮVKA — the O(log V)-"
    "round MST algorithm every Pregel/MapReduce formulation uses "
    "(per-component min outgoing edge -> merge components -> repeat; "
    "component count at least halves per round): run on the part "
    "co-purchase graph with the deterministic integer weights "
    "1 + (src+dst) % 5 (the SSSP entry's weighting), reporting tree "
    "edge count, total weight, and surviving component count. "
    "Rows-only: the iterative contraction is not SQL-expressible "
    "(the CC precedent); EXACT ground truth pinned against a driver-"
    "side Kruskal with the same (w, src, dst) total order in "
    "tests/test_graph.py::test_boruvka_mst_matches_kruskal — tie "
    "order is what makes the forest unique, hence testable. 100 TB: "
    "per round one edge relabel + one |components|-bounded argmin + "
    "a CC pass over SELECTED edges only (operators/mst.py).",
    tags=("rows-only",),
)
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scout_spark.inventory.graph_ops import _edges
    from scout_spark.operators.mst import boruvka_mst

    e = _edges(spark, sf_dir).select(
        "src", "dst", (F.lit(1) + (F.col("src") + F.col("dst")) % 5).alias("w")
    )
    tree = boruvka_mst(e, checkpoint_input=False)  # _edges is persisted
    nodes = (
        e.select(F.col("src").alias("n"))
        .unionByName(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    return tree.agg(
        F.count(F.lit(1)).cast("long").alias("n_tree_edges"),
        F.sum("w").cast("long").alias("total_weight"),
        (F.lit(nodes) - F.count(F.lit(1))).cast("long").alias(
            "n_components"
        ),
    )


# ----------------------------------- bipartite butterfly counting

_BF_MAXPARTS = 40  # skew cap: hub parts contribute quadratic pair streams


@register(
    "graph_butterfly_count_bipartite",
    "BUTTERFLY (2x2 biclique) counting on the order-part bipartite "
    "graph — the bipartite analogue of triangle counting and the "
    "standard cohesion metric for user-item graphs (Sanei-Mehri et "
    "al. 2018): butterflies = sum over order pairs of C(shared "
    "parts, 2), computed from the per-part order lists (wedge "
    "generation) with a DEGREE CAP that drops hub parts above "
    f"{_BF_MAXPARTS} orders IDENTICALLY on both engines (the "
    "documented skew-cap contract — hub wedges are quadratic, and "
    "every production butterfly counter caps or samples them; the "
    "cap parameter is part of the metric's definition here, not a "
    "silent truncation). Spark generates wedges with a capped "
    "EQUI-JOIN on the part key (whole-stage codegen end to end) — "
    "the grouped-list HOF expansion that wins for basket-sized "
    "(<8-item) lists measured 1.8x SLOWER here (7.0 vs 3.9 s at "
    "sf0.1): interpreted per-pair struct lambdas lose to the codegen "
    "join once lists reach ~30 elements. 100 TB: wedge stream "
    "bounded by sum of capped-degree^2; the per-pair count agg "
    "combines map-side.",
    oracle=f"""
      WITH inc AS (
        SELECT DISTINCT l_partkey AS p, l_orderkey AS o FROM lineitem
      ),
      pdeg AS (
        SELECT p FROM inc GROUP BY p HAVING count(*) <= {_BF_MAXPARTS}
      ),
      kept AS (SELECT i.p, i.o FROM inc i JOIN pdeg USING (p)),
      pairs AS (
        SELECT a.o AS o1, b.o AS o2, count(*)::BIGINT AS c
        FROM kept a JOIN kept b ON a.p = b.p AND a.o < b.o
        GROUP BY a.o, b.o
      )
      SELECT count(*)::BIGINT AS n_order_pairs,
             coalesce(sum(c * (c - 1) / 2), 0)::BIGINT AS n_butterflies,
             coalesce(max(c), 0)::BIGINT AS max_shared_parts
      FROM pairs
    """,
)
def graph_butterfly_count_bipartite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # inc feeds the degree filter AND the wedge join (overlapping
    # consumers), but persisting it measured SLOWER (7.7 vs 6.2 s at
    # sf0.1): the InMemoryTableScan breaks codegen fusion into the
    # wedge join, costing more than the repeated 600k-row distinct —
    # the k-consumers rule loses to codegen here
    inc = li.select(
        F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("o")
    ).distinct()
    small = (
        inc.groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= _BF_MAXPARTS)
        .select("p")
    )
    # |part|-bounded key list: broadcast explicitly so inc never
    # re-shuffles for the degree filter, and hint the wedge self-join
    # to SHUFFLE_HASH — sort-merge was sorting both 600k-row sides
    # before emitting 8.4M pairs (r08 floor capture: 8.7 s -> 2.7 s
    # at sf0.1; results identical). At scale the hash build is the
    # per-partition capped-degree slice, which the cap bounds.
    kept = inc.join(F.broadcast(small), "p")
    a, b = kept.alias("a"), kept.alias("b").hint("shuffle_hash")
    # capped wedge equi-join, codegen end to end (see docstring for
    # the measured HOF-expansion comparison)
    pairs = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p")) & (F.col("a.o") < F.col("b.o")),
        )
        .groupBy(F.col("a.o").alias("o1"), F.col("b.o").alias("o2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_order_pairs"),
        F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)
        )
        .cast("long")
        .alias("n_butterflies"),
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias(
            "max_shared_parts"
        ),
    )
