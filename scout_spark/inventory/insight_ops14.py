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
    tree = boruvka_mst(e)
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
    "silent truncation). Spark expands pairs from grouped order "
    "lists (the _edges HOF pattern — no self-join); the oracle "
    "recounts with a quadratic self-join — independent formulations. "
    "100 TB: wedge stream bounded by sum of capped-degree^2; the "
    "per-pair count agg combines map-side.",
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
    inc = li.select(
        F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("o")
    ).distinct()
    kept = (
        inc.groupBy("p")
        .agg(F.array_sort(F.collect_set("o")).alias("os"))
        .where(F.size("os") <= _BF_MAXPARTS)
    )
    # pair expansion from grouped lists (graph_ops._edges pattern):
    # per-part wedge stream, no index self-join; flatten is a single-
    # reference HOF over basket-bounded arrays
    pairs_expr = (
        "flatten(transform(os, (x, i) ->"
        " transform(slice(os, i + 2, size(os) - i - 1),"
        " y -> struct(x as o1, y as o2))))"
    )
    pairs = (
        kept.select(F.explode(F.expr(pairs_expr)).alias("pr"))
        .groupBy("pr.o1", "pr.o2")
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
