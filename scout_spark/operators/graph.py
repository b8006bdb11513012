"""Distributed graph kernels: triangle census and PageRank.

Input convention: an edge DataFrame with columns ``src``/``dst``
holding one row per UNDIRECTED edge, canonicalized ``src < dst`` (the
shape produced by inventory/graph_ops.py::_edges).  Both kernels stay
(id, id) / (id, double) slim through every shuffle — no payload columns
ride the iterations — and both are pure DataFrame ops (no Python in
the loop body), so they scale with the cluster, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirect(edges: DataFrame) -> DataFrame:
    """Expand canonical src<dst edges to both directions."""
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Single-row triangle census: n_nodes, n_edges, n_wedges,
    n_triangles, clustering_coeff (= 3T / wedges, 6dp).

    Degree-oriented enumeration (Suri & Vassilvitskii, WWW'11): each
    edge is directed from its lower-(degree, id) endpoint to the
    higher.  Within a triangle the three nodes are then totally
    ordered, so counting wedges at the lowest node that are closed by
    an oriented mid→high edge counts each triangle exactly once — and
    the wedge fan-out at any node is bounded by its ORIENTED
    out-degree, O(sqrt(m)) even for hub nodes, which is what keeps the
    wedge join from exploding at 100× scale (a naive self-join fans
    out quadratically in raw hub degree).
    """
    und = _undirect(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # orient by (degree, id): strictly increasing along every edge
    dv = deg.select(F.col("src").alias("dst"), F.col("d").alias("dv"))
    ordeg = (
        und.join(deg, "src")
        .join(dv, "dst")
        .where(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    o1 = ordeg.alias("o1")
    o2 = ordeg.alias("o2")
    wedges = (
        o1.join(o2, F.col("o1.src") == F.col("o2.src"))
        .where(F.col("o1.dst") != F.col("o2.dst"))
        .select(F.col("o1.dst").alias("wb"), F.col("o2.dst").alias("wc"))
    )
    tri = wedges.join(
        ordeg,
        (F.col("wb") == F.col("src")) & (F.col("wc") == F.col("dst")),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("t"))
    stats = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
            .cast("long")
            .alias("n_wedges"),
        )
        .crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("t").alias("n_triangles"),
        F.round(3.0 * F.col("t") / F.col("n_wedges"), 6).alias(
            "clustering_coeff"
        ),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Damped power-iteration PageRank → (node, rank).

    Per iteration: one shuffle of slim (node, contribution) pairs.
    The degree-annotated edge table is hash-partitioned on ``src`` and
    persisted ONCE — its output partitioning satisfies the join's
    distribution requirement every round, so only the (much smaller)
    rank table moves.  ``localCheckpoint`` every ``checkpoint_every``
    rounds truncates the lineage so the plan doesn't grow with the
    iteration count (same pattern as operators/dedup.py::
    connected_components).

    On an undirected edge-defined graph every node has out-degree ≥ 1,
    so there is no dangling-mass correction term; total rank mass is
    conserved at 1 up to FP rounding.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    und = _undirect(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = (
        und.join(deg, "src")
        .repartition("src")
        .persist()
    )
    try:
        n = deg.count()
        base = (1.0 - damping) / n
        ranks = deg.select(
            F.col("src").alias("node"), F.lit(1.0 / n).alias("rank")
        )
        for i in range(iterations):
            contribs = ed.join(
                ranks, ed["src"] == ranks["node"]
            ).select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            ranks = contribs.groupBy("node").agg(
                (F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank")
            )
            if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
                ranks = ranks.localCheckpoint()
        return ranks
    finally:
        ed.unpersist()
