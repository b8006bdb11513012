"""Distributed minimum spanning tree via Borůvka rounds.

Borůvka's algorithm is THE distributed MST method (GHS, and every
Pregel/MapReduce MST since): each round, every component selects its
minimum-weight outgoing edge (a per-component argmin — one map-side-
combinable aggregation over the full edge list), the selected edges
merge components, and the component count at least halves — so
rounds = O(log |V|) regardless of data size.

The heavy, data-sized work (relabel + argmin over |E| edges) is fully
distributed each round. The CONTRACTION step unions the selected
forest — a frame bounded by |components|, halving every round — and
runs as a driver-side union-find with the merged map broadcast back
(the bounded-driver-step pattern of k-means' centroid update and
MMR's greedy pick; a first implementation ran the distributed
min-label CC kernel per round instead and spent 33 s in scheduler
floor across ~1,600 stages at sf0.1 vs ~2 s for this shape — chains
in the selected forest give min-label O(diameter) rounds of tiny
jobs). Past driver memory (billions of components), flip the first
round or two to the distributed CC kernel and switch here once
components fit — the algorithm is unchanged.

Correctness on non-unique weights: Borůvka needs a TOTAL edge order
or per-component minima can close a cycle; ties break on
(w, src, dst), making the forest unique and acyclic. Ground truth is
pinned against a driver-side Kruskal with the same order
(tests/test_graph.py::test_boruvka_mst_matches_kruskal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boruvka_mst(
    edges: DataFrame,
    max_rounds: int = 12,
    checkpoint_input: bool = True,
) -> DataFrame:
    """Minimum spanning forest of an undirected weighted edge list
    ``(src, dst, w)`` with ``src < dst``; returns the tree edges.

    ``checkpoint_input=False`` skips the initial lineage-cut when the
    caller's edge frame is already materialized (persisted/cached) —
    the per-round argmin re-reads it from cache either way, and the
    extra checkpoint is a full copy of the edge list."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", "w")
    if checkpoint_input:
        e = e.localCheckpoint()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    chosen = None
    comp_map = None  # None = identity (round 1 needs no relabel join)
    seen: set[int] = set()
    for _ in range(max_rounds):
        if comp_map is None:
            lab = e.select(
                F.col("src").alias("cs"), F.col("dst").alias("cd"),
                "src", "dst", "w",
            )
        else:
            # comp_map holds only non-identity mappings (bounded by
            # merged nodes — up to |V|-1 as rounds contract, so the
            # broadcast hint holds while that fits the budget; past it
            # drop the hints and relabel via shuffle joins on the
            # node-keyed edges): relabel is two map-side LEFT
            # joins; unmapped nodes are their own component. Edges
            # that went intra-component are dropped and the PRUNED
            # frame replaces e — on dense graphs round 1 merges most
            # of the graph, so later rounds scan a fraction of |E|.
            # At sf0.1 the 8.4 s e2e wall is edge build + checkpoint
            # + one full argmin scan (the CC/triangle family cost);
            # later rounds are noise
            lab = (
                e.join(
                    F.broadcast(
                        comp_map.select(
                            F.col("node").alias("src"), F.col("c").alias("ms")
                        )
                    ),
                    "src",
                    "left",
                )
                .join(
                    F.broadcast(
                        comp_map.select(
                            F.col("node").alias("dst"), F.col("c").alias("md")
                        )
                    ),
                    "dst",
                    "left",
                )
                .select(
                    "src",
                    "dst",
                    "w",
                    F.coalesce("ms", "src").alias("cs"),
                    F.coalesce("md", "dst").alias("cd"),
                )
            )
        lab = lab.where(F.col("cs") != F.col("cd"))
        if comp_map is not None:
            lab = lab.localCheckpoint()
            e = lab.select("src", "dst", "w")
        # per-component minimum outgoing edge; struct min gives the
        # deterministic (w, src, dst) tie-break; map-side combinable
        sel = (
            lab.select(
                F.explode(F.array("cs", "cd")).alias("comp"),
                F.struct("w", "src", "dst").alias("edge"),
            )
            .groupBy("comp")
            .agg(F.min("edge").alias("edge"))
            .select("edge.w", "edge.src", "edge.dst")
            .distinct()
            .collect()  # <= |components| rows, halving per round
        )
        if not sel:
            break
        fresh = []
        for r in sel:
            ra, rb = find(int(r["src"])), find(int(r["dst"]))
            if ra != rb:
                parent[ra] = rb
                fresh.append((int(r["src"]), int(r["dst"]), int(r["w"])))
        add = spark.createDataFrame(fresh, "src long, dst long, w long")
        chosen = add if chosen is None else chosen.unionByName(add)
        for r in sel:
            seen.add(int(r["src"]))
            seen.add(int(r["dst"]))
        # only nodes that ever touched a selected edge can have a
        # non-identity component (merges happen along selected edges)
        comp_rows = [(n, find(n)) for n in seen]
        comp_map = spark.createDataFrame(comp_rows, "node long, c long")
    if chosen is None:
        return e.where(F.lit(False)).select("src", "dst", "w")
    return chosen.localCheckpoint()
