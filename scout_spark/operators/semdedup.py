"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540; no counterpart in the
reference — training-data pipeline extension per the build brief).

The published recipe: k-means the corpus embeddings, then WITHIN each
cluster mark semantic duplicates (cosine similarity above a threshold)
and keep one representative per duplicate group. Clustering makes the
quadratic step tractable: pair generation is blocked by cluster id, so
the cost is Σ|cluster|² instead of n² — at 100 TB, k is chosen so
clusters stay bounded (the paper uses ~11k clusters for LAION), each
cluster's pair join is an equi-join bucket, and no vector ever crosses
the network except in the k·dim centroid broadcast.

Composition of existing verified kernels: `kmeans_fit/assign`
(operators/kmeans.py — numpy-matmul Arrow UDF assignment),
intra-cluster pair generation as a self-equi-join on cluster id, and
`connected_components` (operators/dedup.py) to close duplicate pairs
transitively so each ε-ball keeps exactly one representative (the min
id, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from scout_spark.functions.vectors import dot_product, l2_norm
from scout_spark.operators.dedup import connected_components
from scout_spark.operators.kmeans import kmeans_assign, kmeans_fit


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, keeper, is_duplicate) for every input vector.

    ``keeper`` is the min id of the vector's duplicate group (itself
    when it has no near-duplicate above ``threshold`` in its cluster);
    ``is_duplicate`` marks rows a dedup pass would drop. Duplicate
    groups are transitive closures of the >= threshold pairs, so chains
    a~b~c collapse to one keeper even when cos(a, c) < threshold —
    matching the paper's one-per-ball semantics under min-id choice.
    """
    cents = kmeans_fit(
        embeddings, k=k, n_iters=n_iters, vec_col=vec_col, id_col=id_col
    )
    # the Arrow-UDF assignment is read by multiple jobs (both sides of
    # the pair self-join inside connected_components' materialization,
    # and the final output join) — materialize it ONCE; localCheckpoint
    # also truncates lineage so the UDF never re-runs (CLAUDE.md
    # cross-job reuse rule; same pattern as the CC pair checkpoint)
    assigned = kmeans_assign(
        embeddings, cents, vec_col=vec_col, id_col=id_col
    ).localCheckpoint()
    # hoist the per-vector norm below the pair join (r6 lesson from
    # embedding_neardup_pairs): HOF folds run interpreted, so norms
    # inlined in a per-pair cosine cost 2x|dims| extra interpreted ops
    # per candidate pair; projected here they run once per vector
    ec = embeddings.select(
        id_col, vec_col, l2_norm(vec_col).alias("__n")
    ).join(assigned, id_col)
    a, b = ec.alias("a"), ec.alias("b")
    cos = F.try_divide(
        dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
        F.col("a.__n") * F.col("b.__n"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(cos >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("dup_a"),
            F.col(f"b.{id_col}").alias("dup_b"),
        )
    )
    comp = connected_components(pairs, "dup_a", "dup_b").select(
        F.col("id").alias(id_col), F.col("component").alias("keeper")
    )
    return (
        assigned.join(comp, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(F.col("keeper"), F.col(id_col)).alias("keeper"),
            (
                F.coalesce(F.col("keeper"), F.col(id_col)) != F.col(id_col)
            ).alias("is_duplicate"),
        )
    )
