"""Distributed Lloyd's k-means pinned against an exact numpy replica
(same deterministic init, same argmax tie-break, same empty-cluster
rule), plus planted-cluster recovery and monotone inertia."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _planted(spark, n_per=20, dim=8):
    """Three well-separated direction clusters (cosine metric)."""
    rng_free = []
    base = {
        0: np.array([10, 0, 0, 0, 0, 0, 0, 0], dtype=float),
        1: np.array([0, 10, 0, 0, 0, 0, 0, 0], dtype=float),
        2: np.array([0, 0, 10, 0, 0, 0, 0, 0], dtype=float),
    }
    rows = []
    for g in range(3):
        for i in range(n_per):
            # deterministic small jitter, never enough to cross clusters
            jit = np.array(
                [((g * n_per + i) * 7 + d * 3) % 5 / 10.0 for d in range(dim)]
            )
            v = base[g] + jit
            rows.append((g * n_per + i, g, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, planted int, embedding array<double>"
    )


def test_kmeans_recovers_planted_clusters(spark):
    from scout_spark.operators.kmeans import kmeans_assign, kmeans_fit

    df = _planted(spark)
    cents = kmeans_fit(df, k=3, n_iters=4)
    got = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()
    }
    planted = {r["vec_id"]: r["planted"] for r in df.collect()}
    # cluster ids are arbitrary — assert the PARTITIONS coincide
    by_cluster: dict[int, set] = {}
    for vid, c in got.items():
        by_cluster.setdefault(c, set()).add(planted[vid])
    assert len(by_cluster) == 3
    for members in by_cluster.values():
        assert len(members) == 1  # each cluster is pure


def test_kmeans_matches_numpy_replica(spark):
    from scout_spark.operators.kmeans import _init_centroids, kmeans_fit

    df = _planted(spark)
    vecs = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=float
    )
    cents = _init_centroids(df, 3, "embedding", "vec_id")
    for _ in range(4):
        norms = np.linalg.norm(cents, axis=1)
        norms[norms == 0.0] = 1.0
        unit = cents / norms[:, None]
        xn = np.linalg.norm(vecs, axis=1)
        xn[xn == 0.0] = 1.0
        assign = np.argmax((vecs / xn[:, None]) @ unit.T, axis=1)
        new = cents.copy()
        for c in range(3):
            members = vecs[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = new
    got = kmeans_fit(df, k=3, n_iters=4)
    assert np.allclose(got, cents, rtol=1e-9, atol=1e-12)


def test_kmeans_inertia_monotone(spark):
    from scout_spark.operators.kmeans import inertia, kmeans_fit

    df = _planted(spark)
    prev = None
    for iters in (0, 1, 2, 4):
        cents = kmeans_fit(df, k=3, n_iters=iters)
        cur = inertia(df, cents)
        if prev is not None:
            assert cur <= prev + 1e-12, (iters, cur, prev)
        prev = cur


def test_kmeans_profile_entry_runs(spark):
    from scout_spark.inventory import load_all

    df = load_all()["kmeans_cluster_profile"].spark(spark, SF)
    rows = df.collect()
    assert len(rows) >= 1
    assert sum(r["n_vectors"] for r in rows) > 0
    assert all(r["centroid_l2_norm"] > 0 for r in rows)


def test_ivf_with_trained_centroids_recall(spark):
    """IVF probed with k-means centroids must keep recall@10 >= the
    hash-sampled variant's pinned floor against brute force."""
    from scout_spark.inventory import load_all
    from scout_spark.operators.ann import brute_force_topk

    reg = load_all()
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = [r["vec_id"] for r in reg["ann_ivf_kmeans_topk"].spark(spark, SF).collect()]
    assert len(got) == 10
    q = e.where("vec_id = 100").select(
        e["embedding"].alias("qv")
    )
    exact = [
        r["vec_id"]
        for r in brute_force_topk(e, q, k=10, exclude_id=100).collect()
    ]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, (recall, got, exact)
