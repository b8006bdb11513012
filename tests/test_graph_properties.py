"""Property-based hardening for the round-4 set/graph kernels:
random graphs vs a naive triangle counter, random corpora vs a
brute-force similarity join — shapes the fixed fixtures don't reach
(isolated components, all-duplicate corpora, single-token records).
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scout_spark.operators.graph import triangle_stats
from scout_spark.operators.setjoin import prefix_filter_join

# small random undirected edge sets over ≤ 10 nodes
edge_sets = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=20,
)

# small random token-set corpora over a 12-token vocabulary
corpora = st.lists(
    st.sets(st.sampled_from([f"t{i}" for i in range(12)]), min_size=1, max_size=6),
    min_size=2,
    max_size=12,
)


def _naive_tri(es):
    nodes = sorted({x for p in es for x in p})
    cnt = 0
    for a, b, c in combinations(nodes, 3):
        if (
            ((a, b) in es or (b, a) in es)
            and ((a, c) in es or (c, a) in es)
            and ((b, c) in es or (c, b) in es)
        ):
            cnt += 1
    return cnt


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edge_sets)
def test_triangle_stats_property(spark, pairs):
    canon = {tuple(sorted(p)) for p in pairs}
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(canon)], "src long, dst long"
    )
    row = triangle_stats(df).collect()[0]
    assert row["n_edges"] == len(canon)
    assert row["n_triangles"] == _naive_tri(canon)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora, t=st.sampled_from([0.5, 0.7, 1.0]))
def test_prefix_filter_join_property(spark, corpus, t):
    docs = [(i, sorted(s)) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_join(df, "doc_id", "toks", t).collect()
    }
    want = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = set(ta), set(tb)
        if len(sa & sb) / len(sa | sb) >= t:
            want.add((min(ia, ib), max(ia, ib)))
    assert got == want
