"""Fuzzy scorer tests (SURVEY.md §2.9 X3): the exact WRatio scorer's
structural properties, the pandas UDF batch path, and the oracle-
expressible proxy scorer. (Algorithm-level hand-computed values live in
tests/test_wratio.py.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.functions.wratio import wratio
from scout_spark.operators.fuzzy import (
    HAVE_RAPIDFUZZ,
    best_sim_udf,
    proxy_similarity,
)


def test_wratio_structure():
    # exact match = 100, empty = 0, bounded [0, 100]
    assert wratio("monograph dining", "monograph dining") == 100.0
    assert wratio("", "anything") == 0.0
    assert wratio("anything", "") == 0.0
    # token order invariance (token-sort component, ×0.95 unbase scale)
    assert wratio("dining monograph", "monograph dining") == 95.0
    # token-subset scores high (token-set / partial components)
    assert wratio("monograph", "monograph dining") >= 80.0
    # near-match beats unrelated
    near = wratio("monograph dinning", "monograph dining")
    far = wratio("kopitiam 88", "monograph dining")
    assert near > far
    for q, t in [("abc", "abd"), ("a b c", "c b a"), ("x", "yz")]:
        assert 0.0 <= wratio(q, t) <= 100.0


def test_best_sim_udf_batch(spark):
    df = spark.createDataFrame(
        [(1, "monograph dining"), (2, "kopitiam 88"), (3, None), (4, "")],
        "id long, name string",
    )
    sim = best_sim_udf(["monograph dining"])
    out = {r["id"]: r["s"] for r in df.select("id", sim(F.col("name")).alias("s")).collect()}
    assert out[1] == 1.0
    assert 0.0 <= out[2] < 1.0
    assert out[3] == 0.0 and out[4] == 0.0


def test_best_sim_udf_multiple_queries_takes_max(spark):
    df = spark.createDataFrame([(1, "kopitiam 88")], "id long, name string")
    sim = best_sim_udf(["monograph dining", "kopitiam 88"])
    out = df.select(sim(F.col("name")).alias("s")).collect()[0]["s"]
    assert out == 1.0


def test_proxy_similarity_expression(spark):
    df = spark.createDataFrame(
        [(1, "monograph dining"), (2, "monograph dinning"), (3, "zzz qqq")],
        "id long, name string",
    )
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id",
            F.round(proxy_similarity(F.col("name"), "monograph dining"), 6).alias("s"),
        ).collect()
    }
    assert out[1] == 1.0
    assert 0.5 < out[2] < 1.0
    assert out[3] < 0.3
    assert not HAVE_RAPIDFUZZ or True  # env marker, no behavior branch
