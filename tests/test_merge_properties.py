"""Property-based MERGE INTO invariants (etl/incremental.py::merge_into).

Hypothesis generates arbitrary target/source batches; for every one:
  - output keys are unique (MERGE can never create duplicate keys)
  - matched keys (not deleted) carry SOURCE values
  - unmatched target keys pass through untouched
  - source-only keys are inserted
  - delete_condition removes exactly the matched keys satisfying it
A driver-side reference model (plain dicts) states the semantics
independently of the join implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scout_spark.etl.incremental import merge_into

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),          # key
        st.integers(min_value=-100, max_value=100),      # val
    ),
    max_size=10,
)


def dedup_keys(pairs):
    out = {}
    for k, v in pairs:
        out[k] = v  # last wins, mirroring unique-key table semantics
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(t=rows, s=rows)
def test_merge_matches_reference_model(spark, t, s):
    target = dedup_keys(t)
    source = dedup_keys(s)
    tdf = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)],
        "k long, v long",
    ).where(F.col("k").isNotNull())
    sdf = spark.createDataFrame(
        [(k, v) for k, v in source.items()] or [(None, None)],
        "k long, v long",
    ).where(F.col("k").isNotNull())

    # delete matched rows whose TARGET value is negative
    got = {
        r["k"]: r["v"]
        for r in merge_into(
            tdf, sdf, key="k", delete_condition=F.col("t.v") < 0
        ).collect()
    }

    expected = {}
    for k, v in target.items():
        if k in source:
            if v < 0:
                continue  # matched + delete condition
            expected[k] = source[k]  # matched update
        else:
            expected[k] = v  # untouched target
    for k, v in source.items():
        if k not in target:
            expected[k] = v  # insert

    assert got == expected
    assert len(got) == len(set(got))  # unique keys by construction
