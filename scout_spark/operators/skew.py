"""Skew mitigation + co-location utilities (build-brief scale
requirements; SURVEY.md §4 'Rewrites the reference does NOT have').

Two complementary tools for 100 TB joins:
  - ``salted_join``: explicit key salting for a skewed build side when
    AQE's runtime skew splitting isn't available (e.g. broadcast not
    possible and one key dominates). The small side is replicated
    ``salt`` times; the big side picks a deterministic salt per row, so
    each hot key spreads over ``salt`` reducers.
  - ``write_bucketed`` / co-located joins: bucketing both fact tables on
    the join key at write time makes the join shuffle-free (verified in
    tests/test_scale_layout.py by asserting no Exchange in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with ``salt``-way key
    spreading. Result columns = big's columns + small's non-key columns.

    big rows get salt = pmod(hash(row-identity columns…), salt) derived
    from the key AND a spread column — here a deterministic per-row hash
    of all columns — so identical keys land on different reducers; small
    rows are exploded to every salt value.

    Only inner/left supported: the small side is replicated ``salt``
    times, so right/full would emit ``salt`` copies of every unmatched
    small row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.struct(*[F.col(c) for c in big.columns])), salt)
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. Two
    tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (SortMergeJoin reads co-located buckets)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
