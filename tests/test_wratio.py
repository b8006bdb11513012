"""WRatio algorithm parity (functions/wratio.py).

The sub-scores are all Indel normalized similarities, so every expected
value below is hand-derivable: ratio = 100·(1 - d/(m+n)) with
d = m+n-2·LCS. The bit-parallel LCS kernel is cross-checked against a
reference DP on random strings (hypothesis).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from scout_spark.functions.wratio import (
    _indel_ratio,
    _lcs_len,
    _partial_ratio,
    _token_set_ratio,
    _token_sort_ratio,
    wratio,
)


def _lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(max(prev[j + 1], cur[-1], prev[j] + (ca == cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdef ", max_size=40),
    st.text(alphabet="abcdef ", max_size=40),
)
def test_bitparallel_lcs_matches_dp(a, b):
    assert _lcs_len(a, b) == _lcs_dp(a, b)


def test_indel_ratio_hand_values():
    assert _indel_ratio("abc", "abc") == 100.0
    # LCS("abc","abd")=2 → d=2, ratio=100·(1-2/6)
    assert math.isclose(_indel_ratio("abc", "abd"), 100 * (1 - 2 / 6))
    assert _indel_ratio("", "") == 100.0
    assert _indel_ratio("a", "") == 0.0


def test_partial_ratio_window():
    # "ab" appears verbatim inside "xxabxx"
    assert _partial_ratio("ab", "xxabxx") == 100.0
    assert _partial_ratio("xxabxx", "ab") == 100.0
    # no window of "cd" matches "ab" at all
    assert _partial_ratio("ab", "cd") == 0.0


def test_token_sort_ignores_word_order():
    assert _token_sort_ratio("monograph dining", "dining monograph") == 100.0


def test_token_set_subset_scores_100():
    # intersection = {"dining"}; sect is a prefix of both combined
    # strings and equals combined_2 → max includes ratio(sect, sect)=100
    assert _token_set_ratio("dining monograph", "dining") == 100.0
    assert _token_set_ratio("ab cd", "ef gh") < 100.0


def test_wratio_identity_and_empty():
    assert wratio("monograph dining", "monograph dining") == 100.0
    assert wratio("", "anything") == 0.0
    assert wratio("anything", "") == 0.0


def test_wratio_short_branch_hand_value():
    # len_ratio = 1 < 1.5 → max(ratio, token_ratio·0.95).
    # ratio("abc","abd") = 66.67; single tokens → token_sort = same,
    # token_set (no intersection) = same → 66.67·0.95 < 66.67
    assert math.isclose(wratio("abc", "abd"), 100 * (1 - 2 / 6))


def test_wratio_partial_branch_hand_value():
    # "ab" vs "xxabxx": len_ratio = 3 → partial branch, scale 0.9.
    # ratio = 100·(1-4/8) = 50; partial = 100·0.9 = 90;
    # partial_token_set/sort = 100·0.95·0.9 = 85.5 → 90
    assert math.isclose(wratio("ab", "xxabxx"), 90.0)


def test_wratio_long_branch_scale_06():
    # len_ratio ≥ 8 → partial scale 0.6: substring match caps at 60
    q = "ab"
    t = "xx" * 7 + "ab" + "xx" * 7  # len 30, ratio 15
    assert math.isclose(wratio(q, t), 60.0)


def test_wratio_symmetry_and_range():
    pairs = [
        ("monograph dining", "monograph dining kl"),
        ("jalan alor", "alor jalan food street"),
        ("café köln", "koln cafe"),
    ]
    for a, b in pairs:
        x, y = wratio(a, b), wratio(b, a)
        assert math.isclose(x, y), (a, b, x, y)
        assert 0.0 <= x <= 100.0


def test_fuzzy_udf_uses_exact_algorithm(spark):
    """End-to-end: the pandas UDF path scores with the exact composite
    (not an approximation) when rapidfuzz is absent."""
    from scout_spark.operators.fuzzy import HAVE_RAPIDFUZZ, best_sim_udf

    df = spark.createDataFrame(
        [("monograph dining",), ("dining monograph kl",), ("zzz",)],
        "name string",
    )
    udf = best_sim_udf(["monograph dining"])
    got = {
        r["name"]: r["s"]
        for r in df.select("name", udf("name").alias("s")).collect()
    }
    assert got["monograph dining"] == 1.0
    expected_mid = (
        _rf_wratio("monograph dining", "dining monograph kl")
        if HAVE_RAPIDFUZZ
        else wratio("monograph dining", "dining monograph kl")
    ) / 100.0
    assert math.isclose(got["dining monograph kl"], expected_mid)
    assert got["zzz"] < 0.3


def _rf_wratio(a: str, b: str) -> float:
    from rapidfuzz import fuzz

    return fuzz.WRatio(a, b)
