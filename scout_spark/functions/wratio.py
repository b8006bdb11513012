"""Pure-Python implementation of the WRatio composite similarity
(SURVEY.md §2.9 X3; reference ranking.py:73-76 calls rapidfuzz
``fuzz.WRatio(q, target)`` on pre-normalized strings, no processor).

rapidfuzz is not installable in this environment, so this module
re-implements the PUBLISHED WRatio algorithm (the fuzzywuzzy/rapidfuzz
composite, documented in both projects) rather than approximating it
with difflib: every sub-score is the Indel normalized similarity
(1 - indel_distance/(len1+len2), indel = len1+len2-2·LCS), combined by

    len_ratio = max(len)/min(len)
    if len_ratio < 1.5:  max(ratio, token_ratio · 0.95)
    else:                max(ratio, partial_ratio · s,
                             partial_token_ratio · 0.95 · s)
                         with s = 0.9 if len_ratio < 8 else 0.6

where token_ratio = max(token_sort_ratio, token_set_ratio) and the
partial_* variants score the best length-m window of the longer string.

The LCS kernel is Hyyrö's bit-parallel algorithm on Python arbitrary-
precision ints (one AND/ADD/OR per character of the longer string), so
a typical place-name pair costs a few microseconds, not an O(m·n) DP.
Equivalence against a reference DP is property-tested in
tests/test_wratio.py; this is the same [0,100] scale as rapidfuzz.
"""

from __future__ import annotations

from functools import lru_cache


def _lcs_len(s1: str, s2: str) -> int:
    """Length of the longest common subsequence, bit-parallel (Hyyrö).

    Runs in O(len2 · ceil(len1/wordsize)) — Python ints are arbitrary
    precision, so the inner step is a single big-int expression."""
    m = len(s1)
    if m == 0 or len(s2) == 0:
        return 0
    pm: dict[str, int] = {}
    for i, ch in enumerate(s1):
        pm[ch] = pm.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    v = mask
    for ch in s2:
        match = pm.get(ch, 0)
        u = v & match
        v = ((v + u) | (v - u)) & mask
    # zero bits of V mark matched positions
    return m - bin(v).count("1")


def _indel_ratio(s1: str, s2: str) -> float:
    """Indel normalized similarity on [0,100]: 100·(1 - d/(|s1|+|s2|))
    with d = |s1|+|s2|-2·LCS."""
    total = len(s1) + len(s2)
    if total == 0:
        return 100.0
    dist = total - 2 * _lcs_len(s1, s2)
    return 100.0 * (1.0 - dist / total)


def _partial_ratio(s1: str, s2: str) -> float:
    """Best Indel ratio of the shorter string against any same-length
    window of the longer one (plus the edge windows shorter than m)."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    m, n = len(s1), len(s2)
    if m == 0:
        return 100.0 if n == 0 else 0.0
    if m == n:
        return _indel_ratio(s1, s2)
    best = 0.0
    for i in range(n - m + 1):
        best = max(best, _indel_ratio(s1, s2[i : i + m]))
        if best == 100.0:
            return 100.0
    return best


def _sorted_join(s: str) -> str:
    return " ".join(sorted(s.split()))


def _token_sort_ratio(s1: str, s2: str, partial: bool = False) -> float:
    scorer = _partial_ratio if partial else _indel_ratio
    return scorer(_sorted_join(s1), _sorted_join(s2))


def _token_set_ratio(s1: str, s2: str, partial: bool = False) -> float:
    """fuzzywuzzy token-set construction with Indel scoring: compare the
    sorted token intersection against intersection+difference strings."""
    t1, t2 = set(s1.split()), set(s2.split())
    if not t1 or not t2:
        return 0.0
    sect = " ".join(sorted(t1 & t2))
    d12 = " ".join(sorted(t1 - t2))
    d21 = " ".join(sorted(t2 - t1))
    combined_1 = (sect + " " + d12).strip()
    combined_2 = (sect + " " + d21).strip()
    scorer = _partial_ratio if partial else _indel_ratio
    if sect:
        # any non-empty intersection makes sect a prefix of both
        # combined strings → partial variant is trivially 100
        if partial:
            return 100.0
        return max(
            scorer(sect, combined_1),
            scorer(sect, combined_2),
            scorer(combined_1, combined_2),
        )
    return scorer(combined_1, combined_2)


def wratio(s1: str, s2: str) -> float:
    """Weighted composite ratio on [0,100] — the reference's scoring
    kernel (ranking.py:73-76), algorithm-parity with fuzz.WRatio."""
    if not s1 or not s2:
        return 0.0
    unbase_scale = 0.95
    len1, len2 = len(s1), len(s2)
    len_ratio = max(len1, len2) / min(len1, len2)
    end_ratio = _indel_ratio(s1, s2)
    if len_ratio < 1.5:
        token_ratio = max(
            _token_sort_ratio(s1, s2), _token_set_ratio(s1, s2)
        )
        return max(end_ratio, token_ratio * unbase_scale)
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    partial = _partial_ratio(s1, s2) * partial_scale
    partial_token = (
        max(
            _token_sort_ratio(s1, s2, partial=True),
            _token_set_ratio(s1, s2, partial=True),
        )
        * unbase_scale
        * partial_scale
    )
    return max(end_ratio, partial, partial_token)


@lru_cache(maxsize=4096)
def _cached_wratio(q: str, t: str) -> float:
    """Query strings repeat across every row of a scoring pass — a small
    LRU keyed on the (q, t) pair absorbs duplicate targets too."""
    return wratio(q, t)
