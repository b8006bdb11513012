"""operators/rank.py — distributed exact global rank/ntile.

The helpers must be VALUE-IDENTICAL to the single-window formulation
(that is the whole point: same answer, no single-partition funnel), so
every test compares against ``row_number()/ntile()`` over a plain
unpartitioned window on the same frame.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scout_spark.operators.rank import global_ntile, global_row_number


def _frame(spark, n, dup_every=7):
    # values with deliberate ties (v repeats) + unique tie-break id
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % dup_every).alias("v"),
    )


@pytest.mark.parametrize("n", [1, 9, 10, 11, 100, 1003])
def test_global_row_number_matches_single_window(spark, n):
    df = _frame(spark, n)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["v", "id"], out="rn").collect()
    }
    ref = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == ref


@pytest.mark.parametrize(
    "n,tiles", [(1, 10), (5, 10), (9, 10), (10, 10), (11, 10), (95, 10), (100, 7), (1003, 10), (64, 4)]
)
def test_global_ntile_matches_single_window(spark, n, tiles):
    df = _frame(spark, n)
    got = {
        r["id"]: r["tile"]
        for r in global_ntile(df, ["v", "id"], tiles, out="tile").collect()
    }
    ref = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(tiles).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == ref


def test_global_row_number_no_unpartitioned_row_window(spark):
    """The row-level window must partition on the range-partition id —
    the only unpartitioned window allowed in the plan is the P-row
    offset cumulative sum (bounded by partition count, not data)."""
    df = _frame(spark, 200)
    plan = (
        global_row_number(df, ["v", "id"], out="rn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    row_windows = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "row_number" in ln
    ]
    assert row_windows, plan[:3000]
    assert all("__rank_pid#" in ln for ln in row_windows), "\n".join(
        row_windows
    )


# ---------------------------------------------------- setjoin ceiling


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=100_000),
    num=st.integers(min_value=1, max_value=1_000_000),
)
def test_ppjoin_integer_ceiling_exact(n, num):
    """The bigint ceil(p*n/q) used by prefix_filter_join must equal the
    rational-exact ceiling for EVERY threshold p/1e6 — including the
    adversarial ones where double ceil(t*n) lands one high (the
    no-false-negative guarantee rests on this; ADVICE r03/r04)."""
    q = 1_000_000
    threshold = num / q
    frac = Fraction(threshold).limit_denominator(q)
    p, qq = frac.numerator, frac.denominator
    x = p * n + qq - 1
    got = (x - x % qq) // qq
    assert got == math.ceil(Fraction(p, qq) * n)
    # and the snapped rational is the threshold the caller wrote
    assert frac == Fraction(num, q)


def test_rank_toolkit_call_budget():
    """ADVICE r06: _persist_bounded's FIFO eviction is only safe if no
    single query builds more than _MAX_CACHED ranged frames before its
    consuming action runs. Statically count toolkit calls per function
    across the whole inventory package — TRANSITIVELY through
    intra-package helper calls (ADVICE r07: a per-body count missed an
    entry that ranks via a helper which itself calls the toolkit), and
    pin the budget. Counting is by bare function name, which OVERcounts
    on name collisions and branch-exclusive calls — conservative in the
    safe direction for a ceiling check."""
    import ast
    import pathlib

    from scout_spark.operators.rank import _MAX_CACHED

    toolkit = {"global_row_number", "global_ntile", "global_prefix_sum"}
    inv = pathlib.Path("scout_spark/inventory")

    def _callee_names(node):
        for c in ast.walk(node):
            if isinstance(c, ast.Call):
                if isinstance(c.func, ast.Name):
                    yield c.func.id
                elif isinstance(c.func, ast.Attribute):
                    yield c.func.attr

    direct: dict[str, int] = {}  # bare name -> direct toolkit calls
    callees: dict[str, list[str]] = {}  # bare name -> called names
    where: dict[str, str] = {}
    for path in sorted(inv.glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ):
                continue
            names = list(_callee_names(node))
            d = sum(1 for n in names if n in toolkit)
            # name collision across modules: keep the heavier definition
            if d >= direct.get(node.name, -1):
                direct[node.name] = d
                callees[node.name] = [n for n in names if n not in toolkit]
                where[node.name] = f"{path.name}:{node.name}"

    def total(name: str, stack: frozenset) -> int:
        if name not in direct or name in stack:
            return 0  # external call or recursion cycle
        inner = stack | {name}
        return direct[name] + sum(
            total(c, inner) for c in callees[name]
        )

    worst = ("", 0)
    for name in direct:
        t = total(name, frozenset())
        if t > worst[1]:
            worst = (where[name], t)
    assert worst[1] <= _MAX_CACHED, (
        f"{worst[0]} makes {worst[1]} rank-toolkit calls (transitive); "
        f"_MAX_CACHED={_MAX_CACHED} frames could evict a live ranged "
        "frame mid-query — raise _MAX_CACHED or split the query"
    )
    # the known worst case today (RFM's triple ntile) — if this grows,
    # re-derive the headroom consciously rather than silently
    assert worst[1] <= 4, f"toolkit usage grew: {worst}"
