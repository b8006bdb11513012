"""Driver correctness-window rotation (inventory/rotation.py)."""

import json
import os

import __spark_entry__ as entrymod
from scout_spark.inventory import load_all
from scout_spark.inventory.rotation import (
    CHECKED_PRIOR_ROUNDS,
    FAILED_PRIOR_ROUNDS,
    ordered_names,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prior_checked_names_exist_in_registry():
    registry = load_all()
    missing = CHECKED_PRIOR_ROUNDS - set(registry)
    assert not missing, f"rotation list references unknown queries: {missing}"


def test_unchecked_queries_fill_driver_window():
    registry = load_all()
    order = ordered_names(registry)
    assert set(order) == set(registry), "rotation must be a permutation"
    unchecked = [n for n in registry if n not in CHECKED_PRIOR_ROUNDS]
    # the first min(50, #unchecked) window slots are all unchecked names
    # — once fewer than 50 remain unchecked, previously-checked names
    # legitimately fill the window tail (red ones first, see below)
    n_front = min(50, len(unchecked))
    assert set(order[:n_front]) <= set(unchecked), (
        "never-driver-checked queries must fill the window front"
    )
    assert set(order[: len(unchecked)]) == set(unchecked), (
        "all unchecked names must precede every checked name"
    )
    # previously-red names re-enter the window immediately after the
    # never-checked block so fixes actually get re-verified
    red_in_registry = [n for n in order if n in FAILED_PRIOR_ROUNDS]
    tail = order[len(unchecked) : len(unchecked) + len(red_in_registry)]
    assert set(tail) == set(red_in_registry), (
        "previously-failed queries must sort directly behind unchecked ones"
    )
    # within the unchecked block: oracle-backed (hard signal) first
    block = order[: len(unchecked)]
    first_rows_only = next(
        (i for i, n in enumerate(block) if registry[n].oracle is None), len(block)
    )
    assert all(registry[n].oracle is None for n in block[first_rows_only:]), (
        "rows-only entries must not precede oracle-backed ones in the block"
    )


def test_queries_iteration_order_matches_rotation():
    registry = load_all()
    assert list(entrymod.queries()) == ordered_names(registry)


def test_round1_correctness_keys_are_all_marked_checked():
    path = os.path.join(REPO, "CORRECTNESS_r01.json")
    recorded = set(json.load(open(path)))
    assert recorded <= CHECKED_PRIOR_ROUNDS
