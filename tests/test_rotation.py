"""Driver correctness-window rotation (inventory/rotation.py)."""

import json
import os

import __spark_entry__ as entrymod
from scout_spark.inventory import load_all
from scout_spark.inventory.rotation import (
    CHECKED_PRIOR_ROUNDS,
    FAILED_PRIOR_ROUNDS,
    LAST_CHECKED_ROUND,
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
    red_in_registry = [n for n in order if n in FAILED_PRIOR_ROUNDS]
    # previously-red names lead the window outright — no volume of newly
    # registered queries can push a red re-check past the ~50 cutoff
    assert order[: len(red_in_registry)] == red_in_registry, (
        "previously-failed queries must lead the window"
    )
    # then every unchecked name precedes every checked-green name
    priority = set(unchecked) | set(red_in_registry)
    assert set(order[: len(priority)]) == priority, (
        "all unchecked names must precede every checked-green name"
    )
    # the first min(50, #priority) window slots are covered by them
    n_front = min(50, len(priority))
    assert set(order[:n_front]) <= priority, (
        "red + never-driver-checked queries must fill the window front"
    )
    # within the unchecked block: strict registration order, so operators
    # registered later (new rounds) cannot displace the existing backlog
    # from the ~50-slot window
    block = order[len(red_in_registry) : len(priority)]
    reg_index = {n: i for i, n in enumerate(registry)}
    assert block == sorted(block, key=reg_index.__getitem__), (
        "unchecked entries must keep registration order"
    )


def test_queries_iteration_order_matches_rotation():
    registry = load_all()
    assert list(entrymod.queries()) == ordered_names(registry)


def test_green_tier_is_staleness_ordered():
    """Checked-green entries re-enter the window stalest-first:
    tier-2 order is (last-checked round, registration index), so a green
    last verified in r03 precedes one verified in r07 regardless of
    registration order, and every green cycles back on a ~N/50-round
    cadence instead of the oldest-registered prefix re-checking forever."""
    registry = load_all()
    order = ordered_names(registry)
    greens = [
        n
        for n in order
        if n in CHECKED_PRIOR_ROUNDS and n not in FAILED_PRIOR_ROUNDS
    ]
    # greens occupy the back of the rotation contiguously
    assert order[-len(greens) :] == greens
    reg_index = {n: i for i, n in enumerate(registry)}
    keys = [(LAST_CHECKED_ROUND[n], reg_index[n]) for n in greens]
    assert keys == sorted(keys), (
        "green tier must be ordered by (last-checked round, reg index)"
    )
    # the scan actually produced multiple distinct rounds (not all r01)
    assert len({LAST_CHECKED_ROUND[n] for n in greens}) > 1


def test_round1_correctness_keys_are_all_marked_checked():
    path = os.path.join(REPO, "CORRECTNESS_r01.json")
    recorded = set(json.load(open(path)))
    assert recorded <= CHECKED_PRIOR_ROUNDS
