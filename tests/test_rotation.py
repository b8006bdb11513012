"""Driver correctness-window rotation (inventory/rotation.py)."""

import json
import os

import __spark_entry__ as entrymod
from scout_spark.inventory import load_all
from scout_spark.inventory.rotation import CHECKED_PRIOR_ROUNDS, ordered_names

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prior_checked_names_exist_in_registry():
    registry = load_all()
    missing = CHECKED_PRIOR_ROUNDS - set(registry)
    assert not missing, f"rotation list references unknown queries: {missing}"


def test_unchecked_queries_fill_driver_window():
    registry = load_all()
    order = ordered_names(registry)
    assert set(order) == set(registry), "rotation must be a permutation"
    window = order[:50]
    assert not any(n in CHECKED_PRIOR_ROUNDS for n in window), (
        "prior-round-checked queries must rotate behind unchecked ones"
    )
    # oracle-backed (hard rows+schema+hash signal) before rows-only
    first_rows_only = next(
        (i for i, n in enumerate(window) if registry[n].oracle is None), len(window)
    )
    assert all(registry[n].oracle is None for n in window[first_rows_only:]), (
        "rows-only entries must not precede oracle-backed ones in the window"
    )


def test_queries_iteration_order_matches_rotation():
    registry = load_all()
    assert list(entrymod.queries()) == ordered_names(registry)


def test_round1_correctness_keys_are_all_marked_checked():
    path = os.path.join(REPO, "CORRECTNESS_r01.json")
    recorded = set(json.load(open(path)))
    assert recorded <= CHECKED_PRIOR_ROUNDS
