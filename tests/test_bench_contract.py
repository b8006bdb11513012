"""bench.py output contract (no Spark session needed).

VERDICT r07 item 4: the driver's capture buffer truncates bench's
one-line JSON (BENCH_r07 lost the first ~15 per-query keys and could
not reconstruct all entries). The payload must place the graded
scalars first, the E2E_REBUILD per-query entries first inside
``queries``, and duplicate the graded scalars in a trailing
``summary`` so truncation from EITHER end preserves them.
"""

import json

import bench


def _payload():
    timings = {n: 0.5 for n in bench.HEADLINE}
    return bench.output_payload(
        timings, sf=0.1, build_sec=1.0, wall=2.0,
        load_at_start=(0.1, 0.2, 0.3),
    )


def test_graded_scalars_lead_the_line():
    keys = list(_payload())
    assert keys[:4] == [
        "metric", "value", "headline_core32_sec", "sf",
    ]
    # queries (the big dict truncation eats into) comes after every
    # scalar; summary is the absolute last key
    assert keys[-2:] == ["queries", "summary"]


def test_e2e_rebuild_entries_lead_queries_dict():
    q = list(_payload()["queries"])
    n = len(bench.E2E_REBUILD)
    assert set(q[:n]) == bench.E2E_REBUILD
    assert set(q) == set(bench.HEADLINE)


def test_trailing_summary_duplicates_graded_scalars():
    p = _payload()
    assert p["summary"]["headline_sequential_sec"] == p["value"]
    assert (
        p["summary"]["headline_core32_sec"] == p["headline_core32_sec"]
    )
    assert p["summary"]["sf"] == p["sf"]
    # summary survives a front-truncation that eats half the line
    line = json.dumps(p)
    tail = line[len(line) // 2 :]
    assert '"summary"' in tail


def test_core32_is_frozen_prefix():
    assert len(bench.CORE32) == 32
    assert bench.CORE32 == bench.HEADLINE[:32]
