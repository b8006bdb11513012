"""bench.py output contract (no Spark session needed).

VERDICT r07 item 4 + r08 item 6: the driver's capture buffer keeps the
TAIL of bench's one-line JSON and truncates the FRONT (BENCH_r08:
``parsed: null``, first ~5 per-query keys unrecoverable). The payload
must therefore order ``queries`` ASCENDING by cost (front truncation
loses the cheapest entries, never arbitrary ones), keep the graded
scalars duplicated in a trailing ``summary``, and main() writes the
complete payload to BENCH_FULL_LOCAL.json so the repo itself carries
every per-query number regardless of capture truncation.
"""

import json

import bench


def _payload(timings=None):
    timings = timings or {n: 0.5 for n in bench.HEADLINE}
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


def test_queries_ascend_by_cost_so_tail_keeps_expensive():
    timings = {
        n: 0.001 * (i + 1) for i, n in enumerate(bench.HEADLINE)
    }
    q = _payload(timings)["queries"]
    vals = list(q.values())
    assert vals == sorted(vals)
    assert set(q) == set(bench.HEADLINE)
    # the single most expensive entry is adjacent to the summary at
    # the surviving end of the line
    line = json.dumps(_payload(timings), separators=(",", ":"))
    most_expensive = max(timings, key=timings.get)
    tail = line[-200:]
    assert most_expensive in tail and '"summary"' in tail


def test_trailing_summary_duplicates_graded_scalars():
    p = _payload()
    assert p["summary"]["headline_sequential_sec"] == p["value"]
    assert (
        p["summary"]["headline_core32_sec"] == p["headline_core32_sec"]
    )
    assert p["summary"]["sf"] == p["sf"]
    # VERDICT r09 item 3: the load context lives INSIDE the tail-kept
    # summary so a hot-box headline is self-labeling from the one-line
    # JSON alone (r09's 25.2 s driver headline ran at load 10.9)
    assert p["summary"]["load_avg_start"] == 0.1
    # summary survives a front-truncation that eats half the line
    line = json.dumps(p)
    tail = line[len(line) // 2 :]
    assert '"summary"' in tail
    assert '"load_avg_start"' in tail


def test_core32_is_frozen_prefix():
    assert len(bench.CORE32) == 32
    assert bench.CORE32 == bench.HEADLINE[:32]
