"""Point-in-polygon containment join (operators/spatial.py): exact
ray-cast ground truth over hand-built polygons — square, concave
L-shape, polygon with a hole, and bbox-hit-but-outside traps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scout_spark.operators.spatial import RING_SCHEMA, point_in_polygon_join


def ring(*pts):
    return {"xs": [float(p[0]) for p in pts], "ys": [float(p[1]) for p in pts]}


@pytest.fixture(scope="module")
def polys(spark):
    rows = [
        # unit square (0,0)-(10,10)
        (1, [ring((0, 0), (10, 0), (10, 10), (0, 10))]),
        # L-shape: bbox (20,0)-(30,10) but notch (25..30, 5..10) removed
        (2, [ring((20, 0), (30, 0), (30, 5), (25, 5), (25, 10), (20, 10))]),
        # square with a hole: outer (40,0)-(50,10), hole (43,3)-(47,7)
        (3, [
            ring((40, 0), (50, 0), (50, 10), (40, 10)),
            ring((43, 3), (47, 3), (47, 7), (43, 7)),
        ]),
    ]
    return spark.createDataFrame(rows, f"poly_id long, rings {RING_SCHEMA}")


def test_point_in_polygon_cases(spark, polys):
    pts = [
        (100, 5.0, 5.0),    # square interior -> 1
        (101, 11.0, 5.0),   # outside all
        (102, 22.0, 8.0),    # L interior (left arm) -> 2
        (103, 28.0, 8.0),    # inside L's BBOX but in the notch -> none
        (104, 28.0, 2.0),    # L interior (bottom arm) -> 2
        (105, 45.0, 5.0),    # inside the HOLE -> none
        (106, 41.0, 5.0),    # ring interior, not in hole -> 3
        (107, 45.0, 8.5),    # above hole, inside outer -> 3
    ]
    points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    got = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(points, polys).collect()
    }
    assert got == {(100, 1), (102, 2), (104, 2), (106, 3), (107, 3)}


def test_bbox_prefilter_is_broadcast_and_pruning(spark, polys):
    points = spark.createDataFrame(
        [(0, 5.0, 5.0)], "point_id long, lon double, lat double"
    )
    df = point_in_polygon_join(points, polys)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_many_random_points_vs_shapely_free_oracle(spark, polys):
    """200 deterministic pseudo-random points against the unit square:
    containment equals simple coordinate bounds (an independent oracle
    that doesn't share the ray-cast code path)."""
    rows = []
    seed = 1234567
    for i in range(200):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        x = (seed % 2000) / 100.0 - 5.0  # [-5, 15)
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        y = (seed % 2000) / 100.0 - 5.0
        rows.append((i, x, y))
    points = spark.createDataFrame(rows, "point_id long, lon double, lat double")
    got = {
        r["point_id"]
        for r in point_in_polygon_join(points, polys)
        .where(F.col("poly_id") == 1)
        .collect()
    }
    expected = {i for i, x, y in rows if 0 < x < 10 and 0 < y < 10}
    assert got == expected
