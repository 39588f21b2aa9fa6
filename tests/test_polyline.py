"""distribute_points_along vs a faithful replica of the reference loop
(GeometryUtil.equallyDistributePointsAlong, GeometryUtil.java:548-676)."""

import math
import random

import pytest

from pyspark.sql import functions as F


def _reference_distribute(points, preferred, at_ends):
    """Line-for-line replica of the Java algorithm (running accumulation
    and all), the oracle for the Column implementation."""
    length = 0.0
    for a, b in zip(points, points[1:]):
        length += math.hypot(b[0] - a[0], b[1] - a[1])
    num_segments = math.floor(length / preferred + 0.5)
    if num_segments == 0:
        return []
    point_distance = length / num_segments
    num_points = num_segments + 1 if at_ends else num_segments
    result = []
    current = 0.0 if at_ends else point_distance / 2
    cur_in = 0
    off_cur = 0.0
    off_next = math.hypot(points[1][0] - points[0][0], points[1][1] - points[0][1])
    for i in range(num_points):
        if at_ends and i == num_points - 1:
            result.append(points[-1])
            break
        while current > off_next:
            cur_in += 1
            off_cur = off_next
            off_next = off_cur + math.hypot(
                points[cur_in + 1][0] - points[cur_in][0],
                points[cur_in + 1][1] - points[cur_in][1],
            )
        r = (current - off_cur) / (off_next - off_cur)
        a, b = points[cur_in], points[cur_in + 1]
        result.append((a[0] + (b[0] - a[0]) * r, a[1] + (b[1] - a[1]) * r))
        current += point_distance
    return result


def _run(spark, polyline, preferred, at_ends):
    from osm2world_spark.functions.polyline import distribute_points_along

    packed = [float(c) for p in polyline for c in p]
    df = spark.createDataFrame([(packed,)], "geom array<double>")
    col = distribute_points_along(
        F.col("geom"), F.lit(float(preferred)), F.lit(bool(at_ends))
    )
    rows = df.select(F.explode(col).alias("p")).select("p.i", "p.px", "p.pz").collect()
    return [(r.px, r.pz) for r in sorted(rows, key=lambda r: r.i)]


def test_matches_reference_on_random_polylines(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(12):
        n = rng.randint(2, 7)
        pts = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(n)]
        cases.append((pts, rng.uniform(3, 40), rng.random() < 0.5))
    for pts, pref, at_ends in cases:
        expected = _reference_distribute(pts, pref, at_ends)
        got = _run(spark, pts, pref, at_ends)
        assert len(got) == len(expected), (pts, pref, at_ends)
        for (gx, gz), (ex, ez) in zip(got, expected):
            assert gx == pytest.approx(ex, abs=1e-9)
            assert gz == pytest.approx(ez, abs=1e-9)


def test_endpoints_and_spacing(spark):
    pts = [(0.0, 0.0), (10.0, 0.0)]
    got = _run(spark, pts, 2.5, True)
    assert got[0] == pytest.approx((0.0, 0.0))
    assert got[-1] == pytest.approx((10.0, 0.0))
    assert len(got) == 5
    for (x0, _), (x1, _) in zip(got, got[1:]):
        assert x1 - x0 == pytest.approx(2.5)


def test_half_spacing_when_not_at_ends(spark):
    got = _run(spark, [(0.0, 0.0), (10.0, 0.0)], 2.5, False)
    assert len(got) == 4
    assert got[0] == pytest.approx((1.25, 0.0))
    assert got[-1] == pytest.approx((8.75, 0.0))


def test_zero_segments_returns_empty(spark):
    # round(length/preferred) == 0 -> no points (GeometryUtil.java:556-558)
    assert _run(spark, [(0.0, 0.0), (1.0, 0.0)], 10.0, True) == []


def test_multi_segment_bend(spark):
    pts = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]
    got = _run(spark, pts, 2.0, True)
    expected = _reference_distribute(pts, 2.0, True)
    assert len(got) == 5
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, abs=1e-12)
    assert (4.0, 0.0) == pytest.approx(got[2])  # the corner vertex
