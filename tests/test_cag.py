"""CAG piece-geometry tests (CAGUtil / FaceDecompositionUtil semantics)."""

import numpy as np
import pytest

from osm2world_spark.operators.cag import (
    cag_pieces,
    intersect_polygons_faces,
    split_polygon_into_faces,
)
from osm2world_spark.operators.triangulate import _signed_area2


def _sq(x0, z0, x1, z1):
    return [[x0, z0, x1, z0, x1, z1, x0, z1, x0, z0]]


def _area(pieces):
    tot = 0.0
    for outer, holes in pieces:
        tot += _signed_area2(outer[:, 0], outer[:, 1]) / 2.0
        tot += sum(_signed_area2(h[:, 0], h[:, 1]) / 2.0 for h in holes)
    return tot


def test_corner_overlap_single_l_piece():
    pieces = split_polygon_into_faces(_sq(0, 0, 10, 10), [_sq(-5, -5, 4, 6)])
    assert len(pieces) == 1
    outer, holes = pieces[0]
    assert len(holes) == 0
    assert len(outer) == 6
    assert _area(pieces) == pytest.approx(100 - 4 * 6)
    # outer is counterclockwise
    assert _signed_area2(outer[:, 0], outer[:, 1]) > 0


def test_interior_subtract_yields_hole():
    pieces = split_polygon_into_faces(_sq(0, 0, 10, 10), [_sq(3, 3, 6, 6)])
    assert len(pieces) == 1
    outer, holes = pieces[0]
    assert len(holes) == 1
    assert _area(pieces) == pytest.approx(100 - 9)
    # hole ring is clockwise (negative signed area)
    assert _signed_area2(holes[0][:, 0], holes[0][:, 1]) < 0


def test_disjoint_and_covered():
    full = split_polygon_into_faces(_sq(0, 0, 10, 10), [_sq(20, 20, 30, 30)])
    assert _area(full) == pytest.approx(100.0)
    assert split_polygon_into_faces(_sq(0, 0, 10, 10), [_sq(-1, -1, 11, 11)]) == []


def test_multi_subtract():
    pieces = split_polygon_into_faces(
        _sq(0, 0, 10, 10), [_sq(-1, -1, 3, 3), _sq(7, 7, 11, 11)]
    )
    assert _area(pieces) == pytest.approx(100 - 9 - 9)


def test_split_into_multiple_pieces():
    # a band across the middle splits A into two disconnected pieces
    pieces = split_polygon_into_faces(_sq(0, 0, 10, 10), [_sq(-1, 4, 11, 6)])
    assert len(pieces) == 2
    assert _area(pieces) == pytest.approx(100 - 20)


def test_intersect_faces():
    inter = intersect_polygons_faces([_sq(0, 0, 10, 10), _sq(4, -2, 14, 6)])
    assert len(inter) == 1
    assert _area(inter) == pytest.approx(6 * 6)


def test_clockwise_input_normalized():
    # clockwise-wound base ring must not flip the classification
    cw = [[0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0, 0.0, 0.0, 0.0]]
    pieces = split_polygon_into_faces(cw, [_sq(-5, -5, 4, 6)])
    assert _area(pieces) == pytest.approx(100 - 24)


def test_area_consistent_with_polygon_boolean(spark):
    """Cross-check the two J13 surfaces: sum of subtract-piece areas ==
    area_a - area_intersection from the triangle-decomposition kernel."""
    import pyspark.sql.functions as F

    from osm2world_spark.operators.boolean import polygon_boolean

    rng = np.random.default_rng(13)
    rows = []
    for i in range(40):
        ax0, az0 = (float(v) for v in rng.uniform(0, 50, 2))
        aw, ah = (float(v) for v in rng.uniform(20, 60, 2))
        bx0, bz0 = (float(v) for v in rng.uniform(0, 80, 2))
        bw, bh = (float(v) for v in rng.uniform(10, 50, 2))
        rows.append(
            (
                str(i),
                _sq(ax0, az0, ax0 + aw, az0 + ah),
                _sq(bx0, bz0, bx0 + bw, bz0 + bh),
            )
        )
    pairs = spark.createDataFrame(
        rows, "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>"
    )
    booleans = {
        r["pair_id"]: r for r in polygon_boolean(pairs).collect()
    }
    pieces = cag_pieces(pairs, op="subtract").collect()
    piece_area = {}
    for r in pieces:
        piece_area[r.pair_id] = piece_area.get(r.pair_id, 0.0) + r.area
    for pid, b in booleans.items():
        want = b["area_a"] - b["area_intersection"]
        got = piece_area.get(pid, 0.0)
        assert got == pytest.approx(want, abs=1e-6), pid


def test_cag_pieces_canonical_order(spark):
    pairs = spark.createDataFrame(
        [("p", _sq(0.0, 0.0, 10.0, 10.0), _sq(-5.0, -5.0, 4.0, 6.0))],
        "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>",
    )
    rows = cag_pieces(pairs, op="subtract", snap=1e-3).collect()
    assert len(rows) == 1
    outer = rows[0].outer
    # starts at the lexicographic min vertex (0, 6) and runs CCW
    assert outer[:4] == [0.0, 6.0, 4.0, 6.0]
    assert rows[0].n_holes == 0
    assert rows[0].area == pytest.approx(76.0)


def test_area_consistency_random_convex(spark):
    """Face decomposition vs triangle-decomposition areas on random CONVEX
    polygons (generic segment directions, multi-intersection boundaries —
    nothing axis-aligned)."""
    from osm2world_spark.operators.boolean import polygon_boolean

    def convex(rng, cx, cz, r):
        # star polygon with every angular gap < pi (gap fractions bounded
        # by 1.5 / (0.5*(n-1) + 1.5) < 0.5), so the ring is always simple
        n = int(rng.integers(5, 9))
        inc = rng.uniform(0.5, 1.5, n)
        angles = 2 * np.pi * np.cumsum(inc) / inc.sum()
        xs = cx + np.cos(angles) * r * rng.uniform(0.7, 1.3, len(angles))
        zs = cz + np.sin(angles) * r * rng.uniform(0.7, 1.3, len(angles))
        ring = np.empty(2 * (len(xs) + 1))
        ring[0:-2:2], ring[1:-2:2] = xs, zs
        ring[-2], ring[-1] = xs[0], zs[0]
        return [[float(v) for v in ring]]

    rng = np.random.default_rng(21)
    rows = []
    for i in range(25):
        a = convex(rng, float(rng.uniform(0, 40)), float(rng.uniform(0, 40)), 20.0)
        b = convex(rng, float(rng.uniform(0, 40)), float(rng.uniform(0, 40)), 15.0)
        rows.append((str(i), a, b))
    pairs = spark.createDataFrame(
        rows, "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>"
    )
    booleans = {r["pair_id"]: r for r in polygon_boolean(pairs).collect()}
    piece_area = {}
    for r in cag_pieces(pairs, op="subtract").collect():
        piece_area[r.pair_id] = piece_area.get(r.pair_id, 0.0) + r.area
    inter_area = {}
    for r in cag_pieces(pairs, op="intersect").collect():
        inter_area[r.pair_id] = inter_area.get(r.pair_id, 0.0) + r.area
    for pid, b in booleans.items():
        assert piece_area.get(pid, 0.0) == pytest.approx(
            b["area_a"] - b["area_intersection"], abs=1e-6
        ), pid
        assert inter_area.get(pid, 0.0) == pytest.approx(
            b["area_intersection"], abs=1e-6
        ), pid
