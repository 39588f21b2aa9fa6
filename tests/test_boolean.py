"""Polygon boolean (CAG) tests: triangle-decomposition intersection."""

import numpy as np
import pytest

from osm2world_spark.operators.boolean import intersection_pieces


def _rect(x0, z0, x1, z1):
    return [[float(c) for c in (x0, z0, x1, z0, x1, z1, x0, z1, x0, z0)]]


def _lshape():
    pts = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4), (0, 0)]
    return [[float(c) for p in pts for c in p]]


def test_rect_rect_intersection():
    aa, ab, ai, pieces = intersection_pieces(_rect(0, 0, 10, 10), _rect(5, 5, 20, 20))
    assert aa == pytest.approx(100.0)
    assert ab == pytest.approx(225.0)
    assert ai == pytest.approx(25.0)


def test_disjoint_and_self():
    _, _, ai, pieces = intersection_pieces(_rect(0, 0, 1, 1), _rect(5, 5, 6, 6))
    assert ai == 0.0 and not pieces
    aa, _, ai_self, _ = intersection_pieces(_rect(0, 0, 3, 7), _rect(0, 0, 3, 7))
    assert ai_self == pytest.approx(aa)


def test_lshape_rect():
    # L-shape (area 12) ∩ rect [1,1]x[5,5]: the L covers [0,4]x[0,2] ∪
    # [0,2]x[2,4]; within the rect that is [1,4]x[1,2] (3) + [1,2]x[2,4] (2)
    aa, ab, ai, _ = intersection_pieces(_lshape(), _rect(1, 1, 5, 5))
    assert aa == pytest.approx(12.0)
    assert ai == pytest.approx(5.0)


def test_polygon_with_hole():
    outer = _rect(0, 0, 10, 10)[0]
    hole = _rect(4, 4, 6, 6)[0]
    a = [outer, hole]
    aa, ab, ai, _ = intersection_pieces(a, _rect(3, 3, 7, 7))
    assert aa == pytest.approx(96.0)
    # rect 4x4 = 16 minus the hole 2x2 = 4 -> 12
    assert ai == pytest.approx(12.0)


def test_polygon_boolean_operator(spark):
    from osm2world_spark.operators.boolean import polygon_boolean

    df = spark.createDataFrame(
        [
            ("p1", _rect(0, 0, 10, 10), _rect(5, 5, 20, 20)),
            ("p2", _rect(0, 0, 2, 2), _rect(10, 10, 12, 12)),
        ],
        "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>",
    )
    out = {r["pair_id"]: r for r in polygon_boolean(df).collect()}
    assert out["p1"]["area_intersection"] == pytest.approx(25.0)
    assert out["p1"]["area_a_minus_b"] == pytest.approx(75.0)
    assert out["p2"]["area_intersection"] == 0.0
