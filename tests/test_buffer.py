"""Polygon mitre-buffer tests (JTSBufferUtil.bufferPolygon semantics:
JOIN_MITRE + DEFAULT_MITRE_LIMIT, grow and shrink)."""

import math

import numpy as np
import pytest

from osm2world_spark.operators.buffer import (
    DEFAULT_MITRE_LIMIT,
    buffer_polygon_rings,
    buffer_polygons,
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


def test_square_grow_mitre_square():
    pieces = buffer_polygon_rings(_sq(0, 0, 10, 10), 2.0)
    assert len(pieces) == 1
    assert _area(pieces) == pytest.approx(14 * 14)
    outer, holes = pieces[0]
    assert not holes
    # mitre corners: the grown square's corner points are present
    pts = {(round(x, 9), round(z, 9)) for x, z in outer}
    assert {(-2.0, -2.0), (12.0, -2.0), (12.0, 12.0), (-2.0, 12.0)} <= pts


def test_square_shrink_exact():
    pieces = buffer_polygon_rings(_sq(0, 0, 10, 10), -2.0)
    assert len(pieces) == 1
    assert _area(pieces) == pytest.approx(6 * 6)


def test_shrink_past_collapse_is_empty():
    # the raw offset ring inverts through 180 degrees without flipping
    # orientation — the construction must still return nothing
    assert buffer_polygon_rings(_sq(0, 0, 10, 10), -6.0) == []
    assert buffer_polygon_rings(_sq(0, 0, 10, 10), -5.0) == []


def test_zero_distance_identity():
    pieces = buffer_polygon_rings(_sq(0, 0, 10, 10), 0.0)
    assert len(pieces) == 1
    assert _area(pieces) == pytest.approx(100)


def test_hole_shrinks_on_grow():
    geom = _sq(0, 0, 10, 10) + [[3, 3, 7, 3, 7, 7, 3, 7, 3, 3]]
    pieces = buffer_polygon_rings(geom, 1.0)
    assert len(pieces) == 1
    outer, holes = pieces[0]
    assert len(holes) == 1
    assert _area(pieces) == pytest.approx(12 * 12 - 2 * 2)


def test_hole_collapses_and_fills():
    geom = _sq(0, 0, 10, 10) + [[3, 3, 7, 3, 7, 7, 3, 7, 3, 3]]
    pieces = buffer_polygon_rings(geom, 3.0)
    assert len(pieces) == 1
    outer, holes = pieces[0]
    assert not holes  # collapsed hole must fill, not survive inverted
    assert _area(pieces) == pytest.approx(16 * 16)


def test_holes_grow_and_merge_on_shrink():
    geom = (
        _sq(0, 0, 20, 10)
        + [[2, 3, 6, 3, 6, 7, 2, 7, 2, 3]]
        + [[8, 3, 12, 3, 12, 7, 8, 7, 8, 3]]
    )
    pieces = buffer_polygon_rings(geom, -1.2)
    # grown holes overlap each other AND the shrunken outer boundary:
    # the merged void strip must be carved exactly once
    assert _area(pieces) == pytest.approx(17.6 * 7.6 - 12.0 * 6.4)


def test_reflex_corner_grow_l_shape():
    L = [[0, 0, 10, 0, 10, 4, 4, 4, 4, 10, 0, 10, 0, 0]]
    pieces = buffer_polygon_rings(L, 1.0)
    assert len(pieces) == 1
    # grown-by-1 L with mitre corners = 12x6 rect + 6x6 rect
    assert _area(pieces) == pytest.approx(12 * 6 + 6 * 6)


def test_shrink_splits_dumbbell():
    db = [[0, 0, 10, 0, 10, 4, 14, 4, 14, 0, 24, 0, 24, 10,
           14, 10, 14, 6, 10, 6, 10, 10, 0, 10, 0, 0]]
    pieces = buffer_polygon_rings(db, -2.0)
    assert len(pieces) == 2
    assert _area(pieces) == pytest.approx(2 * 6 * 6)


def test_mitre_limit_chamfers_sharp_spike():
    # spike vertices with angle ~5.7 deg: mitre ratio 1/sin(theta/2) ~ 20
    # exceeds the limit of 5 -> corners must be chamfered, bounding the
    # grown area well below the untruncated-mitre area
    spike = [[0, 0, 20, 0, 10, 1, 0, 0]]
    d = 0.5
    pieces = buffer_polygon_rings(spike, d)
    assert len(pieces) == 1
    area = _area(pieces)
    base = 10.0  # triangle area
    perimeter = 20 + 2 * math.sqrt(101)
    # lower bound: bevel join (no corner extension at all)
    assert area > base + perimeter * d
    # upper bound: every corner chamfered at <= mitre_limit * d, each
    # corner wedge is contained in a disk sector of radius limit*d
    limit = DEFAULT_MITRE_LIMIT * d
    assert area < base + perimeter * d + 3 * math.pi * limit * limit


def test_grow_then_shrink_roundtrip_convex():
    # convex polygon: grow(d) then shrink(d) is the identity
    vs = []
    for j in range(6):
        th = 2 * math.pi * j / 6 + 0.3
        vs += [40 + 20 * math.cos(th), 40 + 25 * math.sin(th)]
    vs += vs[:2]
    grown = buffer_polygon_rings([vs], 3.0)
    assert len(grown) == 1
    packed = [grown[0][0].ravel().tolist()]
    back = buffer_polygon_rings(packed, -3.0)
    assert len(back) == 1
    orig_area = _signed_area2(
        np.asarray(vs[0:-2:2]), np.asarray(vs[1:-1:2])
    ) / 2.0
    assert _area(back) == pytest.approx(orig_area, rel=1e-9)


def test_dataframe_operator_pieces(spark):
    import pyspark.sql.functions as F

    def _f(geom):
        return [[float(v) for v in ring] for ring in geom]

    rows = [
        ("grow", _f(_sq(0, 0, 10, 10)), 2.0),
        ("shrink", _f(_sq(0, 0, 10, 10)), -2.0),
        ("collapse", _f(_sq(0, 0, 10, 10)), -6.0),
        ("holey", _f(_sq(0, 0, 10, 10) + [[3, 3, 7, 3, 7, 7, 3, 7, 3, 3]]), 1.0),
    ]
    df = spark.createDataFrame(rows, "poly_id string, geom array<array<double>>, distance double")
    out = buffer_polygons(df, snap=1e-9).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.poly_id, []).append(r)
    assert "collapse" not in by_id
    assert len(by_id["grow"]) == 1 and by_id["grow"][0].area == pytest.approx(196.0)
    assert len(by_id["shrink"]) == 1 and by_id["shrink"][0].area == pytest.approx(36.0)
    assert by_id["holey"][0].n_holes == 1
    assert by_id["holey"][0].area == pytest.approx(144 - 4)
    # canonical outer: starts at its lexicographic minimum vertex, CCW
    outer = by_id["grow"][0].outer
    pts = list(zip(outer[0::2], outer[1::2]))
    assert pts[0] == min(pts)
