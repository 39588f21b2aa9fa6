"""Pure-numpy geometry kernel tests (no Spark).

Semantics pinned to the reference:
- ray cast: SimplePolygonShapeXZ.java:74-93; holes PolygonShapeXZ.java:58-68
- shoelace / winding: SimplePolygonXZ.java:664-672, 240-245
- centroid: SimplePolygonXZ.java:214-236
- segment intersection + EPSILON: GeometryUtil.java:222-278, 799-804
"""

import numpy as np
import pytest

from osm2world_spark.functions.geometry import (
    contains_point,
    flatten,
    ring_centroid,
    ring_is_self_intersecting,
    ring_signed_area,
    row_bbox,
    segment_intersection,
    true_segment_intersection,
)

SQUARE = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]  # CCW, closed
HOLE = [4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0, 4.0, 4.0]


def test_pip_simple():
    flat = flatten([[SQUARE]] * 4)
    qx = np.array([5.0, 15.0, -1.0, 9.999])
    qz = np.array([5.0, 5.0, 5.0, 0.001])
    assert contains_point(qx, qz, flat).tolist() == [True, False, False, True]


def test_pip_with_hole():
    flat = flatten([[SQUARE, HOLE]] * 3)
    qx = np.array([5.0, 2.0, 6.5])
    qz = np.array([5.0, 2.0, 5.0])
    # center is inside the hole -> excluded (PolygonShapeXZ.java:58-68)
    assert contains_point(qx, qz, flat).tolist() == [False, True, True]


def test_pip_concave():
    # L-shape: point in the notch must be outside
    lshape = [0.0, 0.0, 10.0, 0.0, 10.0, 4.0, 4.0, 4.0, 4.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    flat = flatten([[lshape]] * 2)
    assert contains_point(np.array([7.0, 2.0]), np.array([7.0, 2.0]), flat).tolist() == [False, True]


def test_signed_area_and_winding():
    flat = flatten([[SQUARE], [list(reversed_pairs(SQUARE))]])
    areas = ring_signed_area(flat)
    assert areas[0] == pytest.approx(100.0)   # CCW positive
    assert areas[1] == pytest.approx(-100.0)  # CW negative (isClockwise)


def reversed_pairs(coords):
    pts = list(zip(coords[0::2], coords[1::2]))[::-1]
    return [c for p in pts for c in p]


def test_centroid():
    flat = flatten([[SQUARE]])
    cx, cz = ring_centroid(flat)
    assert cx[0] == pytest.approx(5.0)
    assert cz[0] == pytest.approx(5.0)


def test_bbox():
    flat = flatten([[SQUARE, HOLE], [[3.0, -1.0]]])
    minx, minz, maxx, maxz = row_bbox(flat)
    assert (minx[0], minz[0], maxx[0], maxz[0]) == (0, 0, 10, 10)
    assert (minx[1], minz[1], maxx[1], maxz[1]) == (3, -1, 3, -1)


def test_segment_intersection_basic():
    hit, ix, iz = segment_intersection(
        np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([10.0]),
        np.array([0.0]), np.array([10.0]), np.array([10.0]), np.array([0.0]),
    )
    assert hit[0] and ix[0] == pytest.approx(5.0) and iz[0] == pytest.approx(5.0)


def test_segment_intersection_parallel_and_disjoint():
    hit, _, _ = segment_intersection(
        np.array([0.0, 0.0]), np.array([0.0, 0.0]), np.array([10.0, 1.0]), np.array([0.0, 0.0]),
        np.array([0.0, 5.0]), np.array([1.0, 5.0]), np.array([10.0, 6.0]), np.array([1.0, 9.0]),
    )
    assert hit.tolist() == [False, False]


def test_true_intersection_excludes_shared_endpoint():
    # segments share endpoint (0,0) exactly -> no "true" intersection
    # (GeometryUtil.java:267-278)
    hit, _, _ = true_segment_intersection(
        np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]),
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([10.0]),
    )
    assert not hit[0]
    hit2, _, _ = segment_intersection(
        np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]),
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([10.0]),
    )
    assert hit2[0]  # the non-"true" variant does report it


def test_epsilon_parallel_threshold():
    # denominator below EPSILON=1e-4 (GeometryUtil.java:799) -> parallel
    hit, _, _ = segment_intersection(
        np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]),
        np.array([0.0]), np.array([-0.5]), np.array([1.0]), np.array([-0.5 + 0.00005]),
    )
    assert not hit[0]


def test_self_intersection():
    bow = [0.0, 0.0, 10.0, 10.0, 10.0, 0.0, 0.0, 10.0, 0.0, 0.0]  # bowtie
    flat = flatten([[SQUARE], [bow]])
    res = ring_is_self_intersecting(flat)
    assert res.tolist() == [False, True]


def test_pip_golden_region():
    """PIP in projected meters around the golden region (tile 13/4402/2828)."""
    from osm2world_spark.functions.projection import Origin, np_to_xz

    origin = Origin(48.56687, 13.45127)
    ring_ll = [(48.566, 13.450), (48.568, 13.450), (48.568, 13.453), (48.566, 13.453), (48.566, 13.450)]
    x, z = np_to_xz(np.array([p[0] for p in ring_ll]), np.array([p[1] for p in ring_ll]), origin)
    ring = np.empty(len(x) * 2)
    ring[0::2], ring[1::2] = x, z
    flat = flatten([[ring.tolist()]] * 2)
    qx, qz = np_to_xz(np.array([48.567, 48.57]), np.array([13.4515, 13.4515]), origin)
    assert contains_point(qx, qz, flat).tolist() == [True, False]
