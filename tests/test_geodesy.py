"""Geodesy functions (functions/projection.py::initial_bearing_deg /
geodesic_length_m / geodesic_ring_area_m2).

Oracle: scalar math replicas of the standard navigation formulas plus
known-value pins (equator arc, cardinal bearings, a 1x1-degree
equatorial quad against its analytic spherical area).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

R = 6371008.8


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_bearing_cardinals(spark):
    from osm2world_spark.functions.projection import initial_bearing_deg

    cases = [
        ((0.0, 0.0, 10.0, 0.0), 0.0),    # due north
        ((0.0, 0.0, 0.0, 10.0), 90.0),   # due east along the equator
        ((10.0, 0.0, 0.0, 0.0), 180.0),  # due south
        ((0.0, 10.0, 0.0, 0.0), 270.0),  # due west
    ]
    for (la1, lo1, la2, lo2), want in cases:
        got = _one(
            spark,
            initial_bearing_deg(
                F.lit(la1), F.lit(lo1), F.lit(la2), F.lit(lo2)),
        )
        assert abs(got - want) < 1e-9, (la1, lo1, la2, lo2)


def test_bearing_matches_scalar_formula(spark):
    from osm2world_spark.functions.projection import initial_bearing_deg

    pts = [(48.5, 13.4, 52.5, 13.3), (-33.9, 151.2, 35.7, 139.7),
           (1.0, -179.0, -1.0, 179.0)]
    for la1, lo1, la2, lo2 in pts:
        p1, p2 = math.radians(la1), math.radians(la2)
        dl = math.radians(lo2 - lo1)
        want = math.degrees(math.atan2(
            math.sin(dl) * math.cos(p2),
            math.cos(p1) * math.sin(p2)
            - math.sin(p1) * math.cos(p2) * math.cos(dl),
        )) % 360.0
        got = _one(
            spark,
            initial_bearing_deg(
                F.lit(la1), F.lit(lo1), F.lit(la2), F.lit(lo2)),
        )
        assert abs(got - want) < 1e-9


def test_polyline_length_equator_arc(spark):
    from osm2world_spark.functions.projection import geodesic_length_m

    # 3 degrees along the equator in 3 hops = R * 3deg exactly
    lats = F.array(*[F.lit(0.0)] * 4)
    lons = F.array(*[F.lit(float(i)) for i in range(4)])
    got = _one(spark, geodesic_length_m(lats, lons))
    want = R * math.radians(3.0)
    assert abs(got - want) / want < 1e-12


def test_polyline_length_degenerate(spark):
    from osm2world_spark.functions.projection import geodesic_length_m

    for arr in ([], [1.0]):
        lats = F.array(*[F.lit(v) for v in arr])
        got = _one(spark, geodesic_length_m(lats, lats))
        assert got == 0.0


def test_ring_area_equatorial_quad(spark):
    from osm2world_spark.functions.projection import geodesic_ring_area_m2

    # 1x1-degree quad on the equator; analytic spherical area =
    # R^2 * dlon * (sin lat2 - sin lat1)
    la = [0.0, 0.0, 1.0, 1.0, 0.0]
    lo = [0.0, 1.0, 1.0, 0.0, 0.0]
    got = _one(
        spark,
        geodesic_ring_area_m2(
            F.array(*[F.lit(v) for v in la]),
            F.array(*[F.lit(v) for v in lo]),
        ),
    )
    want = R * R * math.radians(1.0) * (math.sin(math.radians(1.0)) - 0.0)
    # Chamberlain-Duquette is a line-integral approximation of the true
    # spherical quad: agreement to ~1e-4 relative at 1-degree edges
    assert abs(got - want) / want < 2e-4
    # orientation-independent
    got_rev = _one(
        spark,
        geodesic_ring_area_m2(
            F.array(*[F.lit(v) for v in reversed(la)]),
            F.array(*[F.lit(v) for v in reversed(lo)]),
        ),
    )
    assert got == got_rev


def test_ring_area_matches_scalar_formula(spark):
    from osm2world_spark.functions.projection import geodesic_ring_area_m2

    la = [48.0, 48.0, 48.6, 48.9, 48.0]
    lo = [13.0, 13.8, 13.9, 13.2, 13.0]
    s = 0.0
    for i in range(len(la) - 1):
        s += (math.radians(lo[i + 1]) - math.radians(lo[i])) * (
            2.0 + math.sin(math.radians(la[i]))
            + math.sin(math.radians(la[i + 1]))
        )
    want = abs(s) * R * R / 2.0
    got = _one(
        spark,
        geodesic_ring_area_m2(
            F.array(*[F.lit(v) for v in la]),
            F.array(*[F.lit(v) for v in lo]),
        ),
    )
    assert abs(got - want) / want < 1e-12


def test_ring_area_degenerate(spark):
    from osm2world_spark.functions.projection import geodesic_ring_area_m2

    tri_open = [0.0, 1.0, 0.0]  # 3 vertices: not a closed ring (< 4)
    got = _one(
        spark,
        geodesic_ring_area_m2(
            F.array(*[F.lit(v) for v in tri_open]),
            F.array(*[F.lit(v) for v in tri_open]),
        ),
    )
    assert got == 0.0
