"""Tests: nearest-surface attachment join (J11), ear-clip triangulation,
multipolygon ring assembly, LSQ interpolation, huge-area clip."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- attachment

def test_nearest_attach_min3d(spark):
    connectors = spark.createDataFrame(
        [("c1", 0.0, 0.0, 0.0), ("c2", 100.0, 5.0, 100.0), ("c3", 9000.0, 0.0, 9000.0)],
        "c_id string, x double, y double, z double",
    )
    surfaces = spark.createDataFrame(
        [
            ("s1", 3.0, 0.0, 4.0),     # dist3d from c1 = 5
            ("s2", 0.0, 2.0, 0.0),     # dist3d from c1 = 2  <- winner
            ("s3", 101.0, 5.0, 100.0), # dist3d from c2 = 1  <- winner
        ],
        "s_id string, x double, y double, z double",
    )
    from osm2world_spark.operators.attach import nearest_attach

    out = {r["c_id"]: r for r in nearest_attach(connectors, surfaces).collect()}
    assert out["c1"]["s_id"] == "s2" and out["c1"]["dist_3d"] == 2.0
    assert out["c2"]["s_id"] == "s3"
    assert "c3" not in out  # nothing within the 50 m radius


def test_nearest_attach_roof_rule(spark):
    """O2WConverterImpl.java:276-282: min XZ distance group (0.1 band),
    then MAX height wins — not the 3D-closest."""
    connectors = spark.createDataFrame(
        [("c1", 0.0, 0.0, 0.0)], "c_id string, x double, y double, z double"
    )
    surfaces = spark.createDataFrame(
        [
            ("low", 1.0, 1.0, 0.0),    # xz dist 1.0, y=1 (3D-closest)
            ("high", 1.05, 30.0, 0.0), # xz dist 1.05 (within 0.1 band), y=30
            ("far", 5.0, 100.0, 0.0),  # outside the band
        ],
        "s_id string, x double, y double, z double",
    )
    from osm2world_spark.operators.attach import nearest_attach

    rows = nearest_attach(connectors, surfaces, roof=True).collect()
    assert len(rows) == 1 and rows[0]["s_id"] == "high"
    rows3d = nearest_attach(connectors, surfaces, roof=False).collect()
    assert rows3d[0]["s_id"] == "low"


# ---------------------------------------------------------- triangulation

def _ring(pts):
    out = []
    for x, z in pts + [pts[0]]:
        out += [float(x), float(z)]
    return out


def _tri_area2(r):
    return (r["bx"] - r["ax"]) * (r["cz"] - r["az"]) - (r["cx"] - r["ax"]) * (r["bz"] - r["az"])


def test_triangulate_convex_and_concave(spark):
    concave = _ring([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])  # L, area 12
    convex = _ring([(0, 0), (2, 0), (2, 2), (0, 2)])  # square, area 4
    df = spark.createDataFrame(
        [("d1", 0, "area", [concave]), ("d2", 0, "area", [convex])],
        "doc_id string, span_idx int, element_type string, geom array<array<double>>",
    )
    from osm2world_spark.operators.triangulate import triangulate

    rows = triangulate(df).collect()
    by_eid = {}
    for r in rows:
        by_eid.setdefault(r["eid"], []).append(r)
    assert len(by_eid["d1#0"]) == 6 - 2
    assert len(by_eid["d2#0"]) == 4 - 2
    assert sum(_tri_area2(r) for r in by_eid["d1#0"]) / 2.0 == pytest.approx(12.0)
    assert sum(_tri_area2(r) for r in by_eid["d2#0"]) / 2.0 == pytest.approx(4.0)
    for r in rows:  # all CCW
        assert _tri_area2(r) > 0


def test_triangulate_with_hole(spark):
    outer = _ring([(0, 0), (10, 0), (10, 10), (0, 10)])
    hole = _ring([(4, 4), (6, 4), (6, 6), (4, 6)])
    df = spark.createDataFrame(
        [("d1", 0, "area", [outer, hole])],
        "doc_id string, span_idx int, element_type string, geom array<array<double>>",
    )
    from osm2world_spark.operators.triangulate import triangulate

    rows = triangulate(df).collect()
    total = sum(_tri_area2(r) for r in rows) / 2.0
    assert total == pytest.approx(100.0 - 4.0)


# -------------------------------------------------------- ring assembly

def test_assemble_two_hole_multipolygon(spark):
    """The mp_two_holes structural fixture
    (OSMToMapDataConverterTest.java:50-64): 1 area, 2 holes, assembled
    from split unclosed way fragments with mixed directions."""
    def seg(pts):
        return [float(c) for p in pts for c in p]

    ways = [
        # outer 0..100 square split into 3 fragments, one reversed
        ("r1", 0, seg([(0, 0), (100, 0), (100, 100)])),
        ("r1", 1, seg([(0, 100), (100, 100)])),          # reversed direction
        ("r1", 2, seg([(0, 0), (0, 100)])),               # reversed direction
        # hole A closed way
        ("r1", 3, seg([(10, 10), (30, 10), (30, 30), (10, 30), (10, 10)])),
        # hole B split into two fragments
        ("r1", 4, seg([(50, 50), (70, 50), (70, 70)])),
        ("r1", 5, seg([(70, 70), (50, 70), (50, 50)])),
        # r2: unclosable (quarantined)
        ("r2", 0, seg([(0, 0), (1, 0)])),
        ("r2", 1, seg([(5, 5), (6, 5)])),
    ]
    df = spark.createDataFrame(ways, "rel_id string, way_idx int, coords array<double>")
    from osm2world_spark.operators.rings import assemble_multipolygons

    out = {(r["rel_id"], r["area_idx"]): r for r in assemble_multipolygons(df).collect()}
    ok = out[("r1", 0)]
    assert ok["status"] == "ok"
    assert ok["n_holes"] == 2
    geom = ok["geom"]
    assert len(geom) == 3
    # winding: outer CCW (positive shoelace), holes CW
    def area2(ring):
        xs, zs = np.asarray(ring[0::2]), np.asarray(ring[1::2])
        return np.dot(xs[:-1], zs[1:]) - np.dot(xs[1:], zs[:-1])

    assert area2(geom[0]) > 0
    assert area2(geom[1]) < 0 and area2(geom[2]) < 0
    assert abs(area2(geom[0])) / 2 == pytest.approx(10000.0)
    hole_areas = sorted(abs(area2(g)) / 2 for g in geom[1:])
    assert hole_areas == [pytest.approx(400.0), pytest.approx(400.0)]
    assert out[("r2", 0)]["status"] == "unclosed"


def test_assemble_nested_islands(spark):
    """Ring nesting depth 3: outer, hole, island-in-hole -> two areas
    (buildPolygonsFromRings peeling, MultipolygonAreaBuilder.java:258-335)."""
    def ring(cx, r_):
        pts = [(cx - r_, cx - r_), (cx + r_, cx - r_), (cx + r_, cx + r_), (cx - r_, cx + r_)]
        return [float(c) for p in pts + [pts[0]] for c in p]

    ways = [
        ("r1", 0, ring(50, 50)),   # outer 100x100
        ("r1", 1, ring(50, 20)),   # hole 40x40
        ("r1", 2, ring(50, 5)),    # island 10x10 inside the hole
    ]
    df = spark.createDataFrame(ways, "rel_id string, way_idx int, coords array<double>")
    from osm2world_spark.operators.rings import assemble_multipolygons

    rows = sorted(
        assemble_multipolygons(df).collect(), key=lambda r: r["area_idx"]
    )
    assert [r["status"] for r in rows] == ["ok", "ok"]
    assert rows[0]["n_holes"] == 1     # outer + hole
    assert rows[1]["n_holes"] == 0     # island alone


# --------------------------------------------------------------- LSQ fit

def test_lsq_interpolate_recovers_quadratic(spark):
    """Sites on an exact quadratic surface: the per-site fits and the
    29-NN blend must reproduce the surface (up to float noise)."""
    rng = []
    for i in range(12):
        for j in range(12):
            x, z = i * 10.0, j * 10.0
            y = 2.0 + 0.1 * x + 0.05 * z + 0.001 * x * x
            rng.append((f"s{i}_{j}", x, z, y))
    sites = spark.createDataFrame(rng, "s_id string, x double, z double, y double")
    queries = spark.createDataFrame(
        [("q1", 55.0, 55.0), ("q2", 20.0, 80.0)], "q_id string, x double, z double"
    )
    from osm2world_spark.operators.knn import lsq_interpolate

    out = {r["q_id"]: r["ele"] for r in lsq_interpolate(queries, sites).collect()}
    for qid, (x, z) in {"q1": (55.0, 55.0), "q2": (20.0, 80.0)}.items():
        expect = 2.0 + 0.1 * x + 0.05 * z + 0.001 * x * x
        assert out[qid] == pytest.approx(expect, abs=1e-6)


# --------------------------------------------------------- huge-area clip

def test_shrink_huge_areas(spark):
    """OSMToMapDataConverter.shrinkHugeAreas: only areas whose bbox exceeds
    5x the dataset boundary (node extent) are clipped, to the boundary
    padded by 1.0 (:85-86)."""
    def rect(x0, z0, x1, z1):
        return [[float(c) for c in (x0, z0, x1, z0, x1, z1, x0, z1, x0, z0)]]

    rows = [
        # node extent defines the boundary: (0,0)..(10,10), area 100
        ("n1", 0, "node", [[0.0, 0.0]], 0.0, 0.0, 0.0, 0.0),
        ("n2", 0, "node", [[10.0, 10.0]], 10.0, 10.0, 10.0, 10.0),
        ("a1", 0, "area", rect(0, 0, 10, 10), 0.0, 0.0, 10.0, 10.0),      # 100 = 1x, kept
        ("huge", 0, "area", rect(-500, -500, 500, 500), -500.0, -500.0, 500.0, 500.0),  # 1e6 > 5x
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, span_idx int, element_type string, geom array<array<double>>, "
        "minx double, minz double, maxx double, maxz double",
    )
    from osm2world_spark.operators.clip import shrink_huge_areas

    out = {r["doc_id"]: r for r in shrink_huge_areas(df).collect()}
    assert not out["a1"]["clipped"]
    assert out["a1"]["geom"] == rect(0, 0, 10, 10)
    assert out["huge"]["clipped"]
    ring = np.asarray(out["huge"]["geom"][0])
    # clipped to the padded boundary rectangle (-1..11)
    assert ring[0::2].min() == -1.0 and ring[0::2].max() == 11.0
    assert ring[1::2].min() == -1.0 and ring[1::2].max() == 11.0
    # bbox columns recomputed
    assert out["huge"]["minx"] == -1.0 and out["huge"]["maxx"] == 11.0
