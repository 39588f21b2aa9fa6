"""Coastline -> water-area assembly tests
(MultipolygonAreaBuilder.createAreasForCoastlines semantics)."""

import numpy as np
import pytest


def _area2(ring):
    xs, zs = np.asarray(ring[0::2]), np.asarray(ring[1::2])
    return float(np.dot(xs[:-1], zs[1:]) - np.dot(xs[1:], zs[:-1]))


def _ways_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "group_id string, way_idx int, coords array<double>, "
        "minx double, minz double, maxx double, maxz double",
    )


def test_coastline_crossing_bbox(spark):
    """A west->east coastline through the bbox: water on the RIGHT of the
    direction of travel = the southern half."""
    from osm2world_spark.operators.rings import coastline_water_areas

    bbox = (0.0, 0.0, 100.0, 100.0)
    coast = [float(c) for p in [(-10, 50), (50, 50), (110, 50)] for c in p]
    df = _ways_df(spark, [("g1", 0, coast, *bbox)])
    rows = coastline_water_areas(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "ok" and r["n_holes"] == 0
    outer = r["geom"][0]
    area = abs(_area2(outer)) / 2
    assert area == pytest.approx(100.0 * 50.0)  # southern half
    zs = np.asarray(outer[1::2])
    assert zs.min() == 0.0 and zs.max() == 50.0  # south of the coastline


def test_coastline_closed_lake(spark):
    """A closed clockwise coastline ring (water inside) with no bbox
    crossing -> the lake polygon itself."""
    from osm2world_spark.operators.rings import coastline_water_areas

    bbox = (0.0, 0.0, 100.0, 100.0)
    # clockwise ring (water on the right = inside)
    pts = [(20, 20), (20, 80), (80, 80), (80, 20), (20, 20)]
    coast = [float(c) for p in pts for c in p]
    df = _ways_df(spark, [("g1", 0, coast, *bbox)])
    rows = coastline_water_areas(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "ok" and r["n_holes"] == 0
    assert abs(_area2(r["geom"][0])) / 2 == pytest.approx(60.0 * 60.0)


def test_coastline_island(spark):
    """A counterclockwise closed coastline (land inside = island) with no
    bbox crossing -> bbox water polygon with the island as a hole
    (MultipolygonAreaBuilder.java:565-597)."""
    from osm2world_spark.operators.rings import coastline_water_areas

    bbox = (0.0, 0.0, 100.0, 100.0)
    pts = [(40, 40), (60, 40), (60, 60), (40, 60), (40, 40)]  # CCW = island
    coast = [float(c) for p in pts for c in p]
    df = _ways_df(spark, [("g1", 0, coast, *bbox)])
    rows = coastline_water_areas(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "ok" and r["n_holes"] == 1
    assert abs(_area2(r["geom"][0])) / 2 == pytest.approx(100.0 * 100.0)
    assert abs(_area2(r["geom"][1])) / 2 == pytest.approx(400.0)


def test_coastline_multiple_groups_parallel(spark):
    """Groups (tiles) process independently."""
    from osm2world_spark.operators.rings import coastline_water_areas

    bbox = (0.0, 0.0, 100.0, 100.0)
    coast = [float(c) for p in [(-10, 50), (110, 50)] for c in p]
    lake = [float(c) for p in [(20, 20), (20, 80), (80, 80), (80, 20), (20, 20)] for c in p]
    df = _ways_df(spark, [("t1", 0, coast, *bbox), ("t2", 0, lake, *bbox)])
    rows = {r["rel_id"]: r for r in coastline_water_areas(df).collect()}
    assert rows["t1"]["status"] == "ok"
    assert rows["t2"]["status"] == "ok"
