"""Golden coastline membership tests: the reference's OWN test scenes.

Replicates OSMToMapDataConverterTest.genericCoastlineTest
(/root/reference/core-jvm/src/test/java/org/osm2world/map_data/creation/
OSMToMapDataConverterTest.java:92-190): parse the checked-in
coastline_*.osm fixtures, build natural=water areas from the coastline
ways (bbox-clipped, direction-dependent), and assert the test's literal
land/water site membership truth tables — land sites in NO water polygon,
water sites in SOME water polygon.
"""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from osm2world_spark.functions.geometry import flatten, contains_point
from osm2world_spark.functions.projection import Origin, np_to_xz

FIXTURES = "/root/reference/core-jvm/src/test/resources"

# the reference test's literal site lists (file, land sites, water sites)
CASES = [
    (
        "coastline_big_island.osm",
        [(51.4946619, 2.1931507)],
        [(51.4994015, 2.183386), (51.4982682, 2.2522352),
         (51.4590992, 2.2500837), (51.4569336, 2.1838825)],
    ),
    (
        "coastline_islands.osm",
        [(51.4662933, 2.2364075), (51.4780457, 2.2009898)],
        [(51.4815502, 2.2271393), (51.4596942, 2.1930457)],
    ),
    (
        "coastline_islands_and_coast.osm",
        [(51.4957716, 2.2466687), (51.456188, 2.2522958),
         (51.4662933, 2.2364075), (51.4780457, 2.2009898)],
        [(51.4815502, 2.2271393), (51.4596942, 2.1930457)],
    ),
    (
        "coastline_multiple_coasts.osm",
        [(51.4730977, 2.2165471)],
        [(51.4654685, 2.2374005), (51.4978323, 2.1844396),
         (51.4555692, 2.2178711)],
    ),
]


def _load(filename):
    root = ET.parse(f"{FIXTURES}/{filename}").getroot()
    b = root.find("bounds")
    bounds = tuple(float(b.get(k)) for k in ("minlat", "minlon", "maxlat", "maxlon"))
    nodes = {
        n.get("id"): (float(n.get("lat")), float(n.get("lon")))
        for n in root.findall("node")
    }
    coastlines = []
    for w in root.findall("way"):
        tags = {t.get("k"): t.get("v") for t in w.findall("tag")}
        if tags.get("natural") == "coastline":
            coastlines.append([nodes[nd.get("ref")] for nd in w.findall("nd")])
    return bounds, coastlines


def _water_areas(spark, filename):
    from osm2world_spark.operators.rings import coastline_water_areas

    (minlat, minlon, maxlat, maxlon), coastlines = _load(filename)
    origin = Origin((minlat + maxlat) / 2, (minlon + maxlon) / 2)  # OSMData.getCenter
    # fileBoundary = projected bbox of the explicit bounds corners
    cx, cz = np_to_xz(np.array([minlat, maxlat]), np.array([minlon, maxlon]), origin)
    bminx, bmaxx = float(min(cx)), float(max(cx))
    bminz, bmaxz = float(min(cz)), float(max(cz))

    rows = []
    for i, way in enumerate(coastlines):
        lat = np.array([p[0] for p in way])
        lon = np.array([p[1] for p in way])
        x, z = np_to_xz(lat, lon, origin)
        coords = [float(c) for xz in zip(x, z) for c in xz]
        rows.append((filename, i, coords, bminx, bminz, bmaxx, bmaxz))
    df = spark.createDataFrame(
        rows,
        "group_id string, way_idx int, coords array<double>, "
        "minx double, minz double, maxx double, maxz double",
    )
    out = coastline_water_areas(df).collect()
    assert all(r["status"] == "ok" for r in out)
    geoms = [r["geom"] for r in out]
    assert geoms, f"{filename}: no water areas built"
    return origin, geoms


@pytest.mark.parametrize("filename,land,water", CASES)
def test_coastline_membership_golden(spark, filename, land, water):
    origin, geoms = _water_areas(spark, filename)

    def in_any_water(lat, lon):
        x, z = np_to_xz(np.array([lat]), np.array([lon]), origin)
        for g in geoms:
            flat = flatten([g])
            if contains_point(np.array([x[0]]), np.array([z[0]]), flat)[0]:
                return True
        return False

    for lat, lon in land:
        assert not in_any_water(lat, lon), f"{filename}: land site {lat},{lon} in water"
    for lat, lon in water:
        assert in_any_water(lat, lon), f"{filename}: water site {lat},{lon} not in water"
