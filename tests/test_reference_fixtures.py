"""Golden-parity tests against the reference's own regression fixtures.

Replicates OSMToMapDataConverterTest.genericMultipolygonTest
(/root/reference/core-jvm/src/test/java/org/osm2world/map_data/creation/
OSMToMapDataConverterTest.java:50-64) using the literal node coordinates
from `mp_two_holes.osm` and the split-way topology of
`mp_two_holes_advanced.osm` (core-jvm/src/test/resources/). Golden
assertions: 13 nodes, 1 area, 2 holes, 6-vertex outer ring, 13 area
segments.
"""

import numpy as np
import pytest

from osm2world_spark.functions.projection import Origin, np_to_xz

# node id -> (lat, lon), verbatim from mp_two_holes_advanced.osm
NODES = {
    -91: (-0.07581557682818, 0.4917680487045985),
    -89: (-0.07574827819085664, 0.4918306521429082),
    -87: (-0.07574827819085664, 0.49193903434548186),
    -85: (-0.07580031725344245, 0.4920043766842175),
    -83: (-0.07588287546538634, 0.4919233834859045),
    -81: (-0.07588170165194749, 0.49181343619737306),
    -79: (-0.07577762352690895, 0.49183534740078144),
    -77: (-0.07584022691042076, 0.4918173489122674),
    -75: (-0.07585705156972414, 0.4918549109752532),
    -73: (-0.07578310132296985, 0.4919362954450558),
    -71: (-0.07577214573084735, 0.4918764309071722),
    -69: (-0.07585509521399153, 0.49187212692078847),
    -67: (-0.0758398356392741, 0.4919413819744184),
}

# the advanced variant's member ways (mixed closed/unclosed fragments)
WAYS = {
    -97: [-91, -89, -87, -85, -83],          # outer fragment
    -100: [-83, -81, -91],                    # outer fragment (closes it)
    -93: [-73, -71, -69],                     # inner fragment
    -103: [-69, -67, -73],                    # inner fragment (closes it)
    -95: [-79, -75, -77, -79],                # inner, already closed
}
MEMBER_ORDER = [-97, -100, -93, -103, -95]


def _metric(node_ids):
    lat = np.array([NODES[n][0] for n in node_ids])
    lon = np.array([NODES[n][1] for n in node_ids])
    # per-dataset origin = node-position center (OSMData.getCenter analogue)
    all_lat = np.array([v[0] for v in NODES.values()])
    all_lon = np.array([v[1] for v in NODES.values()])
    org = Origin(float(all_lat.mean()), float(all_lon.mean()))
    x, z = np_to_xz(lat, lon, org)
    return [float(c) for xy in zip(x, z) for c in xy]


def test_mp_two_holes_advanced_assembly(spark):
    from osm2world_spark.operators.rings import assemble_multipolygons

    rows = [
        ("r", i, _metric(WAYS[w])) for i, w in enumerate(MEMBER_ORDER)
    ]
    df = spark.createDataFrame(rows, "rel_id string, way_idx int, coords array<double>")
    out = assemble_multipolygons(df).collect()

    # 1 area (OSMToMapDataConverterTest.java:56)
    assert len(out) == 1
    area = out[0]
    assert area["status"] == "ok"
    # 2 holes (:60)
    assert area["n_holes"] == 2
    geom = area["geom"]
    # outer polygon has 6 vertices (:61)
    outer = np.asarray(geom[0]).reshape(-1, 2)
    assert len(outer) - 1 == 6
    # 13 area segments total (:62) and 13 distinct nodes (:54)
    n_segments = sum(len(np.asarray(r).reshape(-1, 2)) - 1 for r in geom)
    assert n_segments == 13
    distinct = {tuple(p) for r in geom for p in np.asarray(r).reshape(-1, 2)}
    assert len(distinct) == 13
    # winding: outer CCW, holes CW (MapArea.java:113-115)
    def signed2(r):
        arr = np.asarray(r).reshape(-1, 2)
        return np.dot(arr[:-1, 0], arr[1:, 1]) - np.dot(arr[1:, 0], arr[:-1, 1])

    assert signed2(geom[0]) > 0
    assert signed2(geom[1]) < 0 and signed2(geom[2]) < 0


def test_mp_two_holes_membership(spark):
    """Point-membership truth: hole interiors are NOT inside the polygon,
    the outer/hole annulus is (the coastline-test style point checks,
    OSMToMapDataConverterTest.java:92-190 applied to the mp scene)."""
    from osm2world_spark.functions.geometry import contains_point, flatten
    from osm2world_spark.operators.rings import assemble_multipolygons

    rows = [("r", i, _metric(WAYS[w])) for i, w in enumerate(MEMBER_ORDER)]
    df = spark.createDataFrame(rows, "rel_id string, way_idx int, coords array<double>")
    geom = assemble_multipolygons(df).collect()[0]["geom"]

    flat = flatten([geom])
    rings = [np.asarray(r).reshape(-1, 2) for r in geom]
    outer_c = rings[0][:-1].mean(axis=0)
    hole1_c = rings[1][:-1].mean(axis=0)
    hole2_c = rings[2][:-1].mean(axis=0)
    # hole centroids: inside the outer ring but NOT in the polygon
    assert not contains_point(
        np.array([hole1_c[0]]), np.array([hole1_c[1]]), flat
    )[0]
    assert not contains_point(
        np.array([hole2_c[0]]), np.array([hole2_c[1]]), flat
    )[0]
    # a point between the outer ring and the holes IS inside: probe a
    # point near the outer boundary, just inside it
    edge_mid = (rings[0][0] + rings[0][1]) / 2
    inward = outer_c - edge_mid
    probe = edge_mid + 0.05 * inward
    assert contains_point(np.array([probe[0]]), np.array([probe[1]]), flat)[0]
