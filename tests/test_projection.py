"""Projection tests mirroring the reference's AbstractMapProjectionTest /
MetricMapProjectionTest (core-jvm/src/test/java/org/osm2world/math/geo/)."""

import numpy as np
import pytest

from osm2world_spark.functions.projection import Origin, np_to_latlon, np_to_xz, py_to_xz

DELTA = 1e-6  # AbstractMapProjectionTest.java:20


@pytest.mark.parametrize("origin", [Origin(0, 0), Origin(80, -170), Origin(-55, 33)])
def test_origin_and_axes(origin):
    # AbstractMapProjectionTest.testOriginAndAxes
    x, z = py_to_xz(origin.lat, origin.lon, origin)
    assert x == pytest.approx(0.0, abs=1e-3)  # mm snap
    assert z == pytest.approx(0.0, abs=1e-3)

    lat, lon = np_to_latlon(np.array([0.0]), np.array([0.0]), origin)
    assert lat[0] == pytest.approx(origin.lat, abs=DELTA)
    assert lon[0] == pytest.approx(origin.lon, abs=DELTA)

    # 1 m north: lat increases, lon unchanged
    lat_n, lon_n = np_to_latlon(np.array([x]), np.array([z + 1.0]), origin)
    assert lat_n[0] > origin.lat
    assert lon_n[0] == pytest.approx(origin.lon, abs=DELTA)

    # 1 m east: lon increases, lat unchanged
    lat_e, lon_e = np_to_latlon(np.array([x + 1.0]), np.array([z]), origin)
    assert lon_e[0] > origin.lon
    assert lat_e[0] == pytest.approx(origin.lat, abs=DELTA)


def test_mm_snap():
    # MetricMapProjection.java:37-39 — coordinates snap to exactly 3 decimals
    origin = Origin(48.56687, 13.45127)
    lat = np.linspace(48.52, 48.62, 1000)
    lon = np.linspace(13.37, 13.50, 1000)
    x, z = np_to_xz(lat, lon, origin)
    assert np.allclose(x * 1000, np.round(x * 1000), atol=1e-9)
    assert np.allclose(z * 1000, np.round(z * 1000), atol=1e-9)


def test_roundtrip():
    origin = Origin(48.56687, 13.45127)
    lat = np.array([48.52, 48.56687, 48.6199])
    lon = np.array([13.37, 13.45127, 13.4999])
    x, z = np_to_xz(lat, lon, origin)
    lat2, lon2 = np_to_latlon(x, z, origin)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)


def test_metric_scale():
    # ~1 unit = 1 m near the origin (MapProjection.java:9-14)
    origin = Origin(48.56687, 13.45127)
    # 0.001 deg of latitude ~ 111.19 m * mercator distortion correction;
    # at the origin latitude the local scale is ~1 m per unit
    x1, z1 = py_to_xz(48.566, 13.45, origin)
    x2, z2 = py_to_xz(48.567, 13.45, origin)
    meters_per_deg_lat = abs(z2 - z1) / 0.001
    assert 90_000 < meters_per_deg_lat < 130_000


class TestOrthographicAzimuthal:
    """OrthographicAzimuthalMapProjection parity: the Java formulas
    (:35-80) evaluated in plain math are the oracle; the Column and numpy
    variants must match, round-trip, and be selectable in extraction."""

    ORIGIN = None  # set in setup

    def _origin(self):
        from osm2world_spark.functions.projection import Origin

        return Origin(48.56687, 13.45127)

    def _java_fwd(self, lat, lon, origin):
        import math

        R = 6371000.0
        lat0, lon0 = math.radians(origin.lat), math.radians(origin.lon)
        la, lo = math.radians(lat), math.radians(lon)
        x = R * math.cos(la) * math.sin(lo - lon0)
        z = R * (math.cos(lat0) * math.sin(la) - math.sin(lat0) * math.cos(la) * math.cos(lo - lon0))
        return x, z

    def test_numpy_matches_java_formula(self):
        import numpy as np

        from osm2world_spark.functions.projection import np_ortho_to_xz

        o = self._origin()
        pts = [(48.56687, 13.45127), (48.6, 13.5), (48.5, 13.3), (47.0, 12.0), (50.0, 15.0)]
        lat = np.array([p[0] for p in pts])
        lon = np.array([p[1] for p in pts])
        x, z = np_ortho_to_xz(lat, lon, o)
        for i, (la, lo) in enumerate(pts):
            jx, jz = self._java_fwd(la, lo, o)
            assert x[i] == jx and z[i] == jz  # identical double math
        # origin projects to (0, 0) exactly
        assert x[0] == 0.0 and z[0] == 0.0

    def test_roundtrip_and_column_twin(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from osm2world_spark.functions.projection import (
            np_ortho_to_latlon,
            np_ortho_to_xz,
            ortho_to_lat,
            ortho_to_lon,
            ortho_to_x,
            ortho_to_z,
        )

        o = self._origin()
        lat = np.linspace(48.0, 49.0, 21)
        lon = np.linspace(13.0, 14.0, 21)
        x, z = np_ortho_to_xz(lat, lon, o)
        rlat, rlon = np_ortho_to_latlon(x, z, o)
        np.testing.assert_allclose(rlat, lat, atol=1e-9)
        np.testing.assert_allclose(rlon, lon, atol=1e-9)

        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
        )
        got = df.select(
            ortho_to_x(F.col("lat"), F.col("lon"), o).alias("x"),
            ortho_to_z(F.col("lat"), F.col("lon"), o).alias("z"),
        ).collect()
        for r, xe, ze in zip(got, x, z):
            assert r["x"] == xe and r["z"] == ze  # Column twin bit-equal
        inv = df.select(
            ortho_to_lat(
                ortho_to_x(F.col("lat"), F.col("lon"), o),
                ortho_to_z(F.col("lat"), F.col("lon"), o),
                o,
            ).alias("rlat")
        ).collect()
        for r, la in zip(inv, lat):
            assert abs(r["rlat"] - la) < 1e-9

    def test_selectable_in_extraction(self, spark):
        from pyspark.sql import functions as F

        from osm2world_spark.sources.documents import (
            DOCS_SCHEMA,
            extract_elements,
        )

        docs = spark.createDataFrame(
            [("d1", [{"kind": "geo_point", "text": "48.6,13.5", "media_ref": "", "offset": 0}])],
            DOCS_SCHEMA,
        )
        metric = extract_elements(docs).first()
        ortho = extract_elements(docs, projection="OrthographicAzimuthalMapProjection").first()
        jx, jz = self._java_fwd(48.6, 13.5, self._origin())
        assert ortho["geom"][0][0] == jx and ortho["geom"][0][1] == jz
        assert metric["geom"][0] != ortho["geom"][0]  # projections differ
