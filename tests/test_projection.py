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
