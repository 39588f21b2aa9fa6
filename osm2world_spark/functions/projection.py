"""Geo -> local metric planar projection (and inverse).

Reproduces the reference's MetricMapProjection exactly (file:line into
/root/reference/core/src/main/java/org/osm2world/math/geo/):
- MercatorProjection.java:27-51 — normalized spherical Mercator in [0..1]:
  x = (lon+180)/360,  y = ln((1+sin phi)/(1-sin phi)) / (4 pi) + 0.5
- MercatorProjection.java:15,20-22 — scale = EARTH_CIRCUMFERENCE * cos(lat0),
  EARTH_CIRCUMFERENCE = 40075016.686
- MetricMapProjection.java:30-43 — x/z = scaled, origin-shifted, then
  snapped to mm: round(v*1000)/1000 (the determinism device; replicated
  bit-for-bit so golden outputs match row-for-row)

X points east, Z points north (the reference's XZ ground plane). ~1 unit
= 1 m near the origin. The origin is a per-dataset (or per-tile) constant
chosen deterministically, so the projection constants constant-fold into
the Catalyst plan — no UDF needed for the hot path.

Numpy twins power the Arrow-batched geometry kernels, which project packed
coordinate arrays wholesale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_CIRCUMFERENCE = 40075016.686  # MercatorProjection.java:15


@dataclass(frozen=True)
class Origin:
    """Per-dataset projection origin (MetricMapProjection.java:16-23)."""

    lat: float
    lon: float

    @property
    def scale(self) -> float:
        return EARTH_CIRCUMFERENCE * math.cos(math.radians(self.lat))

    @property
    def origin_x(self) -> float:
        return (self.lon + 180.0) / 360.0 * self.scale

    @property
    def origin_y(self) -> float:
        sin_lat = math.sin(math.radians(self.lat))
        return (math.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * math.pi) + 0.5) * self.scale


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


# -------------------------------------------------------- Column variants

def to_x(lon, origin: Origin) -> Column:
    """lon -> metric X (east), mm-snapped (MetricMapProjection.java:33,37)."""
    lon = _lit(lon)
    x = (lon + 180.0) / 360.0 * origin.scale - origin.origin_x
    # Java Math.round == floor(v + 0.5); keeps the Column and numpy
    # variants bit-identical even at exact .5 mm boundaries
    return F.floor(x * 1000.0 + 0.5) / 1000.0


def to_z(lat, origin: Origin) -> Column:
    """lat -> metric Z (north), mm-snapped (MetricMapProjection.java:34,38)."""
    rad = F.radians(_lit(lat))
    y01 = F.log((1.0 + F.sin(rad)) / (1.0 - F.sin(rad))) / (4.0 * math.pi) + 0.5
    z = y01 * origin.scale - origin.origin_y
    return F.floor(z * 1000.0 + 0.5) / 1000.0


def to_lon(x, origin: Origin) -> Column:
    """metric X -> lon (MetricMapProjection.java:55-61, xToLon)."""
    x01 = (_lit(x) + origin.origin_x) / origin.scale
    return 360.0 * (x01 - 0.5)


def to_lat(z, origin: Origin) -> Column:
    """metric Z -> lat (MetricMapProjection.java:46-52, yToLat)."""
    y01 = (_lit(z) + origin.origin_y) / origin.scale
    return 360.0 * F.atan(F.exp((y01 - 0.5) * (2.0 * math.pi))) / math.pi - 90.0


# --------------------------------------------------------- numpy variants

def np_to_xz(lat: np.ndarray, lon: np.ndarray, origin: Origin) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized forward projection over coordinate arrays; exact twin of
    the Column variant (same formula, same mm snap)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = (lon + 180.0) / 360.0 * origin.scale - origin.origin_x
    sin_lat = np.sin(np.radians(lat))
    y01 = np.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * np.pi) + 0.5
    z = y01 * origin.scale - origin.origin_y
    # Math.round = floor(v + 0.5) for doubles; np.round is half-even, so
    # replicate Java semantics explicitly (MetricMapProjection.java:37-39).
    x = np.floor(x * 1000.0 + 0.5) / 1000.0
    z = np.floor(z * 1000.0 + 0.5) / 1000.0
    return x, z


def np_to_latlon(x: np.ndarray, z: np.ndarray, origin: Origin) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    x01 = (x + origin.origin_x) / origin.scale
    y01 = (z + origin.origin_y) / origin.scale
    lon = 360.0 * (x01 - 0.5)
    lat = 360.0 * np.arctan(np.exp((y01 - 0.5) * (2.0 * np.pi))) / np.pi - 90.0
    return lat, lon


def py_to_xz(lat: float, lon: float, origin: Origin) -> tuple[float, float]:
    x, z = np_to_xz(np.array([lat]), np.array([lon]), origin)
    return float(x[0]), float(z[0])


# ----------------------------------------- orthographic azimuthal variant

GLOBE_RADIUS = 6371000.0  # OrthographicAzimuthalMapProjection.java:14


def ortho_to_x(lat, lon, origin: Origin) -> Column:
    """Orthographic-azimuthal forward X (east), the reference's alternative
    projection (OrthographicAzimuthalMapProjection.java:35-47): plane
    touching the globe at the origin. No mm snap — only the metric
    projection snaps (MetricMapProjection.java:37-39)."""
    lat_r = F.radians(_lit(lat))
    lon_r = F.radians(_lit(lon))
    return GLOBE_RADIUS * F.cos(lat_r) * F.sin(lon_r - math.radians(origin.lon))


def ortho_to_z(lat, lon, origin: Origin) -> Column:
    """Orthographic-azimuthal forward Z (north),
    OrthographicAzimuthalMapProjection.java:43."""
    lat0 = math.radians(origin.lat)
    lat_r = F.radians(_lit(lat))
    lon_r = F.radians(_lit(lon))
    return GLOBE_RADIUS * (
        math.cos(lat0) * F.sin(lat_r)
        - math.sin(lat0) * F.cos(lat_r) * F.cos(lon_r - math.radians(origin.lon))
    )


def ortho_to_lat(x, z, origin: Origin) -> Column:
    """Inverse lat (OrthographicAzimuthalMapProjection.java:50-63): rho=0
    (the exact origin) returns the origin latitude."""
    x, z = _lit(x), _lit(z)
    lat0 = math.radians(origin.lat)
    rho = F.sqrt(x * x + z * z)
    c = F.asin(rho / GLOBE_RADIUS)
    return F.when(rho > 0, F.degrees(
        F.asin(F.cos(c) * math.sin(lat0) + (z * F.sin(c) * math.cos(lat0)) / rho)
    )).otherwise(F.lit(origin.lat))


def ortho_to_lon(x, z, origin: Origin) -> Column:
    """Inverse lon (OrthographicAzimuthalMapProjection.java:66-80): the
    |div| <= 1e-5 degenerate band returns the origin longitude."""
    x, z = _lit(x), _lit(z)
    lat0 = math.radians(origin.lat)
    rho = F.sqrt(x * x + z * z)
    c = F.asin(rho / GLOBE_RADIUS)
    div = rho * math.cos(lat0) * F.cos(c) - z * math.sin(lat0) * F.sin(c)
    return F.when(
        F.abs(div) > 1e-5,
        F.degrees(F.lit(math.radians(origin.lon)) + F.atan2(x * F.sin(c), div)),
    ).otherwise(F.lit(origin.lon))


def np_ortho_to_xz(lat: np.ndarray, lon: np.ndarray, origin: Origin) -> tuple[np.ndarray, np.ndarray]:
    """Numpy twin of the orthographic forward projection (same formula as
    the Column variant; used by the Arrow-batched extraction kernel)."""
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat0 = math.radians(origin.lat)
    lon0 = math.radians(origin.lon)
    x = GLOBE_RADIUS * np.cos(lat_r) * np.sin(lon_r - lon0)
    z = GLOBE_RADIUS * (
        math.cos(lat0) * np.sin(lat_r) - math.sin(lat0) * np.cos(lat_r) * np.cos(lon_r - lon0)
    )
    return x, z


def np_ortho_to_latlon(x: np.ndarray, z: np.ndarray, origin: Origin) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lat0 = math.radians(origin.lat)
    rho = np.sqrt(x * x + z * z)
    c = np.arcsin(rho / GLOBE_RADIUS)
    with np.errstate(invalid="ignore", divide="ignore"):
        lat = np.degrees(
            np.arcsin(np.cos(c) * math.sin(lat0) + (z * np.sin(c) * math.cos(lat0)) / rho)
        )
        div = rho * math.cos(lat0) * np.cos(c) - z * math.sin(lat0) * np.sin(c)
        lon = np.degrees(math.radians(origin.lon) + np.arctan2(x * np.sin(c), div))
    lat = np.where(rho > 0, lat, origin.lat)
    lon = np.where(np.abs(div) > 1e-5, lon, origin.lon)
    return lat, lon


def np_projection(name: str):
    """Config-dispatched projection factory, mirroring O2WConfig
    mapProjection (O2WConfig.java:465-470): the named class selects the
    implementation, anything else falls back to the metric default.
    Returns the numpy forward (lat, lon, origin) -> (x, z).

    Resolves through the strategy registry (registry.py) so user-registered
    projections are reachable from the same config strings; unknown names
    keep the reference's fall-back-to-metric-default behavior
    (O2WConfig.java:465-470 default arm)."""
    from ..registry import resolve

    try:
        return resolve("projection", name)
    except ValueError:
        return np_to_xz


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters between two WGS84 points
    (haversine form, mean earth radius 6371008.8 m — the IUGG mean;
    the reference's planar pipeline projects first and measures in the
    projected plane, so this is the engine's pre-projection companion
    for continent-scale distances where a metric tile projection does
    not exist yet).

    Pure Column trig. Numerically stable at small distances (haversine
    avoids the cos-law cancellation); antipodal points are exact to
    the asin clamp. Cross-engine note: sin/cos/asin agree between the
    JVM and libm on this pipeline's value ranges (the same contract
    the Mercator log/tan queries rely on); snap outputs if a hash
    boundary ever flips."""
    # explicit deg->rad constant (not F.radians): Java toRadians computes
    # x/180*pi while other engines precompute x*(pi/180) — a one-ulp skew
    # this form removes by pinning the exact multiply in both
    d2r = F.lit(0.017453292519943295)
    rlat1, rlat2 = lat1 * d2r, lat2 * d2r
    dlat = lat2 * d2r - lat1 * d2r
    dlon = lon2 * d2r - lon1 * d2r
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * 6371008.8) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def initial_bearing_deg(lat1, lon1, lat2, lon2) -> Column:
    """Forward azimuth from point 1 toward point 2 on the great circle,
    degrees clockwise from north in [0, 360). The navigation companion
    to ``haversine_m`` (same d2r idiom, same cross-engine trig
    contract): theta = atan2(sin dlon * cos lat2,
    cos lat1 * sin lat2 - sin lat1 * cos lat2 * cos dlon)."""
    d2r = F.lit(0.017453292519943295)
    rlat1, rlat2 = lat1 * d2r, lat2 * d2r
    dlon = lon2 * d2r - lon1 * d2r
    y = F.sin(dlon) * F.cos(rlat2)
    x = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    deg = F.atan2(y, x) / d2r
    return F.pmod(deg, F.lit(360.0))


def geodesic_length_m(lats, lons) -> Column:
    """Great-circle length in meters of a lat/lon polyline given as two
    aligned array Columns — the haversine fold over consecutive vertex
    pairs (zip_with the arrays against their tails; a NULL-free exact
    expression tree, no explode, no shuffle). Polylines with fewer than
    two vertices have length 0."""
    n = F.size(lats)
    m = F.greatest(n - 1, F.lit(0))
    seg = F.zip_with(
        F.slice(lats, 1, m),
        F.slice(lons, 1, m),
        lambda la, lo: F.struct(la.alias("la"), lo.alias("lo")),
    )
    nxt = F.zip_with(
        F.slice(lats, 2, m),
        F.slice(lons, 2, m),
        lambda la, lo: F.struct(la.alias("la"), lo.alias("lo")),
    )
    d = F.zip_with(
        seg, nxt,
        lambda a, b: haversine_m(a["la"], a["lo"], b["la"], b["lo"]),
    )
    total = F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(n >= 2, total).otherwise(F.lit(0.0))


def geodesic_ring_area_m2(lats, lons) -> Column:
    """Spherical polygon area in m^2 of a closed lat/lon ring (first
    vertex repeated last), via the Chamberlain-Duquette 2007 spherical
    shoelace: area = R^2/2 * |sum over edges of
    (lon2 - lon1) * (2 + sin lat1 + sin lat2)| with everything in
    radians — the formula GDAL/turf.js use for geodesic_area. Exact for
    rings that do not cross the antimeridian (the engine's documented
    boundary, like the reference's planar pipeline); orientation folds
    away under the absolute value. Pure expression tree: one zip_with
    against the shifted ring and a fold — zero shuffles at any corpus
    size."""
    d2r = F.lit(0.017453292519943295)
    n = F.size(lats)
    m = F.greatest(n - 1, F.lit(0))
    cur = F.zip_with(
        F.slice(lats, 1, m),
        F.slice(lons, 1, m),
        lambda la, lo: F.struct(la.alias("la"), lo.alias("lo")),
    )
    nxt = F.zip_with(
        F.slice(lats, 2, m),
        F.slice(lons, 2, m),
        lambda la, lo: F.struct(la.alias("la"), lo.alias("lo")),
    )
    terms = F.zip_with(
        cur, nxt,
        lambda a, b: (b["lo"] * d2r - a["lo"] * d2r)
        * (F.lit(2.0) + F.sin(a["la"] * d2r) + F.sin(b["la"] * d2r)),
    )
    s = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    r = 6371008.8
    return F.when(n >= 4, F.abs(s) * F.lit(r * r / 2.0)).otherwise(F.lit(0.0))
