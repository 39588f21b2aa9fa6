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
