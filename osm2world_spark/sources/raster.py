"""Synthetic SRTM-like raster source and pixel -> site conversion.

Reference (/root/reference/core/src/main/java/org/osm2world/map_elevation/
creation/):
- SRTMTile.java:20-30 — 1201x1201 big-endian short grid per 1-degree cell
  (PIXELS=1201 :26), no-data BLANK_VALUE=-32768 :23.
- SRTMData.addTileSites (:118-157) — pixel ranges [ceil(PIXELS*(minLon -
  cellLon)), floor(PIXELS*(maxLon - cellLon))], site loops are
  exclusive of the max index (x < maxX, y < maxY), pixel center at
  lat = cellLat + (y+0.5)/PIXELS, no-data skipped; heights projected into
  the metric plane as (x, z, y=elev) sites.
- SRTMData.getSites(bounds) pads the query bbox by 0.005 deg (:74-76).

Spark shape: the raster is a DataFrame (cell_lon, cell_lat, px, py, elev)
generated as a pure function of pixel index (deterministic smooth field +
~2% no-data holes); pixel -> site is pure Column math (the bbox predicate
prunes pixels before anything touches Python). At planet scale this table
is partitioned by (cell_lon, cell_lat), so bbox scans prune whole 1-degree
cells — the lazy per-cell loading of SRTMData.loadTileIfNecessary :82-116.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.projection import Origin, to_x, to_z

PIXELS = 1201          # SRTMTile.java:26
BLANK_VALUE = -32768   # SRTMTile.java:23
SEAM_PAD_DEG = 0.005   # SRTMData.java:74-76


def synthetic_raster(
    spark: SparkSession,
    minlat: float,
    minlon: float,
    maxlat: float,
    maxlon: float,
    seed: int = 42,
    step: int = 1,
) -> DataFrame:
    """Deterministic raster covering the given bounds: one row per pixel of
    every 1-degree cell intersecting the bounds, restricted to pixels inside
    the bounds (keeps small-scale tests small; `step` subsamples the grid).

    elev = smooth deterministic field of (lat, lon): two "hill" harmonics
    plus a valley, 100..~900 m, int16; ~2% pixels are no-data (-32768),
    chosen by a hash of the pixel index.
    """
    cells = [
        (clon, clat)
        for clon in range(int(math.floor(minlon)), int(math.floor(maxlon)) + 1)
        for clat in range(int(math.floor(minlat)), int(math.floor(maxlat)) + 1)
    ]
    dfs = []
    for clon, clat in cells:
        px0 = max(0, int(math.ceil(PIXELS * (minlon - clon))))
        px1 = min(PIXELS - 1, int(math.floor(PIXELS * (maxlon - clon))))
        py0 = max(0, int(math.ceil(PIXELS * (minlat - clat))))
        py1 = min(PIXELS - 1, int(math.floor(PIXELS * (maxlat - clat))))
        if px0 >= px1 or py0 >= py1:
            continue
        nx = (px1 - px0 + step - 1) // step
        ny = (py1 - py0 + step - 1) // step
        base = spark.range(nx * ny).select(
            F.lit(clon).alias("cell_lon"),
            F.lit(clat).alias("cell_lat"),
            (px0 + (F.col("id") % nx) * step).cast("int").alias("px"),
            (py0 + F.floor(F.col("id") / nx) * step).cast("int").alias("py"),
        )
        dfs.append(base)
    if not dfs:
        raise ValueError("bounds intersect no raster cell")
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)

    lat = F.col("cell_lat") + (F.col("py") + 0.5) / PIXELS
    lon = F.col("cell_lon") + (F.col("px") + 0.5) / PIXELS
    field = (
        400.0
        + 300.0 * F.sin(lat * 97.0 + seed) * F.cos(lon * 83.0 - seed)
        + 150.0 * F.sin(lat * 311.0) * F.sin(lon * 271.0)
        + 50.0 * F.cos(lat * 1009.0 + lon * 997.0)
    )
    h = F.hash((F.col("px") * 7919 + F.col("py") * 104729 + seed).cast("bigint"))
    elev = F.when(F.pmod(h, F.lit(50)) == 0, F.lit(BLANK_VALUE)).otherwise(
        F.round(field).cast("int")
    )
    return df.withColumn("elev", elev.cast("smallint"))


def raster_sites(raster: DataFrame, origin: Origin) -> DataFrame:
    """pixel rows -> metric sites (s_id, x, z, y) — SRTMData.addTileSites
    (:139-155): pixel-center lat/lon, no-data skipped, projected with the
    dataset projection. Pure Column math; Catalyst pushes the no-data filter
    into the scan."""
    lat = F.col("cell_lat") + (F.col("py") + 0.5) / PIXELS
    lon = F.col("cell_lon") + (F.col("px") + 0.5) / PIXELS
    return (
        raster.where(F.col("elev") != BLANK_VALUE)
        .select(
            F.concat_ws("_", "cell_lon", "cell_lat", "px", "py").alias("s_id"),
            to_x(lon, origin).alias("x"),
            to_z(lat, origin).alias("z"),
            F.col("elev").cast("double").alias("y"),
        )
    )
