"""Raster <-> vector zonal join: per-element elevation + per-tile zonal stats.

Reference (/root/reference/core/src/main/java/org/osm2world/):
- O2WConverterImpl.calculateElevations (:351-396): raster pixels in the
  padded data bbox become sites (:367), every element's EleConnector sample
  point gets an interpolated elevation (:383-389) via the configured
  interpolator (IDW / least-squares kNN / ...; O2WConfig.java:510-518).
- EleConnector (map_elevation/data/EleConnector.java): per-element sample
  points — for us, every vertex of every geometry ring.

Spark shape: explode element vertices into a connector DataFrame
(doc_id, span_idx, conn_idx, x, z) with pure Column math, then a cell-keyed
IDW (or 29-NN) join against the raster-site table, then zonal aggregates
(groupBy tile). The raster side prunes to the data bbox before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import idw_join, interpolate_29nn


def ele_connectors(elements: DataFrame) -> DataFrame:
    """elements -> one row per geometry vertex (the EleConnector analogue).

    Output: (q_id = doc#span#conn_idx, doc_id, span_idx, conn_idx, x, z)."""
    pts = elements.select(
        "doc_id",
        "span_idx",
        F.posexplode(
            F.flatten(
                F.transform(
                    "geom",
                    lambda ring: F.transform(
                        F.sequence(F.lit(0), (F.size(ring) / 2).cast("int") - 1),
                        lambda i: F.struct(ring[i * 2].alias("x"), ring[i * 2 + 1].alias("z")),
                    ),
                )
            )
        ).alias("conn_idx", "pt"),
    )
    return pts.select(
        F.concat_ws("#", "doc_id", "span_idx", "conn_idx").alias("q_id"),
        "doc_id",
        "span_idx",
        F.col("conn_idx").cast("int").alias("conn_idx"),
        F.col("pt.x").alias("x"),
        F.col("pt.z").alias("z"),
    )


def elevation_join(
    elements: DataFrame,
    sites: DataFrame,
    method: str = "idw",
) -> DataFrame:
    """Attach an interpolated elevation to every element vertex.

    method: 'idw' (cutoff 300 m, d^-2) or 'lsq29' (29-NN linear falloff) —
    mirrors the reference's configurable TerrainInterpolator.
    Output: (q_id, doc_id, span_idx, conn_idx, x, z, ele)."""
    conns = ele_connectors(elements)
    if method == "idw":
        ele = idw_join(conns.select("q_id", "x", "z"), sites)
    elif method == "lsq29":
        ele = interpolate_29nn(conns.select("q_id", "x", "z"), sites)
    else:
        raise ValueError(f"unknown interpolation method: {method}")
    return conns.join(ele, "q_id", "left")


def zonal_stats(elevated: DataFrame, elements: DataFrame, zoom: int = 14) -> DataFrame:
    """Zonal aggregate: per-z14-tile elevation statistics over all element
    vertices whose element bbox-center falls in the tile. Output:
    (zoom, tile_x, tile_y, n_points, avg_ele, min_ele, max_ele)."""
    from ..functions import tiles as T

    centers = elements.select(
        "doc_id",
        "span_idx",
        T.tile_x_at((F.col("minlon") + F.col("maxlon")) / 2, zoom).alias("tile_x"),
        T.tile_y_at((F.col("minlat") + F.col("maxlat")) / 2, zoom).alias("tile_y"),
    )
    return (
        elevated.join(centers, ["doc_id", "span_idx"])
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n_points"),
            F.avg("ele").alias("avg_ele"),
            F.min("ele").alias("min_ele"),
            F.max("ele").alias("max_ele"),
        )
        .withColumn("zoom", F.lit(zoom))
    )
