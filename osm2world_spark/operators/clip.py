"""Per-tile geometry clipping and tile ownership.

Reference: MeshStore.ClipToBounds (/root/reference/core/src/main/java/org/
osm2world/scene/mesh/MeshStore.java:577-768):
- non-split mode: an item belongs to the tile containing its CENTER
  (:591-599) — the dedup rule for geometry spanning multiple tiles
- split mode: successive half-plane clipping against the (CCW-normalized)
  boundary segments (:738-766) — Sutherland-Hodgman against the convex
  tile rectangle; attributes re-interpolated (:683-718)
Wired per-tile in the bulk tileset flow with clipToBounds=true
(desktop/.../TilesetCommand.java:185-190).

Spark shape: ownership is pure Column math (bbox-center tile). Clipping
runs per (element x covered tile) row after the cover explode; the
Sutherland-Hodgman kernel is numpy over the packed coordinate arrays, one
Arrow batch at a time, looping only over the 4 half-planes (vectorized
across all edges of a ring per step).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions import tiles as T


def owner_tile(elements: DataFrame, zoom: int = 12) -> DataFrame:
    """Adds (zoom, tile_x, tile_y) of the tile owning the element: the tile
    containing the bbox center (the ClipToBounds center rule,
    MeshStore.java:591-599). Exactly one owner per element — the dedup rule
    for cross-tile geometry."""
    clat = (F.col("minlat") + F.col("maxlat")) / 2
    clon = (F.col("minlon") + F.col("maxlon")) / 2
    return elements.withColumns(
        {
            "zoom": F.lit(zoom).cast("int"),
            "tile_x": T.tile_x_at(clon, zoom),
            "tile_y": T.tile_y_at(clat, zoom),
        }
    )


def _sh_clip_ring(xs: np.ndarray, zs: np.ndarray, minx, minz, maxx, maxz):
    """Sutherland-Hodgman clip of one closed ring (first==last) against an
    axis-aligned rectangle. Returns (xs, zs) closed, or None if empty.
    Vectorized across the ring's edges for each of the 4 half-planes."""
    # drop the duplicate closing vertex for the algorithm
    if len(xs) >= 2 and xs[0] == xs[-1] and zs[0] == zs[-1]:
        xs, zs = xs[:-1], zs[:-1]
    for side in range(4):
        if len(xs) == 0:
            return None
        if side == 0:
            inside = xs >= minx
        elif side == 1:
            inside = xs <= maxx
        elif side == 2:
            inside = zs >= minz
        else:
            inside = zs <= maxz
        nxt = np.roll(np.arange(len(xs)), -1)
        in_cur = inside
        in_nxt = inside[nxt]
        x2, z2 = xs[nxt], zs[nxt]
        dx = x2 - xs
        dz = z2 - zs
        if side == 0:
            tt = np.where(dx != 0, (minx - xs) / np.where(dx != 0, dx, 1.0), 0.0)
        elif side == 1:
            tt = np.where(dx != 0, (maxx - xs) / np.where(dx != 0, dx, 1.0), 0.0)
        elif side == 2:
            tt = np.where(dz != 0, (minz - zs) / np.where(dz != 0, dz, 1.0), 0.0)
        else:
            tt = np.where(dz != 0, (maxz - zs) / np.where(dz != 0, dz, 1.0), 0.0)
        ix = xs + tt * dx
        iz = zs + tt * dz
        out_x, out_z = [], []
        for i in range(len(xs)):  # emit order matters; ring sizes are small
            if in_cur[i]:
                out_x.append(xs[i])
                out_z.append(zs[i])
                if not in_nxt[i]:
                    out_x.append(ix[i])
                    out_z.append(iz[i])
            elif in_nxt[i]:
                out_x.append(ix[i])
                out_z.append(iz[i])
        xs = np.asarray(out_x)
        zs = np.asarray(out_z)
    if len(xs) < 3:
        return None
    xs = np.append(xs, xs[0])
    zs = np.append(zs, zs[0])
    return xs, zs


CLIPPED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("element_type", StringType()),
        StructField("zoom", IntegerType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("geom", ArrayType(ArrayType(DoubleType()))),
    ]
)


def clip_to_tiles(elements: DataFrame, origin, zoom: int = 14) -> DataFrame:
    """Split mode: explode each area/way element over its covered tiles and
    clip the geometry to each tile's metric rectangle (tile bounds
    projected with the dataset origin). Points pass through to their
    containing tile. Output rows carry only non-empty clipped geometry —
    every tile owns exactly the geometry inside it
    (MeshStore.ClipToBounds split mode :738-766)."""
    from ..functions.projection import np_to_xz

    cover = elements.select(
        "doc_id",
        "span_idx",
        "element_type",
        "geom",
        F.explode(
            T.tiles_for_bounds(zoom, F.col("minlat"), F.col("minlon"), F.col("maxlat"), F.col("maxlon"))
        ).alias("t"),
    ).select(
        "doc_id",
        "span_idx",
        "element_type",
        "geom",
        F.col("t.zoom").alias("zoom"),
        F.col("t.x").alias("tile_x"),
        F.col("t.y").alias("tile_y"),
    )

    def kernel(batches):
        from ..functions.tiles import py_tile_bounds

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "element_type", "zoom", "tile_x", "tile_y", "geom")}
            for row in pdf.itertuples(index=False):
                minlat, minlon, maxlat, maxlon = py_tile_bounds(row.zoom, row.tile_x, row.tile_y)
                xarr, zarr = np_to_xz(
                    np.array([minlat, maxlat]), np.array([minlon, maxlon]), origin
                )
                minx, maxx = sorted((xarr[0], xarr[1]))
                minz, maxz = sorted((zarr[0], zarr[1]))
                rings_out = []
                for k, ring in enumerate(row.geom):
                    arr = np.asarray(ring)
                    xs, zs = arr[0::2].copy(), arr[1::2].copy()
                    if row.element_type == "node":
                        if minx <= xs[0] <= maxx and minz <= zs[0] <= maxz:
                            rings_out.append(ring)
                        continue
                    if row.element_type == "way":
                        for keep_x, keep_z in _clip_polyline(xs, zs, minx, minz, maxx, maxz):
                            packed = np.empty(len(keep_x) * 2)
                            packed[0::2], packed[1::2] = keep_x, keep_z
                            rings_out.append(packed.tolist())
                        continue
                    res = _sh_clip_ring(xs, zs, minx, minz, maxx, maxz)
                    if res is not None:
                        packed = np.empty(len(res[0]) * 2)
                        packed[0::2], packed[1::2] = res
                        rings_out.append(packed.tolist())
                if not rings_out:
                    continue
                out["doc_id"].append(row.doc_id)
                out["span_idx"].append(row.span_idx)
                out["element_type"].append(row.element_type)
                out["zoom"].append(row.zoom)
                out["tile_x"].append(row.tile_x)
                out["tile_y"].append(row.tile_y)
                out["geom"].append(rings_out)
            yield pd.DataFrame(out)

    return cover.mapInPandas(kernel, schema=CLIPPED_SCHEMA)


def shrink_huge_areas(
    elements: DataFrame,
    threshold: float = 5.0,
    pad: float = 1.0,
) -> DataFrame:
    """Huge-area clip (OSMToMapDataConverter.shrinkHugeAreas, /root/
    reference/core/.../map_data/creation/OSMToMapDataConverter.java:78-156):
    areas whose bbox area exceeds `threshold` x the dataset boundary's area
    (:85) are clipped to the boundary padded by `pad` (:86) — the reference
    intersects via CAG (:106-115); the padded boundary is an axis-aligned
    rectangle, so Sutherland-Hodgman half-plane clipping is exact.

    The boundary is the NODE extent (the reference's dataBoundary is the
    file bbox union node extent, MapData.java:53-79 — area bboxes do NOT
    widen it, which is exactly why pathological areas can exceed it) — a
    4-number aggregate broadcast into the clip predicate, so the common
    case (no huge areas) costs one cheap scan + a filter that keeps
    geometry untouched. Falls back to the all-element bbox if there are no
    nodes.

    Output: the input rows with `geom` replaced where clipped and a
    `clipped` flag column.
    """
    nodes = elements.where(F.col("element_type") == "node")
    src = nodes if not nodes.isEmpty() else elements
    b = src.agg(
        F.min("minx").alias("bminx"),
        F.min("minz").alias("bminz"),
        F.max("maxx").alias("bmaxx"),
        F.max("maxz").alias("bmaxz"),
    ).first()
    if b["bminx"] is None:
        return elements.withColumn("clipped", F.lit(False))
    bminx, bminz = b["bminx"] - pad, b["bminz"] - pad
    bmaxx, bmaxz = b["bmaxx"] + pad, b["bmaxz"] + pad
    boundary_area = max(b["bmaxx"] - b["bminx"], 0.0) * max(b["bmaxz"] - b["bminz"], 0.0)

    is_huge = (
        (F.col("element_type") == "area")
        & (
            (F.col("maxx") - F.col("minx")) * (F.col("maxz") - F.col("minz"))
            > threshold * F.lit(boundary_area)
        )
    )
    flagged = elements.withColumn("clipped", is_huge)
    normal = flagged.where(~F.col("clipped"))
    huge = flagged.where(F.col("clipped"))

    out_schema = flagged.schema

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            new_geoms = []
            for geom in pdf["geom"]:
                rings_out = []
                for ring in geom:
                    arr = np.asarray(ring, dtype=np.float64)
                    res = _sh_clip_ring(arr[0::2].copy(), arr[1::2].copy(), bminx, bminz, bmaxx, bmaxz)
                    if res is not None:
                        packed = np.empty(len(res[0]) * 2)
                        packed[0::2], packed[1::2] = res
                        rings_out.append(packed.tolist())
                new_geoms.append(rings_out)
            pdf = pdf.copy()
            pdf["geom"] = new_geoms
            # recompute the bbox columns from the clipped geometry
            for col, fn, idx in (("minx", np.min, 0), ("minz", np.min, 1), ("maxx", np.max, 0), ("maxz", np.max, 1)):
                if col in pdf.columns:
                    vals = []
                    for g in new_geoms:
                        pts = np.concatenate([np.asarray(r)[idx::2] for r in g]) if g else np.array([np.nan])
                        vals.append(float(fn(pts)))
                    pdf[col] = vals
            yield pdf

    clipped = huge.mapInPandas(kernel, schema=out_schema)
    return normal.unionByName(clipped)


def _clip_polyline(xs, zs, minx, minz, maxx, maxz):
    """Liang-Barsky-style polyline clip: keeps the in-rect portion of each
    segment; returns a LIST of (xs, zs) polyline pieces. A way that exits
    the rect and re-enters yields disjoint pieces — split-mode clipping
    (MeshStore.ClipToBounds :738-766) never fabricates a segment joining
    the exit point to the re-entry point. Empty list if fully outside."""
    pieces = []
    pts_x, pts_z = [], []

    def flush():
        if len(pts_x) >= 2:
            pieces.append((np.asarray(pts_x), np.asarray(pts_z)))

    for i in range(len(xs) - 1):
        seg = _clip_segment(xs[i], zs[i], xs[i + 1], zs[i + 1], minx, minz, maxx, maxz)
        if seg is None:
            flush()
            pts_x, pts_z = [], []
            continue
        (ax, az), (bx, bz) = seg
        if pts_x and (pts_x[-1] != ax or pts_z[-1] != az):
            # clipped segment doesn't continue the current chain (previous
            # segment was truncated at the boundary): start a new piece
            flush()
            pts_x, pts_z = [], []
        if not pts_x:
            pts_x.append(ax)
            pts_z.append(az)
        pts_x.append(bx)
        pts_z.append(bz)
    flush()
    return pieces


def _clip_segment(x1, z1, x2, z2, minx, minz, maxx, maxz):
    t0, t1 = 0.0, 1.0
    dx, dz = x2 - x1, z2 - z1
    for p, qv in ((-dx, x1 - minx), (dx, maxx - x1), (-dz, z1 - minz), (dz, maxz - z1)):
        if p == 0:
            if qv < 0:
                return None
            continue
        r = qv / p
        if p < 0:
            if r > t1:
                return None
            if r > t0:
                t0 = r
        else:
            if r < t0:
                return None
            if r < t1:
                t1 = r
    return (x1 + t0 * dx, z1 + t0 * dz), (x1 + t1 * dx, z1 + t1 * dz)
