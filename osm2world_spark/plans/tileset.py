"""Tileset index + layout sink (S8): the reference's bulk-tiling output
writes a `lod{n}/{z}/{x}/{y}.ext` tree plus a 3D-Tiles-style tileset JSON
index over it (output/tileset/TilesetOutput.java:38-120, layout at
desktop/.../TilesetCommand.java:239-246). The analytic analogue here keeps
the 3D payload out of scope and materializes the INDEX: per root tile
(z12), the set of child content tiles (z14) actually populated, their
element counts, and the tightened geographic bounding volume — the
metadata a tile-serving frontend reads before fetching content.

Scale shape: the standard external-tileset pattern — one self-contained
index document per z12 root, children bounded by 4^(child-root) = 16 —
so the index is a plain groupBy with bounded fan-in and the write is an
ordinary partitioned sink. No driver-side collection at any scale; a
planet-wide z12 root set (~28M tiles at the extreme) is just rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import tiles as T

ROOT_ZOOM = 12
CHILD_ZOOM = 14


def _round9(c: Column) -> Column:
    return F.round(c, 9)


def tileset_index(
    tiles: DataFrame, root_zoom: int = ROOT_ZOOM, child_zoom: int = CHILD_ZOOM
) -> DataFrame:
    """assign_tiles output -> one row per populated root tile.

    Columns: zoom, tile_x, tile_y (the root), n_children, n_elements,
    minlat/minlon/maxlat/maxlon (tight union of populated child tile
    bounds, TileNumber.latLonBounds math), content_uri (the child-content
    path pattern the reference's tileset writer emits).
    """
    levels = child_zoom - root_zoom
    child = (
        tiles.where(F.col("zoom") == child_zoom)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_elements"))
    )
    b = T.tile_lat_lon_bounds(child_zoom, F.col("tile_x"), F.col("tile_y"))
    child = child.select(
        F.floor(F.col("tile_x") / (1 << levels)).cast("int").alias("root_x"),
        F.floor(F.col("tile_y") / (1 << levels)).cast("int").alias("root_y"),
        "tile_x",
        "tile_y",
        "n_elements",
        b["minlat"].alias("c_minlat"),
        b["minlon"].alias("c_minlon"),
        b["maxlat"].alias("c_maxlat"),
        b["maxlon"].alias("c_maxlon"),
    )
    return child.groupBy("root_x", "root_y").agg(
        F.count("*").cast("bigint").alias("n_children"),
        F.sum("n_elements").cast("bigint").alias("n_elements"),
        _round9(F.min("c_minlat")).alias("minlat"),
        _round9(F.min("c_minlon")).alias("minlon"),
        _round9(F.max("c_maxlat")).alias("maxlat"),
        _round9(F.max("c_maxlon")).alias("maxlon"),
    ).select(
        F.lit(root_zoom).cast("int").alias("zoom"),
        F.col("root_x").alias("tile_x"),
        F.col("root_y").alias("tile_y"),
        "n_children",
        "n_elements",
        "minlat",
        "minlon",
        "maxlat",
        "maxlon",
        F.concat_ws(
            "/",
            F.lit(root_zoom).cast("string"),
            F.col("root_x").cast("string"),
            F.col("root_y").cast("string"),
            F.lit("tileset.json"),
        ).alias("content_uri"),
    )


def tileset_documents(
    tiles: DataFrame,
    root_zoom: int = ROOT_ZOOM,
    child_zoom: int = CHILD_ZOOM,
    lod: int = 2,
) -> DataFrame:
    """One JSON tileset document per root tile: the index row plus its
    ordered children array (each child's tile id, bounds, element count,
    and `lod{n}/{z}/{x}/{y}` content uri). The children fan-in is bounded
    (4^(child_zoom-root_zoom)), so the array-collect is a safe per-group
    aggregation at any corpus size."""
    levels = child_zoom - root_zoom
    b = T.tile_lat_lon_bounds(child_zoom, F.col("tile_x"), F.col("tile_y"))
    child = (
        tiles.where(F.col("zoom") == child_zoom)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_elements"))
        .select(
            F.floor(F.col("tile_x") / (1 << levels)).cast("int").alias("root_x"),
            F.floor(F.col("tile_y") / (1 << levels)).cast("int").alias("root_y"),
            F.struct(
                F.col("tile_x").alias("x"),
                F.col("tile_y").alias("y"),
                F.col("n_elements"),
                _round9(b["minlat"]).alias("minlat"),
                _round9(b["minlon"]).alias("minlon"),
                _round9(b["maxlat"]).alias("maxlat"),
                _round9(b["maxlon"]).alias("maxlon"),
                F.concat_ws(
                    "/",
                    F.lit(f"lod{lod}"),
                    F.lit(child_zoom).cast("string"),
                    F.col("tile_x").cast("string"),
                    F.col("tile_y").cast("string"),
                ).alias("uri"),
            ).alias("child"),
        )
    )
    agg = child.groupBy("root_x", "root_y").agg(
        F.array_sort(F.collect_list("child")).alias("children"),
        F.count("*").cast("bigint").alias("n_children"),
        F.sum(F.col("child.n_elements")).cast("bigint").alias("n_elements"),
        _round9(F.min(F.col("child.minlat"))).alias("minlat"),
        _round9(F.min(F.col("child.minlon"))).alias("minlon"),
        _round9(F.max(F.col("child.maxlat"))).alias("maxlat"),
        _round9(F.max(F.col("child.maxlon"))).alias("maxlon"),
    )
    doc = F.to_json(
        F.struct(
            F.struct(
                F.lit(root_zoom).cast("int").alias("zoom"),
                F.col("root_x").alias("x"),
                F.col("root_y").alias("y"),
            ).alias("root"),
            F.struct(
                F.col("minlat"), F.col("minlon"), F.col("maxlat"), F.col("maxlon")
            ).alias("bounds"),
            F.col("n_children"),
            F.col("n_elements"),
            F.col("children"),
        )
    )
    return agg.select(
        F.lit(root_zoom).cast("int").alias("zoom"),
        F.col("root_x").alias("tile_x"),
        F.col("root_y").alias("tile_y"),
        doc.alias("tileset_json"),
    )


def write_tileset(
    tiles: DataFrame,
    path: str,
    root_zoom: int = ROOT_ZOOM,
    child_zoom: int = CHILD_ZOOM,
    lod: int = 2,
) -> None:
    """Materialize the tileset tree: `zoom=…/tile_x=…/tile_y=…/part-*.txt`,
    one JSON index document per populated root tile (the hive-partitioned
    analogue of the reference's `{z}/{x}/{y}/tileset.json`; a serving
    layer maps partition dirs to URI paths 1:1). Pure partitioned text
    write — no driver-side iteration."""
    docs = tileset_documents(tiles, root_zoom, child_zoom, lod)
    (
        docs.select(
            F.col("tileset_json").alias("value"), "zoom", "tile_x", "tile_y"
        )
        .repartition("tile_x", "tile_y")
        .write.partitionBy("zoom", "tile_x", "tile_y")
        .mode("overwrite")
        .text(path)
    )
