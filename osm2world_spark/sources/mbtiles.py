"""MBTiles sqlite source (S2 completion): tile blobs, metadata, and
per-tile map metadata from a ``.mbtiles`` file, matching the reference's
fetch semantics:

- MbtilesReader.java:54-76 — a tile is fetched by (zoom, x, flippedY);
  mbtiles stores TMS tile coordinates, whose y axis points northward, so
  flippedY = 2^zoom - 1 - y (TileNumber.java:88-90).
- MbtilesReader.java:80-82 — arbitrary lat/lon bounds are UNSUPPORTED;
  this reader is tile-addressed only.
- MapMetadataMbtilesUtil.java:34-56 — per-tile map metadata is a JSON
  blob {"locale": ..., "land": ...} in a metadata mbtiles; a miss walks
  UP the tile pyramid (ancestor = zoom-1, x>>1, y>>1 per
  TileNumber.java:108-113) and only logs an error when the root misses.
- The sqlite schema is the public MBTiles 1.3 spec: tables
  ``tiles(zoom_level, tile_column, tile_row, tile_data)`` and
  ``metadata(name, value)``.

Spark shape at 100 TB: a tileset is MANY mbtiles files (one per region/
epoch) on shared storage, each internally range-partitionable. The
distributed scan builds a bounded driver-side split table from the
per-zoom tile_row extents (<= ~23 rows per file, a pure index read,
never the blobs) and fans out one sqlite range query per split via
mapInPandas — every executor opens the file read-only itself, so blob
bytes never pass through the driver, and the (zoom_level, tile_column,
tile_row) primary index serves each range scan. Blobs surface as opaque
binary; pipe them through sources/osmpbf.decode_pbf_blobs for the full
MbtilesReader.getData path (tile blob -> pbf elements).
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

TILES_SCHEMA = StructType([
    StructField("zoom", IntegerType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),       # XYZ (southward y), flipped from TMS
    StructField("tms_row", IntegerType()),      # raw TMS tile_row as stored
    StructField("n_bytes", LongType()),
    StructField("tile_data", BinaryType()),
])


def flipped_y(zoom: int, y: int) -> int:
    """TMS <-> XYZ y flip (involution), TileNumber.java:88-90."""
    return (1 << zoom) - 1 - y


def _connect_ro(path: str) -> sqlite3.Connection:
    if not os.path.exists(path):
        raise FileNotFoundError(f"MBTiles file does not exist: {path}")
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def mbtiles_metadata(spark: SparkSession, path: str) -> DataFrame:
    """The ``metadata`` name/value table. Tiny by spec (format, bounds,
    minzoom...), so a driver-side read is the right shape."""
    with _connect_ro(path) as con:
        rows = con.execute(
            "SELECT name, value FROM metadata ORDER BY name"
        ).fetchall()
    return spark.createDataFrame(rows, "name string, value string")


def _zoom_extents(path: str) -> list[tuple[int, int, int, int]]:
    """(zoom, min_row, max_row, n_tiles) per zoom — a bounded index-only
    read (<= ~23 rows for any legal tileset)."""
    with _connect_ro(path) as con:
        return [
            (int(z), int(lo), int(hi), int(n))
            for z, lo, hi, n in con.execute(
                "SELECT zoom_level, MIN(tile_row), MAX(tile_row), COUNT(*) "
                "FROM tiles GROUP BY zoom_level ORDER BY zoom_level"
            )
        ]


def mbtiles_tiles(
    spark: SparkSession, path: str | list[str], rows_per_split: int = 4096
) -> DataFrame:
    """Distributed scan of every tile in one or many mbtiles files:
    (zoom, tile_x, tile_y, tms_row, n_bytes, tile_data) with tile_y in
    the reference's XYZ convention (flip applied in-plan). A 100-TB
    tileset is MANY mbtiles files (per region/epoch), so the split
    table spans the whole list.

    Splits are (path, zoom, tile_row range) chunks sized so each task
    streams ~rows_per_split tiles through the (zoom_level, tile_row)
    index; the split table is the only driver-side state
    (O(files * zooms * splits), no blobs). Tasks reuse one read-only
    connection per file."""
    paths = [path] if isinstance(path, str) else list(path)
    splits: list[tuple[str, int, int, int]] = []
    for p in paths:
        for z, lo, hi, n in _zoom_extents(p):
            span = hi - lo + 1
            # rows cluster unevenly across the row range; chunk the
            # RANGE by the average density so dense zooms still split
            n_chunks = max(
                1, min(span, (n + rows_per_split - 1) // rows_per_split)
            )
            step = (span + n_chunks - 1) // n_chunks
            for start in range(lo, hi + 1, step):
                splits.append((p, z, start, min(start + step - 1, hi)))
    split_df = spark.createDataFrame(
        splits, "path string, zoom int, row_lo int, row_hi int"
    ).repartition(max(1, min(len(splits), 64)))

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        cons: dict[str, sqlite3.Connection] = {}
        try:
            for pdf in batches:
                for p, z, lo, hi in pdf[
                    ["path", "zoom", "row_lo", "row_hi"]
                ].itertuples(index=False):
                    con = cons.get(p)
                    if con is None:
                        con = cons[p] = sqlite3.connect(
                            f"file:{p}?mode=ro", uri=True
                        )
                    rows = con.execute(
                        "SELECT tile_column, tile_row, tile_data FROM tiles "
                        "WHERE zoom_level = ? AND tile_row BETWEEN ? AND ? "
                        "ORDER BY tile_column, tile_row",
                        (int(z), int(lo), int(hi)),
                    ).fetchall()
                    if not rows:
                        continue
                    flip = (1 << int(z)) - 1
                    yield pd.DataFrame({
                        "zoom": [int(z)] * len(rows),
                        "tile_x": [int(c) for c, _, _ in rows],
                        "tile_y": [flip - int(r) for _, r, _ in rows],
                        "tms_row": [int(r) for _, r, _ in rows],
                        "n_bytes": [len(d) for _, _, d in rows],
                        "tile_data": [bytes(d) for _, _, d in rows],
                    })
        finally:
            for con in cons.values():
                con.close()

    return split_df.mapInPandas(scan, TILES_SCHEMA)


def mbtiles_tile(path: str, zoom: int, x: int, y: int) -> bytes | None:
    """Single-tile fetch by XYZ tile number — the reference's
    MbtilesReader.getData(TileNumber) shape (:54-76): the stored TMS row
    is flippedY(zoom, y). Returns None when the tile is absent."""
    with _connect_ro(path) as con:
        row = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level = ? AND "
            "tile_column = ? AND tile_row = ?",
            (zoom, x, flipped_y(zoom, y)),
        ).fetchone()
    return bytes(row[0]) if row else None


def mbtiles_tiles_for_bounds(path: str, bounds) -> None:
    """Parity with MbtilesReader.java:80-82: arbitrary lat/lon bounds
    are not supported by the tile-addressed reader."""
    raise NotImplementedError(
        "MbtilesReader does not support accessing data for arbitrary bounds"
    )


def metadata_for_tile(
    path: str, zoom: int, x: int, y: int, _suppress_errors: bool = False
) -> dict | None:
    """Per-tile map metadata {"locale": str|None, "land": bool|None}
    from a metadata mbtiles (MapMetadataMbtilesUtil.java:34-56): the
    tile's own JSON blob, else the nearest ancestor's (zoom-1, x>>1,
    y>>1 per TileNumber.java:108-113); None past the root."""
    payload = mbtiles_tile(path, zoom, x, y)
    if payload is not None:
        raw = json.loads(payload.decode("utf-8"))
        return {"locale": raw.get("locale"), "land": raw.get("land")}
    if zoom == 0:
        if not _suppress_errors:
            import logging

            logging.getLogger(__name__).error(
                "Could not read metadata for tile %d,%d,%d", zoom, x, y
            )
        return None
    result = metadata_for_tile(path, zoom - 1, x >> 1, y >> 1, True)
    if result is None and not _suppress_errors:
        import logging

        logging.getLogger(__name__).error(
            "Could not read metadata for tile %d,%d,%d", zoom, x, y
        )
    return result
