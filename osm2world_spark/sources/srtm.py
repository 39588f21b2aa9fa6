"""Real SRTM `.hgt` / `.hgt.zip` binary codec -> pixel table -> sites.

Reference (/root/reference/core/src/main/java/org/osm2world/map_elevation/
creation/):
- SRTMTile.java:86-104 — payload is a 1201x1201 grid of BIG-ENDIAN shorts
  (`data.order(ByteOrder.BIG_ENDIAN).asShortBuffer()`), capacity must be at
  least 1201*1201 (:93-95); addressing is row-flipped:
  `getData(x, y) = buf[(1200 - y) * 1201 + x]` (:101-104) — the FIRST row
  of the file is the NORTH edge (y = 1200), pixel y grows northward.
- SRTMTile.java:39-84 — `.zip` payloads: the first non-directory entry of
  the archive is the hgt byte stream.
- SRTMData.java:86-103 — tile filename regex:
  `N%02d|S%02d` + `E%03d|W%03d` + `(?:\\.SRTMGL3)?\\.hgt(?:\\.zip)?`,
  named by the SOUTH-WEST corner of the 1-degree cell.
- SRTMData.addTileSites:118-157 — pixel -> site conversion (already
  implemented in sources/raster.py over the pixel table this module emits).

Spark shape: files arrive as a DataFrame of (file_name, payload: binary)
rows — the layout `spark.read.format("binaryFile")` yields from a tile
directory at any scale, one task per file, no driver involvement. The
decode kernel is Arrow-batched `mapInPandas`; per-payload `np.frombuffer`
is a zero-copy view + one vectorized reshape/flip, so the only Python-level
loop is over FILES in a batch (inherent to variable-size binary payloads,
same shape as functions/png.py). Output is the (cell_lon, cell_lat, px,
py, elev) pixel table that sources/raster.py's `raster_sites` and the
zonal/kNN/interpolation operators already consume — the synthetic raster
and real hgt files are interchangeable upstream of everything else.
"""

from __future__ import annotations

import io
import re
import zipfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    ShortType,
    StructField,
    StructType,
)

from .raster import BLANK_VALUE, PIXELS, SEAM_PAD_DEG

# SRTMData.java:86-103 — built exactly like loadTileIfNecessary's regex
# (alternation inlined since we parse rather than build per-cell patterns)
HGT_NAME_RE = re.compile(
    r"^(?P<ns>[NS])(?P<lat>\d{2})(?P<ew>[EW])(?P<lon>\d{3})"
    r"(?:\.SRTMGL3)?\.hgt(?:\.zip)?$"
)


def hgt_filename(lon: int, lat: int, zipped: bool = False) -> str:
    """Cell (SW corner) -> canonical file name (SRTMData.java:89-99)."""
    name = ("N%02d" % lat if lat >= 0 else "S%02d" % -lat) + (
        "E%03d" % lon if lon >= 0 else "W%03d" % -lon
    )
    return name + (".hgt.zip" if zipped else ".hgt")


def parse_hgt_filename(name: str) -> tuple[int, int] | None:
    """File name -> (cell_lon, cell_lat) of the SW corner, or None if the
    name doesn't match the SRTM pattern."""
    m = HGT_NAME_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        return None
    lat = int(m.group("lat")) * (1 if m.group("ns") == "N" else -1)
    lon = int(m.group("lon")) * (1 if m.group("ew") == "E" else -1)
    return lon, lat


def encode_hgt(grid_yx: np.ndarray, zipped: bool = False, name: str = "payload.hgt") -> bytes:
    """Elevation grid (indexed [y, x] with y growing NORTHWARD, i.e.
    grid[0] is the south edge) -> `.hgt` payload bytes: rows written
    north-first as big-endian int16, the exact layout SRTMTile.getData
    reads back with `buf[(1200 - y) * 1201 + x]`."""
    if grid_yx.shape != (PIXELS, PIXELS):
        raise ValueError(f"expected {PIXELS}x{PIXELS} grid, got {grid_yx.shape}")
    raw = grid_yx[::-1, :].astype(">i2").tobytes()
    if not zipped:
        return raw
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(name, raw)
    return buf.getvalue()


def _decode_payload(payload: bytes) -> np.ndarray:
    """Raw file bytes (plain or zip) -> grid indexed [y, x] with y growing
    northward (SRTMTile addressing). Raises ValueError on a short payload,
    matching the reference's IOException (SRTMTile.java:93-95)."""
    if payload[:4] == b"PK\x03\x04":
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            entry = next((i for i in zf.infolist() if not i.is_dir()), None)
            if entry is None:
                raise ValueError("no hgt payload file found in zip archive")
            payload = zf.read(entry)
    shorts = np.frombuffer(payload, dtype=">i2")
    if len(shorts) < PIXELS * PIXELS:
        raise ValueError(
            f"too few elevation values read from SRTM tile: {len(shorts)}"
        )
    # file rows are north-first; flip so index [y, x] has y growing north
    return shorts[: PIXELS * PIXELS].reshape(PIXELS, PIXELS)[::-1, :]


HGT_PIXEL_SCHEMA = StructType(
    [
        StructField("cell_lon", IntegerType()),
        StructField("cell_lat", IntegerType()),
        StructField("px", IntegerType()),
        StructField("py", IntegerType()),
        StructField("elev", ShortType()),
    ]
)


def decode_hgt_tiles(
    files: DataFrame,
    name_col: str = "file_name",
    payload_col: str = "payload",
    keep_blank: bool = True,
) -> DataFrame:
    """(file_name, payload) rows -> the raster pixel table
    (cell_lon, cell_lat, px, py, elev).

    Files whose names don't match the SRTM pattern are skipped (the
    reference only ever opens pattern-matched files); short payloads raise,
    matching SRTMTile's IOException. `keep_blank=False` drops no-data
    pixels (BLANK_VALUE) in the kernel, before anything shuffles.

    One file fans out to 1201^2 pixel rows, so at planet scale the decode
    stage's output partitioning is by file — repartition downstream if a
    single consumer groups across cells."""
    files = files.select(
        F.col(name_col).alias("file_name"), F.col(payload_col).alias("payload")
    )

    # per-file index grids are identical — build once per executor
    yy, xx = np.mgrid[0:PIXELS, 0:PIXELS]
    xx_flat = xx.ravel().astype(np.int32)
    yy_flat = yy.ravel().astype(np.int32)

    def kernel(batches):
        for pdf in batches:
            for name, payload in zip(pdf["file_name"], pdf["payload"]):
                cell = parse_hgt_filename(name)
                if cell is None:
                    continue
                grid = _decode_payload(bytes(payload))
                elev = grid.ravel().astype(np.int16)
                out = pd.DataFrame(
                    {
                        "cell_lon": np.full(len(elev), cell[0], dtype=np.int32),
                        "cell_lat": np.full(len(elev), cell[1], dtype=np.int32),
                        "px": xx_flat,
                        "py": yy_flat,
                        "elev": elev,
                    }
                )
                if not keep_blank:
                    out = out[out["elev"] != BLANK_VALUE]
                yield out

    return files.mapInPandas(kernel, schema=HGT_PIXEL_SCHEMA)


def hgt_sites(
    files: DataFrame,
    origin,
    minlat: float,
    minlon: float,
    maxlat: float,
    maxlon: float,
) -> DataFrame:
    """Decode + SRTMData.getSites semantics: seam-pad the query bbox by
    0.005 deg (:74-76), keep pixels in the per-cell index range
    [ceil(PIXELS*(min - cell)), floor(PIXELS*(max - cell))) — EXCLUSIVE of
    the max index, which is duplicated in the adjacent tile (:131-141) —
    then convert to metric (x, z, y=elev) sites, no-data dropped."""
    from .raster import raster_sites

    minlat, minlon = minlat - SEAM_PAD_DEG, minlon - SEAM_PAD_DEG
    maxlat, maxlon = maxlat + SEAM_PAD_DEG, maxlon + SEAM_PAD_DEG
    px = F.col("px").cast("double")
    py = F.col("py").cast("double")
    last = F.lit(float(PIXELS - 1))  # the min(PIXELS-1, ...) clamp (:134,:140)
    pixels = decode_hgt_tiles(files, keep_blank=False).where(
        (px >= F.ceil(PIXELS * (F.lit(minlon) - F.col("cell_lon"))))
        & (px < F.least(last, F.floor(PIXELS * (F.lit(maxlon) - F.col("cell_lon")))))
        & (py >= F.ceil(PIXELS * (F.lit(minlat) - F.col("cell_lat"))))
        & (py < F.least(last, F.floor(PIXELS * (F.lit(maxlat) - F.col("cell_lat")))))
    )
    return raster_sites(pixels, origin)


def read_hgt_dir(spark, tile_dir: str) -> DataFrame:
    """Tile directory -> (file_name, payload) rows via Spark's binaryFile
    source — one task per file, executors read payloads directly (the
    distributed analogue of SRTMData's lazy per-cell file loading). Only
    SRTM-pattern names are scanned (pathGlobFilter prunes at listing
    time, before any bytes move), matching loadTileIfNecessary's
    pattern-matched directory listing (SRTMData.java:86-110)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.hgt*")
        .load(tile_dir)
    )
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("content").alias("payload"),
    )
