"""Generate the committed MBTiles test fixtures (MBTiles 1.3 spec
schema) deterministically — every tile's coordinates and payload are a
pure function of (zoom, x, tms_row), so the driver oracle can re-derive
the expected rows arithmetically without ever opening sqlite.

- tests/fixtures/fixture.mbtiles — a small tile pyramid (z12-z14) with
  md5-derived binary blobs of varying length.
- tests/fixtures/meta.mbtiles — per-tile JSON map-metadata blobs at z12
  and z13 only, so the z14 lookup exercises the ancestor walk-up
  (MapMetadataMbtilesUtil.java:44-47).

Regenerate (stable output): python tools/make_mbtiles_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sqlite3

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# base XYZ tile of the pyramid: the SURVEY golden tile (z13 4402,2828)
# region, expressed at z12
BASE = (12, 2201, 1414)


def tile_blob(zoom: int, x: int, tms_row: int) -> bytes:
    """Deterministic payload: md5 of the address, repeated 1-4x."""
    h = hashlib.md5(f"{zoom}/{x}/{tms_row}".encode()).digest()
    return h * (1 + (x + tms_row) % 4)


def fixture_tiles() -> list[tuple[int, int, int]]:
    """(zoom, tile_column, tile_row/TMS) for the committed pyramid:
    at zoom z (12..14), a k x k block of XYZ tiles anchored at the BASE
    tile's descendants, k = 2^(z-12) + 1 (2, 3, 5 tiles per axis) —
    4 + 9 + 25 = 38 tiles wrapping the golden-tile neighborhood."""
    out = []
    z0, x0, y0 = BASE
    for z in range(12, 15):
        scale = 1 << (z - z0)
        k = scale + 1
        for dx in range(k):
            for dy in range(k):
                x, y = x0 * scale + dx, y0 * scale + dy
                out.append((z, x, (1 << z) - 1 - y))
    return out


def write_fixture(path: str) -> int:
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    con.execute(
        "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
        "tile_row integer, tile_data blob)"
    )
    con.execute(
        "CREATE UNIQUE INDEX tile_index ON tiles "
        "(zoom_level, tile_column, tile_row)"
    )
    meta = {
        "name": "osm2world_spark fixture",
        "format": "pbf",
        "minzoom": "12",
        "maxzoom": "14",
        "bounds": "13.27,48.48,13.62,48.69",
        "version": "1",
        "type": "baselayer",
    }
    con.executemany("INSERT INTO metadata VALUES (?, ?)", sorted(meta.items()))
    tiles = fixture_tiles()
    con.executemany(
        "INSERT INTO tiles VALUES (?, ?, ?, ?)",
        [(z, x, r, tile_blob(z, x, r)) for z, x, r in tiles],
    )
    con.commit()
    con.close()
    return len(tiles)


def write_meta_fixture(path: str) -> int:
    """JSON metadata blobs at z12 (locale DE, land true) and one z13
    child (locale AT, land null) — z14 lookups must walk up."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    con.execute(
        "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
        "tile_row integer, tile_data blob)"
    )
    con.execute("INSERT INTO metadata VALUES ('name', 'meta fixture')")
    z0, x0, y0 = BASE
    rows = [
        (z0, x0, (1 << z0) - 1 - y0,
         json.dumps({"locale": "DE", "land": True}).encode()),
        (13, x0 * 2 + 1, (1 << 13) - 1 - (y0 * 2),
         json.dumps({"locale": "AT"}).encode()),
    ]
    con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", rows)
    con.commit()
    con.close()
    return len(rows)


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    n = write_fixture(os.path.join(FIXDIR, "fixture.mbtiles"))
    m = write_meta_fixture(os.path.join(FIXDIR, "meta.mbtiles"))
    print(f"wrote {n} tiles -> fixture.mbtiles, {m} meta tiles -> meta.mbtiles")


if __name__ == "__main__":
    main()
