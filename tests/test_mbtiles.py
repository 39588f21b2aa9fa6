"""MBTiles source vs the reference's fetch semantics: TMS y-flip
(TileNumber.java:88-90), tile-addressed reads with bounds unsupported
(MbtilesReader.java:54-82), metadata ancestor walk-up
(MapMetadataMbtilesUtil.java:34-56), and the distributed range scan.
Fixtures are deterministic (tools/make_mbtiles_fixture.py), so every
expectation is re-derived arithmetically."""

import os

import pytest

from osm2world_spark.sources.mbtiles import (
    flipped_y,
    mbtiles_metadata,
    mbtiles_tile,
    mbtiles_tiles,
    mbtiles_tiles_for_bounds,
    metadata_for_tile,
)
from tools.make_mbtiles_fixture import BASE, fixture_tiles, tile_blob

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fixture.mbtiles")
META = os.path.join(os.path.dirname(__file__), "fixtures", "meta.mbtiles")


def test_flipped_y_matches_reference_and_is_involution():
    # TileNumber.java:88-90
    assert flipped_y(13, 2828) == (1 << 13) - 1 - 2828
    for z, x, r in fixture_tiles():
        assert flipped_y(z, flipped_y(z, r)) == r


def test_single_tile_fetch_applies_tms_flip():
    z0, x0, y0 = BASE
    blob = mbtiles_tile(FIX, z0, x0, y0)
    assert blob == tile_blob(z0, x0, (1 << z0) - 1 - y0)
    # absent tile -> None
    assert mbtiles_tile(FIX, z0, x0 + 999, y0) is None


def test_missing_file_raises_file_not_found():
    with pytest.raises(FileNotFoundError):
        mbtiles_tile("/nonexistent/nope.mbtiles", 12, 0, 0)


def test_bounds_access_unsupported():
    with pytest.raises(NotImplementedError):
        mbtiles_tiles_for_bounds(FIX, (48.5, 13.3, 48.6, 13.4))


def test_metadata_table(spark):
    rows = {r["name"]: r["value"] for r in mbtiles_metadata(spark, FIX).collect()}
    assert rows["format"] == "pbf"
    assert rows["minzoom"] == "12" and rows["maxzoom"] == "14"


def test_distributed_scan_matches_fixture_exactly(spark):
    got = {
        (r["zoom"], r["tile_x"], r["tile_y"]): (r["tms_row"], bytes(r["tile_data"]))
        for r in mbtiles_tiles(spark, FIX).collect()
    }
    want = {
        (z, x, (1 << z) - 1 - r): (r, tile_blob(z, x, r))
        for z, x, r in fixture_tiles()
    }
    assert got == want


def test_distributed_scan_splits(spark):
    # tiny rows_per_split forces multiple range splits per zoom; content
    # must be identical (no dup, no loss at split borders)
    n = mbtiles_tiles(spark, FIX, rows_per_split=2).count()
    assert n == len(fixture_tiles())


def test_metadata_for_tile_walks_up_the_pyramid():
    z0, x0, y0 = BASE
    # direct hit at z12
    assert metadata_for_tile(META, z0, x0, y0) == {"locale": "DE", "land": True}
    # z13 child with its own blob
    assert metadata_for_tile(META, 13, x0 * 2 + 1, y0 * 2) == {
        "locale": "AT", "land": None,
    }
    # z14 grandchild: walks up to the z13 blob
    assert metadata_for_tile(META, 14, (x0 * 2 + 1) * 2, y0 * 4) == {
        "locale": "AT", "land": None,
    }
    # z14 under the OTHER z13 child (no blob): walks up to z12
    assert metadata_for_tile(META, 14, x0 * 4, y0 * 4) == {
        "locale": "DE", "land": True,
    }
    # totally outside: None
    assert metadata_for_tile(META, 14, 3, 5) is None


def test_distributed_scan_many_files(spark, tmp_path):
    """A tileset of several mbtiles files scans as one table."""
    import sqlite3

    paths = []
    for i in range(2):
        p = str(tmp_path / f"t{i}.mbtiles")
        con = sqlite3.connect(p)
        con.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
            "tile_row integer, tile_data blob)"
        )
        con.execute(
            "INSERT INTO tiles VALUES (?, ?, ?, ?)", (10, 5 + i, 7, b"x" * (i + 1))
        )
        con.commit()
        con.close()
        paths.append(p)
    rows = {
        (r["zoom"], r["tile_x"]): r for r in mbtiles_tiles(spark, paths).collect()
    }
    assert set(rows) == {(10, 5), (10, 6)}
    assert rows[(10, 6)]["n_bytes"] == 2
    assert rows[(10, 5)]["tile_y"] == (1 << 10) - 1 - 7
