"""SRTM .hgt binary codec tests (SRTMTile.java / SRTMData.java semantics)."""

import struct

import numpy as np
import pytest

from osm2world_spark.sources.raster import BLANK_VALUE, PIXELS
from osm2world_spark.sources.srtm import (
    _decode_payload,
    decode_hgt_tiles,
    encode_hgt,
    hgt_filename,
    hgt_sites,
    parse_hgt_filename,
)


def _grid(seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-500, 3000, size=(PIXELS, PIXELS)).astype(np.int16)


def test_byte_layout_matches_reference_addressing():
    """SRTMTile.getData(x, y) = buf[(1200 - y) * 1201 + x] over big-endian
    shorts — pin the raw byte positions, not just the roundtrip."""
    grid = _grid()
    grid[10, 5] = 1234     # [y, x]
    grid[0, 0] = -321      # south-west corner
    grid[1200, 1200] = 777  # north-east corner
    raw = encode_hgt(grid)
    assert len(raw) == PIXELS * PIXELS * 2
    for (y, x), want in (((10, 5), 1234), ((0, 0), -321), ((1200, 1200), 777)):
        off = ((1200 - y) * 1201 + x) * 2
        got = struct.unpack(">h", raw[off : off + 2])[0]
        assert got == want, (x, y)
    np.testing.assert_array_equal(_decode_payload(raw), grid)


def test_zip_payload_roundtrip():
    grid = _grid(7)
    zipped = encode_hgt(grid, zipped=True, name="N48E013.hgt")
    assert zipped[:4] == b"PK\x03\x04"
    np.testing.assert_array_equal(_decode_payload(zipped), grid)


def test_short_payload_raises():
    with pytest.raises(ValueError, match="[Tt]oo few elevation values"):
        _decode_payload(b"\x00" * 100)


def test_filename_codec():
    assert hgt_filename(13, 48) == "N48E013.hgt"
    assert hgt_filename(-72, -13, zipped=True) == "S13W072.hgt.zip"
    assert parse_hgt_filename("N48E013.hgt") == (13, 48)
    assert parse_hgt_filename("S13W072.hgt.zip") == (-72, -13)
    assert parse_hgt_filename("N48E013.SRTMGL3.hgt.zip") == (13, 48)
    assert parse_hgt_filename("readme.txt") is None
    assert parse_hgt_filename("/srtm/N48E013.hgt") == (13, 48)


def test_decode_tiles_spark(spark):
    grid_a = _grid(1)
    grid_b = _grid(2)
    files = spark.createDataFrame(
        [
            ("N48E013.hgt", bytearray(encode_hgt(grid_a))),
            ("N48E014.hgt.zip", bytearray(encode_hgt(grid_b, zipped=True))),
            ("notes.txt", bytearray(b"skip me")),
        ],
        "file_name string, payload binary",
    )
    px = decode_hgt_tiles(files)
    sample = (
        px.where("px % 400 = 0 AND py % 400 = 0")
        .orderBy("cell_lon", "px", "py")
        .collect()
    )
    # 2 valid files x 4x4 sampled pixels
    assert len(sample) == 2 * 16
    for r in sample:
        g = grid_a if r.cell_lon == 13 else grid_b
        assert r.elev == g[r.py, r.px], (r.cell_lon, r.px, r.py)
    assert px.count() == 2 * PIXELS * PIXELS


def test_hgt_sites_bounds_and_blank(spark):
    from osm2world_spark.sources.documents import DEFAULT_ORIGIN

    grid = _grid(5)
    grid[100, 200] = BLANK_VALUE
    files = spark.createDataFrame(
        [("N48E013.hgt", bytearray(encode_hgt(grid)))],
        "file_name string, payload binary",
    )
    # a tight bbox inside the cell; seam pad 0.005 deg widens it
    sites = hgt_sites(files, DEFAULT_ORIGIN, 48.05, 13.10, 48.10, 13.15)
    rows = sites.collect()
    assert len(rows) > 0
    # exact SRTMData.addTileSites pixel range on the padded bbox, minus the
    # blank pixel if it falls inside
    import math

    x0 = max(0, math.ceil(PIXELS * (13.10 - 0.005 - 13)))
    x1 = min(PIXELS - 1, math.floor(PIXELS * (13.15 + 0.005 - 13)))
    y0 = max(0, math.ceil(PIXELS * (48.05 - 0.005 - 48)))
    y1 = min(PIXELS - 1, math.floor(PIXELS * (48.10 + 0.005 - 48)))
    expected = sum(
        1
        for x in range(x0, x1)
        for y in range(y0, y1)
        if grid[y, x] != BLANK_VALUE
    )
    assert len(rows) == expected
    # elevation values survive the pixel->site conversion
    ids = {r.s_id: r.y for r in rows}
    probe_x, probe_y = x0 + 1, y0 + 1
    if grid[probe_y, probe_x] != BLANK_VALUE:
        assert ids[f"13_48_{probe_x}_{probe_y}"] == float(grid[probe_y, probe_x])


def test_read_hgt_dir_binaryfile(spark, tmp_path):
    from osm2world_spark.sources.srtm import decode_hgt_tiles, read_hgt_dir

    g1, g2 = _grid(11), _grid(12)
    (tmp_path / "N48E013.hgt").write_bytes(encode_hgt(g1))
    (tmp_path / "N48E014.hgt.zip").write_bytes(encode_hgt(g2, zipped=True))
    (tmp_path / "README.txt").write_text("not a tile")
    files = read_hgt_dir(spark, str(tmp_path))
    assert {r.file_name for r in files.select("file_name").collect()} == {
        "N48E013.hgt",
        "N48E014.hgt.zip",
    }
    px = decode_hgt_tiles(files)
    row = px.where("cell_lon = 13 AND px = 7 AND py = 9").first()
    assert row.elev == g1[9, 7]
    assert px.count() == 2 * PIXELS * PIXELS
