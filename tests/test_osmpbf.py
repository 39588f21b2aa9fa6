"""OSM PBF decode (public PBF format; the inner blob decode the
reference delegates to osm4j's PbfIterator — OSMStreamReader.java:88-89
for files, MbtilesReader.java:63-67 for MBTiles tile blobs): wire-level
roundtrips, the distributed file reader, and the mbtiles->elements
end-to-end path. Fixture expectations re-derive from the deterministic
generator formulas (tools/make_osmpbf_fixture.py)."""

import os
import struct
import zlib

import pytest

from osm2world_spark.sources.osmpbf import (
    decode_pbf_blobs,
    make_pbf_blob,
    parse_pbf_blob,
    pbf_blob_table,
    read_osm_pbf,
    write_osm_pbf,
)
from tools.make_osmpbf_fixture import (
    PBF_TILES,
    file_nodes,
    file_relations,
    file_ways,
    tile_nodes,
    tile_way,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "fixture.osm.pbf")
MB = os.path.join(os.path.dirname(__file__), "fixtures", "pbf_tiles.mbtiles")


def test_blob_roundtrip_all_element_kinds():
    nodes = [
        (101, 48.5671, 13.4512, {"natural": "tree"}),
        (102, 48.5672, 13.4513, {}),
        (205, -33.8568, 151.2153, {"name": "Opera", "tourism": "attraction"}),
    ]
    ways = [(900, [101, 102], {"highway": "residential"}),
            (901, [102, 101, 205], {})]
    rels = [(77, [("node", 101, "admin_centre"), ("way", 900, "outer")],
             {"type": "multipolygon"})]
    rows = parse_pbf_blob(make_pbf_blob(nodes, ways, rels))
    by = {(r[0], r[1]): r for r in rows}
    assert by[("node", 101)][2] == pytest.approx(48.5671, abs=1e-7)
    assert by[("node", 205)][2] == pytest.approx(-33.8568, abs=1e-7)
    assert by[("node", 205)][4] == {"name": "Opera", "tourism": "attraction"}
    assert by[("way", 901)][5] == [102, 101, 205]  # delta decode
    assert by[("relation", 77)][5] == [101, 900]
    assert by[("relation", 77)][6] == ["node", "way"]
    assert by[("relation", 77)][7] == ["admin_centre", "outer"]


def test_framing_walk_reads_headers_only(spark):
    t = {r["blob_type"]: r for r in pbf_blob_table(spark, FIX).collect()}
    assert set(t) == {"OSMHeader", "OSMData"}
    assert t["OSMData"]["size"] > 0
    # offsets consistent with the file length
    sz = os.path.getsize(FIX)
    assert t["OSMData"]["offset"] + t["OSMData"]["size"] == sz


def test_read_osm_pbf_matches_generator_formulas(spark):
    rows = read_osm_pbf(spark, FIX).collect()
    nodes = {r["id"]: r for r in rows if r["element_type"] == "node"}
    ways = {r["id"]: r for r in rows if r["element_type"] == "way"}
    rels = {r["id"]: r for r in rows if r["element_type"] == "relation"}
    want_nodes = file_nodes()
    assert len(nodes) == len(want_nodes)
    for nid, lat, lon, tags in want_nodes:
        r = nodes[nid]
        assert r["lat"] == pytest.approx(lat, abs=1e-7)
        assert r["lon"] == pytest.approx(lon, abs=1e-7)
        assert dict(r["tags"]) == tags
    for wid, refs, tags in file_ways():
        assert list(ways[wid]["refs"]) == refs
        assert dict(ways[wid]["tags"]) == tags
    for rid, members, tags in file_relations():
        r = rels[rid]
        assert list(r["refs"]) == [m[1] for m in members]
        assert list(r["member_types"]) == [m[0] for m in members]
        assert list(r["member_roles"]) == [m[2] for m in members]


def test_multi_blob_file(spark, tmp_path):
    """A file with several OSMData blobs decodes blob-independently
    (delta chains and string tables reset per blob)."""
    p1 = str(tmp_path / "a.osm.pbf")
    p2 = str(tmp_path / "b.osm.pbf")
    write_osm_pbf(p1, [(1, 10.0, 20.0, {"a": "1"})], [])
    write_osm_pbf(p2, [(2, -10.0, -20.0, {"b": "2"})], [])

    def data_blob_frames(path):
        out = b""
        data = open(path, "rb").read()
        p = 0
        while p < len(data):
            (hl,) = struct.unpack(">I", data[p : p + 4])
            hdr = data[p + 4 : p + 4 + hl]
            # datasize is the last varint field in our writer's header
            from osm2world_spark.sources.osmpbf import _fields

            btype, size = "?", 0
            for fno, _, v in _fields(hdr):
                if fno == 1:
                    btype = bytes(v).decode()
                elif fno == 3:
                    size = v
            frame = data[p : p + 4 + hl + size]
            if btype == "OSMData":
                out += frame
            p += 4 + hl + size
        return out, data[: len(data) - len(out)]

    d1, head = data_blob_frames(p1)
    d2, _ = data_blob_frames(p2)
    combo = str(tmp_path / "combo.osm.pbf")
    open(combo, "wb").write(head + d1 + d2)
    rows = {r["id"]: r for r in read_osm_pbf(spark, combo).collect()}
    assert rows[1]["lat"] == pytest.approx(10.0, abs=1e-7)
    assert rows[2]["lat"] == pytest.approx(-10.0, abs=1e-7)
    assert dict(rows[1]["tags"]) == {"a": "1"}
    assert dict(rows[2]["tags"]) == {"b": "2"}


def test_mbtiles_pbf_blobs_end_to_end(spark):
    """The reference's MbtilesReader.getData path: tile blob -> pbf
    elements, with tile keys carried through."""
    from osm2world_spark.sources.mbtiles import mbtiles_tiles

    tiles = mbtiles_tiles(spark, MB)
    els = decode_pbf_blobs(tiles, keys=("zoom", "tile_x", "tile_y"))
    rows = els.collect()
    got_tiles = {(r["zoom"], r["tile_x"], r["tile_y"]) for r in rows}
    assert got_tiles == set(PBF_TILES)
    for z, x, y in PBF_TILES:
        mine = [r for r in rows if (r["zoom"], r["tile_x"], r["tile_y"]) == (z, x, y)]
        nodes = {r["id"]: r for r in mine if r["element_type"] == "node"}
        want = tile_nodes(z, x, y)
        assert set(nodes) == {n[0] for n in want}
        for nid, lat, lon, tags in want:
            assert nodes[nid]["lat"] == pytest.approx(lat, abs=1e-7)
            assert dict(nodes[nid]["tags"]) == tags
        wid, refs, tags = tile_way(z, x, y)
        w = [r for r in mine if r["element_type"] == "way"][0]
        assert w["id"] == wid and list(w["refs"]) == refs


def test_corrupt_blob_raises():
    with pytest.raises(Exception):
        parse_pbf_blob(b"\x00\x01\x02garbage")
    # a Blob with neither raw nor zlib payload
    from osm2world_spark.sources.osmpbf import _w_field, _w_varint

    empty = _w_field(2, 0, _w_varint(5))  # only raw_size
    with pytest.raises(ValueError, match="neither"):
        parse_pbf_blob(empty)


def test_zlib_payload_actually_compressed():
    data = open(FIX, "rb").read()
    assert b"residential" not in data  # strings live inside the zlib blob
    assert zlib  # imported: the writer compresses, the parser inflates


def test_assemble_way_geometries_full_pipeline(spark):
    """fixture.osm.pbf -> elements -> per-way ordered coordinates: the
    reference's file -> node store -> way geometry pipeline end to end.
    Way 500+j references nodes 100+j..100+j+2, whose coords follow the
    generator formulas."""
    from osm2world_spark.sources.osmpbf import assemble_way_geometries

    els = read_osm_pbf(spark, FIX)
    ways = {r["way_id"]: r for r in assemble_way_geometries(els).collect()}
    for wid, refs, tags in file_ways():
        r = ways[wid]
        assert r["n_pts"] == 3 and r["n_missing"] == 0
        j = wid - 500
        want_lats = [48.52 + (j + d) * 0.001 for d in range(3)]
        for got, want in zip(r["lats"], want_lats):
            assert got == pytest.approx(want, abs=1e-7)
        assert dict(r["tags"]) == tags


def test_assemble_way_geometries_missing_ref(spark, tmp_path):
    p = str(tmp_path / "m.osm.pbf")
    write_osm_pbf(p, [(1, 5.0, 6.0, {})], [(10, [1, 999], {})])
    from osm2world_spark.sources.osmpbf import assemble_way_geometries

    r = assemble_way_geometries(read_osm_pbf(spark, p)).collect()[0]
    assert r["n_pts"] == 2 and r["n_missing"] == 1


def test_read_many_files(spark, tmp_path):
    """A corpus of .osm.pbf files decodes in one distributed table."""
    ps = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.osm.pbf")
        write_osm_pbf(p, [(1000 + i, 1.0 + i, 2.0, {"f": str(i)})])
        ps.append(p)
    rows = {r["id"]: r for r in read_osm_pbf(spark, ps).collect()}
    assert set(rows) == {1000, 1001, 1002}
    assert dict(rows[1002]["tags"]) == {"f": "2"}
