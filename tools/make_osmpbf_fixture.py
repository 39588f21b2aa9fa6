"""Generate the committed OSM PBF fixtures. Every element is a pure
function of its index, so the driver oracles re-derive the expected
rows arithmetically without touching the parser under test.

- tests/fixtures/fixture.osm.pbf — DenseNodes + Ways + Relations in one
  zlib OSMData blob behind an OSMHeader (the OSMFileReader path,
  OSMStreamReader.java:88-89).
- tests/fixtures/pbf_tiles.mbtiles — an MBTiles file whose tile blobs
  are bare OSMData blobs (the MbtilesReader.getData path,
  MbtilesReader.java:63-67): z14 tiles each holding 3 nodes + 1 way
  derived from the tile address.

Regenerate (stable output): python tools/make_osmpbf_fixture.py
"""

from __future__ import annotations

import os
import sqlite3
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

N_NODES = 40
N_WAYS = 10
N_RELS = 3

# the z14 tiles of the pbf-blob mbtiles (inside the meta fixture's z12
# BASE tile region): XYZ coords
PBF_TILES = [(14, 8805 + dx, 5657 + dy) for dx in range(3) for dy in range(2)]


def file_nodes():
    out = []
    for i in range(N_NODES):
        tags = (
            {"natural": "tree"} if i % 3 == 0
            else {"highway": "crossing", "name": f"n{i}"} if i % 3 == 1
            else {}
        )
        out.append((100 + i, 48.52 + i * 0.001, 13.37 + i * 0.002, tags))
    return out


def file_ways():
    return [
        (
            500 + j,
            [100 + j, 100 + j + 1, 100 + j + 2],
            {"highway": "residential"} if j % 2 else {"building": "yes"},
        )
        for j in range(N_WAYS)
    ]


def file_relations():
    return [
        (
            900 + k,
            [("node", 100 + k, "admin_centre"), ("way", 500 + k, "outer")],
            {"type": "multipolygon"},
        )
        for k in range(N_RELS)
    ]


def tile_nodes(z: int, x: int, y: int):
    """3 nodes per tile, ids/coords/tags a pure function of (z, x, y)."""
    base = (x * 10000 + y) * 10
    return [
        (
            base + i,
            48.0 + ((x + i) % 100) * 0.001,
            13.0 + ((y + i) % 100) * 0.001,
            {"ref": f"t{x}_{y}_{i}"} if i == 0 else {},
        )
        for i in range(3)
    ]


def tile_way(z: int, x: int, y: int):
    base = (x * 10000 + y) * 10
    return (base + 9, [base, base + 1, base + 2], {"highway": "path"})


def main() -> None:
    from osm2world_spark.sources.osmpbf import make_pbf_blob, write_osm_pbf
    from osm2world_spark.sources.osmxml import write_osm_xml

    os.makedirs(FIXDIR, exist_ok=True)
    pbf_path = os.path.join(FIXDIR, "fixture.osm.pbf")
    write_osm_pbf(pbf_path, file_nodes(), file_ways(), file_relations())
    print(f"wrote {N_NODES} nodes / {N_WAYS} ways / {N_RELS} relations ->",
          pbf_path)

    # the SAME elements as .osm and .osm.gz (format-agnostic schema):
    # the XML fixtures add two action="delete" stubs the JOSM
    # workaround must drop
    for name in ("fixture.osm", "fixture.osm.gz"):
        write_osm_xml(
            os.path.join(FIXDIR, name),
            file_nodes(), file_ways(), file_relations(),
            deleted_node_ids=(9001, 9002),
        )
        print("wrote", name)

    mb_path = os.path.join(FIXDIR, "pbf_tiles.mbtiles")
    if os.path.exists(mb_path):
        os.remove(mb_path)
    con = sqlite3.connect(mb_path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    con.execute(
        "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
        "tile_row integer, tile_data blob)"
    )
    con.execute("INSERT INTO metadata VALUES ('format', 'pbf')")
    con.execute("INSERT INTO metadata VALUES ('name', 'pbf tile fixture')")
    for z, x, y in PBF_TILES:
        blob = make_pbf_blob(tile_nodes(z, x, y), [tile_way(z, x, y)])
        con.execute(
            "INSERT INTO tiles VALUES (?, ?, ?, ?)",
            (z, x, (1 << z) - 1 - y, blob),
        )
    con.commit()
    con.close()
    print(f"wrote {len(PBF_TILES)} pbf tile blobs ->", mb_path)


if __name__ == "__main__":
    main()
