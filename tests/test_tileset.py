"""Tileset index + layout sink (S8): per-root index math and the
partitioned one-JSON-per-root-tile write layout
(TilesetOutput.java:38-120, TilesetCommand.java:239-246)."""

import json
import math
import os

from pyspark.sql import functions as F

from osm2world_spark.plans.tileset import (
    tileset_documents,
    tileset_index,
    write_tileset,
)


def _tiles(spark):
    # z14 assignments across two z12 roots: root (1100, 700) gets children
    # (4400,2800)x3 + (4401,2801)x1; root (1100, 701) gets (4400,2804)x2
    rows = [
        (14, 4400, 2800),
        (14, 4400, 2800),
        (14, 4400, 2800),
        (14, 4401, 2801),
        (14, 4400, 2804),
        (14, 4400, 2804),
        # non-child zoom rows must be ignored by the index
        (12, 1100, 700),
    ]
    return spark.createDataFrame(rows, "zoom int, tile_x int, tile_y int")


def _slippy_lat(y, zoom):
    n = math.pi - 2.0 * math.pi * y / (1 << zoom)
    return math.degrees(math.atan(math.sinh(n)))


def test_tileset_index_rollup_and_bounds(spark):
    idx = {(r["tile_x"], r["tile_y"]): r for r in tileset_index(_tiles(spark)).collect()}
    assert set(idx) == {(1100, 700), (1100, 701)}
    a = idx[(1100, 700)]
    assert a["zoom"] == 12 and a["n_children"] == 2 and a["n_elements"] == 4
    assert a["content_uri"] == "12/1100/700/tileset.json"
    # tight bounds = union of the two populated children, not the root tile
    assert abs(a["minlon"] - (4400 / 16384.0 * 360.0 - 180.0)) < 1e-9
    assert abs(a["maxlon"] - (4402 / 16384.0 * 360.0 - 180.0)) < 1e-9
    assert abs(a["minlat"] - _slippy_lat(2802, 14)) < 1e-6
    assert abs(a["maxlat"] - _slippy_lat(2800, 14)) < 1e-6
    b = idx[(1100, 701)]
    assert b["n_children"] == 1 and b["n_elements"] == 2


def test_write_tileset_layout_and_documents(spark, tmp_path):
    path = str(tmp_path / "tileset")
    write_tileset(_tiles(spark), path)
    # hive-partitioned {zoom}/{x}/{y} tree, one JSON doc per root tile
    roots = [(1100, 700), (1100, 701)]
    for x, y in roots:
        d = os.path.join(path, "zoom=12", f"tile_x={x}", f"tile_y={y}")
        parts = [f for f in os.listdir(d) if f.startswith("part-")]
        assert parts, d
        lines = [
            ln
            for f in parts
            for ln in open(os.path.join(d, f)).read().splitlines()
            if ln.strip()
        ]
        assert len(lines) == 1
        doc = json.loads(lines[0])
        assert doc["root"] == {"zoom": 12, "x": x, "y": y}
        assert doc["n_children"] == len(doc["children"])
        assert sum(c["n_elements"] for c in doc["children"]) == doc["n_elements"]
        for c in doc["children"]:
            assert c["uri"] == f"lod2/14/{c['x']}/{c['y']}"
            assert c["minlat"] < c["maxlat"] and c["minlon"] < c["maxlon"]
    # the document view matches the index view row-for-row on shared cols
    idx = tileset_index(_tiles(spark))
    docs = tileset_documents(_tiles(spark))
    joined = idx.join(docs, ["zoom", "tile_x", "tile_y"]).count()
    assert joined == idx.count() == 2


def test_pipeline_with_tileset_sink(spark, tmp_path):
    """with_tileset=True materializes the index tree over the committed
    tile_assignments stage; every populated z12 root gets exactly one
    parsable JSON doc whose element total matches the stage table."""
    from osm2world_spark.plans.pipeline import TilePipeline
    from osm2world_spark.sources.documents import synthetic_documents

    docs = synthetic_documents(spark, 120, seed=7)
    out = str(tmp_path / "pipe")
    report = TilePipeline(spark, out).run(docs, with_overlaps=False, with_tileset=True)
    assert report["tileset_roots"] >= 1
    ts = spark.read.text(os.path.join(out, "tileset"))
    docs_json = [json.loads(r["value"]) for r in ts.collect()]
    assert len(docs_json) == report["tileset_roots"]
    stage = spark.read.parquet(os.path.join(out, "tile_assignments"))
    n14 = stage.where(F.col("zoom") == 14).count()
    assert sum(d["n_elements"] for d in docs_json) == n14
