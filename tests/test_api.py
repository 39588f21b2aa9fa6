"""Engine facade + DocumentBuilder tests (O2WConverter / MapDataBuilder
analogues, SURVEY.md section 3.3)."""

import pytest


def test_builder_and_engine_roundtrip(spark, tmp_path):
    from osm2world_spark.api import DocumentBuilder, Engine, EngineConfig
    from osm2world_spark.functions.projection import Origin

    lat0, lon0 = 48.566, 13.451
    b = DocumentBuilder()
    b.add_text("d1", "a small scene")
    b.add_node("d1", lat0 + 0.0001, lon0 + 0.0001)
    b.add_area(
        "d1",
        [(lat0, lon0), (lat0, lon0 + 0.001), (lat0 + 0.001, lon0 + 0.001), (lat0 + 0.001, lon0)],
    )
    b.add_way("d2", [(lat0 - 0.0005, lon0 - 0.0005), (lat0 + 0.002, lon0 + 0.002)])
    b.add_media("d2", "media://x")
    docs = b.build(spark)

    # span-sequence invariant: kinds and offsets in insertion order
    spans = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert [s["kind"] for s in spans["d1"]] == ["text", "geo_point", "geo_area"]
    assert [s["offset"] for s in spans["d2"]] == [0, 1]

    eng = Engine(spark, EngineConfig(origin=Origin(lat0, lon0)))
    elements = eng.elements(docs).cache()
    by_type = {r["element_type"]: r for r in elements.collect()}
    assert set(by_type) == {"node", "area", "way"}

    tiles = eng.tile_assignments(elements)
    assert tiles.where("zoom = 12").count() >= 2

    overlaps = eng.overlaps(elements)
    kinds = {r["overlap_kind"] for r in overlaps.collect()}
    # the node sits inside the area; the way crosses it
    assert "CONTAIN" in kinds and "INTERSECT" in kinds

    # full resumable convert
    out = str(tmp_path / "out")
    report = eng.convert(docs, out_dir=out)
    assert report["tile_assignments"] >= 1
    report2 = eng.convert(docs, out_dir=out, run_ts="run1")
    assert report2["tile_assignments"] == 0  # all tiles committed -> skipped


def test_engine_interpolator_config(spark):
    from osm2world_spark.api import Engine, EngineConfig

    sites = spark.createDataFrame(
        [(f"s{i}", float(i % 6) * 20.0, float(i // 6) * 20.0, 5.0) for i in range(36)],
        "s_id string, x double, z double, y double",
    )
    queries = spark.createDataFrame([("q", 51.0, 49.0)], "q_id string, x double, z double")
    eng = Engine(spark, EngineConfig(interpolator="idw"))
    rows = eng.elevations(queries, sites).collect()
    assert len(rows) == 1 and abs(rows[0]["ele"] - 5.0) < 1e-9


def test_engine_round4_surfaces(spark, tmp_path):
    """The round-4 sources/operators are reachable from the facade."""
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from osm2world_spark.api import Engine
    from osm2world_spark.sources.srtm import encode_hgt
    from osm2world_spark.functions.png import encode_png
    from osm2world_spark.sources.raster import PIXELS

    eng = Engine(spark)

    # CAG subtract through the facade
    pairs = spark.createDataFrame(
        [("p", [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]],
          [[-5.0, -5.0, 4.0, -5.0, 4.0, 6.0, -5.0, 6.0, -5.0, -5.0]])],
        "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>",
    )
    assert eng.subtract(pairs).count() == 1
    assert eng.intersect(pairs).count() == 1

    # SRTM directory -> sites
    grid = np.full((PIXELS, PIXELS), 500, dtype=np.int16)
    (tmp_path / "N48E013.hgt").write_bytes(encode_hgt(grid))
    sites = eng.srtm_sites(str(tmp_path), 48.05, 13.10, 48.06, 13.11)
    assert sites.count() > 0

    # OSM JSON -> elements
    resp = spark.createDataFrame(
        [(0, json.dumps({"version": 0.6, "elements": [
            {"type": "node", "id": 1, "lat": 48.5, "lon": 13.3}]}))],
        "response_id int, json string",
    )
    els = eng.osm_elements(resp)
    assert els.where("version_ok").count() == 1

    # media decode through the facade (PNG path)
    media = spark.createDataFrame(
        [("d", 0, "r", "image", bytearray(encode_png(np.zeros((8, 8), np.uint8))), 8, 8)],
        "doc_id string, span_idx int, media_ref string, media_type string, "
        "payload binary, width int, height int",
    )
    feats = eng.media_features(media).collect()
    assert len(feats) == 1 and len(feats[0].feature) == 16


def test_engine_serializer_facade(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from osm2world_spark.api import Engine

    eng = Engine(spark)
    V = lambda x, y, z: Row(x=float(x), y=float(y), z=float(z))  # noqa: E731
    meshes = spark.createDataFrame([
        Row(tile="t0", mesh_order=0, osm_id="w1", type_name="Building",
            material="M0", r=10, g=20, b=30,
            triangles=[[V(0, 0, 0), V(1, 0, 0), V(0, 1, 0)]]),
    ])
    pov = eng.serialize_pov(meshes).collect()[0]["pov_text"]
    assert "triangle {" in pov
    gltf = eng.serialize_gltf(meshes).collect()[0]["gltf_json"]
    assert '"asset"' in gltf
    glb = bytes(eng.serialize_gltf(meshes, binary=True).collect()[0]["glb"])
    assert glb[:4] == b"glTF"
    pbf = bytes(eng.serialize_frontend_pbf(meshes).collect()[0]["pbf"])
    assert len(pbf) > 20
    faces = meshes.select(
        "tile", F.col("mesh_order").alias("face_order"),
        F.lit("G").alias("group_name"), F.col("osm_id").alias("object_name"),
        "material", "r", "g", "b",
        F.element_at("triangles", 1).alias("vertices"),
        F.lit(None).cast(
            "array<struct<x:double,y:double,z:double>>").alias("normals"),
        F.lit(None).cast(
            "array<struct<u:double,v:double>>").alias("texcoords"),
    )
    obj = eng.serialize_obj(faces).collect()[0]
    assert "f 1 2 3" in obj["obj_text"] and "newmtl M0_0" in obj["mtl_text"]


def test_bounded_docs_tile_and_bbox(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.sources.documents import (
        extract_elements,
        synthetic_documents,
    )
    from osm2world_spark.sources.views import bounded_docs, bounds_predicate

    docs = synthetic_documents(spark, 200, seed=3)
    els = extract_elements(docs)
    # docs without geometry spans have no footprint: any restriction
    # excludes them (bounded geodata-read semantics)
    n_geo = els.select("doc_id").distinct().count()

    # a planet-wide bbox keeps every geometry-carrying doc; an
    # empty-ocean bbox nothing
    assert bounded_docs(docs, bounds=(-85.0, -180.0, 85.0, 180.0)).count() == n_geo
    assert bounded_docs(docs, bounds=(80.0, 170.0, 81.0, 171.0)).count() == 0

    # a data-derived tile keeps a nonzero strict subset that matches the
    # manual extract+predicate+semi-join recompute
    row = els.select("minlat", "minlon").first()
    import math

    z = 12
    lat, lon = row["minlat"], row["minlon"]
    x = int((lon + 180.0) / 360.0 * (1 << z))
    y = int(
        (1.0 - math.log(math.tan(math.radians(lat))
                        + 1.0 / math.cos(math.radians(lat))) / math.pi)
        / 2.0 * (1 << z)
    )
    got = bounded_docs(docs, tile=(z, x, y))
    n_got = got.count()
    assert 0 < n_got < n_geo

    from osm2world_spark.sources.views import tile_bounds

    manual_ids = {
        r["doc_id"]
        for r in els.where(bounds_predicate(els, tile_bounds(z, x, y)))
        .select("doc_id").distinct().collect()
    }
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == manual_ids

    import pytest

    with pytest.raises(ValueError):
        bounded_docs(docs, bounds=(0, 0, 1, 1), tile=(1, 0, 0))


def test_engine_round5_facade(spark):
    """The Engine facade exposes the round-5 surface: render/render_png,
    classify, normalized/url dedup, mojibake fix, sharding, resize/
    resample, osmChange splitting — each delegating to the tested op."""
    from pyspark.sql import functions as F

    from osm2world_spark.api import Engine
    from osm2world_spark.functions.png import decode_png

    e = Engine(spark)
    docs = spark.createDataFrame(
        [("d1", "Héllo Wörld 2024"), ("d2", "héllo wörld 0000")],
        "doc_id string, text string",
    )
    assert e.dedup_normalized(docs).count() == 1

    broken = docs.select(
        "doc_id",
        F.lit("hÃ©llo ").alias("text"),  # 'Ã©' mojibake
    )
    fixed = e.fix_text(broken)
    assert fixed.first()["text"] == "héllo "

    urls = spark.createDataFrame(
        [("a", "http://X.com:80/p/"), ("b", "http://x.com/p")],
        "doc_id string, url string",
    )
    assert e.dedup_urls(urls).first()["survivor"] == "a"

    sh = e.shard(docs, 4)
    assert {"shard", "shard_pos"} <= set(sh.columns)

    wv = spark.range(16).select(
        F.col("id").alias("bucket"),
        F.array(F.lit(1).cast("bigint"), F.lit(2).cast("bigint")).alias("ws"),
    )
    scored = e.classify(docs, wv, [0, 0], 16)
    assert scored.count() == 2 and set(scored.columns) >= {"scores", "label"}

    meshes = spark.createDataFrame(
        [("t", 1, 9, 9, 9,
          [[{"x": 0.0, "y": 0.0, "z": 0.0},
            {"x": 4.0, "y": 0.0, "z": 0.0},
            {"x": 4.0, "y": 0.0, "z": 4.0}]])],
        "tile string, mesh_order bigint, r int, g int, b int, "
        "triangles array<array<struct<x double, y double, z double>>>",
    )
    pix1 = e.render(meshes, 8, 8, viewport=(0.0, 0.0, 4.0, 4.0))
    pix2 = e.render(meshes, 8, 8, viewport=(0.0, 0.0, 4.0, 4.0), n_strips=2)
    assert sorted(map(tuple, pix1.collect())) == sorted(
        map(tuple, pix2.collect()))
    png = e.render_png(pix1, 8, 8).first()
    assert decode_png(bytes(png["png"])).shape == (8, 8, 3)

    from osm2world_spark.sources.osmxml import decode_osm_change

    osc = spark.createDataFrame(
        [('<osmChange><create><node id="1" lat="1" lon="2"/></create>'
          '<delete><node id="9"/></delete></osmChange>',)],
        "xml string",
    )
    ups, dels = e.apply_changes(decode_osm_change(osc))
    assert ups.count() == 1 and dels.first()["id"] == 9


def test_engine_training_and_incremental_facade(spark):
    """The continuation surface: classifier training epoch, LM evidence
    + bucket split, span removal, index-scan dedup — each facade method
    delegating to the tested operator."""
    from pyspark.sql import functions as F

    from osm2world_spark.api import Engine

    e = Engine(spark)
    docs = spark.createDataFrame(
        [("d1", "alpha beta gamma delta"), ("d2", "alpha beta gamma delta"),
         ("d3", "epsilon zeta eta theta")],
        "doc_id string, text string",
    )
    labels = docs.select("doc_id", (F.length("text") % 2).alias("y"))
    wv = spark.range(16).select(
        F.col("id").alias("bucket"),
        F.array(F.lit(0).cast("bigint"), F.lit(0).cast("bigint")).alias("ws"),
    )
    nw, stats = e.train_classifier_epoch(docs, labels, wv, [0, 0], 16)
    assert stats.first()["n_scored"] == 3
    assert nw.count() >= 16

    scored = e.lm_score(docs)
    assert scored.count() == 3
    buckets = e.lm_buckets(
        scored, (2.0, 1.0), num_col="sum_hit_num", den_col="n_bigrams")
    assert set(buckets.columns) == {
        "doc_id", "sum_hit_num", "n_bigrams", "familiarity", "bucket"}

    cleaned = e.remove_duplicate_spans(docs, k=4)
    got = {r["doc_id"]: r["n_removed"] for r in cleaned.collect()}
    assert got["d1"] == 4 and got["d2"] == 4 and got["d3"] == 0

    idx = e.dedup_index(docs.where(F.col("doc_id") != "d3"), k=8)
    hits = e.dedup_against_index(
        docs.where(F.col("doc_id") == "d3"), idx, bands=4, min_matches=4, k=8
    )
    assert hits.count() == 0  # d3 is an insert


def test_engine_worldmodule_attribute_facade(spark):
    from osm2world_spark.api import Engine

    e = Engine(spark)
    rows = spark.createDataFrame(
        [
            ("b", {"building": "house", "height": "12"}),
            ("r", {"highway": "primary", "lanes": "2"}),
            ("f", {"barrier": "fence", "fence_type": "railing"}),
            ("t", {"railway": "rail", "gauge": "1000"}),
        ],
        "rid string, tags map<string,string>",
    )
    b = {r["rid"]: r for r in e.building_attributes(rows).collect()}
    assert b["b"]["height"] == 12.0 and b["b"]["btype"] == "house"
    r = {r["rid"]: r for r in e.road_attributes(rows).collect()}
    assert r["r"]["n_lanes"] == 2
    f = {r["rid"]: r for r in e.barrier_attributes(rows).collect()}
    assert f["f"]["barrier_kind"] == "railing"
    t = {r["rid"]: r for r in e.railway_attributes(rows).collect()}
    assert t["t"]["gauge_m"] == 1.0
