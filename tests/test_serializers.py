"""S8 serializer sinks: OBJ+MTL, POV-Ray, glTF/GLB.

Covers the reference writers' observable semantics (ObjOutput.java,
POVRayOutput.java, GltfOutput.java — see the sink module docstrings for
file:line cites): first-seen dedup index maps, change-triggered state
lines, z negation per format, float32 LE accessor payloads, GLB
container byte layout, and the engine-portable fixed-point formatter's
Spark/DuckDB equality.
"""

from __future__ import annotations

import base64
import json
import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm2world_spark.sinks.gltf import (
    build_glb,
    glb_per_tile,
    gltf_buffers,
    gltf_json_per_tile,
)
from osm2world_spark.sinks.obj import obj_per_tile
from osm2world_spark.sinks.povray import pov_per_tile
from osm2world_spark.sinks.textfmt import fixed, fixed_sql


def V(x, y, z):
    return Row(x=float(x), y=float(y), z=float(z))


def T(u, v):
    return Row(u=float(u), v=float(v))


@pytest.fixture(scope="module")
def obj_scene(spark):
    rows = [
        # face A: texcoords only -> f v/t
        Row(tile="t0", face_order=0, group_name="Building",
            object_name="Building 1", material="M0", r=200, g=100, b=50,
            vertices=[V(0, 0, 0), V(1, 0, 0), V(1, 2, 1), V(0, 2, 1)],
            normals=None,
            texcoords=[T(0, 0), T(1, 0), T(1, 1), T(0, 1)]),
        # face B: both -> f v/t/n; reuses two of A's vertices
        Row(tile="t0", face_order=1, group_name="Building",
            object_name="Building 1", material="M0", r=200, g=100, b=50,
            vertices=[V(0, 0, 0), V(1, 2, 1), V(0.5, 3, 0.5)],
            normals=[V(0, 0, -1)] * 3,
            texcoords=[T(0, 0), T(1, 1), T(0.5, 1)]),
        # face C: normals only -> f v//n; new group+object+material
        Row(tile="t0", face_order=2, group_name="Road",
            object_name="Road 7", material="M1", r=30, g=30, b=30,
            vertices=[V(1, 0, 0), V(2, 0, 0), V(2, 0, 1), V(1, 0, 1)],
            normals=[V(0, 1, 0)] * 4, texcoords=None),
    ]
    out = obj_per_tile(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    return out[0]


class TestObj:
    def test_structure_and_dedup(self, obj_scene):
        lines = obj_scene["obj_text"].split("\n")
        assert lines[0].startswith("# OBJ export")
        assert "mtllib t0.obj.mtl" in lines
        # first-seen dedup: 4 + 1 + 3 unique vertices (B reuses 2 of
        # A's, C reuses A's v2), 2 normals, 5 texcoords
        assert sum(ln.startswith("v ") for ln in lines) == 8
        assert sum(ln.startswith("vn ") for ln in lines) == 2
        assert sum(ln.startswith("vt ") for ln in lines) == 5
        # face token forms (ObjOutput.writeFace:304-319)
        fs = [ln for ln in lines if ln.startswith("f ")]
        assert fs[0] == "f 1/1 2/2 3/3 4/4"          # v/t
        assert fs[1] == "f 1/1/1 3/3/1 5/5/1"        # v/t/n, indices reused
        assert fs[2] == "f 2//2 6//2 7//2 8//2"      # v//n

    def test_z_negated_with_negzero_normalized(self, obj_scene):
        lines = obj_scene["obj_text"].split("\n")
        # (1, 2, 1) prints z = -1; z=0 prints 0.0000, never -0.0000
        assert "v 1.0000 2.0000 -1.0000" in lines
        assert "v 0.0000 0.0000 0.0000" in lines
        assert not any("-0.0000" in ln for ln in lines)

    def test_state_lines_emitted_on_change_only(self, obj_scene):
        lines = obj_scene["obj_text"].split("\n")
        assert sum(ln == "g Building" for ln in lines) == 1
        assert sum(ln == "o Building 1" for ln in lines) == 1
        assert sum(ln.startswith("usemtl") for ln in lines) == 2
        # reference emission order inside a face: vn before usemtl
        # (drawFace calls normalsToIndices before useMaterial)
        i_vn = lines.index("vn 0.0000 1.0000 0.0000")
        assert lines[i_vn + 1] == "usemtl M1_0"

    def test_mtl_blocks(self, obj_scene):
        mtl = obj_scene["mtl_text"]
        assert mtl.count("newmtl ") == 2
        assert "newmtl M0_0\nNs 92.156863" in mtl
        # multiplyColor(color, 0.5)/255: round(200*0.5)=100 -> 0.392157
        assert "Ka 0.392157 0.196078 0.098039" in mtl
        assert mtl.count("illum 2") == 2

    def test_no_python_in_plan(self, spark):
        rows = [("t", 0, "G", "O", "M", 1, 2, 3,
                 [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
                 None, None)]
        schema = (
            "tile string, face_order long, group_name string, "
            "object_name string, material string, r int, g int, b int, "
            "vertices array<struct<x:double,y:double,z:double>>, "
            "normals array<struct<x:double,y:double,z:double>>, "
            "texcoords array<struct<u:double,v:double>>"
        )
        plan = obj_per_tile(
            spark.createDataFrame(rows, schema)
        )._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas"):
            assert marker not in plan


class TestPov:
    def test_mesh_blocks(self, spark):
        rows = [
            Row(tile="p0", mesh_order=1, material="M1",
                triangles=[[V(1, 0, 0), V(2, 0, 0), V(2, 0, 1)]]),
            Row(tile="p0", mesh_order=0, material="M0",
                triangles=[[V(0, 0, 0), V(1, 0, 0), V(1, 2, 1)],
                           [V(0, 0, 0), V(1, 2, 1), V(0, 2, 1)]]),
        ]
        txt = pov_per_tile(spark.createDataFrame(rows)).collect()[0][
            "pov_text"]
        assert txt.startswith('#include "osm2world_definitions.inc"\n\n')
        # ordered by mesh_order despite shuffled input
        assert txt.index("texture_M0") < txt.index("texture_M1")
        # z NOT negated (POVRayOutput.appendVector:741-763)
        assert "  triangle { <0.0000, 0.0000, 0.0000>, " \
               "<1.0000, 0.0000, 0.0000>, <1.0000, 2.0000, 1.0000>}" in txt
        assert txt.count("mesh {") == 2
        assert " uv_mapping  texture { texture_M0 }}" in txt


@pytest.fixture(scope="module")
def gltf_scene(spark):
    rows = [
        Row(tile="g0", mesh_order=0, material="M0", r=200, g=100, b=50,
            triangles=[[V(0, 0, 0), V(1, 0, 0), V(1, 2, 1)],
                       [V(0, 0, 0), V(1, 2, 1), V(0, 2, 1)]]),
        Row(tile="g0", mesh_order=1, material="M1", r=30, g=30, b=30,
            triangles=[[V(1, 0, 0), V(2, 0, 0), V(2, 0, 1)]]),
    ]
    return spark.createDataFrame(rows)


class TestGltf:
    def test_json_structure(self, gltf_scene):
        doc = json.loads(
            gltf_json_per_tile(gltf_scene).collect()[0]["gltf_json"]
        )
        assert doc["asset"]["version"] == "2.0"
        assert doc["scenes"][0]["nodes"] == [0]
        assert doc["nodes"][0]["children"] == [1, 2]
        assert [n["mesh"] for n in doc["nodes"][1:]] == [0, 1]
        prim = doc["meshes"][0]["primitives"][0]
        assert prim["mode"] == 4 and prim["attributes"] == {
            "POSITION": 0, "NORMAL": 1}
        # non-indexed triangles: count = 3 * ntris; float32 VEC3
        assert [a["count"] for a in doc["accessors"]] == [6, 6, 3, 3]
        assert all(a["componentType"] == 5126 for a in doc["accessors"])
        # one buffer per view in the gltf flavor, sidecar uris
        assert doc["buffers"][0]["uri"] == "g0_0.bin"
        assert [b["byteLength"] for b in doc["buffers"]] == [72, 72, 36, 36]

    def test_buffers_byte_exact(self, gltf_scene):
        doc = json.loads(
            gltf_json_per_tile(gltf_scene).collect()[0]["gltf_json"])
        bufs = {r["buffer_index"]: bytes(r["data"])
                for r in gltf_buffers(gltf_scene).collect()}
        # POSITION buffer 0: corners in order, z negated, float32 LE
        pos = struct.unpack("<18f", bufs[0])
        assert pos[0:3] == (0.0, 0.0, 0.0)
        assert pos[6:9] == (1.0, 2.0, -1.0)
        # NORMAL buffer 1: flat normal repeated 3x per triangle
        nrm = struct.unpack("<18f", bufs[1])
        assert nrm[0:3] == nrm[3:6] == nrm[6:9]
        # JSON byteLength matches the payload; min/max match the bytes
        for k, b in bufs.items():
            assert doc["bufferViews"][k]["byteLength"] == len(b)
            vals = struct.unpack(f"<{len(b) // 4}f", b)
            cols = [vals[i::3] for i in range(3)]
            acc = doc["accessors"][k]
            for c, lo, hi in zip(cols, acc["min"], acc["max"]):
                assert min(c) == pytest.approx(lo, abs=5e-7)
                assert max(c) == pytest.approx(hi, abs=5e-7)

    def test_glb_container(self, gltf_scene):
        glb = bytes(glb_per_tile(gltf_scene).collect()[0]["glb"])
        magic, version, total = struct.unpack("<III", glb[:12])
        assert magic == 0x46546C67 and version == 2 and total == len(glb)
        jlen, jtype = struct.unpack("<II", glb[12:20])
        assert jtype == 0x4E4F534A and jlen % 4 == 0
        inner = json.loads(glb[20:20 + jlen].decode())
        # GLB flavor: single buffer, no uri, cumulative view offsets
        assert inner["buffers"] == [{"byteLength": 216}]
        assert [v["byteOffset"] for v in inner["bufferViews"]] == [
            0, 72, 144, 180]
        blen, btype = struct.unpack(
            "<II", glb[20 + jlen:28 + jlen])
        assert btype == 0x004E4942 and blen == 216
        bin_chunk = glb[28 + jlen:]
        assert len(bin_chunk) == 216
        # BIN chunk is exactly the ordered accessor payloads
        bufs = [bytes(r["data"]) for r in sorted(
            gltf_buffers(gltf_scene).collect(),
            key=lambda r: r["buffer_index"])]
        assert bin_chunk == b"".join(bufs)
        # the JSON chunk is the glb-flavor JSON, space-padded
        js = gltf_json_per_tile(gltf_scene, flavor="glb").collect()[0][
            "gltf_json"]
        assert glb[20:20 + jlen].decode().rstrip(" ") == js

    def test_build_glb_padding(self):
        glb = build_glb('{"a":1}', [b"\x00" * 8])  # 7-byte JSON -> pad 1
        jlen = struct.unpack("<I", glb[12:16])[0]
        assert jlen == 8 and glb[20:28] == b'{"a":1} '

    def test_json_text_is_pure_columns(self, gltf_scene):
        plan = gltf_json_per_tile(
            gltf_scene
        )._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


@pytest.fixture(scope="module")
def fpbf_scene(spark):
    rows = [
        Row(tile="f0", mesh_order=0, osm_id="w100", type_name="Building",
            material="M0", r=200, g=100, b=50,
            triangles=[[V(0, 0, 0), V(1, 0, 0), V(1, 2, 1)],
                       [V(0, 0, 0), V(1, 2, 1), V(0, 2, 1)]]),
        Row(tile="f0", mesh_order=1, osm_id="w200", type_name="Road",
            material="M1", r=30, g=30, b=30,
            triangles=[[V(1, 0, 0), V(2, 0, -0.0625), V(2, 0, 1)]]),
    ]
    return spark.createDataFrame(rows)


class TestFrontendPbf:
    def test_blocks(self, fpbf_scene):
        from osm2world_spark.sinks.frontend_pbf import fpbf_blocks

        b = fpbf_blocks(fpbf_scene).collect()[0]
        # first-seen dedup across objects: 6 unique vectors (w200
        # reuses (1,0,0)), mm precision, Math.round = floor(x+0.5)
        # including for the negative coord (-0.0625 -> -62, not -63)
        assert len(b["coords"]) == 18
        assert b["coords"][:6] == [0, 0, 0, 1000, 0, 0]
        assert -62 in b["coords"]
        # StringBlock seeded with "" at index 0 (FrontendPbfOutput:262)
        assert b["strings"] == ["", "Building", "Road"]
        assert b["mat_rgb"] == [200, 100, 50, 30, 30, 30]

    def test_objects_reference_blocks(self, fpbf_scene):
        from osm2world_spark.sinks.frontend_pbf import (
            fpbf_blocks,
            fpbf_objects,
        )

        b = fpbf_blocks(fpbf_scene).collect()[0]
        objs = {r["osm_id"]: r
                for r in fpbf_objects(fpbf_scene).collect()}
        # shared corner dedup inside one object
        assert objs["w100"]["vertices"] == [0, 1, 2, 0, 2, 3]
        # cross-object vertex reuse: w200's first corner is block idx 1
        assert objs["w200"]["vertices"][0] == 1
        # indices resolve inside the coords block
        n_vectors = len(b["coords"]) // 3
        for o in objs.values():
            assert all(0 <= v < n_vectors for v in o["vertices"])
        assert objs["w100"]["type_idx"] == 1  # "" occupies index 0
        assert objs["w200"]["material_idx"] == 1

    def test_wire_roundtrip_through_independent_reader(self, fpbf_scene):
        from osm2world_spark.sinks.frontend_pbf import (
            encode_frontend_pbf,
            fpbf_blocks,
            fpbf_objects,
        )
        from osm2world_spark.sources.osmpbf import _fields, _packed_varints

        pbf = bytes(encode_frontend_pbf(fpbf_scene).collect()[0]["pbf"])
        fields = list(_fields(pbf))
        # Tile: required blocks 1-6 present exactly once, objects = 7
        assert [f[0] for f in fields][:6] == [1, 2, 3, 4, 5, 6]
        b = fpbf_blocks(fpbf_scene).collect()[0]
        v3 = next(f[2] for f in fields if f[0] == 1)
        got = _packed_varints(next(_fields(v3))[2], signed=True)
        assert got == list(b["coords"])
        strs = [x[2].decode() for x in _fields(
            next(f[2] for f in fields if f[0] == 3))]
        assert strs == list(b["strings"])
        objs = {r["osm_id"]: r for r in fpbf_objects(fpbf_scene).collect()}
        for ob in (f[2] for f in fields if f[0] == 7):
            fs = list(_fields(ob))
            osm = next(x[2] for x in fs if x[0] == 1).decode()
            geom = list(_fields(next(x[2] for x in fs if x[0] == 3)))
            verts = _packed_varints(next(x[2] for x in geom if x[0] == 2))
            assert verts == list(objs[osm]["vertices"])
            assert next(x[2] for x in geom if x[0] == 1) == \
                objs[osm]["material_idx"]

    def test_zigzag_negative(self):
        from osm2world_spark.sinks.frontend_pbf import _varint, _zigzag
        from osm2world_spark.sources.osmpbf import _rd_varint, _zigzag as unzz

        for v in (0, -1, 1, -62, 12345, -2**40):
            enc = _varint(_zigzag(v))
            raw, _ = _rd_varint(enc, 0)
            assert unzz(raw) == v


class TestFileWrites:
    def test_text_tree_roundtrip(self, spark, tmp_path):
        from osm2world_spark.sinks.write import write_text_models

        rows = [
            Row(tile="t0", mesh_order=0, material="M0",
                triangles=[[V(0, 0, 0), V(1, 0, 0), V(1, 2, 1)]]),
            Row(tile="t1", mesh_order=0, material="M1",
                triangles=[[V(1, 0, 0), V(2, 0, 0), V(2, 0, 1)]]),
        ]
        povs = pov_per_tile(spark.createDataFrame(rows))
        out = str(tmp_path / "pov")
        write_text_models(povs, out, "pov_text")
        expected = {r["tile"]: r["pov_text"] for r in povs.collect()}
        for tile, txt in expected.items():
            d = tmp_path / "pov" / f"tile={tile}"
            parts = [p for p in d.iterdir() if p.name.startswith("part-")]
            assert len(parts) == 1
            assert parts[0].read_text() == txt + "\n"

    def test_gltf_tileset_roundtrip(self, spark, gltf_scene, tmp_path):
        from osm2world_spark.sinks.write import write_gltf_tileset

        out = tmp_path / "gltf"
        write_gltf_tileset(gltf_scene, str(out))
        part = next(p for p in (out / "json" / "tile=g0").iterdir()
                    if p.name.startswith("part-"))
        doc = json.loads(part.read_text())
        # every buffer URI the JSON references exists with the declared
        # byteLength, and its floats are finite
        for buf in doc["buffers"]:
            b = (out / "buffers" / buf["uri"]).read_bytes()
            assert len(b) == buf["byteLength"]
            vals = struct.unpack(f"<{len(b) // 4}f", b)
            assert all(v == v for v in vals)

    def test_binary_files_glb(self, spark, gltf_scene, tmp_path):
        from osm2world_spark.sinks.write import write_binary_files

        glbs = glb_per_tile(gltf_scene)
        write_binary_files(glbs, str(tmp_path / "glb"), "tile", "glb", ".glb")
        b = (tmp_path / "glb" / "g0.glb").read_bytes()
        assert b[:4] == b"glTF"
        assert struct.unpack("<I", b[8:12])[0] == len(b)


class TestPipelineModels:
    def test_pipeline_writes_obj_tree(self, spark, tmp_path):
        from osm2world_spark.plans.pipeline import TilePipeline
        from osm2world_spark.sources.documents import synthetic_documents

        docs = synthetic_documents(spark, 40, seed=3)
        report = TilePipeline(spark, str(tmp_path / "out")).run(
            docs, with_overlaps=False, with_models="obj")
        assert report["model_tiles"] > 0
        objs = list((tmp_path / "out" / "models" / "obj").rglob("part-*"))
        assert objs
        txt = objs[0].read_text()
        assert txt.startswith("# OBJ export") and "\nf " in txt
        mtls = list((tmp_path / "out" / "models" / "mtl").rglob("part-*"))
        assert mtls and "newmtl TERRAIN_DEFAULT_0" in mtls[0].read_text()

    def test_pipeline_writes_fpbf_tiles(self, spark, tmp_path):
        from osm2world_spark.plans.pipeline import TilePipeline
        from osm2world_spark.sources.documents import synthetic_documents
        from osm2world_spark.sources.osmpbf import _fields

        docs = synthetic_documents(spark, 40, seed=3)
        report = TilePipeline(spark, str(tmp_path / "out")).run(
            docs, with_overlaps=False, with_models="fpbf")
        pbfs = list((tmp_path / "out" / "models" / "fpbf").glob("*.pbf"))
        assert len(pbfs) == report["model_tiles"]
        fields = list(_fields(pbfs[0].read_bytes()))
        assert [f[0] for f in fields][:6] == [1, 2, 3, 4, 5, 6]
        assert any(f[0] == 7 for f in fields)  # at least one WorldObject


class TestDegenerateTriangles:
    def test_normal_is_nan_not_ansi_error(self, spark):
        # VectorXYZ.crossNormalized on a zero-area triangle is 0d/0d =
        # NaN in Java; Spark ANSI mode would raise DIVIDE_BY_ZERO
        # without the guard (found driving the serializer facade over
        # data containing collapsed triangles)
        import math

        from osm2world_spark.functions.normals import triangle_normal

        df = spark.createDataFrame(
            [((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
             ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))],
            "v1 struct<x:double,y:double,z:double>, "
            "v2 struct<x:double,y:double,z:double>, "
            "v3 struct<x:double,y:double,z:double>")
        rows = df.select(
            triangle_normal(F.col("v1"), F.col("v2"), F.col("v3")).alias("n")
        ).collect()
        degen = [r["n"] for r in rows if math.isnan(r["n"]["x"])]
        ok = [r["n"] for r in rows if not math.isnan(r["n"]["x"])]
        assert len(degen) == 1 and len(ok) == 1
        assert ok[0]["z"] == -1.0  # (v2-v1) x (v2-v3) convention intact


class TestFixedFormat:
    def test_spark_duckdb_parity_on_awkward_doubles(self, spark):
        import duckdb

        # values chosen to break printf-style formatting: binary
        # fractions that tie at the 4th decimal (0.03125 rounds
        # differently under half-up vs half-even), negative zero,
        # sub-resolution negatives, and shortest-repr disagreements
        vals = [0.03125, -0.03125, 0.09375, -0.0, -0.00004, 1e-7,
                123456.78125, -2.5e-5, 0.1, -1234.00005, 3.15, -3.15]
        sdf = spark.createDataFrame([(v,) for v in vals], "x double")
        got_spark = [r["s"] for r in
                     sdf.select(fixed(F.col("x")).alias("s"))
                     .orderBy("x").collect()]
        con = duckdb.connect()
        vals_sql = ", ".join(f"({v!r})" for v in vals)
        got_duck = [r[0] for r in con.execute(
            f"SELECT {fixed_sql('x')} FROM (VALUES {vals_sql}) t(x) "
            "ORDER BY x"
        ).fetchall()]
        assert got_spark == got_duck
        assert "-0.0000" not in got_spark  # negative zero normalized

    def test_plain_values(self, spark):
        sdf = spark.createDataFrame(
            [(0.25,), (-1.5,), (2.0,)], "x double")
        got = [r["s"] for r in
               sdf.select(fixed(F.col("x")).alias("s")).orderBy("x")
               .collect()]
        assert got == ["-1.5000", "0.2500", "2.0000"]
