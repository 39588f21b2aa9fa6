"""glTF 2.0 / GLB serializer as a relational plan.

Reference: core/.../output/gltf/GltfOutput.java — per mesh a
non-indexed TRIANGLES primitive (createMesh :169-221, "TODO consider
using indices" kept as-is): POSITION = the 3 corners of every triangle
in order (verticesNoDup), NORMAL = flat per-triangle normals repeated
3x (calculateTriangleNormals, smooth=false), both packed as float32
little-endian with per-component min/max (createAccessor :224-262),
z negated at pack time (components() :601-615). One bufferView per
accessor; in the GLTF flavor each bufferView gets its own buffer with
a URI (:266-283 — the reference embeds a base64 data URI; this sink
references ``<tile>_<k>.bin`` sidecar files, produced by
:func:`gltf_buffers`), in the GLB flavor all views share buffer 0 with
cumulative byteOffsets and the payload rides in the BIN chunk
(:284-291, writeGlb :564-599). Scene graph: root node "OSM2World
scene" with one child node per mesh (writeJson :454-513). Materials
are deduped first-seen (materialIndexMap :72).

Re-expression: the JSON document is assembled from pure Catalyst
string Columns — counts, byte lengths, accessor min/max (computed with
array higher-order functions over the triangle arrays, cast to float32
exactly like the reference's (float) casts) — so the entire tileset's
glTF JSON is one distributed job and every byte of it is
oracle-checkable in SQL. Only the float32 buffer payload and the GLB
container bytes use Python (Arrow-batched numpy, :func:`gltf_buffers`
/ :func:`glb_per_tile`), because packing IEEE-754 bits is not a
relational operation.

Deviations (documented): JSON field order is fixed by this module (the
reference serializes via Gson with its own order); numbers print in
the engine-portable fixed-point format (sinks/textfmt.py); materials
carry plain sRGB/255 baseColorFactor (no LColor conversion, no
textures); empty-list sections are simply omitted rather than nulled
(writeJson :521-558 drops them too).

Input contract: one row per mesh with columns
  tile        string — output file key
  mesh_order  bigint — deterministic order within the tile
  material    string — material name;  r, g, b int 0..255
  triangles   array<array<struct<x,y,z: double>>> — inner arrays of 3,
              at least one triangle per mesh
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normals import triangle_normal
from .textfmt import fixed

GENERATOR = "osm2world_spark S8 sink"
_F32 = "float"


def _f6(c: Column) -> Column:
    return fixed(c.cast("double"), scale=1_000_000, decimals=6)


def _corner_f32(triangles: Column, field: str, flip: bool) -> Column:
    """float32 components of every corner (z negated like
    GltfOutput.components :612)."""
    sign = -1.0 if flip else 1.0
    return F.transform(
        F.flatten(triangles), lambda c: (c[field] * F.lit(sign)).cast(_F32)
    )


def _normal_f32(triangles: Column, field: str, flip: bool) -> Column:
    """float32 components of the flat per-triangle normals
    (TriangleXYZ.getNormal via functions.normals.triangle_normal;
    repeats don't affect min/max so one value per triangle is enough)."""
    sign = -1.0 if flip else 1.0
    return F.transform(
        triangles,
        lambda t: (
            triangle_normal(
                F.element_at(t, 1), F.element_at(t, 2), F.element_at(t, 3)
            )[field]
            * F.lit(sign)
        ).cast(_F32),
    )


def _minmax_json(cols: list[Column], agg) -> Column:
    """``[x,y,z]`` fixed-point JSON array of per-component extrema."""
    return F.concat(
        F.lit("["),
        F.concat_ws(",", *[_f6(agg(c)) for c in cols]),
        F.lit("]"),
    )


def gltf_json_per_tile(meshes: DataFrame, flavor: str = "gltf") -> DataFrame:
    """Serialize to one (tile, gltf_json) row per tile.

    flavor='gltf': one buffer per bufferView with a ``<tile>_<k>.bin``
    URI (sidecar files from :func:`gltf_buffers`).
    flavor='glb': single buffer 0, bufferViews with cumulative
    byteOffset, no URIs — the JSON chunk of :func:`glb_per_tile`.
    """
    if flavor not in ("gltf", "glb"):
        raise ValueError(f"unknown flavor {flavor!r}")

    # the meshes relation feeds the per-mesh fragments AND the material
    # dedup; persist so a computed input isn't evaluated per branch
    # (same terminal-sink rationale as obj.obj_per_tile)
    from pyspark import StorageLevel

    meshes = meshes.persist(StorageLevel.MEMORY_AND_DISK)

    wm = Window.partitionBy("tile").orderBy("mesh_order")
    tris = F.col("triangles")
    ntris = F.size(tris)
    count = (ntris * 3).cast("bigint")
    byte_len = count * 12  # 3 float32 components per corner

    pos = {f: _corner_f32(tris, f, f == "z") for f in ("x", "y", "z")}
    nrm = {f: _normal_f32(tris, f, f == "z") for f in ("x", "y", "z")}

    m = meshes.select(
        "tile", "mesh_order", "material", "r", "g", "b",
        (F.row_number().over(wm) - 1).alias("mi"),
        count.alias("cnt"),
        byte_len.alias("blen"),
        _minmax_json(list(pos.values()), F.array_min).alias("pmin"),
        _minmax_json(list(pos.values()), F.array_max).alias("pmax"),
        _minmax_json(list(nrm.values()), F.array_min).alias("nmin"),
        _minmax_json(list(nrm.values()), F.array_max).alias("nmax"),
    )

    # materials deduped first-seen per tile (materialIndexMap)
    mats = meshes.groupBy("tile", "material", "r", "g", "b").agg(
        F.min("mesh_order").alias("fk")
    )
    wmat = Window.partitionBy("tile").orderBy("fk")
    mats = mats.withColumn("mat_idx", F.row_number().over(wmat) - 1)
    m = m.join(
        mats.select("tile", "material", "mat_idx"), ["tile", "material"]
    )

    s = lambda c: c.cast("string")  # noqa: E731
    mi, cnt, blen = F.col("mi"), F.col("cnt"), F.col("blen")
    node_frag = F.concat(F.lit('{"mesh":'), s(mi), F.lit("}"))
    mesh_frag = F.concat(
        F.lit('{"primitives":[{"mode":4,"material":'), s(F.col("mat_idx")),
        F.lit(',"attributes":{"POSITION":'), s(mi * 2),
        F.lit(',"NORMAL":'), s(mi * 2 + 1), F.lit("}}]}"),
    )

    def accessor(view: Column, mn: Column, mx: Column) -> Column:
        return F.concat(
            F.lit('{"componentType":5126,"count":'), s(cnt),
            F.lit(',"type":"VEC3","bufferView":'), s(view),
            F.lit(',"min":'), mn, F.lit(',"max":'), mx, F.lit("}"),
        )

    acc_frag = F.concat_ws(",", accessor(mi * 2, F.col("pmin"), F.col("pmax")),
                           accessor(mi * 2 + 1, F.col("nmin"), F.col("nmax")))

    if flavor == "gltf":
        def view(k: Column) -> Column:
            return F.concat(
                F.lit('{"buffer":'), s(k), F.lit(',"byteLength":'), s(blen),
                F.lit(',"target":34962}'),
            )

        def buf(k: Column) -> Column:
            return F.concat(
                F.lit('{"byteLength":'), s(blen), F.lit(',"uri":"'),
                F.col("tile"), F.lit("_"), s(k), F.lit('.bin"}'),
            )

        bv_frag = F.concat_ws(",", view(mi * 2), view(mi * 2 + 1))
        buf_frag = F.concat_ws(",", buf(mi * 2), buf(mi * 2 + 1))
        m = m.select("*", bv_frag.alias("bvf"), buf_frag.alias("buff"))
    else:  # glb: shared buffer 0, cumulative offsets (GltfOutput:284-291)
        woff = (
            Window.partitionBy("tile").orderBy("mi")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        base = F.coalesce(F.sum(blen * 2).over(woff), F.lit(0)).cast("bigint")

        def view_off(off: Column) -> Column:
            return F.concat(
                F.lit('{"buffer":0,"byteOffset":'), s(off),
                F.lit(',"byteLength":'), s(blen), F.lit(',"target":34962}'),
            )

        bv_frag = F.concat_ws(",", view_off(base), view_off(base + blen))
        m = m.select("*", bv_frag.alias("bvf"), F.lit(None).cast("string").alias("buff"))

    mat_frag = F.concat(
        F.lit('{"name":"'), F.col("material"),
        F.lit('","alphaMode":"OPAQUE","doubleSided":false,'
              '"pbrMetallicRoughness":{"baseColorFactor":['),
        _f6(F.col("r") / 255.0), F.lit(","),
        _f6(F.col("g") / 255.0), F.lit(","),
        _f6(F.col("b") / 255.0), F.lit(",1.000000]}}"),
    )
    mats_json = mats.select("tile", "fk", mat_frag.alias("mf")).groupBy(
        "tile"
    ).agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("fk", "mf"))),
            lambda x: x["mf"],
        ), ",").alias("materials_json")
    )

    frags = m.select(
        "tile", "mi", "blen",
        node_frag.alias("nodef"), mesh_frag.alias("meshf"),
        acc_frag.alias("accf"), F.col("bvf"), F.col("buff"),
    )

    def join_frags(name: str) -> Column:
        return F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("mi"), F.col(name)))),
            lambda x: x[name],
        ), ",")

    agg = frags.groupBy("tile").agg(
        F.count("*").alias("n"),
        F.sum(F.col("blen") * 2).alias("total_len"),
        join_frags("nodef").alias("nodes_json"),
        join_frags("meshf").alias("meshes_json"),
        join_frags("accf").alias("acc_json"),
        join_frags("bvf").alias("bv_json"),
        join_frags("buff").alias("buf_json"),
    )

    children = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("n").cast("int")),
                    lambda i: i.cast("string")),
        ",",
    )
    buffers_json = (
        F.col("buf_json") if flavor == "gltf"
        else F.concat(F.lit('{"byteLength":'),
                      F.col("total_len").cast("string"), F.lit("}"))
    )
    doc = F.concat(
        F.lit('{"asset":{"version":"2.0","generator":"' + GENERATOR + '"},'
              '"scene":0,"scenes":[{"nodes":[0]}],'
              '"nodes":[{"name":"OSM2World scene","children":['),
        children, F.lit("]},"),
        F.col("nodes_json"),
        F.lit('],"meshes":['), F.col("meshes_json"),
        F.lit('],"accessors":['), F.col("acc_json"),
        F.lit('],"bufferViews":['), F.col("bv_json"),
        F.lit('],"buffers":['), buffers_json,
        F.lit('],"materials":['), F.col("materials_json"), F.lit("]}"),
    )
    return agg.join(mats_json, "tile").select("tile", doc.alias("gltf_json"))


# --------------------------------------------------------------------
# binary payloads (Arrow-batched numpy — the non-relational 10%)
# --------------------------------------------------------------------

_BUFFER_SCHEMA = "tile string, buffer_index long, data binary"


def _mesh_payloads(row_tile, row_mi, row_tris) -> Iterable[tuple]:
    import numpy as np

    v = np.asarray(
        [[[c["x"], c["y"], c["z"]] for c in t] for t in row_tris],
        dtype=np.float64,
    )  # (ntris, 3, 3)
    pos = v.reshape(-1, 3).copy()
    pos[:, 2] = -pos[:, 2]
    # TriangleXYZ.getNormal: (v2-v1) x (v2-v3), normalized
    a = v[:, 1] - v[:, 0]
    b = v[:, 1] - v[:, 2]
    n = np.cross(a, b)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = np.repeat(n, 3, axis=0)
    n[:, 2] = -n[:, 2]
    yield (row_tile, 2 * row_mi, pos.astype("<f4").tobytes())
    yield (row_tile, 2 * row_mi + 1, n.astype("<f4").tobytes())


def gltf_buffers(meshes: DataFrame) -> DataFrame:
    """(tile, buffer_index, data): the float32 LE accessor payloads,
    byte-compatible with the JSON from :func:`gltf_json_per_tile` —
    buffer k of the 'gltf' flavor, or the k-th slice of the GLB BIN
    chunk. One Arrow batch in, a few rows out; nothing ever
    concentrates on the driver."""
    wm = Window.partitionBy("tile").orderBy("mesh_order")
    src = meshes.select(
        "tile", "triangles", (F.row_number().over(wm) - 1).alias("mi")
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                out.extend(_mesh_payloads(r.tile, int(r.mi), r.triangles))
            yield pd.DataFrame(out, columns=["tile", "buffer_index", "data"])

    return src.mapInPandas(gen, _BUFFER_SCHEMA)


def build_glb(json_text: str, bin_chunks: list[bytes]) -> bytes:
    """GLB container (GltfOutput.writeGlb :564-599 + the 0x20 JSON
    padding at :141): 12-byte header, JSON chunk, BIN chunk."""
    json_b = json_text.encode("utf-8")
    json_b += b" " * (-len(json_b) % 4)
    bin_b = b"".join(bin_chunks)  # float32 runs are always 4-aligned
    total = 12 + 8 + len(json_b) + 8 + len(bin_b)
    head = struct.pack("<III", 0x46546C67, 2, total)
    jc = struct.pack("<II", len(json_b), 0x4E4F534A) + json_b
    bc = struct.pack("<II", len(bin_b), 0x004E4942) + bin_b
    return head + jc + bc


def glb_per_tile(meshes: DataFrame) -> DataFrame:
    """(tile, glb): full binary glTF per tile — the 'glb' flavor JSON
    joined with its ordered buffer payloads, zipped into the container
    by an Arrow-batched kernel. Composition of the two halves above, so
    the JSON bytes inside the GLB are exactly the oracle-checked ones."""
    js = gltf_json_per_tile(meshes, flavor="glb")
    bufs = gltf_buffers(meshes).groupBy("tile").agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("buffer_index", "data"))),
            lambda s: F.base64(s["data"]),
        ), "|").alias("b64s")
    )
    joined = js.join(bufs, "tile")

    def gen(batches: Iterator) -> Iterator:
        import base64

        import pandas as pd

        for pdf in batches:
            rows = [
                (
                    r.tile,
                    build_glb(
                        r.gltf_json,
                        [base64.b64decode(p) for p in r.b64s.split("|")],
                    ),
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=["tile", "glb"])

    return joined.mapInPandas(gen, "tile string, glb binary")
