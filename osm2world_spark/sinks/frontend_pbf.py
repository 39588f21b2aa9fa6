"""Frontend-PBF tile sink (S8): the reference's web-frontend tile format.

Reference: core-jvm/.../frontend_pbf/FrontendPbfOutput.java + its
frontend.proto. A Tile message carries shared dedup blocks — a
Vector3dBlock of packed sint64 millimeter coords (Math.round(v*1000),
:761-767, COORD_PRECISION_FACTOR=1000 :214), a StringBlock seeded with
"" at index 0 (:262), a MaterialBlock — plus WorldObjects whose
TriangleGeometries reference vertices BY INDEX into the vector block
(buildTriangleGeometry :616-652). Blocks assign indices in first-seen
insertion order (Block.toIndex :117-151).

Re-expression in two halves:

* the BLOCK STRUCTURE (the hard part: global first-seen dedup of every
  vertex in the tile, index assignment, per-geometry index lists) is a
  relational plan — the same groupBy-min + row_number window family as
  the OBJ sink — producing per-tile block arrays and per-object index
  rows that DuckDB can rebuild exactly (driver queries `fpbf_blocks`,
  `fpbf_objects`);

* the WIRE BYTES are a proto2 encoder (varint / zigzag / packed /
  length-delimited — the write-side mirror of sources/osmpbf.py's
  reader) applied per tile in one Arrow batch pass, round-tripped in
  pytest through that same independent reader.

Scope: TriangleGeometry objects (the format's core). ExtrusionGeometry
/ InstanceGeometry / texture layers are renderer-model payload the
engine does not carry (SURVEY §2.9); their fields encode empty blocks,
which the proto marks required and the reference also emits empty when
unused.

Input contract: one row per mesh/world-object with columns
  tile        string — output tile key
  mesh_order  bigint — deterministic object order within the tile
  osm_id      string — WorldObject.osmId
  type_name   string — WorldObject.typeName (via the string block)
  material    string;  r, g, b int 0..255
  triangles   array<array<struct<x,y,z: double>>> — inner arrays of 3
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# corners per mesh packed into the low bits of the first-seen key
_MAX_CORNERS = 1 << 20

COORD_PRECISION_FACTOR = 1000


def _mm(c: Column) -> Column:
    """Math.round(v * 1000): floor(x + 0.5) on the scaled double —
    Java's Math.round IS floor(x+0.5), including for negatives."""
    return F.floor(c * F.lit(float(COORD_PRECISION_FACTOR)) + F.lit(0.5)) \
        .cast("bigint")


def _corners(meshes: DataFrame) -> DataFrame:
    """One row per triangle corner with the packed first-seen key
    (TriangleGeometry vertices arrive in triangle order,
    buildTriangleGeometry :624-626)."""
    return meshes.select(
        "tile", "mesh_order",
        F.posexplode(F.flatten("triangles")).alias("ci", "v"),
    ).select(
        "tile", "mesh_order", "ci",
        (F.col("mesh_order") * _MAX_CORNERS + F.col("ci")).alias("ok"),
        F.col("v.x").alias("vx"), F.col("v.y").alias("vy"),
        F.col("v.z").alias("vz"),
    )


def _vector_block(meshes: DataFrame) -> DataFrame:
    """The tile's Vector3dBlock as a relation: first-seen dedup on the
    exact double vector (VectorBlock.toIndex dedups PRE-rounding,
    :155-200), 0-based index in insertion order."""
    firsts = _corners(meshes).groupBy("tile", "vx", "vy", "vz").agg(
        F.min("ok").alias("fk")
    )
    w = Window.partitionBy("tile").orderBy("fk")
    return firsts.withColumn("vidx", F.row_number().over(w) - 1)


def fpbf_blocks(meshes: DataFrame) -> DataFrame:
    """Per tile: the shared dedup blocks — (tile, coords, strings,
    mat_rgb). coords is the packed mm triple list in block order;
    strings is the StringBlock ("" seed + first-seen type names);
    mat_rgb flattens the MaterialBlock's color triples in block order.
    """
    vtab = _vector_block(meshes)
    coords = vtab.groupBy("tile").agg(
        F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct(
                "fk", _mm(F.col("vx")).alias("cx"),
                _mm(F.col("vy")).alias("cy"), _mm(F.col("vz")).alias("cz"),
            ))),
            lambda s: F.array(s["cx"], s["cy"], s["cz"]),
        )).alias("coords")
    )
    strings = (
        meshes.groupBy("tile", "type_name").agg(F.min("mesh_order").alias("fk"))
        .groupBy("tile")
        .agg(F.concat(
            F.array(F.lit("")),
            F.transform(
                F.array_sort(F.collect_list(F.struct("fk", "type_name"))),
                lambda s: s["type_name"],
            ),
        ).alias("strings"))
    )
    mats = (
        meshes.groupBy("tile", "material", "r", "g", "b")
        .agg(F.min("mesh_order").alias("fk"))
        .groupBy("tile")
        .agg(F.flatten(F.transform(
            F.array_sort(F.collect_list(F.struct("fk", "r", "g", "b"))),
            lambda s: F.array(s["r"].cast("bigint"), s["g"].cast("bigint"),
                              s["b"].cast("bigint")),
        )).alias("mat_rgb"))
    )
    return coords.join(strings, "tile").join(mats, "tile")


def fpbf_objects(meshes: DataFrame) -> DataFrame:
    """Per WorldObject: (tile, mesh_order, osm_id, type_idx,
    material_idx, vertices) where vertices are the 0-based
    Vector3dBlock indices of the triangle corners in order and the
    *_idx columns are 0-based block references."""
    vtab = _vector_block(meshes)
    cidx = _corners(meshes).join(
        vtab.select("tile", "vx", "vy", "vz", "vidx"),
        ["tile", "vx", "vy", "vz"],
    )
    verts = cidx.groupBy("tile", "mesh_order").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ci", "vidx"))),
            lambda s: s["vidx"].cast("bigint"),
        ).alias("vertices")
    )
    wstr = Window.partitionBy("tile").orderBy("fk")
    stab = (
        meshes.groupBy("tile", "type_name").agg(F.min("mesh_order").alias("fk"))
        # index 1-based here because StringBlock[0] is the "" seed
        .withColumn("type_idx", F.row_number().over(wstr))
        .select("tile", "type_name", "type_idx")
    )
    mtab = (
        meshes.groupBy("tile", "material").agg(F.min("mesh_order").alias("fk"))
        .withColumn("material_idx", F.row_number().over(wstr) - 1)
        .select("tile", "material", "material_idx")
    )
    return (
        meshes.select("tile", "mesh_order", "osm_id", "type_name", "material")
        .join(stab, ["tile", "type_name"])
        .join(mtab, ["tile", "material"])
        .join(verts, ["tile", "mesh_order"])
        .select("tile", "mesh_order", "osm_id", "type_idx", "material_idx",
                "vertices")
    )


# --------------------------------------------------------------------
# proto2 wire encoding (the write-side mirror of sources/osmpbf.py)
# --------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, vals, signed: bool = False) -> bytes:
    body = b"".join(_varint(_zigzag(v) if signed else v) for v in vals)
    return _len_field(field, body)


def encode_tile(coords, strings, mat_rgb, objects) -> bytes:
    """One frontend.proto Tile message (field layout per frontend.proto;
    required-but-unused blocks encode as empty messages, matching the
    reference's output for tiles without shapes/models)."""
    parts = [
        _len_field(1, _packed(1, coords, signed=True)),   # vector3dBlock
        _len_field(2, b""),                               # vector2dBlock
        _len_field(3, b"".join(
            _len_field(1, s.encode("utf-8")) for s in strings)),
        _len_field(4, b""),                               # shapeBlock
        _len_field(5, b"".join(                           # materialBlock
            _len_field(1,
                       _tag(1, 0) + _varint(mat_rgb[i])
                       + _tag(2, 0) + _varint(mat_rgb[i + 1])
                       + _tag(3, 0) + _varint(mat_rgb[i + 2]))
            for i in range(0, len(mat_rgb), 3))),
        _len_field(6, b""),                               # modelBlock
    ]
    for o in objects:  # (osm_id, type_idx, material_idx, vertices)
        osm_id, type_idx, material_idx, vertices = o
        geom = _tag(1, 0) + _varint(material_idx) + _packed(2, vertices)
        body = (
            _len_field(1, osm_id.encode("utf-8"))
            + _tag(2, 0) + _varint(type_idx)
            + _len_field(3, geom)
        )
        parts.append(_len_field(7, body))
    return b"".join(parts)


def encode_frontend_pbf(meshes: DataFrame) -> DataFrame:
    """(tile, pbf): the serialized Tile message per tile — blocks and
    index lists computed relationally above, bytes assembled in one
    Arrow batch pass."""
    objs = fpbf_objects(meshes).groupBy("tile").agg(
        F.array_sort(F.collect_list(F.struct(
            "mesh_order", "osm_id", "type_idx", "material_idx", "vertices"
        ))).alias("objects")
    )
    doc = fpbf_blocks(meshes).join(objs, "tile")

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                objects = [
                    (o["osm_id"], int(o["type_idx"]),
                     int(o["material_idx"]), [int(v) for v in o["vertices"]])
                    for o in r.objects
                ]
                rows.append((r.tile, encode_tile(
                    [int(c) for c in r.coords], list(r.strings),
                    [int(m) for m in r.mat_rgb], objects)))
            yield pd.DataFrame(rows, columns=["tile", "pbf"])

    return doc.mapInPandas(gen, "tile string, pbf binary")
