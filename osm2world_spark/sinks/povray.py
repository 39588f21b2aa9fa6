"""POV-Ray scene serializer as a relational plan.

Reference: core/.../output/povray/POVRayOutput.java — drawTriangles
(:290-341) wraps each mesh's triangles in ``mesh { ... }`` with one
``  triangle { <a>, <b>, <c>}`` line per triangle (appendTriangle
:568-622, INDENT ``"  "`` :39), then `` uv_mapping`` plus the named
texture `` texture { texture_<name> }`` (appendMaterialOrName
:630-639) and the closing brace. Vectors are ``<x, y, z>`` with z NOT
negated (:741-763 — POV-Ray's left-handed frame matches the engine's
internal one, unlike OBJ/glTF which flip z). The file header includes
``osm2world_definitions.inc`` (:61); the camera/light preamble is only
written when a camera is configured (:63-65) — this sink is the
camera-less path.

Re-expression: one mesh = one row; the triangle block is a pure
``transform``+``array_join`` over the triangle array (whole-stage
codegen, no Python); one output file (tile) = one ``groupBy`` row with
an ordered join of its mesh blocks. Numbers use the engine-portable
fixed-point format (sinks/textfmt.py) instead of Java Double.toString.

Input contract: one row per mesh with columns
  tile        string — output file key
  mesh_order  bigint — deterministic emission order within the tile
  material    string — material name (-> ``texture { texture_<m> }``)
  triangles   array<array<struct<x,y,z: double>>> — inner arrays of 3
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textfmt import fixed

HEADER = '#include "osm2world_definitions.inc"\n'


def _vec(v: Column) -> Column:
    """``<x, y, z>`` (POVRayOutput.appendVector:741-763, no z flip)."""
    return F.concat(
        F.lit("<"), fixed(v["x"]), F.lit(", "), fixed(v["y"]),
        F.lit(", "), fixed(v["z"]), F.lit(">"),
    )


def mesh_block(triangles: Column, material: Column) -> Column:
    """One ``mesh { ... }`` block (drawTriangles no-texcoord path
    :323-341): triangle lines then `` uv_mapping  texture { ... }}``
    (the double space reproduces append(" uv_mapping ") followed by
    appendMaterialOrName's leading-space " texture { ... }")."""
    tri_lines = F.transform(
        triangles,
        lambda t: F.concat(
            F.lit("  triangle { "),
            _vec(F.element_at(t, 1)), F.lit(", "),
            _vec(F.element_at(t, 2)), F.lit(", "),
            _vec(F.element_at(t, 3)), F.lit("}"),
        ),
    )
    return F.concat(
        F.lit("mesh {\n"),
        F.array_join(tri_lines, "\n"),
        F.lit("\n uv_mapping  texture { texture_"), material, F.lit(" }}"),
    )


def pov_per_tile(meshes: DataFrame) -> DataFrame:
    """Serialize a meshes DataFrame to one (tile, pov_text) row per
    tile. See the module docstring for the input contract."""
    blocks = meshes.select(
        "tile", "mesh_order",
        mesh_block(F.col("triangles"), F.col("material")).alias("block"),
    )
    return blocks.groupBy("tile").agg(
        F.concat(
            F.lit(HEADER + "\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("mesh_order", "block"))),
                    lambda s: s["block"],
                ),
                "\n",
            ),
        ).alias("pov_text")
    )
