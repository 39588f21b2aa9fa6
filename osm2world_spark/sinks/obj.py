"""Wavefront OBJ + MTL serializer as a relational plan.

Reference: core/.../output/obj/ObjOutput.java — an imperative stream
writer that keeps three first-seen index maps (vertexIndexMap,
normalsIndexMap, texCoordsIndexMap, :51-53), lazily emits ``v``/``vn``/
``vt`` lines the moment a vector is first used (:246-264), negates z
with -0.0 normalized away (:266-275), writes ``g``/``o`` lines on
object-class / object change (:139-171), ``usemtl`` on material change
(:202-221), and faces as 1-based ``f v``, ``f v/t``, ``f v//n`` or
``f v/t/n`` (:298-322). The MTL block per material is :324-371.

Re-expression (Spark-first, zero Python in the plan): every output
LINE of the file is a row with a deterministic sort key
``(face_order, kind, sub)`` where kind encodes the reference's
within-face emission order — g(0) o(1) vn(2) usemtl(3) vt(4) v(5)
f(6). First-seen index maps become a groupBy on the vector value with
``min(packed emission key)`` plus a per-tile ``row_number`` window;
"emit on change" lines become a ``lag`` window over faces; the file is
a per-tile ordered ``array_join``. Everything is keyed by tile, so a
planet-scale scene serializes as one shuffle-bounded distributed job —
there is no single-writer bottleneck like the reference's PrintWriter.

Deviations (documented): numbers use the engine-portable fixed-point
format of sinks/textfmt.py instead of Java ``Double.toString``; the
header comment block is a fixed 4-line stanza (no version string /
projection origin); materials are single-layer (``usemtl <name>_0``,
matching the reference's layer-0 path — multi-texture-layer SMALL_OFFSET
re-draws at :184-195 are renderer payload, out of analytic scope).

Input contract: one row per face with columns
  tile          string  — output file key (one OBJ per tile)
  face_order    bigint  — deterministic emission order within the tile
  group_name    string  — ``g`` content (WorldObject class)
  object_name   string  — ``o`` content
  material      string  — material name
  r, g, b       int     — material base color 0..255
  vertices      array<struct<x,y,z: double>>   (2..MAX_CORNERS corners)
  normals       array<struct<x,y,z: double>> or NULL (parallel to vertices)
  texcoords     array<struct<u,v: double>> or NULL  (parallel to vertices)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textfmt import fixed

# corners per face packed into the low bits of the first-seen key;
# ObjOutput has no such limit but faces beyond ~64 corners are not a
# thing the pipeline produces (triangulate first).
MAX_CORNERS = 64

_HEADER = (
    "# OBJ export: osm2world_spark S8 sink (ObjOutput.java parity)",
    "",
)
_MTL_HEADER = (
    "# MTL export: osm2world_spark S8 sink (ObjOutput.java:400-406)",
    "",
)
# Ns / Ks / Ke / Ni / illum constants from ObjOutput.writeMaterial
# (:334, :344-346, :365-367).
_MTL_CONST_TAIL = (
    "Ks 0.000000 0.000000 0.000000",
    "Ke 0.000000 0.000000 0.000000",
    "Ni 1",
    "illum 2",
    "",
)


def _line(tile, k1, k2, k3, text) -> list[Column]:
    return [
        tile.alias("tile"),
        k1.cast("bigint").alias("k1"),
        F.lit(k2).cast("int").alias("k2"),
        k3.cast("bigint").alias("k3"),
        text.alias("text"),
    ]


def _vec3(prefix: str, x: Column, y: Column, z: Column) -> Column:
    """``v x y -z`` / ``vn x y -z`` — formatVector's z flip with the
    -0.0 normalization built into the fixed-point snap."""
    return F.concat(
        F.lit(prefix), fixed(x), F.lit(" "), fixed(y), F.lit(" "), fixed(-z)
    )


def _first_seen(corners: DataFrame, keys: list[str], idx_name: str) -> DataFrame:
    """First-seen index map as a relation: group on the vector value,
    keep the minimum packed emission key, number per tile in that
    order (ObjOutput.vectorsToIndices:246-264, 1-based like the OBJ
    face references)."""
    firsts = corners.groupBy("tile", *keys).agg(F.min("ok").alias("fk"))
    w = Window.partitionBy("tile").orderBy("fk")
    return firsts.withColumn(idx_name, F.row_number().over(w))


def _ambient(c: Column) -> Column:
    """multiplyColor(color, AMBIENT_FACTOR=0.5) then /255f
    (ObjOutput.java:44,337-338,373-380), fixed-point 6dp."""
    return fixed(
        F.floor(c * 0.5 + F.lit(0.5)) / F.lit(255.0), scale=1_000_000, decimals=6
    )


def obj_per_tile(faces: DataFrame, persist: bool = True) -> DataFrame:
    """Serialize a faces DataFrame to one (tile, obj_text, mtl_text)
    row per tile. See the module docstring for the input contract.

    The assembled plan references the faces relation from several
    branches (state lines, three first-seen index maps, face lines,
    materials). Spark re-evaluates unshared subtrees per reference, so
    by default the normalized input is persisted (MEMORY_AND_DISK) —
    serialization is a terminal sink step, and its input is exactly the
    data being written, so caching it for the job's duration is the
    intended trade. Pass persist=False to keep the plan fully lazy
    (e.g. when the caller already persisted upstream).
    """
    spark_cols = [
        "tile", "face_order", "group_name", "object_name", "material",
        "r", "g", "b", "vertices", "normals", "texcoords",
    ]
    faces = faces.select(*spark_cols)
    if persist:
        from pyspark import StorageLevel

        faces = faces.persist(StorageLevel.MEMORY_AND_DISK)

    # --- change-triggered lines (g / o / usemtl) --------------------
    # one window pass + one explode produces all three line kinds, so
    # the (possibly expensive) faces subtree is evaluated once here
    # instead of once per kind
    wf = Window.partitionBy("tile").orderBy("face_order")
    marks = faces.select(
        "tile", "face_order", "group_name", "object_name", "material",
        F.lag("group_name").over(wf).alias("_pg"),
        F.lag("object_name").over(wf).alias("_po"),
        F.lag("material").over(wf).alias("_pm"),
    )

    def _changed(prev: str, cur: str):
        return F.col(prev).isNull() | (F.col(prev) != F.col(cur))

    state = F.filter(
        F.array(
            F.when(_changed("_pg", "group_name"), F.struct(
                F.lit(0).alias("k2"),
                F.concat(F.lit("g "), F.col("group_name")).alias("text"))),
            F.when(_changed("_po", "object_name"), F.struct(
                F.lit(1).alias("k2"),
                F.concat(F.lit("o "), F.col("object_name")).alias("text"))),
            F.when(_changed("_pm", "material"), F.struct(
                F.lit(3).alias("k2"),
                F.concat(F.lit("usemtl "), F.col("material"),
                         F.lit("_0")).alias("text"))),
        ),
        lambda x: x.isNotNull(),
    )
    state_lines = marks.select(
        "tile", "face_order", F.explode(state).alias("s")
    ).select(
        F.col("tile"),
        F.col("face_order").cast("bigint").alias("k1"),
        F.col("s.k2").cast("int").alias("k2"),
        F.lit(0).cast("bigint").alias("k3"),
        F.col("s.text").alias("text"),
    )

    # --- corners with packed emission keys --------------------------
    zipped = faces.select(
        "tile", "face_order",
        F.col("vertices").alias("_v"),
        F.coalesce("normals", F.array()).alias("_n"),
        F.coalesce("texcoords", F.array()).alias("_t"),
    ).select(
        "tile", "face_order",
        F.posexplode(F.arrays_zip("_v", "_n", "_t")).alias("ci", "c"),
    )
    corners = zipped.select(
        "tile", "face_order", "ci",
        (F.col("face_order") * MAX_CORNERS + F.col("ci")).alias("ok"),
        F.col("c._v.x").alias("vx"), F.col("c._v.y").alias("vy"),
        F.col("c._v.z").alias("vz"),
        F.col("c._n.x").alias("nx"), F.col("c._n.y").alias("ny"),
        F.col("c._n.z").alias("nz"),
        F.col("c._t.u").alias("tu"), F.col("c._t.v").alias("tv"),
    )

    # --- first-seen vector tables + their v / vn / vt lines ---------
    vtab = _first_seen(corners, ["vx", "vy", "vz"], "vidx")
    ntab = _first_seen(
        corners.where(F.col("nx").isNotNull()), ["nx", "ny", "nz"], "nidx"
    )
    ttab = _first_seen(
        corners.where(F.col("tu").isNotNull()), ["tu", "tv"], "tidx"
    )
    fk_face = F.floor(F.col("fk") / MAX_CORNERS).cast("bigint")
    fk_sub = F.col("fk") % MAX_CORNERS
    v_lines = vtab.select(*_line(
        F.col("tile"), fk_face, 5, fk_sub,
        _vec3("v ", F.col("vx"), F.col("vy"), F.col("vz"))))
    n_lines = ntab.select(*_line(
        F.col("tile"), fk_face, 2, fk_sub,
        _vec3("vn ", F.col("nx"), F.col("ny"), F.col("nz"))))
    t_lines = ttab.select(*_line(
        F.col("tile"), fk_face, 4, fk_sub,
        F.concat(F.lit("vt "), fixed(F.col("tu")), F.lit(" "),
                 fixed(F.col("tv")))))

    # --- face lines: join indices back, assemble f tokens -----------
    cidx = (
        corners
        .join(vtab.select("tile", "vx", "vy", "vz", "vidx"),
              ["tile", "vx", "vy", "vz"])
        .join(ntab.select("tile", "nx", "ny", "nz", "nidx"),
              ["tile", "nx", "ny", "nz"], "left")
        .join(ttab.select("tile", "tu", "tv", "tidx"),
              ["tile", "tu", "tv"], "left")
    )
    f_lines = (
        cidx.groupBy("tile", "face_order")
        .agg(F.array_sort(
            F.collect_list(F.struct("ci", "vidx", "nidx", "tidx"))
        ).alias("cs"))
        .select(*_line(
            F.col("tile"), F.col("face_order"), 6, F.lit(0),
            F.concat(F.lit("f "),
                     F.array_join(F.transform(F.col("cs"), token_for), " ")),
        ))
    )

    # --- assembly: the fixed header is a prefix of every file, so it
    # concatenates onto the joined body instead of costing a distinct
    # scan + union branch -----------------------------------------------
    lines = state_lines.unionByName(n_lines).unionByName(t_lines) \
        .unionByName(v_lines).unionByName(f_lines)
    obj = (
        lines.groupBy("tile")
        .agg(F.concat(
            F.lit(_HEADER[0] + "\n" + _HEADER[1] + "\n"),
            F.concat(F.lit("mtllib "), F.col("tile"),
                     F.lit(".obj.mtl\n\n")),
            F.array_join(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("k1", "k2", "k3", "text"))),
                lambda s: s["text"],
            ), "\n"),
        ).alias("obj_text"))
    )

    # --- MTL: one block per material, first-seen order ---------------
    mats = faces.groupBy("tile", "material", "r", "g", "b").agg(
        F.min("face_order").alias("fk")
    )
    ka = F.concat_ws(" ", F.lit("Ka"), _ambient(F.col("r")),
                     _ambient(F.col("g")), _ambient(F.col("b")))
    kd = F.concat_ws(" ", F.lit("Kd"), _ambient(F.col("r")),
                     _ambient(F.col("g")), _ambient(F.col("b")))
    block = F.array_join(F.array(
        F.concat(F.lit("newmtl "), F.col("material"), F.lit("_0")),
        F.lit("Ns 92.156863"),
        ka, kd,
        *[F.lit(t) for t in _MTL_CONST_TAIL],
    ), "\n")
    mtl = (
        mats.select("tile", "fk", block.alias("block"))
        .groupBy("tile")
        .agg(F.concat(
            F.lit("\n".join(_MTL_HEADER) + "\n"),
            F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("fk", "block"))),
                lambda s: s["block"],
            ), "\n"),
        ).alias("mtl_text"))
    )

    return obj.join(mtl, "tile")


def token_for(c: Column) -> Column:
    """f-line token for one corner struct (ci, vidx, nidx, tidx):
    ``v``, ``v/t``, ``v//n`` or ``v/t/n`` (ObjOutput.writeFace:304-319)."""
    v = c["vidx"].cast("string")
    n = c["nidx"].cast("string")
    t = c["tidx"].cast("string")
    return (
        F.when(c["tidx"].isNotNull() & c["nidx"].isNotNull(),
               F.concat(v, F.lit("/"), t, F.lit("/"), n))
        .when(c["tidx"].isNotNull(), F.concat(v, F.lit("/"), t))
        .when(c["nidx"].isNotNull(), F.concat(v, F.lit("//"), n))
        .otherwise(v)
    )
