"""Smooth (vertex-averaged) normals as a relational plan
(NormalCalculationUtil.calculateTriangleNormals smooth=true,
NormalCalculationUtil.java:40-49,149-168).

The Java builds a HashMultimap<vertex, normal> over ALL triangles (a
SET — identical normals of coplanar neighbors collapse before the
average) and emits, per triangle vertex, the normalized sum of that
vertex's adjacent-normal set. That is a join shape, not a loop:

  triangles -> per-triangle normal (projection)
            -> explode verticesNoDup -> DISTINCT (mesh, vertex, normal)
            -> groupBy (mesh, vertex): ORDER-INDEPENDENT summed normal
            -> join back to the triangle vertices, reassemble in order

Scale: two exchanges (distinct + the vertex aggregation; the join
reuses the aggregation's partitioning) regardless of mesh size; meshes
shard by mesh_id so no task sees more than one mesh's vertices.

Determinism deviations from the Java (documented, pinned by tests):
- the summed average folds the adjacent normals in sorted (x, y, z)
  order, so the double sum is partition- and shuffle-order-independent
  (Java sums in HashSet iteration order — same set, different rounding);
- the degenerate fallback (opposite normals cancelling to length 0)
  returns the adjacent normal of the LOWEST triangle index (Java takes
  HashSet.iterator().next(), which is unspecified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normals import triangle_normal


def _fold_sum(sorted_normals: Column) -> Column:
    """Left-fold component sum over a pre-sorted normal array — the
    deterministic replacement for an unordered double sum."""
    zero = F.struct(
        F.lit(0.0).alias("x"), F.lit(0.0).alias("y"), F.lit(0.0).alias("z")
    )
    return F.aggregate(
        sorted_normals,
        zero,
        lambda acc, v: F.struct(
            (acc["x"] + v["x"]).alias("x"),
            (acc["y"] + v["y"]).alias("y"),
            (acc["z"] + v["z"]).alias("z"),
        ),
    )


def smooth_vertex_normals(
    tris: DataFrame,
    mesh_col: str = "mesh_id",
    tri_col: str = "tri_idx",
    verts_col: str = "verts",
) -> DataFrame:
    """tris (mesh_id, tri_idx, verts: array<struct<x,y,z>> of length 3)
    -> (mesh_id, vertex struct, normal struct): the smooth normal of
    every distinct vertex VALUE in each mesh.

    Callers reattach normals to triangle corners with one more join on
    (mesh_id, vertex) — kept separate so the heavy corner explosion is
    opt-in."""
    v = F.col(verts_col)
    withn = tris.select(
        F.col(mesh_col),
        F.col(tri_col),
        v.alias("verts"),
        triangle_normal(
            F.element_at(v, 1), F.element_at(v, 2), F.element_at(v, 3)
        ).alias("normal"),
    )
    # verticesNoDup (TriangleXYZ.java): drop repeated corner values
    corners = withn.select(
        mesh_col,
        tri_col,
        "normal",
        F.explode(F.array_distinct("verts")).alias("vertex"),
    )
    # the HashMultimap SET semantics: one row per distinct
    # (mesh, vertex, normal); keep the lowest tri_idx as the
    # deterministic degenerate fallback
    adj = corners.groupBy(mesh_col, "vertex", "normal").agg(
        F.min(tri_col).alias("first_tri")
    )
    per_vertex = adj.groupBy(mesh_col, "vertex").agg(
        _fold_sum(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("normal")["x"].alias("x"),
                        F.col("normal")["y"].alias("y"),
                        F.col("normal")["z"].alias("z"),
                    )
                )
            )
        ).alias("sum_n"),
        F.min_by("normal", F.struct(F.col("first_tri"), F.col("normal"))).alias(
            "fallback"
        ),
    )
    ln2 = (
        F.col("sum_n")["x"] * F.col("sum_n")["x"]
        + F.col("sum_n")["y"] * F.col("sum_n")["y"]
        + F.col("sum_n")["z"] * F.col("sum_n")["z"]
    )
    ln = F.sqrt(ln2)
    normal = F.when(
        ln2 > 0.0,
        F.struct(
            (F.col("sum_n")["x"] / ln).alias("x"),
            (F.col("sum_n")["y"] / ln).alias("y"),
            (F.col("sum_n")["z"] / ln).alias("z"),
        ),
    ).otherwise(F.col("fallback"))
    return per_vertex.select(mesh_col, "vertex", normal.alias("normal"))
