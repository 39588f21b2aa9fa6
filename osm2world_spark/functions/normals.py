"""Flat-shading normal calculation (NormalCalculationUtil parity).

Reference: core/.../math/algorithms/NormalCalculationUtil.java —
calculateTriangleNormals(flat) repeats each triangle's normal three
times (:26-54); calculatePerTriangleNormals(:117-147) computes strip /
fan per-vertex flat normals with normals[0] = normals[1] = normals[2];
TriangleXYZ.getNormal (TriangleXYZ.java:60-62) is
(v2 - v1) x (v2 - v3), normalized.

Vertices are struct<x double, y double, z double>; everything is a pure
Column projection (no shuffle, no Python). A degenerate triangle
produces NaN components exactly like the Java division by zero length.
Smooth (vertex-averaged) normals need cross-triangle context and live
in operators/normals.py as a relational plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .meshes import _el, _idx


def vec3(x, y, z) -> Column:
    return F.struct(
        F.lit(x).alias("x") if not isinstance(x, Column) else x.alias("x"),
        F.lit(y).alias("y") if not isinstance(y, Column) else y.alias("y"),
        F.lit(z).alias("z") if not isinstance(z, Column) else z.alias("z"),
    )


def _sub(a: Column, b: Column) -> Column:
    return vec3(a["x"] - b["x"], a["y"] - b["y"], a["z"] - b["z"])


def cross_normalized(a: Column, b: Column) -> Column:
    """VectorXYZ.crossNormalized (VectorXYZ.java:105-116): cross product
    components divided by the cross length. Parallel/degenerate inputs
    give NaN components like the Java 0d/0d — guarded explicitly because
    Spark's ANSI mode would otherwise raise DIVIDE_BY_ZERO on them
    instead of propagating NaN (the when() branch keeps the division
    untaken for ln == 0, so non-degenerate values are bit-identical)."""
    x = a["y"] * b["z"] - a["z"] * b["y"]
    y = a["z"] * b["x"] - a["x"] * b["z"]
    z = a["x"] * b["y"] - a["y"] * b["x"]
    ln = F.sqrt(x * x + y * y + z * z)
    nan = F.lit(float("nan"))

    def div(c: Column) -> Column:
        return F.when(ln != 0.0, c / ln).otherwise(nan)

    return vec3(div(x), div(y), div(z))


def triangle_normal(v1: Column, v2: Column, v3: Column) -> Column:
    """TriangleXYZ.getNormal: (v2-v1) x (v2-v3), normalized — points up
    for counterclockwise triangles."""
    return cross_normalized(_sub(v2, v1), _sub(v2, v3))


def flat_triangle_normals(vs: Column) -> Column:
    """Flat-shading normals for a triangle vertex list (size % 3 == 0):
    each triangle's normal three times (calculateTriangleNormals,
    smooth=false). NULL when size isn't a multiple of 3."""
    n = F.size(vs)
    out = F.flatten(
        F.transform(
            _idx(n, F.floor(n / 3).cast("int") - 1),
            lambda t: F.array_repeat(
                triangle_normal(_el(vs, t * 3), _el(vs, t * 3 + 1), _el(vs, t * 3 + 2)),
                3,
            ),
        )
    )
    return F.when(n % 3 == 0, out)


def _per_triangle_normals(vs: Column, fan: bool) -> Column:
    """calculatePerTriangleNormals: output[j] for j >= 2 is the normal
    of triangle j-2 (vBefore = vs[fan ? 0 : j-2], vAt = vs[j-1],
    vAfter = vs[j]; orientation flips on odd strip triangles);
    output[0] = output[1] = output[2]."""
    n = F.size(vs)

    def normal_at(j: Column) -> Column:
        t = j - 2  # triangle index
        v_before = _el(vs, F.lit(0)) if fan else _el(vs, t)
        v_at = _el(vs, t + 1)
        v_after = _el(vs, t + 2)
        to_before = _sub(v_before, v_at)
        to_after = _sub(v_after, v_at)
        fwd = cross_normalized(to_before, to_after)
        if fan:
            return fwd
        return F.when(t % 2 == 0, fwd).otherwise(
            cross_normalized(to_after, to_before)
        )

    return F.transform(
        _idx(n, n - 1),
        lambda j: normal_at(F.greatest(j, F.lit(2))),
    )


def strip_flat_normals(vs: Column) -> Column:
    """calculateTriangleStripNormals(smooth=false)."""
    return _per_triangle_normals(vs, fan=False)


def fan_flat_normals(vs: Column) -> Column:
    """calculateTriangleFanNormals(smooth=false)."""
    return _per_triangle_normals(vs, fan=True)
