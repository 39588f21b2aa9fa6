"""Triangle-list assembly from strips and fans (GeometryUtil parity).

Reference: core/.../math/algorithms/GeometryUtil.java:54-186 —
trianglesFromVertexList (consecutive triples, size must be a multiple
of 3), triangleVertexListFromTriangleStrip (triangle t = (v[t], v[t+1],
v[t+2]) with the odd-t orientation flip), triangleVertexListFromTriangleFan
(t = (v[0], v[t+1], v[t+2])), and triangleNormalListFromTriangleStripOrFan
(flat shading: normal[t+2] repeated three times).

The Java functions are generic over the vertex type V; these Column
versions are too — they reorder ARRAY ELEMENTS of any type (vertex
structs, packed coordinates, ids), as pure Catalyst higher-order
functions (whole-stage codegen, zero Python, shuffle-free).

Deviation from reference: where Java throws IllegalArgumentException
(vertex list not a multiple of 3), these return NULL, and inputs with
fewer than 3 vertices yield an empty list — the relational
malformed-input convention used across the engine (quarantine, not
crash; sources/documents.py:367)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _el(vs: Column, i) -> Column:
    """0-based element access (element_at is 1-based)."""
    return F.element_at(vs, (i + 1).cast("int"))


def _idx(n: Column, last: Column) -> Column:
    """Ascending triangle indexes [0..last], empty when last < 0.
    (A bare sequence(0, last) DESCENDS for last < 0 — Spark infers
    step -1 — and would feed invalid element_at indexes; building
    ascending-then-filter keeps every accessed index in range.)"""
    return F.filter(
        F.sequence(F.lit(0), F.greatest(n, F.lit(1))), lambda i: i <= last
    )


def triangles_from_vertex_list(vs: Column) -> Column:
    """array -> array of 3-element triangle arrays (consecutive triples).
    GeometryUtil.java:54-96. NULL when size isn't a multiple of 3."""
    n = F.size(vs)
    tri = F.transform(
        _idx(n, F.floor(n / 3).cast("int") - 1),
        lambda t: F.array(_el(vs, t * 3), _el(vs, t * 3 + 1), _el(vs, t * 3 + 2)),
    )
    return F.when(n % 3 == 0, tri)


def triangle_vertex_list_from_strip(vs: Column) -> Column:
    """Strip -> flat triangle vertex list with the odd-triangle
    orientation flip (GeometryUtil.java:114-136)."""
    n = F.size(vs)
    return F.flatten(
        F.transform(
            _idx(n, n - 3),
            lambda t: F.when(
                t % 2 == 0, F.array(_el(vs, t), _el(vs, t + 1), _el(vs, t + 2))
            ).otherwise(F.array(_el(vs, t), _el(vs, t + 2), _el(vs, t + 1))),
        )
    )


def triangle_vertex_list_from_fan(vs: Column) -> Column:
    """Fan -> flat triangle vertex list: (v[0], v[t+1], v[t+2]) per
    triangle (GeometryUtil.java:165-186)."""
    n = F.size(vs)
    return F.flatten(
        F.transform(
            _idx(n, n - 3),
            lambda t: F.array(_el(vs, F.lit(0)), _el(vs, t + 1), _el(vs, t + 2)),
        )
    )


def triangle_normal_list_from_strip_or_fan(normals: Column) -> Column:
    """Flat-shading normals: normal[t+2] three times per triangle
    (GeometryUtil.java:142-155)."""
    n = F.size(normals)
    return F.flatten(
        F.transform(
            _idx(n, n - 3), lambda t: F.array_repeat(_el(normals, t + 2), 3)
        )
    )
