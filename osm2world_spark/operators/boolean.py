"""Polygon boolean operations (CAG): intersection / difference by
triangle decomposition.

Reference: CAGUtil (/root/reference/core/src/main/java/org/osm2world/math/
algorithms/CAGUtil.java): `subtractPolygons` (:37-41) and
`intersectPolygons` (:90-93) compute constructive-area-geometry results
via face decomposition (FaceDecompositionUtil) with a JTS fallback
(:43-88). The *analytics* surface we reproduce: exact intersection /
difference areas and an explicit decomposition of the intersection region.

Spark shape: polygons (with holes) are ear-clipped into triangle soups
(the engine's triangulation operator); triangle x triangle intersection is
convex∩convex, solved exactly by Sutherland-Hodgman half-plane clipping.
area(A ∩ B) = sum over clipped pieces; area(A \\ B) = area(A) − area(A ∩ B)
(valid because the pieces partition the intersection). Runs per pair
inside one mapInPandas batch — pairs parallelize across the cluster, and
each pair's work is bounded by its triangle counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from .triangulate import _bridge_hole, _ear_clip, _signed_area2


def _poly_triangles(geom) -> list[np.ndarray]:
    """geometry (list of packed closed rings; ring 0 outer, rest holes) ->
    list of (3,2) CCW triangles."""
    rings = []
    for ring in geom:
        arr = np.asarray(ring, dtype=np.float64)
        xs, zs = arr[0::2], arr[1::2]
        if len(xs) >= 2 and xs[0] == xs[-1] and zs[0] == zs[-1]:
            xs, zs = xs[:-1], zs[:-1]
        if len(xs) >= 3:
            rings.append((xs, zs))
    if not rings:
        return []
    oxs, ozs = rings[0]
    if _signed_area2(oxs, ozs) < 0:
        oxs, ozs = oxs[::-1], ozs[::-1]
    holes = []
    for hxs, hzs in rings[1:]:
        if _signed_area2(hxs, hzs) > 0:
            hxs, hzs = hxs[::-1], hzs[::-1]
        holes.append((hxs, hzs))
    holes.sort(key=lambda h: -float(np.max(h[0])))
    for hxs, hzs in holes:
        oxs, ozs = _bridge_hole(oxs, ozs, hxs, hzs)
    return [
        np.array([[oxs[i], ozs[i]], [oxs[j], ozs[j]], [oxs[k], ozs[k]]])
        for i, j, k in _ear_clip(oxs, ozs)
    ]


def _clip_convex(poly: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip polygon `poly` (n,2) by CCW convex
    `clipper` (m,2). Returns the (k,2) clipped polygon (possibly empty)."""
    out = poly
    m = len(clipper)
    for e in range(m):
        if len(out) == 0:
            break
        ax, az = clipper[e]
        bx, bz = clipper[(e + 1) % m]
        # inside = left of directed edge a->b (CCW interior)
        d = (bx - ax) * (out[:, 1] - az) - (bz - az) * (out[:, 0] - ax)
        inside = d >= 0
        nxt = np.roll(np.arange(len(out)), -1)
        res = []
        for i in range(len(out)):
            j = nxt[i]
            if inside[i]:
                res.append(out[i])
                if not inside[j]:
                    t = d[i] / (d[i] - d[j])
                    res.append(out[i] + t * (out[j] - out[i]))
            elif inside[j]:
                t = d[i] / (d[i] - d[j])
                res.append(out[i] + t * (out[j] - out[i]))
        out = np.asarray(res) if res else np.empty((0, 2))
    return out


def _poly_area(p: np.ndarray) -> float:
    if len(p) < 3:
        return 0.0
    return 0.5 * float(
        np.dot(p[:, 0], np.roll(p[:, 1], -1)) - np.dot(np.roll(p[:, 0], -1), p[:, 1])
    )


def intersection_pieces(a_geom, b_geom) -> tuple[float, float, float, list[np.ndarray]]:
    """(area_a, area_b, area_intersection, pieces): the convex pieces
    partition A ∩ B."""
    tris_a = _poly_triangles(a_geom)
    tris_b = _poly_triangles(b_geom)
    area_a = sum(_poly_area(t) for t in tris_a)
    area_b = sum(_poly_area(t) for t in tris_b)
    pieces = []
    inter = 0.0
    for ta in tris_a:
        for tb in tris_b:
            p = _clip_convex(ta, tb)
            ar = _poly_area(p)
            if ar > 0.0:
                pieces.append(p)
                inter += ar
    return area_a, area_b, inter, pieces


BOOLEAN_SCHEMA = StructType(
    [
        StructField("pair_id", StringType()),
        StructField("n_pieces", IntegerType()),
        StructField("area_a", DoubleType()),
        StructField("area_b", DoubleType()),
        StructField("area_intersection", DoubleType()),
        StructField("area_a_minus_b", DoubleType()),
        StructField("area_b_minus_a", DoubleType()),
    ]
)


def polygon_boolean(pairs: DataFrame) -> DataFrame:
    """pairs (pair_id, a_geom: array<array<double>>, b_geom) ->
    intersection / difference areas + piece count per pair
    (CAGUtil.intersectPolygons / subtractPolygons analytics surface)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for pid, ag, bg in zip(pdf["pair_id"], pdf["a_geom"], pdf["b_geom"]):
                aa, ab, ai, pieces = intersection_pieces(ag, bg)
                rows.append((pid, len(pieces), aa, ab, ai, aa - ai, ab - ai))
            yield pd.DataFrame(
                rows,
                columns=[
                    "pair_id", "n_pieces", "area_a", "area_b",
                    "area_intersection", "area_a_minus_b", "area_b_minus_a",
                ],
            )

    return pairs.mapInPandas(kernel, schema=BOOLEAN_SCHEMA)
