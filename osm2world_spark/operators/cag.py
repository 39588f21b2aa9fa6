"""CAG piece geometry: polygon subtract / intersect returning the actual
result polygons (with holes), via planar face decomposition.

Reference: CAGUtil.subtractPolygons / intersectPolygons (/root/reference/
core/src/main/java/org/osm2world/math/algorithms/CAGUtil.java:37-41,90-93)
and FaceDecompositionUtil (same dir, FaceDecompositionUtil.java):
- facesFromGraph (:74-130): find all segment intersections, snap
  intersection points to segment endpoints within SNAP_DISTANCE=1e-5
  (:79,:88-100), split segments at intersection points (dedup), build the
  fully-noded undirected edge graph.
- facesFromFullyNodedGraph (:136-218): direct every edge both ways, sort
  outgoing edges per node by direction angle, trace each face by always
  taking the next edge after the reversed incoming one, keep
  counterclockwise loops as face outers and clockwise loops as candidate
  holes, then fit holes into outers by containment + area
  (buildPolygonsFromRings :221-257).
- splitPolygonIntoFaces (:32-50): faces kept iff an interior point lies in
  the base polygon and in none of the subtracted polygons.

Spark shape: each PAIR is an independent bounded unit — the kernel runs
per pair inside an Arrow batch, so pairs parallelize across the cluster
exactly like the reference parallelizes conversions. Within a pair the
segment counts are polygon-sized (not corpus-sized); intersections and
containment tests are vectorized numpy, the face trace is the reference's
own O(edges) loop. This operator backs the rare-by-construction paths
(shrinkHugeAreas residuals, terrain cutouts), not the per-element hot
path.

Known limitation (shared with the reference's own face decomposition):
COLLINEAR OVERLAPPING boundary segments between inputs are not noded
against each other (the zero-denominator case is skipped, like
SimpleLineSegmentIntersectionFinder) — polygons sharing a partial
boundary edge should go through the area-only polygon_boolean kernel,
whose Sutherland-Hodgman clipping handles tangency exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .triangulate import _ear_clip, _signed_area2

SNAP_DISTANCE = 1e-5  # FaceDecompositionUtil.java:79


def _rings_of(geom) -> list[np.ndarray]:
    """geometry (list of packed closed rings) -> list of (n,2) open rings."""
    out = []
    for ring in geom:
        arr = np.asarray(ring, dtype=np.float64)
        pts = np.stack([arr[0::2], arr[1::2]], axis=1)
        if len(pts) >= 2 and (pts[0] == pts[-1]).all():
            pts = pts[:-1]
        if len(pts) >= 3:
            out.append(pts)
    return out


def _segments_of(rings: list[np.ndarray]) -> np.ndarray:
    """(n,4) array of (x1, z1, x2, z2) boundary segments."""
    segs = []
    for pts in rings:
        nxt = np.roll(pts, -1, axis=0)
        segs.append(np.concatenate([pts, nxt], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.empty((0, 4))


def _all_intersections(segs: np.ndarray):
    """All proper pairwise intersection points (vectorized all-pairs — the
    per-pair segment count is polygon-sized). Collinear overlaps are
    skipped like SimpleLineSegmentIntersectionFinder's zero-denominator
    case. Returns (seg_i, seg_j, x, z) arrays."""
    n = len(segs)
    if n < 2:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0),) * 2
    ii, jj = np.triu_indices(n, k=1)
    p1x, p1z, p2x, p2z = (segs[ii, k] for k in range(4))
    q1x, q1z, q2x, q2z = (segs[jj, k] for k in range(4))
    rx, rz = p2x - p1x, p2z - p1z
    sx, sz = q2x - q1x, q2z - q1z
    den = rx * sz - rz * sx
    # relative threshold, not `den != 0`: collinear segment pairs whose
    # cross product is floating-point noise (e.g. a mitre-join edge lying
    # on the same line as the adjacent offset edge) would otherwise
    # produce a garbage intersection point anywhere on the shared line
    # (den ~ 1e-12 divides a finite numerator) and corrupt the noding
    ok = np.abs(den) > 1e-9 * np.sqrt((rx * rx + rz * rz) * (sx * sx + sz * sz))
    den_safe = np.where(ok, den, 1.0)
    t = ((q1x - p1x) * sz - (q1z - p1z) * sx) / den_safe
    u = ((q1x - p1x) * rz - (q1z - p1z) * rx) / den_safe
    hit = ok & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    return ii[hit], jj[hit], (p1x + t * rx)[hit], (p1z + t * rz)[hit]


def _noded_edges(segs: np.ndarray) -> set[tuple[tuple[float, float], tuple[float, float]]]:
    """facesFromGraph: snap intersections to endpoints, split segments at
    intersection points, dedupe undirected edges."""
    si, sj, ix, iz = _all_intersections(segs)
    endpoints = np.concatenate([segs[:, 0:2], segs[:, 2:4]], axis=0)
    if len(ix):
        # snap each intersection to the closest known endpoint if < SNAP
        d2 = (endpoints[:, 0][None, :] - ix[:, None]) ** 2 + (
            endpoints[:, 1][None, :] - iz[:, None]
        ) ** 2
        nearest = np.argmin(d2, axis=1)
        near_d = np.sqrt(d2[np.arange(len(ix)), nearest])
        snap = near_d < SNAP_DISTANCE
        ix = np.where(snap, endpoints[nearest, 0], ix)
        iz = np.where(snap, endpoints[nearest, 1], iz)

    pts_per_seg: dict[int, list[tuple[float, float]]] = {
        k: [(segs[k, 0], segs[k, 1]), (segs[k, 2], segs[k, 3])] for k in range(len(segs))
    }
    for k, x, z in zip(np.concatenate([si, sj]), np.concatenate([ix, ix]), np.concatenate([iz, iz])):
        pts_per_seg[int(k)].append((float(x), float(z)))

    edges: set[tuple[tuple[float, float], tuple[float, float]]] = set()
    for k, pts in pts_per_seg.items():
        uniq = list(dict.fromkeys(pts))
        start = min(((segs[k, 0], segs[k, 1]), (segs[k, 2], segs[k, 3])))
        uniq.sort(key=lambda p: (p[0] - start[0]) ** 2 + (p[1] - start[1]) ** 2)
        for a, b in zip(uniq, uniq[1:]):
            if a != b:
                edges.add((a, b) if a <= b else (b, a))
    return edges


def _trace_faces(edges) -> list[np.ndarray]:
    """facesFromFullyNodedGraph (:136-218): trace every directed edge's
    face by taking, at each node, the edge after the reversed incoming one
    in the angular order of outgoing edges. Returns vertex loops (open,
    (n,2)); counterclockwise loops are interiors, clockwise ones are the
    infinite face and hole boundaries."""
    directed = []
    for a, b in edges:
        directed.append((a, b))
        directed.append((b, a))
    out_at: dict[tuple[float, float], list[tuple[tuple[float, float], tuple[float, float]]]] = {}
    for e in directed:
        out_at.setdefault(e[0], []).append(e)
    for node, outs in out_at.items():
        # VectorXZ.angle() is measured from the +Z axis, increasing
        # clockwise (atan2(x, z)) — the sort must be the reference's
        # clockwise order for `incoming + 1` to trace CCW interior faces
        outs.sort(key=lambda e: math.atan2(e[1][0] - e[0][0], e[1][1] - e[0][1]))

    idx_at = {node: {e: i for i, e in enumerate(outs)} for node, outs in out_at.items()}
    remaining = set(directed)
    faces = []
    while remaining:
        first = next(iter(remaining))
        path = [first]
        while True:
            cur = path[-1]
            outs = out_at[cur[1]]
            incoming = (cur[1], cur[0])
            nxt = outs[(idx_at[cur[1]][incoming] + 1) % len(outs)]
            if nxt == path[0]:
                break
            path.append(nxt)
            if len(path) > 100000:
                raise RuntimeError("path too long while attempting to build a face")
        remaining.difference_update(path)
        loop = np.asarray([e[0] for e in path])
        if len(loop) >= 3 and abs(_signed_area2(loop[:, 0], loop[:, 1])) > 1e-12:
            faces.append(loop)
    return faces


def _point_inside(loop: np.ndarray) -> tuple[float, float]:
    """An interior point of a simple polygon: centroid of the first ear
    triangle (robust for non-convex faces, cf. getPointInside)."""
    xs, zs = loop[:, 0], loop[:, 1]
    if _signed_area2(xs, zs) < 0:
        xs, zs = xs[::-1], zs[::-1]
    tris = _ear_clip(xs, zs)
    if tris:
        i, j, k = tris[0]
        return float((xs[i] + xs[j] + xs[k]) / 3.0), float((zs[i] + zs[j] + zs[k]) / 3.0)
    return float(xs.mean()), float(zs.mean())


def _pip_rings(x: float, z: float, rings: list[np.ndarray]) -> bool:
    """Even-odd containment of (x, z) in a polygon given as outer+hole
    rings (crossings over ALL rings; holes flip parity)."""
    crossings = 0
    for pts in rings:
        x1, z1 = pts[:, 0], pts[:, 1]
        x2, z2 = np.roll(x1, -1), np.roll(z1, -1)
        cond = (z1 > z) != (z2 > z)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x1 + (z - z1) / (z2 - z1) * (x2 - x1)
        crossings += int(np.count_nonzero(cond & (x < np.where(cond, xi, np.inf))))
    return crossings % 2 == 1


def _build_polygons(faces: list[np.ndarray]) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """buildPolygonsFromRings (:221-257): CCW faces are outers; fit each CW
    face into the smallest containing outer (area guard 1e-7)."""
    outers = [f for f in faces if _signed_area2(f[:, 0], f[:, 1]) > 0]
    inners = [f for f in faces if _signed_area2(f[:, 0], f[:, 1]) < 0]
    areas = {id(f): abs(_signed_area2(f[:, 0], f[:, 1])) / 2.0 for f in faces}
    result = []
    outers_left = list(outers)
    inners_left = list(inners)
    while outers_left:
        outer = outers_left.pop()
        holes = []
        for inner in list(inners_left):
            px, pz = _point_inside(inner)
            if areas[id(outer)] > areas[id(inner)] + 1e-7 and _pip_rings(px, pz, [outer]):
                contained_in_smaller = any(
                    _pip_rings(px, pz, [o])
                    and areas[id(o)] > areas[id(inner)] + 1e-7
                    and _pip_rings(*_point_inside(o), [outer])
                    for o in outers_left
                )
                if not contained_in_smaller:
                    holes.append(inner)
        used = {id(h) for h in holes}
        inners_left = [i for i in inners_left if id(i) not in used]
        result.append((outer, holes))
    return result


def split_polygon_into_faces(base_geom, subtract_geoms):
    """splitPolygonIntoFaces (:32-50): the faces of the arrangement of all
    boundary segments, kept iff an interior point is inside `base_geom`
    and inside none of `subtract_geoms`. Returns a list of
    (outer (n,2), holes [(m,2), ...]) pieces covering base - union(subtract).
    """
    base_rings = _rings_of(base_geom)
    if not base_rings:
        return []  # degenerate base (no ring with >= 3 points) -> no area
    sub_rings = [_rings_of(g) for g in subtract_geoms]
    segs = [s for s in [_segments_of(base_rings)] + [_segments_of(r) for r in sub_rings] if len(s)]
    edges = _noded_edges(np.concatenate(segs, axis=0))
    faces = _trace_faces(edges)
    polys = _build_polygons(faces)
    kept = []
    for outer, holes in polys:
        px, pz = _point_inside(outer)
        if not _pip_rings(px, pz, base_rings):
            continue
        if any(_pip_rings(px, pz, r) for r in sub_rings):
            continue
        kept.append((outer, holes))
    return kept


def intersect_polygons_faces(geoms):
    """intersectPolygons (CAGUtil.java:90-93) piece geometry: faces whose
    interior point lies inside EVERY input polygon."""
    all_rings = [_rings_of(g) for g in geoms]
    if any(not r for r in all_rings):
        return []  # a degenerate input has no area to intersect
    segs = np.concatenate([_segments_of(r) for r in all_rings], axis=0)
    faces = _trace_faces(_noded_edges(segs))
    polys = _build_polygons(faces)
    kept = []
    for outer, holes in polys:
        px, pz = _point_inside(outer)
        if all(_pip_rings(px, pz, r) for r in all_rings):
            kept.append((outer, holes))
    return kept


def _canon_ring(pts: np.ndarray, ccw: bool) -> np.ndarray:
    """Canonical form: requested orientation, rotated to start at the
    lexicographically smallest vertex — hash-stable across trace order."""
    if (_signed_area2(pts[:, 0], pts[:, 1]) > 0) != ccw:
        pts = pts[::-1]
    k = np.lexsort((pts[:, 1], pts[:, 0]))[0]
    return np.roll(pts, -k, axis=0)


CAG_SCHEMA = StructType(
    [
        StructField("pair_id", StringType()),
        StructField("op", StringType()),
        StructField("piece_idx", IntegerType()),
        StructField("n_holes", IntegerType()),
        StructField("area", DoubleType()),
        StructField("outer", ArrayType(DoubleType())),
        StructField("holes", ArrayType(ArrayType(DoubleType()))),
    ]
)


def cag_pieces(pairs: DataFrame, op: str = "subtract", snap: float | None = None) -> DataFrame:
    """pairs (pair_id, a_geom, b_geom) -> one row per result piece of
    A - B (op='subtract') or A ∩ B (op='intersect'), with the actual
    outer/hole vertex arrays (canonical: outer CCW, holes CW, every ring
    rotated to its lexicographic min vertex, pieces ordered by their min
    vertex). This is the geometry CAGUtil callers consume
    (shrinkHugeAreas residuals, terrain cutouts).

    `snap` (e.g. 1e-3 for mm) quantizes vertex coordinates BEFORE
    canonicalization, so ulp-level drift in computed intersection points
    cannot flip the rotation/ordering — the engine-wide mm precision model
    (MetricMapProjection's mm snap applied to derived vertices)."""
    if op not in ("subtract", "intersect"):
        raise ValueError(op)
    quant = None if snap is None else 1.0 / snap

    def _q(pts: np.ndarray) -> np.ndarray:
        if quant is None:
            return pts
        return np.floor(pts * quant + 0.5) / quant

    def kernel(batches):
        for pdf in batches:
            rows = []
            for pid, ag, bg in zip(pdf["pair_id"], pdf["a_geom"], pdf["b_geom"]):
                if op == "subtract":
                    pieces = split_polygon_into_faces(ag, [bg])
                else:
                    pieces = intersect_polygons_faces([ag, bg])
                pieces = [(_q(outer), [_q(h) for h in holes]) for outer, holes in pieces]
                canon = []
                for outer, holes in pieces:
                    c_outer = _canon_ring(outer, ccw=True)
                    c_holes = sorted(
                        (_canon_ring(h, ccw=False) for h in holes),
                        key=lambda h: (h[0, 0], h[0, 1]),
                    )
                    area = _signed_area2(c_outer[:, 0], c_outer[:, 1]) / 2.0
                    area += sum(_signed_area2(h[:, 0], h[:, 1]) / 2.0 for h in c_holes)
                    canon.append((c_outer, c_holes, area))
                canon.sort(key=lambda t: (t[0][0, 0], t[0][0, 1]))
                for idx, (outer, holes, area) in enumerate(canon):
                    rows.append(
                        (
                            pid,
                            op,
                            idx,
                            len(holes),
                            area,
                            outer.ravel().tolist(),
                            [h.ravel().tolist() for h in holes],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["pair_id", "op", "piece_idx", "n_holes", "area", "outer", "holes"],
            )

    return pairs.mapInPandas(kernel, schema=CAG_SCHEMA)
