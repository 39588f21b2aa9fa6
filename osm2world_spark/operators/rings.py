"""Multipolygon assembly: stitch way fragments into closed rings, then
group rings into polygons-with-holes.

Reference: MultipolygonAreaBuilder (/root/reference/core/src/main/java/org/
osm2world/map_data/creation/MultipolygonAreaBuilder.java):
- buildRings (:193-251): greedily appends node sequences (either end, either
  direction) to the ring under construction until it closes; if any
  sequence cannot be placed the relation is invalid (returns null :246-248)
- buildPolygonsFromRings (:258-335): repeatedly pick a ring contained in no
  other remaining ring as an OUTER (:269-287), take the rings directly
  contained in it (contained in the outer but in no other remaining ring)
  as its HOLES (:293-312), emit the polygon, remove used rings (:328-329)
- winding: outer rings counterclockwise, holes clockwise (MapArea.java:
  113-115 reverses hole sense).

Spark shape: `applyInPandas` grouped by relation id — assembly is a
per-relation sequential stitch (the reference's own loop), but relations
are independent, so the group-by key is the parallelism unit; geometry
stays in packed numpy arrays throughout. Invalid relations (unclosable
rings) are quarantined as `status='unclosed'` lineage-style rows instead
of failing the job (FaultTolerantIterationUtil analogue).
"""

from __future__ import annotations

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

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("rel_id", StringType()),
        StructField("area_idx", IntegerType()),
        StructField("status", StringType()),
        StructField("n_holes", IntegerType()),
        StructField("geom", ArrayType(ArrayType(DoubleType()))),
    ]
)


def _signed_area2(xs: np.ndarray, zs: np.ndarray) -> float:
    return float(np.dot(xs, np.roll(zs, -1)) - np.dot(np.roll(xs, -1), zs))


def _stitch(seqs: list[np.ndarray]) -> list[np.ndarray] | None:
    """buildRings (:193-251): greedy either-end either-direction append.
    Each seq is an (n,2) array. Returns closed rings (first==last) or None
    if any fragment can't be placed into a closed ring."""
    pool = [s for s in seqs if len(s) >= 2]
    rings: list[np.ndarray] = []
    cur: np.ndarray | None = None
    while pool or cur is not None:
        if cur is None:
            cur = pool.pop()
        if np.array_equal(cur[0], cur[-1]) and len(cur) >= 4:
            rings.append(cur)
            cur = None
            continue
        placed = False
        for i, s in enumerate(pool):
            if np.array_equal(cur[-1], s[0]):
                cur = np.concatenate([cur, s[1:]])
            elif np.array_equal(cur[-1], s[-1]):
                cur = np.concatenate([cur, s[::-1][1:]])
            elif np.array_equal(cur[0], s[-1]):
                cur = np.concatenate([s, cur[1:]])
            elif np.array_equal(cur[0], s[0]):
                cur = np.concatenate([s[::-1], cur[1:]])
            else:
                continue
            pool.pop(i)
            placed = True
            break
        if not placed:
            if np.array_equal(cur[0], cur[-1]) and len(cur) >= 4:
                rings.append(cur)
                cur = None
            else:
                return None  # :246-248 — the last ring could not be closed
    return rings


def _ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """Ring.containsRing analogue: every inner vertex inside-or-on the
    outer ring (vertex-based, consistent with the reference's polygon
    containment idiom). Uses the even-odd kernel on the shared geometry
    module."""
    from ..functions.geometry import FlatRings, contains_points_multi

    # FlatRings stores CLOSED rings (first == last; edges() emits npts-1)
    oxs, ozs = outer[:, 0], outer[:, 1]
    flat = FlatRings(
        n_rows=1,
        ring_row=np.zeros(1, dtype=np.int64),
        ring_idx=np.zeros(1, dtype=np.int64),
        ring_start=np.zeros(1, dtype=np.int64),
        ring_npts=np.array([len(oxs)], dtype=np.int64),
        px=oxs.copy(),
        pz=ozs.copy(),
    )
    qx, qz = inner[:-1, 0], inner[:-1, 1]
    on_vertex = ((qx[:, None] == oxs[None, :]) & (qz[:, None] == ozs[None, :])).any(axis=1)
    need = ~on_vertex
    if not need.any():
        return True
    inside = contains_points_multi(
        qx[need], qz[need], np.zeros(int(need.sum()), dtype=np.int64), flat
    )
    return bool(inside.all())


def _pack(ring: np.ndarray, ccw: bool) -> list[float]:
    a2 = _signed_area2(ring[:-1, 0], ring[:-1, 1])
    if (a2 > 0) != ccw:
        ring = ring[::-1]
    return ring.reshape(-1).tolist()


def _is_right_of(px, pz, ax, az, bx, bz) -> bool:
    """GeometryUtil.isRightOf (:283-287): p right of ray a->b (cross < 0
    in the x-east/z-north plane)."""
    return (bx - ax) * (pz - az) - (bz - az) * (px - ax) < 0


def _seg_intersection(p1, p2, r1, r2):
    """Inclusive segment x segment intersection
    (GeometryUtil.getLineSegmentIntersection :222-260); None if parallel or
    outside either segment."""
    vx, vz = p2[0] - p1[0], p2[1] - p1[1]
    qx, qz = r2[0] - r1[0], r2[1] - r1[1]
    denom = vz * qx - vx * qz
    if abs(denom) < 1e-12:
        return None
    dx, dz = r1[0] - p1[0], r1[1] - p1[1]
    t = (dz * qx - dx * qz) / denom          # along p1->p2
    u = (dz * vx - dx * vz) / denom          # along r1->r2
    if -0.0 <= t <= 1.0 and -0.0 <= u <= 1.0:
        return (p1[0] + t * vx, p1[1] + t * vz), u
    return None


def _coastline_rings_for_group(seqs, minx, minz, maxx, maxz, is_at_sea):
    """createAreasForCoastlines (MultipolygonAreaBuilder.java:357-617) for
    one bbox: clip coastlines to the bbox, synthesize bbox sections between
    outgoing and incoming crossings, stitch into closed rings. Returns the
    ring list (None if unclosable)."""
    TL, TR = (minx, maxz), (maxx, maxz)
    BR, BL = (maxx, minz), (minx, minz)
    sides = [(TL, TR), (TR, BR), (BR, BL), (BL, TL)]  # :621-629 clockwise

    # --- insert bbox intersection nodes into the coastlines (:400-458)
    side_hits = [[] for _ in sides]  # (dist_from_p1, point, outgoing)
    coastlines = []
    for seq in seqs:
        pts = [tuple(p) for p in seq]
        out_pts = []
        i = 0
        while i < len(pts):
            out_pts.append(pts[i])
            if i + 1 < len(pts):
                a, b = pts[i], pts[i + 1]
                hits = []
                for k, (s1, s2) in enumerate(sides):
                    res = _seg_intersection(s1, s2, a, b)
                    if res is not None:
                        q, u = res
                        outgoing = _is_right_of(a[0], a[1], s1[0], s1[1], s2[0], s2[1])
                        hits.append((u, q, k, outgoing))
                hits.sort()
                for u, q, k, outgoing in hits:
                    node = a if q == a else (b if q == b else q)
                    d = ((node[0] - sides[k][0][0]) ** 2 + (node[1] - sides[k][0][1]) ** 2) ** 0.5
                    side_hits[k].append((d, node, outgoing))
                    if node not in (a, b):
                        out_pts.append(node)
            i += 1
        coastlines.append(out_pts)

    bbox_nodes = []  # (point, outgoing|None) walked clockwise (:443-458)
    on_bbox = set()
    for k, (s1, s2) in enumerate(sides):
        for d, node, outgoing in sorted(side_hits[k], key=lambda h: h[0]):
            bbox_nodes.append((node, outgoing))
            on_bbox.add(node)
        bbox_nodes.append((s2, None))  # corner

    # --- drop outside portions, splitting sequences (:461-495)
    def inside(p):
        return minx <= p[0] <= maxx and minz <= p[1] <= maxz

    modified = []
    for pts in coastlines:
        cur = []
        for p in pts:
            if inside(p) or p in on_bbox:
                cur.append(p)
            elif cur:
                modified.append(cur)
                cur = []
        if cur:
            modified.append(cur)

    # --- bbox sections between outgoing and incoming crossings (:499-550)
    sections = []
    has_crossings = any(o is not None for _, o in bbox_nodes)
    if has_crossings:
        first_out = -1
        idx = 0
        cur = None
        while idx != first_out:
            node, outgoing = bbox_nodes[idx]
            if outgoing is None:  # plain corner node
                if cur is not None:
                    cur.append(node)
            elif bool(outgoing):
                cur = [node]
                if first_out == -1:
                    first_out = idx
            else:
                if cur is not None:
                    cur.append(node)
                    sections.append(cur)
                    cur = None
            idx = (idx + 1) % len(bbox_nodes)
            if first_out == -1 and idx == 0:
                break  # no outgoing crossing at all

    seq_arrays = [np.asarray(s, dtype=np.float64) for s in modified + sections if len(s) >= 2]
    rings = _stitch(seq_arrays)
    if rings is None:
        return None

    # --- island / all-sea tiles: wrap with the bbox ring (:565-597)
    if not sections:
        has_island = any(
            _signed_area2(r[:-1, 0], r[:-1, 1]) > 0 for r in rings
        )
        if has_island or is_at_sea:
            boundary = np.asarray([BL, BR, TR, TL, BL], dtype=np.float64)
            rings.append(boundary)
    return rings


def coastline_water_areas(coastlines: DataFrame, is_at_sea: bool = False) -> DataFrame:
    """Coastline ways -> natural=water areas per tile group
    (MultipolygonAreaBuilder.createAreasForCoastlines :357-617): coastlines
    carry water on the RIGHT of their direction; crossings with the tile
    bbox synthesize boundary sections; closed rings become a synthetic
    water multipolygon (outer/holes classified exactly like assembled
    relations). Island-only and all-sea groups get the full bbox ring.

    Input: (group_id, way_idx, coords array<double>, minx, minz, maxx,
    maxz) — the bbox columns are constant within a group (one tile = one
    group; groups process in parallel across the cluster).
    Output: (rel_id=group_id, area_idx, status, n_holes, geom).
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = pdf["group_id"].iloc[0]
        pdf = pdf.sort_values("way_idx")
        seqs = [np.asarray(c, dtype=np.float64).reshape(-1, 2) for c in pdf["coords"]]
        rings = _coastline_rings_for_group(
            seqs,
            float(pdf["minx"].iloc[0]),
            float(pdf["minz"].iloc[0]),
            float(pdf["maxx"].iloc[0]),
            float(pdf["maxz"].iloc[0]),
            is_at_sea,
        )
        if rings is None:
            return pd.DataFrame(
                {"rel_id": [gid], "area_idx": [0], "status": ["unclosed"],
                 "n_holes": [0], "geom": [None]}
            )
        rows = []
        remaining = list(rings)
        area_idx = 0
        while remaining:
            outer = None
            for cand in remaining:
                if not any(o is not cand and _ring_contains_ring(o, cand) for o in remaining):
                    outer = cand
                    break
            if outer is None:
                rows.append((gid, area_idx, "unclosed", 0, None))
                break
            holes = [
                r for r in remaining
                if r is not outer and _ring_contains_ring(outer, r)
                and not any(
                    o is not r and o is not outer and _ring_contains_ring(o, r)
                    for o in remaining
                )
            ]
            geom = [_pack(outer, ccw=True)] + [_pack(h, ccw=False) for h in holes]
            rows.append((gid, area_idx, "ok", len(holes), geom))
            area_idx += 1
            remaining = [r for r in remaining if r is not outer and not any(r is h for h in holes)]
        if not rows:
            return pd.DataFrame(columns=["rel_id", "area_idx", "status", "n_holes", "geom"])
        return pd.DataFrame(rows, columns=["rel_id", "area_idx", "status", "n_holes", "geom"])

    return coastlines.groupBy("group_id").applyInPandas(run, schema=ASSEMBLED_SCHEMA)


def assemble_multipolygons(ways: DataFrame) -> DataFrame:
    """ways (rel_id, way_idx, coords: array<double> packed x,z polyline)
    -> assembled polygons (rel_id, area_idx, status, n_holes,
    geom: array<array<double>>) with ring 0 the CCW outer and subsequent
    rings CW holes. status='ok' | 'unclosed' (quarantined relation,
    geom=null)."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = pdf["rel_id"].iloc[0]
        pdf = pdf.sort_values("way_idx")
        seqs = [np.asarray(c, dtype=np.float64).reshape(-1, 2) for c in pdf["coords"]]
        rings = _stitch(seqs)
        if rings is None:
            return pd.DataFrame(
                {"rel_id": [rel_id], "area_idx": [0], "status": ["unclosed"],
                 "n_holes": [0], "geom": [None]}
            )
        rows = []
        remaining = list(rings)
        area_idx = 0
        while remaining:
            outer = None
            for cand in remaining:  # :269-287
                if not any(
                    o is not cand and _ring_contains_ring(o, cand) for o in remaining
                ):
                    outer = cand
                    break
            if outer is None:  # mutual containment degenerate; bail safely
                rows.append((rel_id, area_idx, "unclosed", 0, None))
                break
            holes = [
                r
                for r in remaining
                if r is not outer
                and _ring_contains_ring(outer, r)
                and not any(
                    o is not r and o is not outer and _ring_contains_ring(o, r)
                    for o in remaining
                )
            ]  # :293-312
            geom = [_pack(outer, ccw=True)] + [_pack(h, ccw=False) for h in holes]
            rows.append((rel_id, area_idx, "ok", len(holes), geom))
            area_idx += 1
            remaining = [r for r in remaining if r is not outer and not any(r is h for h in holes)]
        return pd.DataFrame(rows, columns=["rel_id", "area_idx", "status", "n_holes", "geom"])

    return ways.groupBy("rel_id").applyInPandas(assemble, schema=ASSEMBLED_SCHEMA)
