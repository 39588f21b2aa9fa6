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
    from ..functions.geometry import FlatRings, contains_point

    oxs, ozs = outer[:-1, 0], outer[:-1, 1]
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
    return bool(contains_point(qx[need], qz[need], flat).all())


def _pack(ring: np.ndarray, ccw: bool) -> list[float]:
    a2 = _signed_area2(ring[:-1, 0], ring[:-1, 1])
    if (a2 > 0) != ccw:
        ring = ring[::-1]
    return ring.reshape(-1).tolist()


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
