"""Natural-neighbor (Sibson) terrain interpolation — reference J9.

Reference (/root/reference/core/src/main/java/org/osm2world/
map_elevation/creation/):
- NaturalNeighborInterpolator.java:19-57 — build one Delaunay
  triangulation over the sites' bbox padded by 100 (:27-29), then for each
  probe point take its natural neighbors and weight their heights.
- DelaunayTriangulation.java:565-653 (probe) — Sibson weights via the
  stolen-area rule: temporarily insert the probe, weight of neighbor v =
  Voronoi-cell area v loses to the probe = (sector-fan area of v over the
  REMOVED cavity triangles) - (sector-fan area over the NEW triangles),
  normalized by the total (:632-650). Sector fans are triangles
  (v, circumcenter_i, circumcenter_i+1) over the rotationally ordered
  incident subset (:683-771).

Spark shape: a cogrouped applyInPandas — queries and sites are grouped by
a spatial key, each group builds its own incremental (Bowyer-Watson)
triangulation and probes its queries locally, so groups parallelize across
executors and nothing global is collected. With `cell_size` set, groups
are grid cells and sites are replicated into a `halo`-cell neighborhood:
exact whenever every query's Sibson neighborhood (a few local Voronoi
cells) fits inside the halo — the per-tile decomposition the reference's
global in-memory triangulation cannot do. With cell_size=None everything
is one group (small-data exact mode; the reference's own shape).

The triangulation math is the textbook Bowyer-Watson algorithm + Sibson's
stolen-area formula (public knowledge); no reference code is copied.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

BBOX_PAD = 100.0  # NaturalNeighborInterpolator.java:28


class _Delaunay:
    """Incremental Bowyer-Watson triangulation seeded with two triangles
    over a (padded) bounding rectangle, like the reference's
    DelaunayTriangulation(boundingBox). Vertices 0..3 are the frame
    corners."""

    def __init__(self, minx, minz, maxx, maxz):
        self.px = [minx, maxx, maxx, minx]
        self.pz = [minz, minz, maxz, maxz]
        # two CCW triangles covering the rectangle
        self.tris: list[tuple[int, int, int] | None] = [(0, 1, 2), (0, 2, 3)]
        self.cc: list[tuple[float, float, float] | None] = [
            self._circum(0, 1, 2),
            self._circum(0, 2, 3),
        ]
        self.edge_map: dict[tuple[int, int], int] = {}
        self.incident: list[set[int]] = [set() for _ in range(4)]
        for t_idx, t in enumerate(self.tris):
            for e in self._edges(t):
                self.edge_map[e] = t_idx
            for v in t:
                self.incident[v].add(t_idx)
        self.last_alive = 0

    # ------------------------------------------------------------ basics

    def _circum(self, i, j, k):
        ax, az = self.px[i], self.pz[i]
        bx, bz = self.px[j], self.pz[j]
        cx, cz = self.px[k], self.pz[k]
        d = 2.0 * (ax * (bz - cz) + bx * (cz - az) + cx * (az - bz))
        if d == 0.0:
            return (float("inf"), float("inf"), float("inf"))
        a2 = ax * ax + az * az
        b2 = bx * bx + bz * bz
        c2 = cx * cx + cz * cz
        ux = (a2 * (bz - cz) + b2 * (cz - az) + c2 * (az - bz)) / d
        uz = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ux - ax) ** 2 + (uz - az) ** 2
        return (ux, uz, r2)

    @staticmethod
    def _edges(t):
        return ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))

    def _in_circle(self, t_idx, x, z):
        ux, uz, r2 = self.cc[t_idx]
        return (x - ux) ** 2 + (z - uz) ** 2 < r2 * (1.0 + 1e-12)

    def _locate(self, x, z):
        """Walk from the last inserted triangle toward (x, z) using
        orientation tests; falls back to scanning if the walk stalls."""
        t_idx = self.last_alive
        if self.tris[t_idx] is None:
            t_idx = next(i for i, t in enumerate(self.tris) if t is not None)
        for _ in range(4 * len(self.tris) + 8):
            t = self.tris[t_idx]
            moved = False
            for a, b in self._edges(t):
                # strictly right of directed edge (a -> b): cross < 0
                cross = (self.px[b] - self.px[a]) * (z - self.pz[a]) - (
                    self.pz[b] - self.pz[a]
                ) * (x - self.px[a])
                if cross < 0:
                    nxt = self.edge_map.get((b, a))
                    if nxt is not None:
                        t_idx = nxt
                        moved = True
                        break
            if not moved:
                return t_idx
        for i, t in enumerate(self.tris):  # pragma: no cover - degenerate walk
            if t is not None and self._contains(i, x, z):
                return i
        return t_idx

    def _contains(self, t_idx, x, z):
        t = self.tris[t_idx]
        for a, b in self._edges(t):
            cross = (self.px[b] - self.px[a]) * (z - self.pz[a]) - (
                self.pz[b] - self.pz[a]
            ) * (x - self.px[a])
            if cross < -1e-12:
                return False
        return True

    # ------------------------------------------------------------ cavity

    def _cavity(self, x, z):
        """All triangles whose circumcircle contains (x, z): BFS from the
        containing triangle (the cavity is edge-connected)."""
        start = self._locate(x, z)
        if not self._in_circle(start, x, z):
            for i, t in enumerate(self.tris):
                if t is not None and self._in_circle(i, x, z):
                    start = i
                    break
            else:
                return []
        seen = {start}
        stack = [start]
        cavity = []
        while stack:
            ti = stack.pop()
            cavity.append(ti)
            for a, b in self._edges(self.tris[ti]):
                nb = self.edge_map.get((b, a))
                if nb is not None and nb not in seen and self._in_circle(nb, x, z):
                    seen.add(nb)
                    stack.append(nb)
        return cavity

    def _boundary(self, cavity):
        """Boundary edges of the cavity in original orientation (CCW seen
        from inside)."""
        cav = set(cavity)
        out = []
        for ti in cavity:
            for a, b in self._edges(self.tris[ti]):
                if self.edge_map.get((b, a)) not in cav:
                    out.append((a, b))
        return out

    # ------------------------------------------------------------ insert

    def insert(self, x, z, dedupe_eps=1e-9) -> bool:
        """Insert a vertex; returns False (no vertex added) for points
        outside the frame or coinciding with an existing vertex."""
        cavity = self._cavity(x, z)
        if not cavity:
            return False
        for ti in cavity:  # duplicate site -> degenerate triangles; skip
            for v in self.tris[ti]:
                if (self.px[v] - x) ** 2 + (self.pz[v] - z) ** 2 < dedupe_eps ** 2:
                    return False
        boundary = self._boundary(cavity)
        p_idx = len(self.px)
        self.px.append(x)
        self.pz.append(z)
        self.incident.append(set())
        for ti in cavity:
            for e in self._edges(self.tris[ti]):
                if self.edge_map.get(e) == ti:
                    del self.edge_map[e]
            for v in self.tris[ti]:
                self.incident[v].discard(ti)
            self.tris[ti] = None
            self.cc[ti] = None
        for a, b in boundary:
            t_idx = len(self.tris)
            self.tris.append((a, b, p_idx))
            self.cc.append(self._circum(a, b, p_idx))
            for e in self._edges((a, b, p_idx)):
                self.edge_map[e] = t_idx
            for v in (a, b, p_idx):
                self.incident[v].add(t_idx)
            self.last_alive = t_idx
        return True

    # ------------------------------------------------------------- probe

    def _fan_area(self, v, centers_by_other):
        """Signed sector-fan area at vertex v over a chain of incident
        triangles. `centers_by_other` maps (prev_vertex, next_vertex) ->
        circumcenter for each incident triangle (v, prev, next); chaining
        consecutive triangles through the shared edge vertex reproduces the
        reference's rotational walk (DelaunayTriangulation.java:697-745)."""
        if not centers_by_other:
            return 0.0
        nxt = {a: (b, c) for (a, b), c in centers_by_other.items()}
        starts = set(a for a, _ in centers_by_other) - set(
            b for (_, b) in centers_by_other
        )
        closed = not starts
        start = min(starts) if starts else next(iter(nxt))
        chain = []
        cur = start
        for _ in range(len(nxt)):
            if cur not in nxt:
                break
            b, c = nxt.pop(cur)
            chain.append(c)
            cur = b
        if closed and len(chain) >= 2:
            chain.append(chain[0])  # wrap: v interior to the cavity
        vx, vz = self.px[v], self.pz[v]
        area = 0.0
        for (c1x, c1z), (c2x, c2z) in zip(chain, chain[1:]):
            area += 0.5 * (
                (c1x - vx) * (c2z - vz) - (c2x - vx) * (c1z - vz)
            )
        return area

    def probe(self, x, z, snap_eps=1e-9):
        """Natural neighbors of (x, z): list of (vertex_idx, weight) with
        weights summing to 1 (Sibson stolen-area rule). A probe coinciding
        with an existing vertex returns that vertex with weight 1."""
        cavity = self._cavity(x, z)
        if not cavity:
            return []
        neighbors: set[int] = set()
        for ti in cavity:
            neighbors.update(self.tris[ti])
        for v in neighbors:
            if (self.px[v] - x) ** 2 + (self.pz[v] - z) ** 2 < snap_eps ** 2:
                return [(v, 1.0)]
        boundary = self._boundary(cavity)
        # FULL cell fans per neighbor, with and without the probe — the
        # reference computes whole-cell sizes both times (its incident-
        # subset restriction is disabled, DelaunayTriangulation.java:697,
        # 717), so the unchanged sectors cancel exactly in the diff
        qx, qz = x, z
        cav_set = set(cavity)
        old_ct: dict[int, dict] = {v: {} for v in neighbors}
        new_ct: dict[int, dict] = {v: {} for v in neighbors}
        for v in neighbors:
            for ti in self.incident[v]:
                t = self.tris[ti]
                c = self.cc[ti][:2]
                i = t.index(v)
                key = (t[(i + 1) % 3], t[(i + 2) % 3])  # spans prev -> next
                old_ct[v][key] = c
                if ti not in cav_set:
                    new_ct[v][key] = c
        Q = -1  # symbolic index for the probe
        for a, b in boundary:
            ax, az = self.px[a], self.pz[a]
            bx, bz = self.px[b], self.pz[b]
            d = 2.0 * (ax * (bz - qz) + bx * (qz - az) + qx * (az - bz))
            if d == 0.0:
                continue
            a2, b2, q2 = ax * ax + az * az, bx * bx + bz * bz, qx * qx + qz * qz
            ux = (a2 * (bz - qz) + b2 * (qz - az) + q2 * (az - bz)) / d
            uz = (a2 * (qx - bx) + b2 * (ax - qx) + q2 * (bx - ax)) / d
            c = (ux, uz)
            # triangle (a, b, q): at a the span is b -> q, at b it is q -> a
            new_ct[a][(b, Q)] = c
            new_ct[b][(Q, a)] = c
        weights = []
        total = 0.0
        for v in neighbors:
            w = self._fan_area(v, old_ct[v]) - self._fan_area(v, new_ct[v])
            if w > 0:
                weights.append((v, w))
                total += w
        if total <= 0:
            return []
        return [(v, w / total) for v, w in weights]


def _interpolate_group(sites_x, sites_z, sites_y, q_x, q_z):
    """Build one triangulation over the group's sites (bbox padded by
    BBOX_PAD, frame corners carry y=0 like the reference's boundary
    points) and Sibson-probe each query. Returns ele array (NaN where a
    query has no neighbors)."""
    minx, maxx = sites_x.min() - BBOX_PAD, sites_x.max() + BBOX_PAD
    minz, maxz = sites_z.min() - BBOX_PAD, sites_z.max() + BBOX_PAD
    tri = _Delaunay(minx, minz, maxx, maxz)
    ys = [0.0, 0.0, 0.0, 0.0]  # frame corners
    order = np.lexsort((sites_z, sites_x))  # deterministic insertion order
    for i in order:
        if tri.insert(float(sites_x[i]), float(sites_z[i])):
            ys.append(float(sites_y[i]))  # ys stays index-aligned with vertices
    out = np.full(len(q_x), np.nan)
    for qi in range(len(q_x)):
        nn = tri.probe(float(q_x[qi]), float(q_z[qi]))
        if nn:
            out[qi] = sum(ys[v] * w for v, w in nn)
    return out


NN_SCHEMA = StructType(
    [StructField("q_id", StringType()), StructField("ele", DoubleType())]
)


def natural_neighbor_interpolate(
    queries: DataFrame,
    sites: DataFrame,
    cell_size: float | None = None,
    halo: int = 1,
) -> DataFrame:
    """queries (q_id, x, z) x sites (s_id, x, z, y) -> (q_id, ele) via
    Sibson natural-neighbor interpolation (NaturalNeighborInterpolator
    semantics).

    cell_size=None: one group — exact, for datasets whose sites fit one
    task (the reference's own single-machine shape). With cell_size set,
    queries group by grid cell and sites replicate into the (2*halo+1)^2
    cell neighborhood; exact whenever the Sibson neighborhood radius <
    halo*cell_size (choose cell_size >> typical site spacing)."""
    if cell_size is None:
        q = queries.select(F.lit(0).alias("g"), "q_id", "x", "z")
        s = sites.select(F.lit(0).alias("g"), "x", "z", "y")
    else:
        gq = (
            F.floor(F.col("x") / cell_size).cast("bigint") * 2_000_003
            + F.floor(F.col("z") / cell_size).cast("bigint")
        )
        q = queries.select(gq.alias("g"), "q_id", "x", "z")
        offs = [
            (dx, dz) for dx in range(-halo, halo + 1) for dz in range(-halo, halo + 1)
        ]
        off_arr = F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dz).alias("dz"))
                for dx, dz in offs
            ]
        )
        s = sites.select(
            F.explode(
                F.transform(
                    off_arr,
                    lambda o: (
                        (F.floor(F.col("x") / cell_size).cast("bigint") + o["dx"].cast("bigint"))
                        * 2_000_003
                        + (F.floor(F.col("z") / cell_size).cast("bigint") + o["dz"].cast("bigint"))
                    ),
                )
            ).alias("g"),
            "x",
            "z",
            "y",
        )

    def fn(q_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(q_pdf) == 0 or len(s_pdf) == 0:
            return pd.DataFrame({"q_id": q_pdf.get("q_id", pd.Series(dtype=object)), "ele": np.nan})
        ele = _interpolate_group(
            s_pdf["x"].to_numpy(np.float64),
            s_pdf["z"].to_numpy(np.float64),
            s_pdf["y"].to_numpy(np.float64),
            q_pdf["x"].to_numpy(np.float64),
            q_pdf["z"].to_numpy(np.float64),
        )
        return pd.DataFrame({"q_id": q_pdf["q_id"].values, "ele": ele})

    return (
        q.groupBy("g")
        .cogroup(s.groupBy("g"))
        .applyInPandas(lambda qk, sk: fn(qk, sk), schema=NN_SCHEMA)
    )
