"""Polygon triangulation (ear clipping) over packed coordinate arrays.

Reference: TriangulationUtil (/root/reference/core/src/main/java/org/
osm2world/math/algorithms/TriangulationUtil.java:22-50) dispatches polygon
triangulation to an ear-cut implementation
(Earcut4JTriangulationUtil.java); the result is a list of triangles
covering the polygon. Holes are handled by the ear-cut's bridge building;
here holes are bridged to the outer ring by the classic max-x bridge
(connect the hole's max-x vertex to a visible outer vertex), then the
merged ring is ear-clipped.

Spark shape: one `mapInPandas` over the elements DataFrame; per Arrow
batch the kernel loops rings (rings are document-scale, tens of vertices)
and emits one row per triangle. Invariants (test surface): a simple ring
with n distinct vertices yields exactly n-2 triangles, and the signed
areas of the triangles sum to the ring's shoelace area exactly (the same
additions in a fixed order, so the float result is deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TRIANGLES_SCHEMA = StructType(
    [
        StructField("eid", StringType()),
        StructField("tri_idx", IntegerType()),
        StructField("ax", DoubleType()),
        StructField("az", DoubleType()),
        StructField("bx", DoubleType()),
        StructField("bz", DoubleType()),
        StructField("cx", DoubleType()),
        StructField("cz", DoubleType()),
    ]
)


def _signed_area2(xs: np.ndarray, zs: np.ndarray) -> float:
    """Twice the shoelace signed area of an open ring (no closing dup)."""
    return float(np.dot(xs, np.roll(zs, -1)) - np.dot(np.roll(xs, -1), zs))


def _ear_clip(xs: np.ndarray, zs: np.ndarray) -> list[tuple[int, int, int]]:
    """Ear clipping of one simple ring (open, CCW). Returns index triples.
    O(n^2) with vectorized point-in-triangle per candidate ear; rings are
    small so this is bounded per-row work."""
    n = len(xs)
    if n < 3:
        return []
    idx = list(range(n))
    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        clipped = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            ax, az = xs[i0], zs[i0]
            bx, bz = xs[i1], zs[i1]
            cx, cz = xs[i2], zs[i2]
            cross = (bx - ax) * (cz - az) - (cx - ax) * (bz - az)
            if cross <= 0:  # reflex or degenerate corner (CCW convention)
                continue
            others = np.array([j for j in idx if j not in (i0, i1, i2)], dtype=np.int64)
            if len(others):
                px, pz = xs[others], zs[others]
                # bridge duplicates coincide with ear corners exactly; a
                # coincident vertex must not block the ear
                dup = ((px == ax) & (pz == az)) | ((px == bx) & (pz == bz)) | (
                    (px == cx) & (pz == cz)
                )
                px, pz = px[~dup], pz[~dup]
                d1 = (bx - ax) * (pz - az) - (bz - az) * (px - ax)
                d2 = (cx - bx) * (pz - bz) - (cz - bz) * (px - bx)
                d3 = (ax - cx) * (pz - cz) - (az - cz) * (px - cx)
                if bool(((d1 >= 0) & (d2 >= 0) & (d3 >= 0)).any()):
                    continue
            tris.append((i0, i1, i2))
            del idx[k]
            clipped = True
            break
        if not clipped:  # numerically stuck: fan the rest (degenerate ring)
            break
    if len(idx) >= 3:
        for k in range(1, len(idx) - 1):
            tris.append((idx[0], idx[k], idx[k + 1]))
    return tris


def _bridge_hole(oxs, ozs, hxs, hzs):
    """Merge one hole into the outer ring via the max-x bridge (the
    standard ear-cut hole elimination): connect the hole's max-x vertex to
    the nearest outer vertex to its right, duplicating both endpoints."""
    h = int(np.argmax(hxs))
    hx, hz = hxs[h], hzs[h]
    cand = np.nonzero(oxs >= hx)[0]
    if len(cand) == 0:
        cand = np.arange(len(oxs))
    d2 = (oxs[cand] - hx) ** 2 + (ozs[cand] - hz) ** 2
    o = int(cand[np.argmin(d2)])
    # outer[..o] + hole[h..] + hole[..h] + hole[h] + outer[o..]
    nxs = np.concatenate([oxs[: o + 1], hxs[h:], hxs[: h + 1], oxs[o:]])
    nzs = np.concatenate([ozs[: o + 1], hzs[h:], hzs[: h + 1], ozs[o:]])
    return nxs, nzs


def triangulate(elements: DataFrame, id_cols: tuple[str, str] = ("doc_id", "span_idx")) -> DataFrame:
    """Triangulate every `area` element's polygon (outer ring + holes) into
    triangles: one output row per triangle, vertices in CCW order.

    Input needs (id_cols..., element_type, geom: array<array<double>>);
    ring 0 is the outer ring, further rings are holes (first==last vertex).
    """
    from pyspark.sql import functions as F

    areas = elements.where(F.col("element_type") == "area").select(
        F.concat_ws("#", *id_cols).alias("eid"), "geom"
    )

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("eid", "tri_idx", "ax", "az", "bx", "bz", "cx", "cz")}
            for eid, geom in zip(pdf["eid"], pdf["geom"]):
                rings = []
                for ring in geom:
                    arr = np.asarray(ring, dtype=np.float64)
                    xs, zs = arr[0::2], arr[1::2]
                    if len(xs) >= 2 and xs[0] == xs[-1] and zs[0] == zs[-1]:
                        xs, zs = xs[:-1], zs[:-1]
                    if len(xs) >= 3:
                        rings.append((xs, zs))
                if not rings:
                    continue
                oxs, ozs = rings[0]
                if _signed_area2(oxs, ozs) < 0:  # normalize outer to CCW
                    oxs, ozs = oxs[::-1], ozs[::-1]
                # holes clockwise, merged largest-max-x first
                holes = []
                for hxs, hzs in rings[1:]:
                    if _signed_area2(hxs, hzs) > 0:
                        hxs, hzs = hxs[::-1], hzs[::-1]
                    holes.append((hxs, hzs))
                holes.sort(key=lambda h: -float(np.max(h[0])))
                for hxs, hzs in holes:
                    oxs, ozs = _bridge_hole(oxs, ozs, hxs, hzs)
                for t, (i0, i1, i2) in enumerate(_ear_clip(oxs, ozs)):
                    out["eid"].append(eid)
                    out["tri_idx"].append(t)
                    out["ax"].append(float(oxs[i0]))
                    out["az"].append(float(ozs[i0]))
                    out["bx"].append(float(oxs[i1]))
                    out["bz"].append(float(ozs[i1]))
                    out["cx"].append(float(oxs[i2]))
                    out["cz"].append(float(ozs[i2]))
            yield pd.DataFrame(out)

    return areas.mapInPandas(kernel, schema=TRIANGLES_SCHEMA)
