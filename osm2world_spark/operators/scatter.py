"""Seeded point scattering over polygon areas.

Reference: GeometryUtil.distributePointsOn (/root/reference/core/src/main/
java/org/osm2world/math/algorithms/GeometryUtil.java:723-797), the
vegetation placement primitive — TreeModule.java:545 calls it with
seed = the area's OSM id to scatter trees over forest polygons with a
density per 100 m^2, so a re-run of the converter places every tree at
exactly the same spot.

Algorithm (replicated exactly):
- boxSize = sqrt(100 / density); the polygon's bbox is covered by a grid
  of boxes, iterated boxZ-major then boxX (:758-759) — iteration order
  matters because all boxes share ONE java.util.Random(seed) stream,
- a box is skipped (consuming NO random draws) when it neither contains
  nor intersects the polygon region (:771-774); kept boxes draw
  POINTS_PER_BOX = 100 candidate points, two nextDouble() each (x then
  z, :778-780), and a candidate is emitted iff it lies strictly inside
  the polygon-with-holes (:784),
- rand_mode='lcg' (production / reference parity) is a bit-exact
  java.util.Random: 48-bit LCG state, nextDouble = (next(26) << 27 +
  next(27)) * 2^-53. The 400 sequential draws of a box are vectorized by
  jumping the LCG with precomputed A^t / C_t tables (state_t =
  A^t * s0 + C_t mod 2^48), so the kernel is numpy throughout; pytest
  pins the output against golden values produced by running the real
  java.util.Random on the JDK in tools/ScatterGolden.java.
- rand_mode='hash' replaces the stream with a per-(box, candidate, axis)
  md5-derived fraction — order-independent and reproducible in any SQL
  engine, used by the driver oracle.

Spark shape: one bounded kernel per polygon row inside Arrow batches
(mapInPandas, no shuffle); candidate filtering is the vectorized
ray-cast kernel over the packed FlatRings layout.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.geometry import contains_point, flatten

POINTS_PER_BOX = 100  # GeometryUtil.java:723
_MULT = 0x5DEECE66D
_ADD = 0xB
_MASK = (1 << 48) - 1

# LCG jump tables: state after t advances = (A_POW[t] * s0 + C_OFF[t]) & MASK
_N_DRAWS = POINTS_PER_BOX * 4
_A_POW = np.empty(_N_DRAWS + 1, dtype=np.uint64)
_C_OFF = np.empty(_N_DRAWS + 1, dtype=np.uint64)
_A_POW[0], _C_OFF[0] = 1, 0
for _t in range(1, _N_DRAWS + 1):
    _A_POW[_t] = (int(_A_POW[_t - 1]) * _MULT) & _MASK
    _C_OFF[_t] = (int(_C_OFF[_t - 1]) * _MULT + _ADD) & _MASK


def _java_random_doubles(state: int, n_doubles: int) -> tuple[np.ndarray, int]:
    """n_doubles java.util.Random.nextDouble() values from `state`
    (post-scramble 48-bit state), plus the state afterwards. Vectorized
    via the jump tables."""
    t = np.arange(1, 2 * n_doubles + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):  # modular 2^64 wrap is the point
        states = (_A_POW[t] * np.uint64(state) + _C_OFF[t]) & np.uint64(_MASK)
    hi = (states[0::2] >> np.uint64(22)).astype(np.int64)  # next(26)
    lo = (states[1::2] >> np.uint64(21)).astype(np.int64)  # next(27)
    vals = ((hi << 27) + lo) * (2.0 ** -53)
    end = (int(_A_POW[2 * n_doubles]) * state + int(_C_OFF[2 * n_doubles])) & _MASK
    return vals, end


def _hash_fracs(seed: int, box_x: int, box_z: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-candidate md5-derived fractions in [0, 1): 52-bit prefix of
    md5('{seed}:{box_x}:{box_z}:{i}:{axis}') / 2^52 — the exact formula
    the DuckDB oracle recomputes."""
    xs = np.empty(n)
    zs = np.empty(n)
    for i in range(n):
        for axis, arr in (("x", xs), ("z", zs)):
            h = hashlib.md5(f"{seed}:{box_x}:{box_z}:{i}:{axis}".encode()).hexdigest()
            arr[i] = int(h[:13], 16) / 4503599627370496.0  # 2^52
    return xs, zs


def _rings_arrays(geom) -> list[np.ndarray]:
    out = []
    for ring in geom:
        arr = np.asarray(ring, dtype=np.float64)
        pts = np.stack([arr[0::2], arr[1::2]], axis=1)
        if len(pts) >= 2 and (pts[0] == pts[-1]).all():
            pts = pts[:-1]
        if len(pts) >= 3:
            out.append(pts)
    return out


def _box_crosses(rings: list[np.ndarray], bx0, bz0, bx1, bz1) -> bool:
    """Any polygon boundary segment properly intersects a box edge
    (collinear overlaps skipped, like the CAG intersection finder)."""
    edges = (
        (bx0, bz0, bx1, bz0),
        (bx1, bz0, bx1, bz1),
        (bx1, bz1, bx0, bz1),
        (bx0, bz1, bx0, bz0),
    )
    for pts in rings:
        nxt = np.roll(pts, -1, axis=0)
        rx, rz = nxt[:, 0] - pts[:, 0], nxt[:, 1] - pts[:, 1]
        for qx1, qz1, qx2, qz2 in edges:
            sx, sz = qx2 - qx1, qz2 - qz1
            den = rx * sz - rz * sx
            ok = np.abs(den) > 1e-12 * np.sqrt((rx * rx + rz * rz) * (sx * sx + sz * sz))
            den_safe = np.where(ok, den, 1.0)
            t = ((qx1 - pts[:, 0]) * sz - (qz1 - pts[:, 1]) * sx) / den_safe
            u = ((qx1 - pts[:, 0]) * rz - (qz1 - pts[:, 1]) * rx) / den_safe
            if np.any(ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)):
                return True
    return False


def _pip(flat, xs: np.ndarray, zs: np.ndarray) -> np.ndarray:
    return contains_point(xs, zs, flat)


SCATTER_SCHEMA = StructType(
    [
        StructField("poly_id", StringType()),
        StructField("box_x", IntegerType()),
        StructField("box_z", IntegerType()),
        StructField("cand", IntegerType()),
        StructField("px", DoubleType()),
        StructField("pz", DoubleType()),
    ]
)


def scatter_points_on(
    polys: DataFrame,
    density: float,
    id_col: str = "poly_id",
    geom_col: str = "geom",
    seed_col: str | None = None,
    rand_mode: str = "lcg",
) -> DataFrame:
    """One row per scattered point: (poly_id, box_x, box_z, cand, px, pz).
    `seed_col` defaults to the polygon id cast to a long (the reference
    seeds with the area's OSM id)."""
    if rand_mode not in ("lcg", "hash"):
        raise ValueError(rand_mode)
    box_size = math.sqrt(100 / density)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            seeds = pdf[seed_col] if seed_col else pdf[id_col]
            for pid, geom, seed in zip(pdf[id_col], pdf[geom_col], seeds):
                rings = _rings_arrays(geom)
                if not rings:
                    continue
                seed = int(seed)
                allx = np.concatenate([r[:, 0] for r in rings])
                allz = np.concatenate([r[:, 1] for r in rings])
                # bbox of the OUTER ring (PolygonWithHolesXZ.boundingBox
                # spans the outer); holes lie inside it anyway
                min_x, max_x = float(rings[0][:, 0].min()), float(rings[0][:, 0].max())
                min_z, max_z = float(rings[0][:, 1].min()), float(rings[0][:, 1].max())
                n_bx = int((max_x - min_x) / box_size)
                n_bz = int((max_z - min_z) / box_size)
                state = (seed ^ _MULT) & _MASK
                flat = None
                for box_z in range(n_bz + 1):
                    for box_x in range(n_bx + 1):
                        bx0 = min_x + box_size * box_x
                        bz0 = min_z + box_size * box_z
                        bx1 = min_x + box_size * (box_x + 1)
                        bz1 = min_z + box_size * (box_z + 1)
                        if not _box_crosses(rings, bx0, bz0, bx1, bz1):
                            # no boundary crossing: the box is entirely on
                            # one side — keep iff its center is in the
                            # polygon region (even-odd with holes)
                            if flat is None:
                                flat = flatten([geom])
                            cx = np.array([(bx0 + bx1) / 2.0])
                            cz = np.array([(bz0 + bz1) / 2.0])
                            if not bool(_pip(flat, cx, cz)[0]):
                                continue  # consumes no draws (:771-774)
                        if rand_mode == "lcg":
                            vals, state = _java_random_doubles(state, 2 * POINTS_PER_BOX)
                            fx, fz = vals[0::2], vals[1::2]
                        else:
                            fx, fz = _hash_fracs(seed, box_x, box_z, POINTS_PER_BOX)
                        px = bx0 + box_size * fx
                        pz = bz0 + box_size * fz
                        if flat is None:
                            flat = flatten([geom])
                        flats = flatten([geom] * len(px)) if len(px) else flat
                        inside = contains_point(px, pz, flats)
                        for i in np.nonzero(inside)[0]:
                            rows.append(
                                (str(pid), box_x, box_z, int(i), float(px[i]), float(pz[i]))
                            )
            yield pd.DataFrame(rows, columns=[f.name for f in SCATTER_SCHEMA.fields])

    cols = [F.col(id_col).alias(id_col), F.col(geom_col).alias(geom_col)]
    if seed_col:
        cols.append(F.col(seed_col).cast("bigint").alias(seed_col))
    return polys.select(*cols).mapInPandas(kernel, SCATTER_SCHEMA)
