"""All-intersections among line segments — reference J12.

Reference: LineSegmentIntersectionFinder.java:17-60 — a sweep-line over
segment endpoints that reports every crossing of a segment set (used for
road-network intersection finding). The event-queue formulation is
inherently sequential; the Spark-shaped equivalent here is
**sweep-and-prune**: sort the group's segments by their x-interval start,
then for each segment take as candidates exactly the later segments whose
x-interval starts before this one's end (one vectorized searchsorted — no
quadratic expansion when segments are short relative to the extent, the
road-segment shape), prune again on z-interval overlap, and run the exact
parametric crossing test on the survivors. Everything after the
per-group sort is flat numpy.

Distribution: groups (a spatial cell or an explicit key) run independently
inside one applyInPandas — the same partition-parallel shape as the
spatial self-join, so dense groups parallelize across executors.

Semantics match the engine's segment x segment rule (ww kernel,
spatial_join._ww_rows): crossing iff |denom| > 1e-4 and both parameters
lie in [0, 1]; output positions are mm-snapped (floor(v*1000 + 0.5)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SWEEP_SCHEMA = StructType(
    [
        StructField("a_key", StringType()),
        StructField("b_key", StringType()),
        StructField("ix_mm", LongType()),
        StructField("iz_mm", LongType()),
    ]
)


def _group_intersections(pdf: pd.DataFrame, cell_size: float | None = None) -> pd.DataFrame:
    from ..functions.geometry import _ranges

    n = len(pdf)
    if n < 2:
        return pd.DataFrame({c.name: [] for c in SWEEP_SCHEMA})
    key = pdf["key"].to_numpy()
    x1 = pdf["x1"].to_numpy(np.float64)
    z1 = pdf["z1"].to_numpy(np.float64)
    x2 = pdf["x2"].to_numpy(np.float64)
    z2 = pdf["z2"].to_numpy(np.float64)

    xmin = np.minimum(x1, x2)
    xmax = np.maximum(x1, x2)
    order = np.argsort(xmin, kind="stable")
    key, x1, z1, x2, z2 = key[order], x1[order], z1[order], x2[order], z2[order]
    xmin, xmax = xmin[order], xmax[order]

    # broad phase: candidates of i = later segments starting before xmax_i
    hi = np.searchsorted(xmin, xmax, side="right")
    counts = np.maximum(hi - np.arange(1, n + 1), 0)
    if counts.sum() == 0:
        return pd.DataFrame({c.name: [] for c in SWEEP_SCHEMA})
    ii = np.repeat(np.arange(n, dtype=np.int64), counts)
    jj = np.repeat(np.arange(1, n + 1, dtype=np.int64), counts) + _ranges(counts)

    # z-interval prune
    zmin = np.minimum(z1, z2)
    zmax = np.maximum(z1, z2)
    zok = (zmin[ii] <= zmax[jj]) & (zmin[jj] <= zmax[ii])
    ii, jj = ii[zok], jj[zok]
    if len(ii) == 0:
        return pd.DataFrame({c.name: [] for c in SWEEP_SCHEMA})

    # canonical (a, b) = key-ascending BEFORE the narrow phase, so the
    # parametric point is computed on the same segment an oracle keyed by
    # (a.key < b.key) would use — identical double ops, identical mm snap
    swap = key[ii] > key[jj]
    ia = np.where(swap, jj, ii)
    ib = np.where(swap, ii, jj)

    # narrow phase: parametric crossing, same rule as the ww kernel
    vx = x2[ia] - x1[ia]
    vz = z2[ia] - z1[ia]
    qx = x2[ib] - x1[ib]
    qz = z2[ib] - z1[ib]
    denom = vz * qx - vx * qz
    amcx = x1[ib] - x1[ia]
    amcz = z1[ib] - z1[ia]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (amcz * qx - amcx * qz) / denom
        s = (amcz * vx - amcx * vz) / denom
    hit = (np.abs(denom) > 1e-4) & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1)
    if not hit.any():
        return pd.DataFrame({c.name: [] for c in SWEEP_SCHEMA})
    ia, ib, t = ia[hit], ib[hit], t[hit]
    ix = x1[ia] + t * (x2[ia] - x1[ia])
    iz = z1[ia] + t * (z2[ia] - z1[ia])
    if cell_size is not None:
        # reference-point dedup across cell replicas: a crossing is owned by
        # the ONE cell containing its intersection point. Both segments'
        # bboxes contain the point, so that cell is covered by both
        # replications — every crossing is emitted exactly once. The
        # (ia, ib) canonical key order above makes ix/iz bit-identical in
        # every replica, so the floor test picks the same owner everywhere.
        cx = int(pdf["cell_x"].iloc[0])
        cz = int(pdf["cell_z"].iloc[0])
        own = (np.floor(ix / cell_size) == cx) & (np.floor(iz / cell_size) == cz)
        if not own.any():
            return pd.DataFrame({c.name: [] for c in SWEEP_SCHEMA})
        ia, ib, ix, iz = ia[own], ib[own], ix[own], iz[own]
    return pd.DataFrame(
        {
            "a_key": key[ia].astype(str),
            "b_key": key[ib].astype(str),
            "ix_mm": np.floor(ix * 1000.0 + 0.5).astype(np.int64),
            "iz_mm": np.floor(iz * 1000.0 + 0.5).astype(np.int64),
        }
    )


def sweep_intersections(
    segments: DataFrame,
    group_col: str | None = None,
    cell_size: float | None = None,
) -> DataFrame:
    """segments (key, x1, z1, x2, z2[, group_col]) -> every pairwise
    crossing (a_key, b_key, ix_mm, iz_mm) with a_key < b_key.

    Distribution modes:
    - `cell_size`: the complete mode — each segment is replicated into every
      grid cell its bbox overlaps (the same IndexGrid insert semantics as
      the spatial self-join, IndexGrid.java:154-178), and a crossing is
      emitted only by the cell containing its intersection point
      (reference-point dedup). This reports EVERY pairwise crossing of the
      whole set, including pairs straddling cell boundaries, matching the
      reference's all-intersections semantics
      (LineSegmentIntersectionFinder.java:17-60).
    - `group_col`: explicit pre-blocked mode — crossings are only found
      WITHIN a group; a pair straddling two groups is not reported. Use
      only when the blocking key is known to be closed under crossings
      (e.g. per-way or per-relation sets).
    - neither: the whole set is one group (small-data mode).
    """
    cols = ["key", "x1", "z1", "x2", "z2"]
    if cell_size is not None:
        cs = float(cell_size)
        cx0 = F.floor(F.least("x1", "x2") / cs).cast("bigint")
        cx1 = F.floor(F.greatest("x1", "x2") / cs).cast("bigint")
        cz0 = F.floor(F.least("z1", "z2") / cs).cast("bigint")
        cz1 = F.floor(F.greatest("z1", "z2") / cs).cast("bigint")
        cells = F.flatten(
            F.transform(
                F.sequence(cx0, cx1),
                lambda cx: F.transform(
                    F.sequence(cz0, cz1),
                    lambda cz: F.struct(cx.alias("cell_x"), cz.alias("cell_z")),
                ),
            )
        )
        src = segments.select(
            *[F.col(c) for c in cols], F.explode(cells).alias("cell")
        ).select(*cols, F.col("cell.cell_x"), F.col("cell.cell_z"))
        return src.groupBy("cell_x", "cell_z").applyInPandas(
            lambda pdf: _group_intersections(pdf, cell_size=cs), schema=SWEEP_SCHEMA
        )
    if group_col is None:
        src = segments.select(F.lit(0).alias("g"), *[F.col(c) for c in cols])
    else:
        src = segments.select(F.col(group_col).alias("g"), *[F.col(c) for c in cols])
    return (
        src.groupBy("g")
        .applyInPandas(lambda pdf: _group_intersections(pdf), schema=SWEEP_SCHEMA)
    )
