"""Empty-terrain patch grid: synthetic ground areas covering the dataset.

Reference: EmptyTerrainBuilder (/root/reference/core/src/main/java/org/
osm2world/map_data/creation/EmptyTerrainBuilder.java):
- a 30 m point grid over the padded data bounds (POINT_GRID_DIST=30 :27,
  bounds.pad(30) :41-42); grid indices snap to multiples of 30 via
  VectorGridXZ (startX = ceil((minX+0.01)/30), VectorGridXZ.java:40-44)
- nodes exist only on patch boundaries (x or z index divisible by
  PATCH_SIZE_POINTS=10, or on the outer edge :50-52)
- patches are 10x10-square ring areas walked first-row -> last-column ->
  last-row (reversed) -> first-column (reversed, closing on the start
  node) (createAreaForPatch :85-115); patch count rounds up
  ((n + PATCH-2) / PATCH :70-71)

Spark shape: a pure Column-expression generator — `spark.range` over the
patch grid, ring coordinates built with `sequence`/`transform`/`flatten`
entirely inside whole-stage codegen. No UDF, no Python. At scale this is
the "fill the ocean tiles" source: patch coordinates derive from the
dataset bounds only, so the generator partitions trivially and never
shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINT_GRID_DIST = 30.0   # EmptyTerrainBuilder.java:27
PATCH_SIZE_POINTS = 10   # EmptyTerrainBuilder.java:28


def empty_terrain_patches(
    spark: SparkSession,
    minx: float,
    minz: float,
    maxx: float,
    maxz: float,
) -> DataFrame:
    """Patch-ring areas covering [minx..maxx]x[minz..maxz] (padded by the
    grid distance, like the reference). Output: (patch_x, patch_z,
    ring: array<double> packed x,z closed ring)."""
    d = POINT_GRID_DIST
    p = PATCH_SIZE_POINTS
    # VectorGridXZ over padded bounds (pad = grid dist)
    start_x = math.ceil((minx - d + 0.01) / d)
    start_z = math.ceil((minz - d + 0.01) / d)
    end_x = math.floor((maxx + d - 0.01) / d)
    end_z = math.floor((maxz + d - 0.01) / d)
    size_x = end_x - start_x + 1
    size_z = end_z - start_z + 1
    if size_x <= 0 or size_z <= 0:
        return spark.createDataFrame([], "patch_x int, patch_z int, ring array<double>")
    n_px = (size_x + p - 2) // p
    n_pz = (size_z + p - 2) // p

    df = spark.range(n_px * n_pz).select(
        (F.col("id") % n_px).cast("int").alias("patch_x"),
        (F.col("id") / n_px).cast("int").alias("patch_z"),
    )
    sxi = F.col("patch_x") * p
    szi = F.col("patch_z") * p
    exi = F.least(sxi + p + 1, F.lit(size_x))   # exclusive ends
    ezi = F.least(szi + p + 1, F.lit(size_z))

    def gx(xi):
        return (xi + F.lit(start_x)) * d

    def gz(zi):
        return (zi + F.lit(start_z)) * d

    def pt(xi, zi):
        return F.array(gx(xi), gz(zi))

    first_row = F.transform(F.sequence(sxi, exi - 1), lambda xi: pt(xi, szi))
    last_col = F.when(
        ezi - 2 >= szi + 1,
        F.transform(F.sequence(szi + 1, ezi - 2), lambda zi: pt(exi - 1, zi)),
    ).otherwise(F.array().cast("array<array<double>>"))
    last_row = F.transform(F.sequence(exi - 1, sxi, F.lit(-1)), lambda xi: pt(xi, ezi - 1))
    first_col = F.when(
        ezi - 2 >= szi,
        F.transform(F.sequence(ezi - 2, szi, F.lit(-1)), lambda zi: pt(sxi, zi)),
    ).otherwise(F.array().cast("array<array<double>>"))

    ring = F.flatten(F.concat(first_row, last_col, last_row, first_col))
    return df.select("patch_x", "patch_z", ring.alias("ring"))
