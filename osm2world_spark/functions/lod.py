"""Level-of-detail range predicates and filtering — reference P15.

Reference: LODRange (scene/mesh/LODRange.java:8-40) is an inclusive
[min, max] pair over the 5 LOD ordinals (0..4); MeshStore.FilterLod
(scene/mesh/MeshStore.java:124-140) keeps rows whose range contains the
target LOD selected by config (O2WConfig.lod :432). Pure Column
expressions — stays in whole-stage codegen and pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOD_MIN, LOD_MAX = 0, 4  # LevelOfDetail ordinals LOD0..LOD4


def lod_range_contains(min_lod, max_lod, target: int) -> Column:
    """LODRange.contains (LODRange.java:25-27): min <= target <= max."""
    t = F.lit(int(target))
    return (F.col(min_lod) <= t) & (t <= F.col(max_lod)) if isinstance(min_lod, str) else (
        (min_lod <= t) & (t <= max_lod)
    )


def lod_range_intersection(min1, max1, min2, max2) -> Column:
    """LODRange.intersection (LODRange.java:30-40) as a struct Column:
    (greatest of mins, least of maxs), NULL when empty."""
    lo = F.greatest(min1, min2)
    hi = F.least(max1, max2)
    return F.when(lo <= hi, F.struct(lo.alias("min"), hi.alias("max")))


def filter_lod(df: DataFrame, target: int, min_col: str = "lod_min", max_col: str = "lod_max") -> DataFrame:
    """MeshStore.FilterLod: keep rows whose [lod_min, lod_max] contains the
    target LOD."""
    return df.where(lod_range_contains(F.col(min_col), F.col(max_col), target))
