"""TreeModule dimension semantics (TreeModule.java:130-185
TreeDimensions.fromTags, deterministic path) as a pure Column
projection.

Chain, branch for branch (random=null, model=null →
defaultHeightToWidth=2, defaultCrownToTrunk=30):

- trunkDiameter = parseMeasureWithSpecialDefaultUnit(diameter, 1e-3)
  — a bare number is MILLIMETRES (the reference's special default
  unit), "0.3 m" is metres; else circumference/π (:150-157).
- crownDiameter = parseMeasure(diameter_crown) (:159).
- height = parseMeasure(height) else parseMeasure(est_height) else
  crownDiameter·2 else trunkDiameter·30·2 else defaultHeight
  (:160-173; defaultTreeHeight=10, defaultTreeHeightForest=20,
  :190-193 — pass via `default_height`).
- crownDiameter fallback = height/2 (:175-177).

The forest scale factor 0.5+0.75·random is the reference's per-tree
jitter; the deterministic (random=null → scaleFactor=1) path is what
this operator reproduces — jitter belongs to the renderer, not the
attribute relation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

DEFAULT_HEIGHT_TO_WIDTH = 2.0
DEFAULT_CROWN_TO_TRUNK = 30.0
DEFAULT_TREE_HEIGHT = 10.0
DEFAULT_TREE_HEIGHT_FOREST = 20.0


def tree_dimensions(
    df: DataFrame, tags_col: str = "tags",
    default_height: float = DEFAULT_TREE_HEIGHT,
) -> DataFrame:
    """Append tree_height / crown_diameter / trunk_diameter columns."""
    tags = F.col(tags_col)
    trunk = F.coalesce(
        V.parse_measure(tags["diameter"], unitless_factor=1e-3),
        V.parse_measure(tags["circumference"]) / F.lit(math.pi),
    )
    crown0 = V.parse_measure(tags["diameter_crown"])
    height = F.coalesce(
        V.parse_measure(tags["height"]),
        V.parse_measure(tags["est_height"]),
        crown0 * F.lit(DEFAULT_HEIGHT_TO_WIDTH),
        trunk * F.lit(DEFAULT_CROWN_TO_TRUNK) * F.lit(DEFAULT_HEIGHT_TO_WIDTH),
        F.lit(float(default_height)),
    )
    s1 = df.select(
        "*",
        trunk.alias("trunk_diameter"),
        crown0.alias("_crown0"),
        height.alias("tree_height"),
    )
    return s1.select(
        *df.columns,
        "trunk_diameter",
        F.coalesce(
            F.col("_crown0"),
            F.col("tree_height") / F.lit(DEFAULT_HEIGHT_TO_WIDTH),
        ).alias("crown_diameter"),
        "tree_height",
    )
