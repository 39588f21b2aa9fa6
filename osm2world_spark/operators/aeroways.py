"""AerowayModule width semantics (AerowayModule.java:212,:235) as a
pure Column projection: runways default to parseWidth(tags, 20.0),
taxiways to parseWidth(tags, 5.0).  Other aeroway values surface NULLs
(the module's other representations are node/area-shaped renderer
objects with no width attribute)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

AEROWAY_WIDTHS = {"runway": 20.0, "taxiway": 5.0}


def aeroway_width(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    tags = F.col(tags_col)
    av = tags["aeroway"]
    dflt = F.when(av == "runway", F.lit(20.0)).when(av == "taxiway", F.lit(5.0))
    parsed = F.coalesce(
        V.parse_measure(tags["width"]), V.parse_measure(tags["est_width"])
    )
    return df.select(
        "*",
        F.when(dflt.isNotNull(), av).alias("aeroway_kind"),
        F.when(dflt.isNotNull(), F.coalesce(parsed, dflt)).alias("aeroway_width"),
    )
