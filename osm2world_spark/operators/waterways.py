"""WaterModule waterway-width semantics (WaterModule.java:44-52,
124-125) as a pure Column projection: the per-type default width table
and the parseWidth override.

WATERWAY_WIDTHS (:48-52): river 3.0, stream 0.5, canal 2.0, ditch 1.0,
drain 1.0; width = WorldModuleParseUtil.parseWidth(tags, default)
(:124-125 — width tag, else est_width, else the table default).
Waterway values outside the table surface NULLs (the module only
builds representations for table keys, :59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

WATERWAY_WIDTHS = {
    "river": 3.0,
    "stream": 0.5,
    "canal": 2.0,
    "ditch": 1.0,
    "drain": 1.0,
}


def waterway_width(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Append waterway / waterway_width columns."""
    tags = F.col(tags_col)
    wv = tags["waterway"]
    dflt = None
    for k, w in WATERWAY_WIDTHS.items():
        dflt = (F.when(wv == k, F.lit(w)) if dflt is None
                else dflt.when(wv == k, F.lit(w)))
    parsed = F.coalesce(
        V.parse_measure(tags["width"]), V.parse_measure(tags["est_width"])
    )
    return df.select(
        "*",
        F.when(dflt.isNotNull(), wv).alias("waterway_kind"),
        # the reference only evaluates parseWidth for table keys (:59)
        F.when(dflt.isNotNull(), F.coalesce(parsed, dflt)).alias("waterway_width"),
    )
