"""RailwayModule track-geometry semantics (RailwayModule.java) as a
pure Column projection — gauge parsing and the derived rail / sleeper /
ballast widths, with the reference's float32 quirks preserved.

Citations (RailwayModule.java):

- accepted railway values :51-53 — rail, light_rail, tram, subway,
  disused; anything else surfaces NULLs (the module skips the segment).
- gaugeMeters :150 — ``parseInt(tags, 1435, "gauge") / 1000.0f``: the
  division runs in FLOAT32 (int / float literal) before widening, so
  the default gauge is float32(1.435) = 1.434999942779541, NOT 1.435.
  parseInt is WorldModuleParseUtil.java:127-139 (parseOsmDecimal
  NONNEGATIVE, (int) truncation, default on miss/unparseable).
- railDist :151 — gauge + 2*(0.5f*RAIL_HEAD_WIDTH); the float
  subexpression is exactly float32(0.067) = 0.06700000166893005.
- sleeperWidth :153 — gauge + 2*RAIL_HEAD_WIDTH + 2*SLEEPER_EXTRA_WIDTH
  with 2*float32(0.067) = 0.1340000033378601 and SLEEPER_EXTRA_WIDTH
  already a double 0.5 (:61), evaluated left to right.
- groundWidth :154 — sleeperWidth + 2*GROUND_EXTRA_WIDTH,
  GROUND_EXTRA_WIDTH = (double)0.2f = 0.20000000298023224 (:58).
- ownGround :161 — trams render no own ballast (part of a street).
- ground state :166-179 — BELOW for subway (unless tunnel=no) or
  tunnel=yes; otherwise the network superclass fallback
  (AbstractNetworkWaySegmentWorldObject.java:311-319): bridge (any
  value but "no") -> ABOVE, any other tunnel variant except
  building_passage -> BELOW, else ON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

RAILWAY_VALUES = ("rail", "light_rail", "tram", "subway", "disused")

DEFAULT_GAUGE_MM = 1435
#: float32(0.067) widened — RAIL_HEAD_WIDTH is a float field (:68)
RAIL_HEAD_WIDTH = 0.06700000166893005
#: double fields initialised from float literals (:58,:61)
GROUND_EXTRA_WIDTH = 0.20000000298023224
SLEEPER_EXTRA_WIDTH = 0.5


def rail_geometry(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Append gauge_m / rail_dist / sleeper_width / ground_width /
    own_ground / ground_state columns for railway way segments."""
    tags = F.col(tags_col)
    rw = tags["railway"]
    accepted = rw.isin(*RAILWAY_VALUES)

    gauge_mm = F.coalesce(
        V.osm_decimal(tags["gauge"], "nonnegative").cast("int"),
        F.lit(DEFAULT_GAUGE_MM),
    )
    # int / 1000.0f in float32, then widened (:150)
    gauge_m = (
        gauge_mm.cast("float") / F.lit(1000.0).cast("float")
    ).cast("float").cast("double")

    rail_dist = gauge_m + F.lit(2 * (0.5 * RAIL_HEAD_WIDTH))
    sleeper_width = (gauge_m + F.lit(0.1340000033378601)) + F.lit(
        2 * SLEEPER_EXTRA_WIDTH
    )
    ground_width = sleeper_width + F.lit(2 * GROUND_EXTRA_WIDTH)

    own_ground = rw != "tram"
    tunnel = F.coalesce(tags["tunnel"], F.lit(""))
    bridge = F.coalesce(tags["bridge"], F.lit(""))
    # Rail.getGroundState (:166-179) falls through to the network
    # superclass (AbstractNetworkWaySegmentWorldObject.java:311-319):
    # bridge -> ABOVE, any other tunnel variant -> BELOW, else ON
    ground_state = (
        F.when(
            ((rw == "subway") & (tunnel != "no")) | (tunnel == "yes"),
            F.lit("BELOW"),
        )
        .when(tags["bridge"].isNotNull() & (bridge != "no"), F.lit("ABOVE"))
        .when(
            tags["tunnel"].isNotNull()
            & (tunnel != "no")
            & (tunnel != "building_passage"),
            F.lit("BELOW"),
        )
        .otherwise(F.lit("ON"))
    )

    def _g(c):
        return F.when(accepted, c)

    return df.select(
        "*",
        _g(gauge_m).alias("gauge_m"),
        _g(rail_dist).alias("rail_dist"),
        _g(sleeper_width).alias("sleeper_width"),
        _g(ground_width).alias("ground_width"),
        _g(own_ground).alias("own_ground"),
        _g(ground_state).alias("ground_state"),
    )
