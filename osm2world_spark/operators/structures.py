"""Small structural predicates and attributes shared across world
modules, as one pure Column projection:

- is_bridge — BridgeModule.java:53-56: bridge key present and not
  "no".  (BRIDGE_UNDERSIDE_HEIGHT = (double)0.2f is renderer geometry.)
- is_tunnel — TunnelModule.java:45-49: tunnel key present and neither
  "no" nor "building_passage".
- cliff_height — CliffModule.java:37,85: for natural=cliff segments,
  parseHeight(tags, 5); NULL otherwise.
- bicycle_stands — BicycleParkingModule.java:103-110: for
  amenity=bicycle_parking, (capacity+1)/2 stands when the parseUInt'd
  capacity is positive, else NULL ("unknown" in the reference).

These are the predicates the other modules branch on (roads skip
terrain under bridges, tunnels flip ground state), so they belong in
the relational layer even though each is a one-liner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V


def structure_flags(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    tags = F.col(tags_col)
    bridge = tags["bridge"]
    tunnel = tags["tunnel"]
    capacity = V.parse_uint(tags["capacity"])
    return df.select(
        "*",
        (bridge.isNotNull() & (bridge != "no")).alias("is_bridge"),
        (
            tunnel.isNotNull()
            & (tunnel != "no")
            & (tunnel != "building_passage")
        ).alias("is_tunnel"),
        F.when(
            tags["natural"] == "cliff",
            F.coalesce(
                V.parse_measure(tags["height"]),
                V.parse_measure(tags["building:height"]),
                V.parse_measure(tags["est_height"]),
                F.lit(5.0),
            ),
        ).alias("cliff_height"),
        F.when(
            (tags["amenity"] == "bicycle_parking") & (capacity > 0),
            ((capacity + 1) / 2).cast("int"),
        ).alias("bicycle_stands"),
    )
