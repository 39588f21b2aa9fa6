"""StreetFurnitureModule node-furniture dispatch + dimension semantics
(StreetFurnitureModule.java) as one projection + one explode — "how
many benches / street lamps / bus stops per tile, and how big".

The reference's applyToNode (:76-154) is MULTI-match: every ``if`` is
independent, so one node can carry several representations — the
output here is one row per matched kind (posexplode over the matched
set; nodes matching nothing disappear).

Kinds, their predicates, and tag-derived dimensions (all citations
StreetFurnitureModule.java; float literals pinned as exact doubles):

  swing            playground=swing            h=parseHeight(1.5), w=parseWidth(0.5·parseInt(capacity,4))  (:814-818)
  pole             man_made=pole               h=parseMeasure(height,5.0), w=parseMeasure(width,0.2)       (:228-229 — single keys, no est_*)
  flagpole         man_made=flagpole           h=parseHeight(10.0)                                          (:263)
  advertising_column advertising=column        h=parseHeight(3.0)                                           (:653)
  billboard        advertising=billboard       h=parseHeight(3.5f), w=parseWidth(4.0)                       (:685-686)
  bench            amenity=bench               w=parseWidth(0.5·parseInt(seats,4))                          (:925-929)
  table            amenity=table | leisure=picnic_table
                                               h=parseHeight(0.75f), w=parseWidth(h·1.2f)                   (:1006-1007)
  bus_stop         highway=bus_stop | (public_transport=platform & bus=yes)
                                               h=parseHeight(3.0)                                           (:99-105,:1719; the isInHighway suppression is a graph check — documented subset)
  cross            man_made=cross | summit:cross=yes | historic=wayside_cross
                                               summit = summit:cross KEY present | natural=peak;
                                               h=parseHeight(summit?4:2), w=parseHEIGHT(h·2/3) — the
                                               reference's own width-from-height-tag quirk, kept (:1118-1126)
  clock            amenity=clock & support=wall h=parseHeight(10.0), w=parseWidth(1.0)                      (:1175,:1210)
  waste_basket     amenity=waste_basket        fixed model, no tag dims                                     (:1369)
  grit_bin         amenity=grit_bin            h=parseHeight(0.5), w=parseWidth(1.0)                        (:1458-1459)
  post_box         amenity=post_box & operator/brand KNOWN: Deutsche Post (AG) -> wall
                   h=parseHeight(0.8f), w=parseWidth(0.3f); Royal Mail -> pillar
                   h=parseHeight(2.0), w=parseWidth(0.5); unknown operators emit NOTHING (:1658-1692)
  phone            amenity=telephone & operator/brand in the Telekom/British Telecom sets;
                   the wall-vs-cell split is a geometry check (isInWall) — the free-standing
                   CELL dims are emitted: h=parseHeight(2.1f), w=parseWidth(0.8f) (:1517-1548)
  parcel_locker    amenity=parcel_locker | (vending_machine & vending in parcel sets)
                                               brand-variant model, kind only (:129-134)
  vending_machine  amenity=vending_machine & vending in (bicycle_tube,cigarettes,condoms)
                                               h=parseHeight(1.8f)                                          (:135-137,:1615)
  recycling        amenity=recycling & recycling_type=container  fixed model, kind only (:139-142)
  fire_hydrant     emergency=fire_hydrant & fire_hydrant:type=pillar  h=parseHeight(1.0) (:143-146,:1835)
  street_lamp      highway=street_lamp         h=parseHeight(5.0)                                           (:147-149,:1871)
  board            tourism=information & information=board  kind only (:150-153)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

# float literals promoted to double
F35 = 3.5
F075 = 0.75
F12 = 1.2000000476837158     # (double) 1.2f
F08 = 0.800000011920929      # (double) 0.8f
F03 = 0.30000001192092896    # (double) 0.3f
F21 = 2.0999999046325684     # (double) 2.1f
F18 = 1.7999999523162842     # (double) 1.8f

_TELEKOM = ("Deutsche Telekom AG", "Deutsche Telekom", "Telekom")
_BT = ("British Telecom",)
_DPOST = ("Deutsche Post AG", "Deutsche Post")


def furniture_attributes(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """One row per matched furniture kind: input columns + kind /
    furniture_height / furniture_width."""
    tags = F.col(tags_col)
    C = F.col

    def _brand_in(vals):
        return tags["operator"].isin(*vals) | tags["brand"].isin(*vals)

    # stage 1 — shared parsed scalars
    s1 = df.select(
        "*",
        F.coalesce(
            V.parse_measure(tags["height"]),
            V.parse_measure(tags["building:height"]),
            V.parse_measure(tags["est_height"]),
        ).alias("_ph"),
        F.coalesce(
            V.parse_measure(tags["width"]), V.parse_measure(tags["est_width"])
        ).alias("_pw"),
        V.parse_measure(tags["height"]).alias("_pm_h"),
        V.parse_measure(tags["width"]).alias("_pm_w"),
        F.coalesce(
            V.osm_decimal(tags["capacity"], "nonnegative").cast("int"), F.lit(4)
        ).alias("_capacity"),
        F.coalesce(
            V.osm_decimal(tags["seats"], "nonnegative").cast("int"), F.lit(4)
        ).alias("_seats"),
        (
            tags["summit:cross"].isNotNull() | (tags["natural"] == "peak")
        ).alias("_summit"),
    )

    ph = lambda d: F.coalesce(C("_ph"), d if isinstance(d, Column) else F.lit(float(d)))  # noqa: E731
    pw = lambda d: F.coalesce(C("_pw"), d if isinstance(d, Column) else F.lit(float(d)))  # noqa: E731
    nulld = F.lit(None).cast("double")

    def k(name: str, cond: Column, h: Column | None, w: Column | None) -> Column:
        return F.when(
            cond,
            F.array(
                F.struct(
                    F.lit(name).alias("kind"),
                    (h if h is not None else nulld).alias("height"),
                    (w if w is not None else nulld).alias("width"),
                )
            ),
        ).otherwise(F.array().cast(
            "array<struct<kind:string,height:double,width:double>>"
        ))

    cross_h = ph(F.when(C("_summit"), F.lit(4.0)).otherwise(F.lit(2.0)))
    table_h = ph(F075)

    kinds = F.concat(
        k("swing", tags["playground"] == "swing",
          ph(1.5), pw(F.lit(0.5) * C("_capacity").cast("double"))),
        k("pole", tags["man_made"] == "pole",
          F.coalesce(C("_pm_h"), F.lit(5.0)),
          F.coalesce(C("_pm_w"), F.lit(0.2))),
        k("flagpole", tags["man_made"] == "flagpole", ph(10.0), None),
        k("advertising_column", tags["advertising"] == "column", ph(3.0), None),
        k("billboard", tags["advertising"] == "billboard", ph(F35), pw(4.0)),
        k("bench", tags["amenity"] == "bench",
          None, pw(F.lit(0.5) * C("_seats").cast("double"))),
        k("table",
          (tags["amenity"] == "table") | (tags["leisure"] == "picnic_table"),
          table_h, pw(table_h * F.lit(F12))),
        k("bus_stop",
          (tags["highway"] == "bus_stop")
          | ((tags["public_transport"] == "platform") & (tags["bus"] == "yes")),
          ph(3.0), None),
        k("cross",
          (tags["man_made"] == "cross")
          | (tags["summit:cross"] == "yes")
          | (tags["historic"] == "wayside_cross"),
          cross_h, F.coalesce(C("_ph"), cross_h * F.lit(2.0) / F.lit(3.0))),
        k("clock", (tags["amenity"] == "clock") & (tags["support"] == "wall"),
          ph(10.0), pw(1.0)),
        k("waste_basket", tags["amenity"] == "waste_basket", None, None),
        k("grit_bin", tags["amenity"] == "grit_bin", ph(0.5), pw(1.0)),
        k("post_box",
          (tags["amenity"] == "post_box") & _brand_in(_DPOST),
          ph(F08), pw(F03)),
        k("post_box",
          (tags["amenity"] == "post_box") & (tags["operator"] == "Royal Mail"),
          ph(2.0), pw(0.5)),
        k("phone",
          (tags["amenity"] == "telephone")
          & (_brand_in(_TELEKOM) | _brand_in(_BT)),
          ph(F21), pw(F08)),
        k("parcel_locker",
          (tags["amenity"] == "parcel_locker")
          | ((tags["amenity"] == "vending_machine")
             & tags["vending"].isin("parcel_pickup;parcel_mail_in",
                                    "parcel_mail_in")),
          None, None),
        k("vending_machine",
          (tags["amenity"] == "vending_machine")
          & tags["vending"].isin("bicycle_tube", "cigarettes", "condoms"),
          ph(F18), None),
        k("recycling",
          (tags["amenity"] == "recycling")
          & (tags["recycling_type"] == "container"),
          None, None),
        k("fire_hydrant",
          (tags["emergency"] == "fire_hydrant")
          & (tags["fire_hydrant:type"] == "pillar"),
          ph(1.0), None),
        k("street_lamp", tags["highway"] == "street_lamp", ph(5.0), None),
        k("board",
          (tags["tourism"] == "information")
          & (tags["information"] == "board"),
          None, None),
    )
    out = s1.select(*df.columns, F.posexplode(kinds))
    return out.select(
        *df.columns,
        F.col("col.kind").alias("kind"),
        F.col("col.height").alias("furniture_height"),
        F.col("col.width").alias("furniture_width"),
    )
