"""Tag predicates: set-membership filters over the dynamic tag map.

Reference: HardcodedRuleset (/root/reference/core/src/main/java/org/
osm2world/osm/ruleset/HardcodedRuleset.java):
- isAreaTag (:89-91): key in areaKeys OR (key,value) in areaTags; a closed
  way becomes an area when it carries any area tag and not area=no
  (OSMToMapDataConverter closed-way handling)
- isLandTag / isSeaTag (:94-102): exact (key,value) membership
- isRelevantRelation (:112-132): type=multipolygon needs one of a fixed
  main-tag set; other relations pass a type whitelist (:76-84)

Spark shape: tags live in a `map<string,string>` column; every predicate
is a pure Column expression over literal arrays (Catalyst constant-folds
the set literals and the whole filter stays in whole-stage codegen — these
sets are tiny, so broadcast joins would be overkill).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (key, value) area tags (HardcodedRuleset.java:25-47, minus the
# SurfaceAreaModule.defaultSurfaceMap import which adds surface=* values)
AREA_TAGS: frozenset[tuple[str, str]] = frozenset(
    {
        ("area", "yes"),
        ("aeroway", "apron"),
        ("aeroway", "helipad"),
        ("amenity", "bicycle_parking"),
        ("amenity", "fountain"),
        ("amenity", "parking"),
        ("amenity", "parking_space"),
        ("indoor", "area"),
        ("indoor", "corridor"),
        ("indoor", "room"),
        ("leisure", "pitch"),
        ("leisure", "swimming_pool"),
        ("natural", "beach"),
        ("natural", "sand"),
        ("natural", "water"),
        ("natural", "wood"),
        ("natural", "scrub"),
        ("natural", "shrubbery"),
        ("power", "generator"),
        ("tourism", "artwork"),
        ("waterway", "riverbank"),
    }
)

# keys that always make an area (HardcodedRuleset.java:49-56)
AREA_KEYS: frozenset[str] = frozenset(
    {"area:highway", "bridge:support", "building", "building:part", "golf",
     "landuse", "landcover", "leisure"}
)

LAND_TAGS: frozenset[tuple[str, str]] = frozenset(
    {("landuse", "forest"), ("natural", "water"), ("natural", "wood"),
     ("waterway", "river"), ("waterway", "stream")}
)

SEA_TAGS: frozenset[tuple[str, str]] = frozenset(
    {("maritime", "yes"), ("route", "ferry"), ("seamark", "buoy"),
     ("seamark:type", "buoy_cardinal"), ("seamark:type", "buoy_isolated_danger"),
     ("seamark:type", "buoy_lateral"), ("seamark:type", "buoy_safe_water"),
     ("seamark:type", "buoy_special_purpose"), ("seamark:type", "cable_submarine"),
     ("submarine", "yes"), ("wetland", "tidalflat")}
)

RELATION_TYPE_WHITELIST: frozenset[str] = frozenset(
    {"multipolygon", "destination_sign", "building", "enforcement",
     "bridge", "connectivity", "tunnel"}
)

# multipolygon relevance main tags (HardcodedRuleset.java:113-129)
_MP_ANY_KEY = ("building", "building:part", "landcover", "highway", "barrier", "golf")
_MP_KEY_VALUES = {
    "man_made": ("bridge", "tunnel"),
    "natural": ("shrubbery", "wood", "mud", "water"),
    "landuse": ("forest", "orchard"),
    "aeroway": ("apron", "helipad"),
    "amenity": ("parking", "parking_space", "bicycle_parking", "fountain"),
    "leisure": ("swimming_pool", "pitch"),
    "power": ("generator",),
}


def _has_any_kv(tags: Column, pairs) -> Column:
    out = F.lit(False)
    for k, v in sorted(pairs):
        # coalesce: tags[k] is NULL for absent keys, and NULL would poison
        # the OR chain under SQL three-valued logic
        out = out | F.coalesce(tags[k] == v, F.lit(False))
    return out


def is_area_tagged(tags: Column) -> Column:
    """Any area tag present (isAreaTag over the whole TagSet) and not
    explicitly area=no — the closed-way-becomes-area rule."""
    any_key = F.lit(False)
    for k in sorted(AREA_KEYS):
        any_key = any_key | tags[k].isNotNull()
    return (any_key | _has_any_kv(tags, AREA_TAGS)) & (
        F.coalesce(tags["area"] != "no", F.lit(True))
    )


def is_land_tagged(tags: Column) -> Column:
    return _has_any_kv(tags, LAND_TAGS)


def is_sea_tagged(tags: Column) -> Column:
    return _has_any_kv(tags, SEA_TAGS)


def is_relevant_relation(tags: Column) -> Column:
    """isRelevantRelation (:112-132): perf-motivated relation filter."""
    mp_main = F.lit(False)
    for k in _MP_ANY_KEY:
        mp_main = mp_main | tags[k].isNotNull()
    for k, vs in sorted(_MP_KEY_VALUES.items()):
        mp_main = mp_main | F.coalesce(tags[k].isin(*vs), F.lit(False))
    return F.when(tags["type"] == "multipolygon", mp_main).otherwise(
        F.coalesce(tags["type"].isin(*sorted(RELATION_TYPE_WHITELIST)), F.lit(False))
    )
