"""Seeded random-corpus parity sweeps: the buildings and roads Column
pipelines vs the independent scalar oracles in test_buildings.py /
test_roads.py, over randomly composed tag maps (including garbage
values) — the same discipline as test_values.py's parser sweep.

Excluded from the random pools (documented subset/divergence
boundaries, SURVEY §2.10): dome-without-diameter (diameter column
always supplied here).  roof:angle IS in the pool — the sweep supplies
a ridge-distance column so both angle families (plain-decimal ridge
gate vs compass-capable skillion gate) are exercised.
"""

import math
import random

from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from tests.test_buildings import oracle as building_oracle
from tests.test_roads import oracle as road_oracle

N_ROWS = 700


def _rng():
    return random.Random(0xB17D)


_B_TYPES = [
    None, "yes", "house", "greenhouse", "garage", "garages", "carport",
    "hut", "shed", "cabin", "roof", "church", "hangar", "industrial",
    "apartments", "chimney", "retail", "",
]
_B_SHAPES = [None, "flat", "gabled", "hipped", "dome", "skillion", "onion",
             "pyramidal", "weird", ""]
_NUMISH = ["0", "1", "2", "3", "7", "25", "2.5", "3.5", "-1", "-2.5",
           "junk", "", "4 m", "12 m", "0.5 km", "6'3\"", "1.2.3", " 5", "5 "]


def _random_building_tags(r):
    tags = {}
    bt = r.choice(_B_TYPES)
    if bt is not None:
        tags["building"] = bt
    if r.random() < 0.3:
        p = r.choice([None, "yes", "garage", "roof", ""])
        if p is not None:
            tags["building:part"] = p
    sh = r.choice(_B_SHAPES)
    if sh is not None:
        tags["roof:shape"] = sh
    for key, p in [
        ("building:levels", 0.4), ("roof:levels", 0.25), ("height", 0.35),
        ("building:height", 0.15), ("est_height", 0.15), ("roof:height", 0.25),
        ("building:min_level", 0.15), ("building:levels:underground", 0.15),
        ("min_height", 0.15), ("building:roof:shape", 0.1),
    ]:
        if r.random() < p:
            tags[key] = r.choice(_NUMISH)
    if r.random() < 0.1:
        tags["parking"] = r.choice(["multi-storey", "surface"])
    if r.random() < 0.1:
        tags["man_made"] = r.choice(["chimney", "tower"])
    if r.random() < 0.25:
        tags["roof:angle"] = r.choice(
            ["30", "45", "89", "90", "100", "400", "-10", "22.5", "NE",
             "junk", "0"]
        )
    return tags


def test_buildings_random_parity(spark):
    r = _rng()
    rows = [(str(i), _random_building_tags(r), float(5 + i % 20),
             float(2 + i % 11)) for i in range(N_ROWS)]
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("diameter", DoubleType()),
        StructField("rdist", DoubleType()),
    ])
    from osm2world_spark.operators.buildings import level_and_height

    df = spark.createDataFrame(rows, schema)
    got = {
        g["rid"]: g.asDict()
        for g in level_and_height(
            df, diameter_col="diameter", ridge_distance_col="rdist"
        ).collect()
    }
    n_typed = 0
    for rid, tags, diameter, rdist in rows:
        exp = building_oracle(tags, diameter, rdist)
        g = got[rid]
        if exp is None:
            assert g["btype"] is None and g["height"] is None, (rid, tags, g)
            continue
        n_typed += 1
        for k, want in exp.items():
            have = g[k]
            if isinstance(want, float):
                if math.isnan(want):
                    assert have is not None and math.isnan(have), (rid, k, tags, g)
                elif math.isinf(want):
                    assert have == want, (rid, k, tags, g)
                else:
                    # 1-ulp slack ONLY for the tan() angle path (JVM
                    # vs libm last-digit); everything else stays exact
                    assert have == want or (
                        "roof:angle" in tags
                        and abs(have - want) <= 1e-12 * max(1.0, abs(want))
                    ), (rid, k, have, want, tags)
            else:
                assert have == want, (rid, k, have, want, tags)
    assert n_typed > N_ROWS // 2


_HWS = [None, "motorway", "motorway_link", "trunk", "primary", "secondary",
        "residential", "service", "track", "path", "footway", "cycleway",
        "steps", "pedestrian", "living_street", "unclassified", "funny"]


def _random_road_tags(r):
    tags = {}
    hw = r.choice(_HWS)
    if hw is not None:
        tags["highway"] = hw
    for key, vals, p in [
        ("lanes", ["1", "2", "3", "4", "2.5", "0", "-1", "junk"], 0.35),
        ("lanes:forward", ["1", "2", "3", "0", "junk"], 0.2),
        ("lanes:backward", ["1", "2", "0", "junk"], 0.2),
        ("width", _NUMISH, 0.2),
        ("est_width", _NUMISH, 0.1),
        ("oneway", ["yes", "no", "-1"], 0.25),
        ("sidewalk", ["left", "right", "both", "no", "separate"], 0.3),
        ("cycleway", ["lane", "track", "no"], 0.2),
        ("cycleway:left", ["lane", "track"], 0.1),
        ("cycleway:right", ["lane", "track"], 0.1),
        ("bus_bay", ["left", "right", "both"], 0.1),
        ("divider", ["dashed_line", "solid_line", "no", "other"], 0.15),
        ("lane_markings", ["yes", "no", "maybe"], 0.15),
        ("surface", ["asphalt", "gravel", "sand", "paved", "earth"], 0.25),
        ("service", ["parking_aisle", "driveway"], 0.1),
        ("overtaking", ["no", "forward", "backward", "yes"], 0.1),
        ("overtaking:forward", ["yes", "no"], 0.05),
        ("overtaking:backward", ["yes", "no"], 0.05),
        ("sidewalk:left:width", ["1.5", "2", "junk"], 0.1),
        ("sidewalk:both:kerb", ["no", "lowered", "flush"], 0.1),
        ("sidewalk:left:kerb", ["no", "raised"], 0.05),
        ("sidewalk:right:kerb", ["no", "raised"], 0.05),
        ("cycleway:both:width", ["1", "2.5"], 0.05),
        ("bus_bay:both:width", ["3", "3.5"], 0.05),
    ]:
        if r.random() < p:
            tags[key] = r.choice(vals)
    # per-lane tags with random (sometimes inconsistent) pipe counts
    if r.random() < 0.3:
        n = r.randint(1, 4)
        tags["width:lanes:forward"] = "|".join(
            r.choice(["3", "3.5", "2.75", "x", ""]) for _ in range(n))
        if r.random() < 0.4:
            m = r.randint(1, 4)
            tags["turn:lanes:forward"] = "|".join(
                r.choice(["left", "through", "right"]) for _ in range(m))
        if r.random() < 0.3:
            tags["cycleway:lanes:forward"] = "|".join(
                r.choice(["yes", "no"]) for _ in range(r.randint(1, 4)))
    if r.random() < 0.15:
        tags["width:lanes:backward"] = "|".join(
            r.choice(["3", "4", "y"]) for _ in range(r.randint(1, 3)))
    return tags


def test_roads_random_parity(spark):
    r = _rng()
    rows = [(str(i), _random_road_tags(r)) for i in range(N_ROWS)]
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
    ])
    from osm2world_spark.operators.roads import road_lanes_and_width

    df = spark.createDataFrame(rows, schema)
    got = {g["rid"]: g.asDict() for g in road_lanes_and_width(df).collect()}
    for rid, tags in rows:
        exp = road_oracle(tags)
        g = got[rid]
        for k, want in exp.items():
            have = g[k]
            if isinstance(want, float):
                if math.isnan(want):
                    assert have is not None and math.isnan(have), (rid, k, tags)
                else:
                    assert have == want, (rid, k, have, want, tags)
            else:
                assert have == want, (rid, k, have, want, tags)
