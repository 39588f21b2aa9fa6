"""operators/buildings.py vs an independent scalar transcription of
LevelAndHeightData.java:108-222 + BuildingDefaults.java:30-124 —
the Simple-3D-Buildings attribute derivation, corpus-swept."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from osm2world_spark.operators.buildings import (
    DEFAULTS_BASE,
    DEFAULTS_BY_TYPE,
    RIDGE_SHAPES,
    level_and_height,
)

# ---------------------------------------------------------------- oracle
# plain-Python re-derivation (dict in, dict out); written against the
# Java directly, NOT against the Column code.


def _parse_int(v):
    if v is None:
        return None
    try:
        i = int(v)
    except ValueError:
        return None
    if not (-(2**31) <= i < 2**31) or (v.strip() != v):
        return None
    return i


def _parse_uint(v):
    i = _parse_int(v)
    return i if i is not None and i >= 0 else None


def _osm_decimal(v, nonneg=False):
    if v is None:
        return None
    i = _parse_int(v)
    out = None
    if i is not None:
        out = float(i)
    else:
        import re

        m = re.fullmatch(r"(-?\d+)\.(\d+)", v)
        if m and _parse_int(m.group(1)) is not None and _parse_int(m.group(2)) is not None:
            before, after = m.group(1), m.group(2)
            out = abs(int(before)) + int(after) * 10.0 ** -len(after)
            if before.startswith("-"):
                out = -out
    if out is not None and nonneg and out < 0:
        return None
    return out


_M_PER_INCH = 0.02539999969303608


def _parse_measure(v):
    if v is None:
        return None
    d = _osm_decimal(v)
    if d is not None and d > 0:
        return d
    import re

    m = re.fullmatch(r"([\d\.]+)\s*m", v)
    if m:
        g = _osm_decimal(m.group(1))
        if g is not None and g > 0:
            return g
    m = re.fullmatch(r"([\d\.]+)\s*km", v)
    if m:
        g = _osm_decimal(m.group(1))
        if g is not None and g > 0:
            return 1000.0 * g
    m = re.fullmatch(r"(\d+)'\s*(\d+)\"", v)
    if m and int(m.group(2)) < 12:
        return _M_PER_INCH * (12 * int(m.group(1)) + int(m.group(2)))
    return None


def _parse_height(tags):
    for k in ("height", "building:height", "est_height"):
        got = _parse_measure(tags.get(k))
        if got is not None:
            return got
    return None


def _defaults(tags):
    t = tags.get("building:part")
    if t is None or t == "yes":
        t = tags.get("building")
    if t is None:
        return None
    levels, hpl, shape, windows, walls = DEFAULTS_BY_TYPE.get(t, DEFAULTS_BASE)
    if tags.get("parking") == "multi-storey":
        levels, windows = 5, False
    if tags.get("man_made") == "chimney" or t == "chimney":
        shape, levels, hpl, windows = "chimney", 1, 10.0, False
    return t, levels, hpl, shape, walls


_COMPASS = {
    "N": 0.0, "NNE": 22.5, "NE": 45.0, "ENE": 67.5, "E": 90.0,
    "ESE": 112.5, "SE": 135.0, "SSE": 157.5, "S": 180.0, "SSW": 202.5,
    "SW": 225.0, "WSW": 247.5, "W": 270.0, "WNW": 292.5, "NW": 315.0,
    "NNW": 337.5,
}


def _parse_angle(v):
    """ValueParseUtil.parseAngle — nonneg decimal mod 360, else compass."""
    d = _osm_decimal(v, nonneg=True)
    if d is not None:
        return math.fmod(d, 360.0)
    if v in _COMPASS:
        return _COMPASS[v]
    return None


_RIDGE_SHAPES = (
    "gabled", "hipped", "side_hipped", "half-hipped", "side_half-hipped",
    "gambrel", "mansard", "saltbox", "round",
)


def oracle(tags, diameter=None, rdist=None):
    d = _defaults(tags)
    if d is None:
        return None
    btype, d_levels, d_hpl, d_shape, d_walls = d
    roof_shape = tags.get("roof:shape")
    if roof_shape is None:
        roof_shape = tags.get("building:roof:shape")
    if roof_shape is None:
        roof_shape = d_shape

    b_min = _parse_int(tags.get("building:min_level")) or 0
    ug = _parse_uint(tags.get("building:levels:underground")) or 0
    mlwu = b_min if b_min > 0 else min(b_min, -ug)

    parsed = _osm_decimal(tags.get("building:levels"), nonneg=True)
    th = _parse_height(tags)
    trh = _parse_measure(tags.get("roof:height"))
    thwr = (th or 0.0) - (trh or 0.0)
    if parsed is not None:
        levels = max(0, math.ceil(parsed))
    elif th is not None and trh is not None and th <= trh:
        levels = 0
    elif trh is not None and thwr > 0:
        levels = max(mlwu + 1, max(1, int(thwr / d_hpl)))
    elif mlwu > 0:
        levels = mlwu + 1
    else:
        levels = d_levels

    roof_levels = _parse_uint(tags.get("roof:levels"))
    roof_levels = 1 if roof_levels is None else roof_levels

    # Roof.createRoofForShape's default branch is FlatRoof (Roof.java:
    # 134): any shape without its own class — unknown values included —
    # is flat; chimney's own class also pins 0.0
    non_flat = (
        "pyramidal", "onion", "skillion", "saltbox", "gabled", "hipped",
        "side_hipped", "half-hipped", "side_half-hipped", "gambrel",
        "mansard", "sawtooth", "dome", "round", "cone", "complex",
    )
    if roof_shape not in non_flat:
        rh = 0.0
    else:
        rh = trh
        if rh is None and rdist is not None:
            av = tags.get("roof:angle")
            if roof_shape in _RIDGE_SHAPES:
                a = _osm_decimal(av)  # parseRoofAngle: plain decimal
                if a is not None and 0 <= a < 90:
                    rh = math.tan(math.radians(a)) * rdist
            elif roof_shape == "skillion":
                a = _parse_angle(av)
                if a is not None and 0 <= a < 90:
                    rh = math.tan(math.radians(a)) * rdist
    if rh is None and levels == 0 and (th or 0.0) > 0:
        rh = th
    if rh is None and "roof:levels" in tags:
        ri = _parse_int(tags.get("roof:levels"))
        if ri is not None:
            rh = d_hpl * ri
    if rh is None:
        if roof_shape == "dome" and diameter is not None:
            rh = diameter / 2.0
        elif levels == 1:
            rh = 1.0
        else:
            rh = 5.0
    if rh == 0:
        roof_levels = 0

    if levels + roof_levels < mlwu + 1:
        mlwu = levels + roof_levels - 1

    height = _parse_height(tags)
    if height is None:
        height = levels * d_hpl + rh
    height = max(height, 0.01)
    hwr = math.floor((height - rh) * 1e4 + 0.5) / 1e4

    tmh = _parse_measure(tags.get("min_height"))
    if tmh is not None:
        min_h = tmh
    elif b_min > 0:
        min_h = (hwr / levels) * b_min if levels else (
            math.inf if hwr > 0 else (-math.inf if hwr < 0 else math.nan)
        )
    elif not d_walls:
        min_h = hwr - 0.3
    else:
        min_h = 0.0
    if min_h > hwr:  # NaN fails this, as in Java
        min_h = hwr - 0.1

    return dict(
        btype=btype,
        roof_shape=roof_shape,
        building_levels=levels,
        roof_levels=roof_levels,
        min_level_wu=mlwu,
        height=height,
        roof_height=rh,
        height_without_roof=hwr,
        min_height=min_h,
    )


# ---------------------------------------------------------------- corpus

TYPES = [
    None, "yes", "house", "greenhouse", "garage", "garages", "carport",
    "hut", "shed", "cabin", "roof", "church", "hangar", "industrial",
    "apartments", "chimney",
]
SHAPES = [None, "flat", "gabled", "hipped", "dome", "skillion", "onion", "pyramidal"]


def _corpus():
    rows = []
    i = 0
    for bt in TYPES:
        for shape in SHAPES:
            i += 1
            tags = {}
            if bt is not None:
                tags["building"] = bt
            if shape is not None:
                tags["roof:shape"] = shape
            k = i % 11
            if k == 1:
                tags["building:levels"] = str(i % 7)
            elif k == 2:
                tags["building:levels"] = f"{i % 5}.5"
            elif k == 3:
                tags["height"] = f"{(i % 40) + 2}"
            elif k == 4:
                tags["height"] = f"{(i % 30) + 4} m"
                tags["roof:height"] = str(i % 6)
            elif k == 5:
                tags["building:height"] = f"{(i % 25) + 3}"
                tags["building:min_level"] = str(i % 4)
            elif k == 6:
                tags["roof:levels"] = str(i % 3)
            elif k == 7:
                tags["building:levels:underground"] = str(i % 3)
                tags["min_height"] = f"{(i % 5)}.5"
            elif k == 8:
                tags["height"] = "bogus"
                tags["est_height"] = f"{(i % 12) + 1}"
            elif k == 9:
                tags["parking"] = "multi-storey"
            elif k == 10:
                tags["man_made"] = "chimney"
                tags["height"] = f"{(i % 60) + 20}"
            diameter = float(10 + i % 9) if shape == "dome" else None
            rows.append((i, tags, diameter))
    # targeted corners
    rows.append((9001, {"building": "yes", "building:levels": "0",
                        "building:min_level": "2", "roof:levels": "1"}, None))
    rows.append((9002, {"building": "house", "height": "4", "roof:height": "6"}, None))
    rows.append((9003, {"building": "roof"}, None))  # hasWalls=False path
    rows.append((9004, {"building:part": "garage", "building": "house"}, None))
    rows.append((9005, {"building:part": "yes", "building": "hut"}, None))
    rows.append((9006, {"building": "house", "roof:shape": "gabled",
                        "roof:height": "0"}, None))
    return rows


def test_level_and_height_corpus(spark):
    rows = _corpus()
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("diameter", DoubleType()),
    ])
    df = spark.createDataFrame(
        [(str(r), t, d) for r, t, d in rows], schema
    )
    got = {
        r["rid"]: r.asDict()
        for r in level_and_height(df, diameter_col="diameter").collect()
    }
    n_typed = 0
    for rid, tags, diameter in rows:
        g = got[str(rid)]
        exp = oracle(tags, diameter)
        if exp is None:
            assert g["btype"] is None, (rid, g)
            assert g["height"] is None
            continue
        n_typed += 1
        for k, want in exp.items():
            have = g[k]
            if isinstance(want, float):
                if math.isnan(want):
                    assert math.isnan(have), (rid, k, have, tags)
                else:
                    assert have == pytest.approx(want, abs=0, rel=0), (
                        rid, k, have, want, tags,
                    )
            else:
                assert have == want, (rid, k, have, want, tags)
    assert n_typed > 100


def test_part_inherits_building_tags(spark):
    """LevelAndHeightData.java:111-117 — a part without level-defining
    keys inherits them from the building; with any of them, it doesn't."""
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("btags", MapType(StringType(), StringType())),
    ])
    df = spark.createDataFrame(
        [
            ("inherit", {"building:part": "yes"},
             {"building": "house", "building:levels": "7"}),
            ("own", {"building:part": "yes", "building:levels": "2"},
             {"building": "house", "building:levels": "7"}),
            ("height_blocks", {"building:part": "yes", "height": "9"},
             {"building": "house", "building:levels": "7"}),
        ],
        schema,
    )
    out = {
        r["rid"]: r
        for r in level_and_height(df, building_tags_col="btags").collect()
    }
    assert out["inherit"]["building_levels"] == 7
    assert out["own"]["building_levels"] == 2
    # height=9 on the part blocks inheritance; levels derive from the
    # default chain (no building:levels on part view): height 9 given,
    # no roof:height -> default levels=3 for house
    assert out["height_blocks"]["building_levels"] == 3
    assert out["height_blocks"]["height"] == 9.0


def test_ridge_angle_path(spark):
    """RoofWithRidge.java:229-234 / SkillionRoof.java:95-99 — geometry
    column feeds the tan(angle)·distance fallback."""
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("rdist", DoubleType()),
    ])
    df = spark.createDataFrame(
        [
            ("ridge", {"building": "house", "roof:shape": "gabled",
                       "roof:angle": "45"}, 4.0),
            ("skillion_ok", {"building": "house", "roof:shape": "skillion",
                             "roof:angle": "30"}, 6.0),
            ("skillion_steep", {"building": "house", "roof:shape": "skillion",
                                "roof:angle": "90"}, 6.0),
            # parseRoofAngle gates to [0,90) (Roof.java:184): 100 -> null
            ("ridge_steep", {"building": "house", "roof:shape": "gabled",
                             "roof:angle": "100"}, 4.0),
            # ridge uses plain parseOsmDecimal: compass "NE" is null;
            # skillion uses parseAngle: "NE" is 45 degrees
            ("ridge_compass", {"building": "house", "roof:shape": "gabled",
                               "roof:angle": "NE"}, 4.0),
            ("skillion_compass", {"building": "house",
                                  "roof:shape": "skillion",
                                  "roof:angle": "NE"}, 6.0),
        ],
        schema,
    )
    out = {
        r["rid"]: r
        for r in level_and_height(df, ridge_distance_col="rdist").collect()
    }
    assert out["ridge"]["roof_height"] == pytest.approx(4.0)
    assert out["skillion_ok"]["roof_height"] == pytest.approx(
        math.tan(math.radians(30)) * 6.0
    )
    # angle >= 90 rejected for BOTH families -> default ridge height 5.0
    assert out["skillion_steep"]["roof_height"] == 5.0
    assert out["ridge_steep"]["roof_height"] == 5.0
    assert out["ridge_compass"]["roof_height"] == 5.0
    assert out["skillion_compass"]["roof_height"] == pytest.approx(
        math.tan(math.radians(45)) * 6.0
    )
    for s in RIDGE_SHAPES:
        assert s not in ("flat", "chimney")


def test_part_roof_uses_merged_tags(spark):
    """BuildingPart.java:86-100 — the Roof is built from the ALWAYS
    merged part+building tags, even when the part's own level-defining
    keys block inheritance for the level math (:113-117)."""
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("btags", MapType(StringType(), StringType())),
    ])
    df = spark.createDataFrame(
        [
            ("part", {"building:part": "yes", "building:levels": "2"},
             {"building": "house", "roof:shape": "gabled",
              "roof:height": "4"}),
        ],
        schema,
    )
    row = level_and_height(df, building_tags_col="btags").collect()[0]
    # level math sticks to the part (levels=2), the roof inherits
    assert row["building_levels"] == 2
    assert row["roof_shape"] == "gabled"
    assert row["roof_height"] == 4.0
