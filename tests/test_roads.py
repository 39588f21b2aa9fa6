"""operators/roads.py vs an independent scalar transcription of
RoadModule.java's lane layout + width derivation (float32 accumulation
included), corpus-swept."""

import math
import re

import numpy as np
import pytest
from pyspark.sql.types import MapType, StringType, StructField, StructType

from osm2world_spark.operators.roads import (
    DEFAULT_LANE_WIDTH,
    W_CYCLEWAY,
    W_KERB,
    W_LINE,
    W_SIDEWALK,
    road_lanes_and_width,
)

# ---------------------------------------------------------------- oracle
# plain-Python re-derivation against the Java, NOT the Column code.


def _osm_decimal_pos(v):
    if v is None:
        return None
    out = None
    if re.fullmatch(r"[+-]?\d+", v):  # Integer.parseInt — no trimming
        i = int(v)
        out = float(i) if -(2**31) <= i < 2**31 else None
    else:
        m = re.fullmatch(r"(-?\d+)\.(\d+)", v)
        if m:
            out = abs(int(m.group(1))) + int(m.group(2)) * 10.0 ** -len(m.group(2))
            if m.group(1).startswith("-"):
                out = -out
    if out is not None and out <= 0:
        return None
    return out


_M_PER_INCH = 0.02539999969303608


def _parse_measure(v):
    d = _osm_decimal_pos(v)
    if d is not None:
        return d
    if v is None:
        return None
    m = re.fullmatch(r"([\d\.]+)\s*m", v)
    if m:
        return _osm_decimal_pos(m.group(1))
    m = re.fullmatch(r"([\d\.]+)\s*km", v)
    if m:
        g = _osm_decimal_pos(m.group(1))
        return 1000.0 * g if g is not None else None
    m = re.fullmatch(r"(\d+)'\s*(\d+)\"", v)
    if m and int(m.group(2)) < 12:
        return _M_PER_INCH * (12 * int(m.group(1)) + int(m.group(2)))
    return None


def _parse_width(tags):
    for k in ("width", "est_width"):
        got = _parse_measure(tags.get(k))
        if got is not None:
            return got
    return None


def _is_path(tags):
    return tags.get("highway") in ("path", "footway", "cycleway", "bridleway", "steps")


def _is_oneway(tags):
    return tags.get("oneway") == "yes" or (
        tags.get("oneway") != "no"
        and tags.get("highway") in ("motorway", "motorway_link")
    )


def _default_lanes(tags):
    hw = tags.get("highway")
    if (
        hw is None
        or _is_path(tags)
        or hw.endswith("_link")
        or hw in ("service", "track", "residential", "living_street", "pedestrian",
                  "platform")
    ):
        return 1
    if hw == "motorway":
        return 2
    return 1 if _is_oneway(tags) else 2


PER_LANE_KEYS = ("width", "cycleway", "access", "turn")


def _java_pipe_split(v):
    """Java String.split("\\\\|"): trailing empties dropped, "" -> [""]."""
    if v == "":
        return [""]
    parts = v.split("|")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _per_lane(tags, suffixes):
    n = None
    values = {}
    for k in PER_LANE_KEYS:
        for s in suffixes:
            v = tags.get(k + s)
            if v is None:
                continue
            parts = _java_pipe_split(v)
            if n is None:
                n = len(parts)
            elif len(parts) != n:
                return None
            if k not in values:
                values[k] = [p.strip() for p in parts]
    if n is None:
        return None
    return n, values


def _merged(tags, own, both):
    return tags[own] if own in tags else tags.get(both)


def _merged_width(tags, own_prefix, both_prefix):
    for k in ("width", "est_width"):
        got = _parse_measure(_merged(tags, own_prefix + k, both_prefix + k))
        if got is not None:
            return got
    return None


def oracle(tags):
    if tags.get("highway") == "steps":
        w = _parse_width(tags)
        return {"width": w if w is not None else 1.0}

    oneway = _is_oneway(tags)
    surf = tags.get("surface")
    lm = tags.get("lane_markings")
    unmarked = (
        False if lm == "yes" else True if lm == "no"
        else surf in ("earth", "gravel", "ice", "pebblestone", "rock", "sand", "snow")
    )

    fwd = _per_lane(
        tags, [":lanes", ":lanes:forward"] if oneway else [":lanes:forward"]
    )
    bwd = _per_lane(tags, [":lanes:backward"])

    lanes = _osm_decimal_pos(tags.get("lanes")) if "lanes" in tags else None
    lanes_r = float(fwd[0]) if fwd else _osm_decimal_pos(tags.get("lanes:forward")) if "lanes:forward" in tags else None
    lanes_l = float(bwd[0]) if bwd else _osm_decimal_pos(tags.get("lanes:backward")) if "lanes:backward" in tags else None

    if lanes_r is not None and lanes_l is not None:
        vlc_r, vlc_l = int(lanes_r), int(lanes_l)
    else:
        vlc = _default_lanes(tags) if lanes is None else int(lanes)
        if lanes_r is not None:
            vlc_r = int(lanes_r)
            vlc = max(vlc, vlc_r)
            vlc_l = vlc - vlc_r
        elif lanes_l is not None:
            vlc_l = int(lanes_l)
            vlc = max(vlc, vlc_l)
            vlc_r = vlc - vlc_l
        else:
            vlc_l = vlc // 2
            vlc_r = vlc - vlc_l

    # lane lists as (type, explicit_width) tuples
    def part(vlc_part, per_lane):
        out = []
        for i in range(vlc_part):
            if i > 0 and not unmarked:
                out.append(("D", None))
            if per_lane:
                _, vals = per_lane
                cyc = "cycleway" in vals and i < len(vals["cycleway"]) and vals["cycleway"][i] == "yes"
                w = None
                if "width" in vals and i < len(vals["width"]):
                    w = _parse_measure(vals["width"][i])
                out.append(("C" if cyc else "V", w))
            else:
                out.append(("V", None))
        return out

    left = part(vlc_l, bwd)
    right = part(vlc_r, fwd)

    divider = tags.get("divider")
    center = None
    if vlc_r > 0 and vlc_l > 0:
        if divider == "dashed_line":
            center = "dashed_line"
        elif divider == "solid_line":
            center = "solid_line"
        elif divider == "no" or unmarked:
            center = None
        else:
            of = tags.get("overtaking:forward") == "yes" or (
                tags.get("overtaking:forward") != "no"
                and tags.get("overtaking") != "backward"
                and tags.get("overtaking") != "no"
            )
            ob = tags.get("overtaking:backward") == "yes" or (
                tags.get("overtaking:backward") != "no"
                and tags.get("overtaking") != "forward"
                and tags.get("overtaking") != "no"
            )
            center = "solid_line" if not of and not ob else "dashed_line"
    if center is not None:
        right = [("D", None)] + right

    def has_cyc(lst):
        return any(t == "C" for t, _ in lst)

    cw_both = tags.get("cycleway") == "lane"
    if (tags.get("cycleway:left") == "lane" or cw_both) and not has_cyc(left):
        left += [("D", None), ("C", _merged_width(tags, "cycleway:left:", "cycleway:both:"))]
    if (tags.get("cycleway:right") == "lane" or cw_both) and not has_cyc(right):
        right += [("D", None), ("C", _merged_width(tags, "cycleway:right:", "cycleway:both:"))]
    if tags.get("bus_bay") in ("left", "both"):
        left += [("D", None), ("B", _merged_width(tags, "bus_bay:left:", "bus_bay:both:"))]
    if tags.get("bus_bay") in ("right", "both"):
        right += [("D", None), ("B", _merged_width(tags, "bus_bay:right:", "bus_bay:both:"))]
    if tags.get("sidewalk") in ("left", "both"):
        if _merged(tags, "sidewalk:left:kerb", "sidewalk:both:kerb") != "no":
            left.append(("K", None))
        left.append(("S", _merged_width(tags, "sidewalk:left:", "sidewalk:both:")))
    if tags.get("sidewalk") in ("right", "both"):
        # reference quirk: right kerb inherits LEFT over right (:1056-1058)
        if _merged(tags, "sidewalk:left:kerb", "sidewalk:right:kerb") != "no":
            right.append(("K", None))
        right.append(("S", _merged_width(tags, "sidewalk:right:", "sidewalk:both:")))

    lanes_ltr = list(reversed(left)) + right

    def resolved(t, w):
        if t == "D":
            return W_LINE
        if t == "K":
            return W_KERB
        if t == "C":
            return w if w is not None else W_CYCLEWAY
        if t == "S":
            return w if w is not None else W_SIDEWALK
        return w  # V / B

    def fold(ws):
        acc = np.float32(0.0)
        for w in ws:
            acc = np.float32(np.float64(acc) + w)
        return float(acc)

    rs = [resolved(t, w) for t, w in lanes_ltr]
    sum_known = None if any(r is None for r in rs) else fold(rs)
    if sum_known is not None:
        width = sum_known
    else:
        explicit = _parse_width(tags)
        if explicit is not None:
            width = explicit
        elif any(k in tags for k in ("lanes", "lanes:forward", "lanes:backward", "divider")):
            width = fold([r if r is not None else DEFAULT_LANE_WIDTH for r in rs])
        else:
            rs_nv = [
                resolved(t, w) for t, w in lanes_ltr if t != "V"
            ]
            base = fold([r if r is not None else DEFAULT_LANE_WIDTH for r in rs_nv])
            hw = tags.get("highway")
            if "lanes" in tags or "divider" in tags:
                est = 0.0
            elif _is_path(tags):
                est = 1.0
            elif hw == "track":
                est = min(2.5, DEFAULT_LANE_WIDTH)
            elif hw == "service":
                est = DEFAULT_LANE_WIDTH * 0.8 if tags.get("service") == "parking_aisle" else DEFAULT_LANE_WIDTH
            elif hw in ("primary", "secondary"):
                est = 2 * DEFAULT_LANE_WIDTH
            elif hw == "motorway":
                est = 2.5 * DEFAULT_LANE_WIDTH
            elif "oneway" in tags and tags["oneway"] != "no":
                est = DEFAULT_LANE_WIDTH
            else:
                est = 4.0
            width = base + est

    return {
        "oneway": oneway,
        "unmarked_lanes": unmarked,
        "n_lanes_forward": vlc_r,
        "n_lanes_backward": vlc_l,
        "n_lanes": vlc_r + vlc_l,
        "centre_divider": center,
        "width": width,
    }


# ---------------------------------------------------------------- corpus

HIGHWAYS = [
    "motorway", "motorway_link", "trunk", "primary", "secondary", "tertiary",
    "residential", "living_street", "service", "track", "path", "footway",
    "cycleway", "pedestrian", "unclassified", "steps",
]


def _corpus():
    rows = []
    i = 0
    for hw in HIGHWAYS:
        for k in range(14):
            i += 1
            tags = {"highway": hw}
            if k == 1:
                tags["lanes"] = str(1 + i % 5)
            elif k == 2:
                tags["width"] = f"{3 + i % 9}.5"
            elif k == 3:
                tags["sidewalk"] = ["left", "right", "both"][i % 3]
            elif k == 4:
                tags["cycleway"] = "lane"
            elif k == 5:
                tags["oneway"] = "yes"
                tags["lanes"] = str(1 + i % 3)
            elif k == 6:
                tags["lanes:forward"] = str(1 + i % 3)
                tags["lanes:backward"] = str(i % 3)
            elif k == 7:
                tags["surface"] = ["gravel", "asphalt", "sand"][i % 3]
            elif k == 8:
                tags["divider"] = ["dashed_line", "solid_line", "no"][i % 3]
                tags["lanes"] = "4"
            elif k == 9:
                tags["bus_bay"] = ["left", "right", "both"][i % 3]
            elif k == 10:
                n = 1 + i % 3
                tags["lanes:forward"] = str(n)
                tags["width:lanes:forward"] = "|".join(
                    str(3 + (i + j) % 4) for j in range(n)
                )
                tags["lanes:backward"] = "1"
                tags["width:lanes:backward"] = "3.5"
            elif k == 11:
                tags["sidewalk"] = "both"
                tags["sidewalk:left:width"] = "2.5"
                tags["sidewalk:both:kerb"] = ["no", "lowered"][i % 2]
            elif k == 12:
                tags["overtaking"] = ["no", "forward", "backward"][i % 3]
                tags["lanes"] = "2"
            elif k == 13:
                tags["lane_markings"] = ["yes", "no"][i % 2]
                tags["lanes"] = "3"
    # targeted corners
            rows.append((i, tags))
    rows.append((9001, {"highway": "secondary", "lanes": "2",
                        "width:lanes:forward": "3|x", "lanes:forward": "2"}))
    rows.append((9002, {"highway": "service", "service": "parking_aisle"}))
    rows.append((9003, {"highway": "residential", "oneway": "yes"}))
    rows.append((9004, {"highway": "secondary",
                        "cycleway:lanes:forward": "no|yes",
                        "lanes:backward": "1"}))
    rows.append((9005, {"highway": "primary", "lanes:forward": "2",
                        "width:lanes:forward": "3|3", "turn:lanes:forward": "left|right|through"}))
    rows.append((9006, {"highway": "steps", "width": "2.2"}))
    # Java pipe-split drops trailing empties: "3|" is ONE lane
    rows.append((9007, {"highway": "secondary", "lanes": "2",
                        "lanes:backward": "1",
                        "width:lanes:forward": "3|"}))
    rows.append((9008, {"highway": "secondary",
                        "turn:lanes:forward": "left||",
                        "lanes:backward": "1"}))
    return rows


def test_road_width_corpus(spark):
    rows = _corpus()
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
    ])
    df = spark.createDataFrame([(str(r), t) for r, t in rows], schema)
    got = {r["rid"]: r.asDict() for r in road_lanes_and_width(df).collect()}
    for rid, tags in rows:
        g = got[str(rid)]
        exp = oracle(tags)
        for k, want in exp.items():
            have = g[k]
            if isinstance(want, float):
                assert have == pytest.approx(want, abs=0, rel=0) or (
                    math.isnan(want) and math.isnan(have)
                ), (rid, k, have, want, tags)
            else:
                assert have == want, (rid, k, have, want, tags)


def test_inconsistent_per_lane_counts(spark):
    """getPerLaneTags :1119-1123 — mismatched '|' counts void the whole
    per-lane tag set; lane counts fall back to the lanes tags."""
    schema = StructType([
        StructField("rid", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
    ])
    df = spark.createDataFrame(
        [("x", {"highway": "secondary", "lanes": "2",
                "width:lanes:forward": "3|3",
                "turn:lanes:forward": "left|through|right"})],
        schema,
    )
    row = road_lanes_and_width(df).collect()[0]
    # inconsistent -> per-lane null -> lanes=2 split 1/1
    assert row["n_lanes_forward"] == 1 and row["n_lanes_backward"] == 1
