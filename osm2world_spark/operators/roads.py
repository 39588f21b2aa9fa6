"""RoadModule lane-layout and width semantics (RoadModule.java) as pure
Column arithmetic — "how many lanes / how wide is every road" over a
tag map, the analytic core of the reference's road world module.

Transcribed branch for branch (all citations RoadModule.java):

- isPath :148-155, isOneway :157-162, getDefaultLanes :164-181.
- buildBasicLaneLayout :823-1073: oneway / lane_markings / surface-
  implied unmarked lanes (:826-831), sidewalk / cycleway-lane / bus-bay
  flags (:839-849), per-lane ``:lanes[:forward|:backward]`` tag arrays
  (getPerLaneTags :1079-1136: '|'-split, per-value trim, inconsistent
  counts -> null), the vehicle-lane-count derivation (:857-930,
  ``(int)`` truncation preserved), the central divider with its
  overtaking-rule inference (:934-973), per-direction lane dividers
  (:988-996), and the special-lane appends (cycleway :1012-1024 with
  its dashed divider, bus bay :1026-1037, kerb+sidewalk :1039-1070 —
  including the reference's own left-prefix quirk in the right kerb's
  inheritTags call at :1056-1058, kept verbatim).
- calculateWidth :1190-1218: sum of known lane widths, else explicit
  width tag, else lane-based width with defaults when basic lane info
  exists, else non-vehicle lanes + estimateVehicleLanesWidth
  (:1259-1302 type table).
- calculateLaneBasedWidth :1232-1255: **float32 accumulation** — the
  Java loop keeps a ``float`` accumulator and narrows after each add,
  so the sum is order-dependent; lanes are walked leftmost-to-rightmost
  (LaneLayout.getLanesLeftToRight :1665-1671 = reversed(leftLanes) +
  rightLanes).  This module builds the lane sequence as an ordered
  array<struct> column and folds it with a FloatType accumulator —
  bit-identical to the Java walk.
- Lane-type default widths with the reference's float literals promoted
  to double (VEHICLE/BUS_BAY null :2121-2152, CYCLEWAY (double)1.5f
  :2160, SIDEWALK (double)1.0f :2181, SOLID/DASHED (double)0.1f
  :2191,:2206, KERB (double)0.15f :2268): 0.1f = 0.10000000149011612
  and 0.15f = 0.15000000596046448 as exact doubles.
- steps bypass the lane layout entirely: width = parseWidth(tags, 1.0)
  (:808-811).

Documented subset boundaries (each falls back exactly like untagged
data, never crashes): per-lane tag collection covers the declared
PER_LANE_KEYS (width / cycleway / access / turn) rather than *every*
key with a ``:lanes`` suffix; the surface->unmarked test compares the
raw surface value against the reference's unmarked-material set rather
than resolving the full material style chain; right-hand traffic is
assumed (the left-hand case only permutes lane order, and the fold
order of parts is preserved structurally, not by driving side).

Everything is one zero-shuffle projection (array/higher-order Columns,
no UDF): at 100 TB this rides any way-segment scan for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

# float literals promoted to double, pinned exactly
W_LINE = 0.10000000149011612     # (double) 0.1f  — SOLID/DASHED_LINE
W_KERB = 0.15000000596046448     # (double) 0.15f — KERB
W_CYCLEWAY = 1.5                 # (double) 1.5f
W_SIDEWALK = 1.0                 # (double) 1.0f
DEFAULT_LANE_WIDTH = 3.5         # :772 (double) 3.5f

#: base keys whose ``<key>:lanes[:forward|:backward]`` forms are
#: collected into per-lane tag arrays (getPerLaneTags subset)
PER_LANE_KEYS = ("width", "cycleway", "access", "turn")

#: surfaces whose roads default to unmarked lanes (:829-830)
UNMARKED_SURFACES = ("earth", "gravel", "ice", "pebblestone", "rock", "sand", "snow")

_PATH_VALUES = ("path", "footway", "cycleway", "bridleway", "steps")
_ONE_LANE_HIGHWAYS = (
    "service", "track", "residential", "living_street", "pedestrian", "platform",
)


def is_path(tags: Column) -> Column:
    """:148-155."""
    return tags["highway"].isin(*_PATH_VALUES)


def is_oneway(tags: Column) -> Column:
    """:157-162."""
    return (tags["oneway"] == "yes") | (
        (F.coalesce(tags["oneway"], F.lit("")) != "no")
        & tags["highway"].isin("motorway", "motorway_link")
    )


def default_lanes(tags: Column) -> Column:
    """:164-181."""
    hw = tags["highway"]
    return (
        F.when(
            hw.isNull()
            | F.coalesce(is_path(tags), F.lit(False))
            | hw.endswith("_link")
            | hw.isin(*_ONE_LANE_HIGHWAYS),
            F.lit(1),
        )
        .when(hw == "motorway", F.lit(2))
        .otherwise(F.when(is_oneway(tags), F.lit(1)).otherwise(F.lit(2)))
    )


def parse_width(tags: Column) -> Column:
    """WorldModuleParseUtil.parseWidth :45-47 over :141-153 — first
    PARSEABLE of width, est_width (NULL instead of the -1 sentinel)."""
    return F.coalesce(
        V.parse_measure(tags["width"]), V.parse_measure(tags["est_width"])
    )


def _merged_value(tags: Column, own_key: str, both_key: str) -> Column:
    """inheritTags over getTagsWithPrefix results, reduced to one key:
    the side-specific tag's value if the KEY exists, else the :both
    tag's (WorldModuleParseUtil.java:156-168 own-key-wins)."""
    return F.when(tags[own_key].isNotNull(), tags[own_key]).otherwise(tags[both_key])


def _merged_width(tags: Column, own_prefix: str, both_prefix: str) -> Column:
    """parseWidth over the merged side-specific/both prefix tag sets."""
    return F.coalesce(
        V.parse_measure(
            _merged_value(tags, own_prefix + "width", both_prefix + "width")
        ),
        V.parse_measure(
            _merged_value(tags, own_prefix + "est_width", both_prefix + "est_width")
        ),
    )


def _float32_fold(arr: Column) -> Column:
    """``float width = 0; width += w;`` (:1236-1253) — double add,
    float32 narrow per step, widened to double at the end."""
    return F.aggregate(
        arr,
        F.lit(0.0).cast("float"),
        lambda acc, w: (acc.cast("double") + w).cast("float"),
    ).cast("double")


# lane-type codes inside the ordered struct array
_VEH, _CYC, _BUS, _SW, _KERB, _DIV = "V", "C", "B", "S", "K", "D"


def _lane(t: str, w: Column | None = None) -> Column:
    return F.struct(
        F.lit(t).alias("t"),
        (w if w is not None else F.lit(None).cast("double")).alias("w"),
    )


def _resolved(x: Column) -> Column:
    """getAbsoluteWidth per lane type (citations in module docstring):
    NULL only for VEHICLE_LANE / BUS_BAY without explicit width."""
    return (
        F.when(x["t"] == _DIV, F.lit(W_LINE))
        .when(x["t"] == _KERB, F.lit(W_KERB))
        .when(x["t"] == _CYC, F.coalesce(x["w"], F.lit(W_CYCLEWAY)))
        .when(x["t"] == _SW, F.coalesce(x["w"], F.lit(W_SIDEWALK)))
        .otherwise(x["w"])
    )


def road_lanes_and_width(
    df: DataFrame, tags_col: str = "tags"
) -> DataFrame:
    """Append lane/width columns to a way frame carrying a
    map<string,string> tag column: n_lanes_forward / n_lanes_backward /
    n_lanes (vehicle lanes), oneway, unmarked_lanes, and width (m).

    Rows whose tags carry no highway key still evaluate (the reference
    only constructs Road for accepted ways; callers filter) — they take
    the default-lane path like any untagged road.
    """
    C = F.col
    base_cols = list(df.columns)
    tags = F.col(tags_col)

    # ---- stage 1: scalar flags and parsed tags -------------------------
    surf = tags["surface"]
    unmarked = (
        F.when(tags["lane_markings"] == "yes", F.lit(False))
        .when(tags["lane_markings"] == "no", F.lit(True))
        .otherwise(surf.isin(*UNMARKED_SURFACES) & surf.isNotNull())
    )
    s1_cols = [
        tags["highway"].alias("_hw"),
        (tags["highway"] == "steps").alias("_steps"),
        F.coalesce(is_oneway(tags), F.lit(False)).alias("oneway"),
        unmarked.alias("unmarked_lanes"),
        tags["divider"].alias("_divider"),
        tags["sidewalk"].isin("left", "both").alias("_sw_l"),
        tags["sidewalk"].isin("right", "both").alias("_sw_r"),
        ((tags["cycleway:left"] == "lane") | (tags["cycleway"] == "lane")).alias("_cw_l"),
        ((tags["cycleway:right"] == "lane") | (tags["cycleway"] == "lane")).alias("_cw_r"),
        tags["bus_bay"].isin("left", "both").alias("_bb_l"),
        tags["bus_bay"].isin("right", "both").alias("_bb_r"),
        V.osm_decimal(tags["lanes"], "positive").alias("_lanes_dec"),
        tags["lanes"].isNotNull().alias("_has_lanes_key"),
        tags["divider"].isNotNull().alias("_has_divider_key"),
        (
            tags["lanes"].isNotNull()
            | tags["lanes:forward"].isNotNull()
            | tags["lanes:backward"].isNotNull()
            | tags["divider"].isNotNull()
        ).alias("_has_lane_info"),
        V.osm_decimal(tags["lanes:forward"], "positive").alias("_lanes_fwd_dec"),
        V.osm_decimal(tags["lanes:backward"], "positive").alias("_lanes_bwd_dec"),
        parse_width(tags).alias("_explicit_width"),
        default_lanes(tags).alias("_default_lanes"),
        # special-lane widths (merged side/both prefix tag sets)
        _merged_width(tags, "cycleway:left:", "cycleway:both:").alias("_cw_w_l"),
        _merged_width(tags, "cycleway:right:", "cycleway:both:").alias("_cw_w_r"),
        _merged_width(tags, "bus_bay:left:", "bus_bay:both:").alias("_bb_w_l"),
        _merged_width(tags, "bus_bay:right:", "bus_bay:both:").alias("_bb_w_r"),
        _merged_width(tags, "sidewalk:left:", "sidewalk:both:").alias("_sw_w_l"),
        _merged_width(tags, "sidewalk:right:", "sidewalk:both:").alias("_sw_w_r"),
        # kerb presence: kerbTags.contains("kerb","no") suppresses the
        # kerb lane (:1045,:1060); right side inherits LEFT over right —
        # the reference's own quirk at :1056-1058, kept verbatim
        (
            F.coalesce(
                _merged_value(tags, "sidewalk:left:kerb", "sidewalk:both:kerb"),
                F.lit(""),
            )
            != "no"
        ).alias("_kerb_l"),
        (
            F.coalesce(
                _merged_value(tags, "sidewalk:left:kerb", "sidewalk:right:kerb"),
                F.lit(""),
            )
            != "no"
        ).alias("_kerb_r"),
        # overtaking-rule divider inference (:955-965); all comparisons
        # ''-coalesced (NULL == 'x' would poison the OR to NULL)
        (
            (F.coalesce(tags["overtaking:forward"], F.lit("")) == "yes")
            | (
                (F.coalesce(tags["overtaking:forward"], F.lit("")) != "no")
                & (F.coalesce(tags["overtaking"], F.lit("")) != "backward")
                & (F.coalesce(tags["overtaking"], F.lit("")) != "no")
            )
        ).alias("_ot_fwd"),
        (
            (F.coalesce(tags["overtaking:backward"], F.lit("")) == "yes")
            | (
                (F.coalesce(tags["overtaking:backward"], F.lit("")) != "no")
                & (F.coalesce(tags["overtaking"], F.lit("")) != "forward")
                & (F.coalesce(tags["overtaking"], F.lit("")) != "no")
            )
        ).alias("_ot_bwd"),
    ]

    # per-lane tag arrays (getPerLaneTags :1079-1136).  Forward part:
    # [":lanes", ":lanes:forward"] under oneway, else [":lanes:forward"];
    # backward part: [":lanes:backward"].  All present arrays must agree
    # on length or the whole part's per-lane tags are null.
    def _per_lane_cols(pref: str, suffixes: list[str]) -> list[Column]:
        arrs = []
        for k in PER_LANE_KEYS:
            for s in suffixes:
                v = tags[k + s]
                # Java String.split("\\|"): trailing empties dropped
                # (RoadModule.java:1114)
                arrs.append((k, V.java_split(v, r"\|")))
        n = F.coalesce(
            *[F.when(a.isNotNull(), F.size(a)) for _, a in arrs],
            F.lit(None).cast("int"),
        )
        consistent = n.isNotNull()
        for _, a in arrs:
            consistent = consistent & (a.isNull() | (F.size(a) == n))

        def _first(key):
            cands = [a for kk, a in arrs if kk == key]
            return F.coalesce(*cands) if len(cands) > 1 else cands[0]

        w_arr = F.transform(_first("width"), lambda x: V.parse_measure(F.trim(x)))
        c_arr = F.transform(_first("cycleway"), lambda x: F.trim(x) == "yes")
        return [
            F.when(consistent, n).alias(f"{pref}_n"),
            F.when(consistent, w_arr).alias(f"{pref}_w"),
            F.when(consistent, c_arr).alias(f"{pref}_c"),
        ]

    s1_cols += _per_lane_cols("_fwd_ow", [":lanes", ":lanes:forward"])
    s1_cols += _per_lane_cols("_fwd_tw", [":lanes:forward"])
    s1_cols += _per_lane_cols("_bwd_ow", [":lanes:backward"])

    s1 = df.select("*", *s1_cols)
    ow_c = F.col("oneway")
    s1 = s1.select(
        "*",
        F.when(ow_c, C("_fwd_ow_n")).otherwise(C("_fwd_tw_n")).alias("_fwd_n"),
        F.when(ow_c, C("_fwd_ow_w")).otherwise(C("_fwd_tw_w")).alias("_fwd_w"),
        F.when(ow_c, C("_fwd_ow_c")).otherwise(C("_fwd_tw_c")).alias("_fwd_c"),
        C("_bwd_ow_n").alias("_bwd_n"),
        C("_bwd_ow_w").alias("_bwd_w"),
        C("_bwd_ow_c").alias("_bwd_c"),
    )

    # ---- stage 2: vehicle lane counts (:857-930) -----------------------
    lanes_r = F.when(C("_fwd_n").isNotNull(), C("_fwd_n").cast("double")).otherwise(
        C("_lanes_fwd_dec")
    )
    lanes_l = F.when(C("_bwd_n").isNotNull(), C("_bwd_n").cast("double")).otherwise(
        C("_lanes_bwd_dec")
    )
    s2 = s1.select("*", lanes_r.alias("_lanes_r"), lanes_l.alias("_lanes_l"))

    both = C("_lanes_r").isNotNull() & C("_lanes_l").isNotNull()
    vlc_base = F.when(
        C("_lanes_dec").isNull(), C("_default_lanes")
    ).otherwise(C("_lanes_dec").cast("int"))
    vlc_r = (
        F.when(both, C("_lanes_r").cast("int"))
        .when(
            C("_lanes_r").isNotNull(),
            C("_lanes_r").cast("int"),
        )
        .when(
            C("_lanes_l").isNotNull(),
            F.greatest(vlc_base, C("_lanes_l").cast("int"))
            - C("_lanes_l").cast("int"),
        )
        .otherwise(vlc_base - (vlc_base / 2).cast("int"))
    )
    vlc_l = (
        F.when(both, C("_lanes_l").cast("int"))
        .when(
            C("_lanes_r").isNotNull(),
            F.greatest(vlc_base, C("_lanes_r").cast("int"))
            - C("_lanes_r").cast("int"),
        )
        .when(C("_lanes_l").isNotNull(), C("_lanes_l").cast("int"))
        .otherwise((vlc_base / 2).cast("int"))
    )
    s2 = s2.select(
        "*",
        vlc_r.alias("n_lanes_forward"),
        vlc_l.alias("n_lanes_backward"),
    )
    s2 = s2.select(
        "*", (C("n_lanes_forward") + C("n_lanes_backward")).alias("n_lanes")
    )

    # ---- stage 3: ordered lane struct array ----------------------------
    def _part_structs(n: Column, w_arr: Column, c_arr: Column) -> Column:
        """[lane0, DIV?, lane1, DIV?, ...] for one direction
        (:976-1008): dividers between same-direction lanes unless
        unmarked; per-lane CYCLEWAY when the cycleway:lanes value is
        yes (:1002-1004)."""
        unm = C("unmarked_lanes")

        def one(i: Column) -> Column:
            lane = F.struct(
                F.when(
                    c_arr.isNotNull() & F.coalesce(F.element_at(c_arr, i + 1), F.lit(False)),
                    F.lit(_CYC),
                )
                .otherwise(F.lit(_VEH))
                .alias("t"),
                F.when(w_arr.isNotNull(), F.element_at(w_arr, i + 1))
                .otherwise(F.lit(None).cast("double"))
                .alias("w"),
            )
            return F.when((i > 0) & ~unm, F.array(_lane(_DIV), lane)).otherwise(
                F.array(lane)
            )

        return F.when(
            n > 0, F.flatten(F.transform(F.sequence(F.lit(0), n - 1), one))
        ).otherwise(F.array().cast("array<struct<t:string,w:double>>"))

    empty = F.array().cast("array<struct<t:string,w:double>>")

    def _special(flag: Column, *lanes: Column) -> Column:
        return F.when(flag, F.array(*lanes)).otherwise(empty)

    # central divider presence (:934-973); divider may be untagged, so
    # every comparison runs against the ''-coalesced value (a raw
    # NULL == 'x' would poison the OR chain to NULL, not false)
    div = F.coalesce(C("_divider"), F.lit(""))
    center_present = (
        (C("n_lanes_forward") > 0)
        & (C("n_lanes_backward") > 0)
        & (
            (div == "dashed_line")
            | (div == "solid_line")
            | ((div != "no") & ~C("unmarked_lanes"))
        )
    )

    has_cyc_fwd = F.coalesce(
        F.exists(C("_fwd_c"), lambda x: F.coalesce(x, F.lit(False))), F.lit(False)
    )
    has_cyc_bwd = F.coalesce(
        F.exists(C("_bwd_c"), lambda x: F.coalesce(x, F.lit(False))), F.lit(False)
    )

    left_structs = F.concat(
        _part_structs(C("n_lanes_backward"), C("_bwd_w"), C("_bwd_c")),
        _special(C("_cw_l") & ~has_cyc_bwd, _lane(_DIV), _lane(_CYC, C("_cw_w_l"))),
        _special(C("_bb_l"), _lane(_DIV), _lane(_BUS, C("_bb_w_l"))),
        _special(C("_sw_l") & C("_kerb_l"), _lane(_KERB)),
        _special(C("_sw_l"), _lane(_SW, C("_sw_w_l"))),
    )
    right_structs = F.concat(
        _special(center_present, _lane(_DIV)),
        _part_structs(C("n_lanes_forward"), C("_fwd_w"), C("_fwd_c")),
        _special(C("_cw_r") & ~has_cyc_fwd, _lane(_DIV), _lane(_CYC, C("_cw_w_r"))),
        _special(C("_bb_r"), _lane(_DIV), _lane(_BUS, C("_bb_w_r"))),
        _special(C("_sw_r") & C("_kerb_r"), _lane(_KERB)),
        _special(C("_sw_r"), _lane(_SW, C("_sw_w_r"))),
    )
    centre_divider = (
        F.when(~center_present, F.lit(None).cast("string"))
        .when(div == "dashed_line", F.lit("dashed_line"))
        .when(div == "solid_line", F.lit("solid_line"))
        # no explicit divider tagging: infer from overtaking (:955-965)
        .when(~C("_ot_fwd") & ~C("_ot_bwd"), F.lit("solid_line"))
        .otherwise(F.lit("dashed_line"))
    )

    s3 = s2.select(
        "*",
        F.concat(F.reverse(left_structs), right_structs).alias("_lanes_arr"),
        centre_divider.alias("centre_divider"),
    )

    # ---- stage 4: the three width sums + final width (:1190-1302) ------
    ls = C("_lanes_arr")
    any_unknown = F.exists(
        ls, lambda x: x["t"].isin(_VEH, _BUS) & _resolved(x).isNull()
    )
    sum_known = F.when(
        ~any_unknown, _float32_fold(F.transform(ls, _resolved))
    )
    sum_defaults = _float32_fold(
        F.transform(ls, lambda x: F.coalesce(_resolved(x), F.lit(DEFAULT_LANE_WIDTH)))
    )
    sum_novehicle = _float32_fold(
        F.transform(
            F.filter(ls, lambda x: x["t"] != _VEH),
            lambda x: F.coalesce(_resolved(x), F.lit(DEFAULT_LANE_WIDTH)),
        )
    )

    hw = C("_hw")
    estimate = F.when(
        C("_has_lanes_key") | C("_has_divider_key"), F.lit(0.0)
    ).otherwise(
        F.when(hw.isin(*_PATH_VALUES), F.lit(1.0))
        .when(hw == "track", F.lit(min(2.5, DEFAULT_LANE_WIDTH)))
        .when(
            hw == "service",
            F.when(tags["service"] == "parking_aisle", F.lit(DEFAULT_LANE_WIDTH * 0.8))
            .otherwise(F.lit(DEFAULT_LANE_WIDTH)),
        )
        .when(hw.isin("primary", "secondary"), F.lit(2 * DEFAULT_LANE_WIDTH))
        .when(hw == "motorway", F.lit(2.5 * DEFAULT_LANE_WIDTH))
        .when(
            tags["oneway"].isNotNull() & (tags["oneway"] != "no"),
            F.lit(DEFAULT_LANE_WIDTH),
        )
        .otherwise(F.lit(4.0))
    )

    width = F.when(
        C("_steps"), F.coalesce(parse_width(tags), F.lit(1.0))
    ).otherwise(
        F.coalesce(
            sum_known,
            C("_explicit_width"),
            F.when(C("_has_lane_info"), sum_defaults),
            sum_novehicle + estimate,
        )
    )
    s4 = s3.select("*", width.alias("width"))

    return s4.select(
        *base_cols,
        "oneway",
        "unmarked_lanes",
        "n_lanes_forward",
        "n_lanes_backward",
        "n_lanes",
        "centre_divider",
        "width",
    )
