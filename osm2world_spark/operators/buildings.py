"""Simple-3D-Buildings level/height semantics (the analytic core of the
reference's building world module) as pure Column arithmetic.

The reference's building pipeline is mostly renderer payload (walls,
windows, roof meshes — out of analytic scope per SURVEY §2.9), but the
*attribute derivation* that drives it is a pure tag→value function and
is exactly what an analytics user asks of building data ("how tall is
every building in this tile set?").  This module transcribes that
derivation, branch for branch:

- BuildingDefaults.getDefaultsFor (BuildingDefaults.java:30-124):
  per-type default levels / height-per-level / roof shape / windows /
  walls, plus the parking=multi-storey and man_made=chimney overrides.
- roof-shape resolution (BuildingPart.java:91-100): roof:shape, else
  building:roof:shape, else the type default.  The `ComplexRoof` branch
  (BuildingPart.java:94-97) requires ridge/edge *member geometry* of a
  building relation and is intentionally not modelled here; rows that
  would take it resolve like plain tagged shapes.
- Roof.calculatePreliminaryHeight and its per-shape overrides
  (Roof.java:79-84, FlatRoof.java:33-35, ChimneyRoof.java:45-47,
  RoofWithRidge.java:222-236, SkillionRoof.java:92-101,
  SawtoothRoof.java:115-117): FlatRoof is createRoofForShape's DEFAULT
  branch (Roof.java:134), so every shape value WITHOUT its own class —
  unknown/garbage values included — pins 0.0, as does chimney; ridge
  shapes fall back to tan(roof:angle)·maxDistanceToRidge, skillion to
  tan(roof:angle)·roofLength — the two geometry-dependent angle paths
  are honoured when the caller supplies the distance column
  (`ridge_distance_col`), else those rows continue down the default
  chain exactly as an untagged roof would.
- LevelAndHeightData (LevelAndHeightData.java:108-222): levels from
  building:levels (non-integer → ceil), else derived from tagged
  height minus roof height at the type's height-per-level, else
  min-level/underground floor, else the type default; the roof-height
  default chain (roof:levels × height-per-level → dome diameter/2 →
  1.0 for single-level → DEFAULT_RIDGE_HEIGHT=5); total height =
  parseHeight(height → building:height → est_height,
  WorldModuleParseUtil.java:58-68,141-153 "first parseable key wins")
  defaulted to levels·hpl + roofHeight, floored at 0.01; and the
  min_height chain with both reference clamps.

Everything is whole-stage-codegen Column arithmetic over a
`map<string,string>` tags column — no UDF, no shuffle; at 100 TB this
is a zero-exchange projection appended to any element scan.  The exact
float discipline matters for golden parity: heightWithoutRoof is
rounded with the reference's own floor(x·1e4 + 0.5)/1e4 (a Java
Math.round transcription, LevelAndHeightData.java:202), not an engine
ROUND whose half-even/half-up rules differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

#: BuildingPart.java:55
DEFAULT_RIDGE_HEIGHT = 5.0

# type → (levels, height_per_level, roof_shape, has_windows, has_walls)
# BuildingDefaults.java:43-99; the base default is (3, 2.5, "flat",
# windows, walls).  Only types that deviate appear here.
DEFAULTS_BASE = (3, 2.5, "flat", True, True)
DEFAULTS_BY_TYPE: dict[str, tuple[int, float, str, bool, bool]] = {
    "greenhouse": (1, 2.5, "flat", False, True),
    "garage": (1, 2.5, "flat", False, True),
    "garages": (1, 2.5, "flat", False, True),
    "carport": (1, 2.5, "flat", False, False),
    "hut": (1, 2.5, "flat", True, True),
    "shed": (1, 2.5, "flat", True, True),
    "cabin": (1, 2.5, "flat", True, True),
    "roof": (1, 2.5, "flat", False, False),
    "church": (3, 2.5, "flat", False, True),
    "hangar": (3, 2.5, "flat", False, True),
    "industrial": (3, 2.5, "flat", False, True),
}

# roof shapes with their own Roof class (Roof.createRoofForShape,
# Roof.java:116-135); anything else — including "flat" itself — takes
# the DEFAULT branch and becomes a FlatRoof (:134), so an unknown
# roof:shape value is FLAT (height 0), not a ridge roof
NON_FLAT_SHAPES = (
    "pyramidal", "onion", "skillion", "saltbox", "gabled", "hipped",
    "side_hipped", "half-hipped", "side_half-hipped", "gambrel", "mansard",
    "sawtooth", "dome", "round", "cone", "complex",
)
# RoofWithRidge subclasses — the tan(angle)·maxDistanceToRidge family
# (Roof.java:116-133 dispatch: gabled/hipped/side_hipped/half-hipped/
# side_half-hipped/gambrel/mansard/saltbox/round share the base,
# RoofWithRidge.java:222-236)
RIDGE_SHAPES = (
    "gabled", "hipped", "side_hipped", "half-hipped", "side_half-hipped",
    "gambrel", "mansard", "saltbox", "round",
)


def building_type(tags: Column) -> Column:
    """BuildingDefaults.java:32-36 — building:part unless absent/'yes',
    else building.  NULL (reference: IllegalArgumentException) when
    neither key carries a type; callers filter or quarantine."""
    part = tags["building:part"]
    return F.when(part.isNotNull() & (part != "yes"), part).otherwise(tags["building"])


def _defaults_case(tags: Column, btype: Column, field: int) -> Column:
    expr = F.lit(DEFAULTS_BASE[field])
    for t, row in DEFAULTS_BY_TYPE.items():
        if row[field] != DEFAULTS_BASE[field]:
            expr = F.when(btype == t, F.lit(row[field])).otherwise(expr)
    # parking=multi-storey: levels=5, windows off (BuildingDefaults.java:102-105)
    if field == 0:
        expr = F.when(tags["parking"] == "multi-storey", F.lit(5)).otherwise(expr)
    if field == 3:
        expr = F.when(tags["parking"] == "multi-storey", F.lit(False)).otherwise(expr)
    # chimney override (BuildingDefaults.java:107-114): roof shape,
    # levels=1, heightPerLevel=10, windows off
    chimney = (tags["man_made"] == "chimney") | (btype == "chimney")
    if field == 0:
        expr = F.when(chimney, F.lit(1)).otherwise(expr)
    elif field == 1:
        expr = F.when(chimney, F.lit(10.0)).otherwise(expr)
    elif field == 2:
        expr = F.when(chimney, F.lit("chimney")).otherwise(expr)
    elif field == 3:
        expr = F.when(chimney, F.lit(False)).otherwise(expr)
    return expr


def inherit_tags(own: Column, parent: Column) -> Column:
    """WorldModuleParseUtil.java:156-168 — union of the two tag maps,
    own keys winning."""
    return F.map_zip_with(own, parent, lambda _k, v_own, v_parent: F.coalesce(v_own, v_parent))


def resolve_roof_shape(tags: Column, default_shape: Column) -> Column:
    """BuildingPart.java:98-100 (the non-complex branch)."""
    return F.coalesce(tags["roof:shape"], tags["building:roof:shape"], default_shape)


def parse_height(tags: Column) -> Column:
    """WorldModuleParseUtil.parseHeight :61-68 over :141-153 — first
    PARSEABLE of height, building:height, est_height (a present but
    unparseable key falls through to the next)."""
    return F.coalesce(
        V.parse_measure(tags["height"]),
        V.parse_measure(tags["building:height"]),
        V.parse_measure(tags["est_height"]),
    )


def _java_round4(x: Column) -> Column:
    """Math.round(x * 1e4) / 1e4 (LevelAndHeightData.java:202) exactly:
    floor(x·1e4 + 0.5) / 1e4 — NOT F.round, whose HALF_UP decimal path
    differs from Java's float semantics at ties."""
    return F.floor(x * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)


def level_and_height(
    df: DataFrame,
    tags_col: str = "tags",
    building_tags_col: str | None = None,
    diameter_col: str | None = None,
    ridge_distance_col: str | None = None,
) -> DataFrame:
    """Append the LevelAndHeightData columns (LevelAndHeightData.java:
    108-222) to an element frame carrying a map<string,string> tag
    column.

    Optional columns: `building_tags_col` (the parent building's tags,
    for building:part inheritance per :111-117), `diameter_col` (outline
    diameter, the DomeRoof default :177-178), `ridge_distance_col`
    (maxDistanceToRidge / roofLength for the roof:angle paths).

    Output columns: btype, roof_shape, building_levels, roof_levels,
    min_level_wu, height, height_without_roof, min_height — all exact
    per the reference's double arithmetic.  Rows without a building
    type (reference throws, :38-39) surface btype=NULL with NULL
    derived columns: the O6 quarantine discipline.

    The derivation is staged through named intermediate columns (one
    select per dependency level) instead of one nested Column tree: a
    reused Column copies its whole subtree into every use site, and
    this chain is six levels deep — the single-expression form blows
    the analyzer up exponentially, the staged form keeps every reuse a
    plain attribute reference.  Catalyst collapses the selects back
    into one projection, so the physical plan is identical.
    """
    own = F.col(tags_col)
    if building_tags_col is not None:
        merged = inherit_tags(own, F.col(building_tags_col))
        # defaults always see the merged set (:111); level math sees the
        # part's own tags unless the part carries none of the three
        # level-defining keys (:113-117)
        has_level_keys = (
            own["building:levels"].isNotNull()
            | own["roof:levels"].isNotNull()
            | own["height"].isNotNull()
        )
        tags = F.when(has_level_keys, own).otherwise(merged)
        def_tags = merged
    else:
        tags = own
        def_tags = own

    C = F.col
    base_cols = list(df.columns)

    # stage 1 — parsed tag scalars and defaults
    btype = building_type(def_tags)
    s1 = df.select(
        "*",
        btype.alias("btype"),
        _defaults_case(def_tags, btype, 0).cast("int").alias("_d_levels"),
        _defaults_case(def_tags, btype, 1).cast("double").alias("_d_hpl"),
        _defaults_case(def_tags, btype, 2).alias("_d_shape"),
        _defaults_case(def_tags, btype, 4).alias("_d_walls"),
        F.coalesce(V.parse_int(tags["building:min_level"]), F.lit(0)).alias("_b_min"),
        F.coalesce(
            V.parse_uint(tags["building:levels:underground"]), F.lit(0)
        ).alias("_ug"),
        V.osm_decimal(tags["building:levels"], "nonnegative").alias("_parsed_levels"),
        parse_height(tags).alias("_th"),
        V.parse_measure(tags["roof:height"]).alias("_trh"),
        # the Roof object is built from the ALWAYS-merged tags
        # (BuildingPart.java:86-100), so its shape, roof:height and
        # roof:angle read def_tags even when the level math (:113-117)
        # sticks to the part's own tags
        V.parse_measure(def_tags["roof:height"]).alias("_trh_roof"),
        F.coalesce(V.parse_uint(tags["roof:levels"]), F.lit(1)).alias("_rl0"),
        V.parse_int(tags["roof:levels"]).alias("_rl_int"),
        tags["roof:levels"].isNotNull().alias("_has_rl"),
        V.parse_measure(tags["min_height"]).alias("_tmh"),
        (
            # parseRoofAngle = plain parseOsmDecimal (Roof.java:181-188)
            V.osm_decimal(def_tags["roof:angle"])
            if ridge_distance_col
            else F.lit(None).cast("double")
        ).alias("_angle_ridge"),
        (
            # SkillionRoof uses the compass-capable parseAngle (:95)
            V.parse_angle(def_tags["roof:angle"])
            if ridge_distance_col
            else F.lit(None).cast("double")
        ).alias("_angle_skill"),
    )
    s1 = s1.select(
        "*",
        resolve_roof_shape(def_tags, C("_d_shape")).alias("roof_shape"),
    )

    # stage 2 — level counts (:120-155)
    mlwu0 = F.when(C("_b_min") > 0, C("_b_min")).otherwise(
        F.least(C("_b_min"), -C("_ug"))
    )
    thwr = F.coalesce(C("_th"), F.lit(0.0)) - F.coalesce(C("_trh"), F.lit(0.0))
    s2 = s1.select("*", mlwu0.alias("_mlwu0"), thwr.alias("_thwr"))
    levels_from_height = F.greatest(
        C("_mlwu0") + 1,
        F.greatest(F.lit(1), (C("_thwr") / C("_d_hpl")).cast("int")),
    )
    building_levels = F.when(
        C("_parsed_levels").isNotNull(),
        F.greatest(F.lit(0), F.ceil(C("_parsed_levels")).cast("int")),
    ).otherwise(
        F.when(
            C("_th").isNotNull() & C("_trh").isNotNull() & (C("_th") <= C("_trh")),
            F.lit(0),
        )
        .when(C("_trh").isNotNull() & (C("_thwr") > 0), levels_from_height)
        .when(C("_mlwu0") > 0, C("_mlwu0") + 1)
        .otherwise(C("_d_levels"))
    )
    s2 = s2.select("*", building_levels.alias("building_levels"))

    # stage 3 — roof height chain (:157-193).  The preliminary height
    # belongs to the Roof object, so it reads the merged-tag columns
    # (_trh_roof / _angle_*); rebuilt here over the staged columns
    # instead of preliminary_roof_height() so the parse subtrees
    # aren't duplicated.
    ridge_dist = F.col(ridge_distance_col) if ridge_distance_col else None
    if ridge_dist is not None:
        # RoofWithRidge.java:229-234 via parseRoofAngle's [0,90) gate
        # (Roof.java:184); SkillionRoof.java:95-99 with its own gate
        ridge_fb = F.when(
            (C("_angle_ridge") >= 0) & (C("_angle_ridge") < 90),
            F.tan(F.radians(C("_angle_ridge"))) * ridge_dist,
        )
        skill_fb = F.when(
            (C("_angle_skill") >= 0) & (C("_angle_skill") < 90),
            F.tan(F.radians(C("_angle_skill"))) * ridge_dist,
        )
        prelim = F.when(
            ~C("roof_shape").isin(*NON_FLAT_SHAPES), F.lit(0.0)
        ).otherwise(
            F.coalesce(
                C("_trh_roof"),
                F.when(C("roof_shape").isin(*RIDGE_SHAPES), ridge_fb).when(
                    C("roof_shape") == "skillion", skill_fb
                ),
            )
        )
    else:
        prelim = F.when(
            ~C("roof_shape").isin(*NON_FLAT_SHAPES), F.lit(0.0)
        ).otherwise(C("_trh_roof"))
    dome_h = (
        (F.col(diameter_col) / F.lit(2.0)).cast("double")
        if diameter_col
        else F.lit(None).cast("double")
    )
    roof_height = F.coalesce(
        # :165-168 — building with only roof levels
        F.coalesce(
            prelim,
            F.when(
                (C("building_levels") == 0)
                & (F.coalesce(C("_th"), F.lit(0.0)) > 0),
                F.coalesce(C("_th"), F.lit(0.0)),
            ),
        ),
        # :170-174 — roof:levels × heightPerLevel (strict Integer.parseInt)
        F.when(C("_has_rl"), C("_d_hpl") * C("_rl_int").cast("double")),
        # :176-183 — dome diameter/2, single-level 1.0, ridge default 5.0
        F.when(C("roof_shape") == "dome", dome_h),
        F.when(C("building_levels") == 1, F.lit(1.0)),
        F.lit(DEFAULT_RIDGE_HEIGHT),
    )
    s3 = s2.select("*", roof_height.alias("roof_height"))
    s3 = s3.select(
        "*",
        F.when(C("roof_height") == 0, F.lit(0))
        .otherwise(C("_rl0"))
        .alias("roof_levels"),
    )

    # stage 4 — min-level clamp (:188-191), height (:196-202)
    s4 = s3.select(
        "*",
        F.when(
            C("building_levels") + C("roof_levels") < C("_mlwu0") + 1,
            C("building_levels") + C("roof_levels") - 1,
        )
        .otherwise(C("_mlwu0"))
        .alias("min_level_wu"),
        F.greatest(
            F.coalesce(
                C("_th"),
                C("building_levels").cast("double") * C("_d_hpl") + C("roof_height"),
            ),
            F.lit(0.01),
        ).alias("height"),
    )
    s4 = s4.select("*", _java_round4(C("height") - C("roof_height")).alias("height_without_roof"))

    # stage 5 — min_height (:204-217)
    hwr = C("height_without_roof")
    # buildingLevels=0 with buildingMinLevel>0 divides by zero in the
    # reference: IEEE gives ±Infinity·minLevel (sign of hwr) or NaN at
    # hwr==0 — encoded explicitly rather than trusting engine /0 rules
    div0 = (
        F.when(hwr > 0, F.lit(float("inf")))
        .when(hwr < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )
    min_height0 = F.coalesce(
        C("_tmh"),
        F.when(
            (C("_b_min") > 0) & (C("building_levels") > 0),
            (hwr / C("building_levels").cast("double")) * C("_b_min").cast("double"),
        ).when((C("_b_min") > 0) & (C("building_levels") == 0), div0),
        F.when(~C("_d_walls"), hwr - F.lit(0.3)),
        F.lit(0.0),
    )
    s5 = s4.select("*", min_height0.alias("_minh0"))
    # :215-217 clamp — Java's `NaN > x` is false (NaN passes through);
    # Spark orders NaN greatest, so the NaN case must bypass the clamp
    min_height = F.when(F.isnan(C("_minh0")), C("_minh0")).otherwise(
        F.when(C("_minh0") > hwr, hwr - F.lit(0.1)).otherwise(C("_minh0"))
    )
    s5 = s5.select("*", min_height.alias("min_height"))

    guard = C("btype").isNotNull()

    def _g(name: str) -> Column:
        return F.when(guard, C(name)).alias(name)

    return s5.select(
        *base_cols,
        "btype",
        _g("roof_shape"),
        _g("building_levels"),
        _g("roof_levels"),
        _g("min_level_wu"),
        _g("height"),
        _g("roof_height"),
        _g("height_without_roof"),
        _g("min_height"),
    )
