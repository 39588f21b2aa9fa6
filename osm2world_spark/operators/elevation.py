"""Elevation post-pass: EleCalculator dispatch + constraint enforcement.

Reference semantics (tordanik/OSM2World):
- config dispatch `eleCalculator()`: conversion/O2WConfig.java:373-378 —
  NoOpEleCalculator | EleTagEleCalculator | ConstraintEleCalculator(
  SimpleEleConstraintEnforcer) | default BridgeTunnelEleCalculator.
- connector graph: map_elevation/data/EleConnector.java:81-85 — two
  connectors connect iff same pos AND (same non-null reference OR both
  groundState==ON).
- SimpleEleConstraintEnforcer (map_elevation/creation/
  SimpleEleConstraintEnforcer.java):
  * addConnectors pairs every connecting pair into a "stiff set"
    (union-find merge, :30-120); sets therefore have >=2 members, and a
    connector in no set is untouched by averaging.
  * enforceConstraints (:147-183): each stiff set takes the average of
    its members' non-null elevations (`orElse(0.0)` when all null) and
    assigns it to every member; then EVERY connector with a non-null
    elevation gets groundState adjustment ABOVE -> +5, BELOW -> -5.
- TagEleCalculator (map_elevation/creation/TagEleCalculator.java:19-45):
  per connector, try the reference node's tags first, then the owning
  object's tags; only overwrite when the calculator yields non-null.
  * EleTagEleCalculator: parseOsmDecimal(tags["ele"])
    (util/ValueParseUtil.java:87-134 — int parse, else ^(-?\\d+)\\.(\\d+)$
    with int-parsed groups).
  * BridgeTunnelEleCalculator (:10-36): bridge -> terrain + 0.1,
    tunnel -> terrain + 0.0; isBridge = has "bridge" != "no"
    (world/modules/BridgeModule.java:53-56), isTunnel = has "tunnel"
    not in ("no", "building_passage") (TunnelModule.java:45-49).

Spark-first shape — the whole pass is Column algebra, no UDF:
every edge requires exact pos equality, so no stiff set ever spans two
positions. Within one position the connection structure has a closed
form: all ON connectors are mutually connected (one "pool"); each
non-null reference is a clique; a reference clique containing at least
one ON member merges into the pool. That turns the union-find into two
window functions sharing one hash exchange:
  1. partitionBy(pos, ref):   does this reference clique touch the pool?
  2. partitionBy(pos, comp):  set size + average elevation per component
Pre-repartitioning on the position key lets Catalyst satisfy both
windows' clustering requirements from the SAME exchange (hash(pos)
clusters every superset key), so the enforcer is one shuffle at any
scale, and
component cardinality ~= row cardinality (no skew: a component is
bounded by the connectors at one exact position).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: SimpleEleConstraintEnforcer.java:175-179
ABOVE_OFFSET = 5.0
BELOW_OFFSET = -5.0

#: BridgeTunnelEleCalculator.java:21-22
BRIDGE_OFFSET = 0.1
TUNNEL_OFFSET = 0.0

_DEC = r"^(-?\d+)\.(\d+)$"  # ValueParseUtil.DEC_POINT_PATTERN :35


def parse_osm_decimal(col: Column) -> Column:
    """OSM decimal parse (ValueParseUtil.parseOsmDecimal :87-134):
    Integer.parseInt first (int32 range, optional sign), else the
    decimal-point pattern with both groups int-parsed (so overlong
    fraction digits overflow to null, like the reference)."""
    as_int = F.when(col.rlike(r"^[+-]?\d+$"), col.try_cast("int"))
    before = F.regexp_extract(col, _DEC, 1).try_cast("int")
    after = F.regexp_extract(col, _DEC, 2)
    after_i = after.try_cast("int")
    dec_val = F.when(
        col.rlike(_DEC) & before.isNotNull() & after_i.isNotNull(),
        F.when(F.regexp_extract(col, _DEC, 1).startswith("-"), F.lit(-1.0))
        .otherwise(F.lit(1.0))
        * (
            F.abs(before).cast("double")
            + after_i.cast("double") * F.pow(F.lit(10.0), -F.length(after))
        ),
    )
    return F.coalesce(as_int.cast("double"), dec_val)


def is_bridge(tags: Column) -> Column:
    """BridgeModule.isBridge(TagSet) :53-56."""
    v = F.element_at(tags, "bridge")
    return v.isNotNull() & (v != "no")


def is_tunnel(tags: Column) -> Column:
    """TunnelModule.isTunnel(TagSet) :45-49."""
    v = F.element_at(tags, "tunnel")
    return v.isNotNull() & (v != "no") & (v != "building_passage")


def _with_components(connectors: DataFrame, repartition: bool = False) -> DataFrame:
    """Adds the stiff-set component key columns (_pos, _comp) — the ONE
    definition of the same-ele relation, shared by the enforcer and the
    validator (EleConnector.connectsTo closed form; see enforce_simple).
    `repartition=True` hash-partitions on the _pos COLUMN between the key
    projection and the windows, so both window specs reuse that single
    exchange (enforce_simple's one-shuffle plan)."""
    df = connectors.withColumn(
        "_pos",
        F.concat_ws(
            ",",
            (F.col("x") + F.lit(0.0)).cast("string"),
            (F.col("z") + F.lit(0.0)).cast("string"),
        ),
    )
    if repartition:
        df = df.repartition("_pos")
    on = F.col("ground_state") == "ON"
    w_ref = Window.partitionBy("_pos", "ref")
    ref_has_on = F.max(F.when(on, F.lit(1)).otherwise(F.lit(0))).over(w_ref)
    return df.withColumn(
        "_comp",
        F.when(F.col("ref").isNotNull() & (ref_has_on == 1), F.lit("P"))
        .when(F.col("ref").isNotNull(), F.concat(F.lit("R:"), F.col("ref")))
        .when(on, F.lit("P"))
        .otherwise(F.concat(F.lit("S:"), F.col("conn_id"))),
    )


def enforce_simple(connectors: DataFrame) -> DataFrame:
    """SimpleEleConstraintEnforcer as one-shuffle window algebra.

    Input columns: conn_id, x, z, ref (nullable string), ground_state
    ('ON' | 'ABOVE' | 'BELOW'), ele (nullable double, terrain-interpolated).
    Output: same rows with `ele` replaced by the enforced elevation.

    Component closed form at one (x, z):
      ref != null & its clique has an ON member -> pool component
      ref != null (no ON member in clique)      -> that reference clique
      ref == null & ON                          -> pool component
      ref == null & not ON                      -> singleton (edge-free)
    Stiff sets are components of size >= 2 (requireSameEle only fires for
    pairs, :40-44); singletons keep their elevation. Averaging ignores
    null elevations and falls back to 0.0 (:155-158); the ABOVE/BELOW
    offset then applies to every non-null elevation (:168-179).
    """
    # one string position key instead of the raw (x, z) doubles: Spark
    # wraps float window keys in normalizenanandzero(), which defeats
    # exchange reuse (the repartition output no longer matches the
    # window's required clustering). `+ 0.0` folds -0.0 into +0.0 first,
    # matching VectorXZ equality; double->string is round-trip exact.
    # Component construction is shared with the validator
    # (_with_components); the _pos-column repartition keeps the
    # one-exchange plan.
    df = _with_components(connectors, repartition=True)

    w_comp = Window.partitionBy("_pos", "_comp")
    n = F.count(F.lit(1)).over(w_comp)
    n_ele = F.count("ele").over(w_comp)  # count skips nulls
    avg_ele = F.avg("ele").over(w_comp)  # avg skips nulls
    stiff_ele = F.when(n_ele > 0, avg_ele).otherwise(F.lit(0.0))
    new_ele = F.when(n >= 2, stiff_ele).otherwise(F.col("ele"))
    adjusted = F.when(
        new_ele.isNotNull(),
        new_ele
        + F.when(F.col("ground_state") == "ABOVE", F.lit(ABOVE_OFFSET))
        .when(F.col("ground_state") == "BELOW", F.lit(BELOW_OFFSET))
        .otherwise(F.lit(0.0)),
    )
    return df.withColumn("ele", adjusted).drop("_comp", "_pos")


def _tag_ele(calculator: str, tags: Column, terrain: Column) -> Column:
    """getEleForTags for the two tag calculators; null = "tags don't
    define the elevation" (TagEleCalculator.java:47-53)."""
    if calculator == "EleTagEleCalculator":
        return parse_osm_decimal(F.element_at(tags, "ele"))
    # BridgeTunnelEleCalculator.java:24-35
    return (
        F.when(is_bridge(tags), terrain + F.lit(BRIDGE_OFFSET))
        .when(is_tunnel(tags), terrain + F.lit(TUNNEL_OFFSET))
        .otherwise(F.lit(None).cast("double"))
    )


def calculate_elevations(
    connectors: DataFrame, calculator: str = "BridgeTunnelEleCalculator"
) -> DataFrame:
    """Config-dispatched elevation calculator (O2WConfig.eleCalculator()
    :373-378; unknown names fall through to BridgeTunnelEleCalculator
    like the reference's `default ->` arm).

    Tag calculators additionally read `ref_tags` (the reference node's
    tags; null when the connector's reference is not a node) and
    `owner_tags` (the owning world object's element tags), both
    map<string,string>. Node tags win when they yield a value
    (TagEleCalculator.java:27-39).
    """
    if calculator == "NoOpEleCalculator":
        return connectors
    if calculator == "ConstraintEleCalculator":
        return enforce_simple(connectors)

    terrain = F.col("ele")
    from_node = F.when(
        F.col("ref_tags").isNotNull(), _tag_ele(calculator, F.col("ref_tags"), terrain)
    )
    from_owner = _tag_ele(calculator, F.col("owner_tags"), terrain)
    return connectors.withColumn(
        "ele", F.coalesce(from_node, from_owner, terrain)
    )


# -------------------------------------------------- validator + zero interp

def zero_interpolate(queries: DataFrame, sites: DataFrame | None = None, **_) -> DataFrame:
    """ZeroInterpolator (map_elevation/creation/ZeroInterpolator.java):
    every query point gets elevation 0.0; known sites are ignored. The
    trivial arm of the TerrainInterpolator strategy matrix."""
    return queries.withColumn("ele", F.lit(0.0))


def validate_constraints(
    connectors: DataFrame,
    vertical: DataFrame | None = None,
    smoothness: DataFrame | None = None,
) -> DataFrame:
    """EleConstraintValidator (map_elevation/creation/
    EleConstraintValidator.java:24-185): a pass-through wrapper's CHECKS as
    data — it does not change elevations (use validated_enforce for the
    wrapped pass-through), it returns one row per detected contradiction.

    - `vertical` (upper, lower, ctype in MIN|MAX|EXACT, distance):
      a vertical-distance constraint between two connectors that the
      same-ele relation already forces equal is contradictory
      ("vertical distance despite same ele", :100-116 — only constraints
      that actually separate the pair count: type != MAX with distance > 0
      or type != MIN with distance < 0).
    - `smoothness` (c1, c2, c3): triples whose incline change per meter
      exceeds the reference's threshold (|inc2 - inc1| / dist > 200,
      :150-173) are logged.

    The same-ele relation is the SimpleEleConstraintEnforcer component
    (same position AND (shared reference clique or both ON)), size >= 2 —
    exactly the stiff sets enforce_simple averages over. Output columns:
    kind, c1, c2, detail."""
    df = _with_components(connectors)
    w_comp = Window.partitionBy("_pos", "_comp")
    comp = df.select(
        "conn_id",
        F.concat_ws("|", "_pos", "_comp").alias("comp_key"),
        (F.count(F.lit(1)).over(w_comp) >= 2).alias("in_stiff_set"),
        "x",
        "z",
        F.col("ele").alias("_y"),
    )

    spark = connectors.sparkSession
    warnings = None

    if vertical is not None:
        separating = (
            ((F.col("ctype") != "MAX") & (F.col("distance") > 0))
            | ((F.col("ctype") != "MIN") & (F.col("distance") < 0))
        )
        cu = comp.select(
            F.col("conn_id").alias("upper"),
            F.col("comp_key").alias("_ku"),
            F.col("in_stiff_set").alias("_su"),
        )
        cl = comp.select(
            F.col("conn_id").alias("lower"),
            F.col("comp_key").alias("_kl"),
            F.col("in_stiff_set").alias("_sl"),
        )
        bad = (
            vertical.where(separating)
            .join(cu, "upper")
            .join(cl, "lower")
            .where(F.col("_su") & F.col("_sl") & (F.col("_ku") == F.col("_kl")))
            .select(
                F.lit("vertical distance despite same ele").alias("kind"),
                F.col("upper").alias("c1"),
                F.col("lower").alias("c2"),
                F.concat(F.col("ctype"), F.lit(" "), F.col("distance").cast("string")).alias("detail"),
            )
        )
        warnings = bad

    if smoothness is not None:
        pts = comp.select("conn_id", "x", "z", "_y")

        def _pt(alias):
            return pts.select(
                F.col("conn_id").alias(alias),
                F.col("x").alias(f"{alias}_x"),
                F.col("z").alias(f"{alias}_z"),
                F.col("_y").alias(f"{alias}_y"),
            )

        t = (
            smoothness.join(_pt("c1"), "c1").join(_pt("c2"), "c2").join(_pt("c3"), "c3")
        )
        d12 = F.sqrt(
            (F.col("c2_x") - F.col("c1_x")) ** 2 + (F.col("c2_z") - F.col("c1_z")) ** 2
        )
        d23 = F.sqrt(
            (F.col("c3_x") - F.col("c2_x")) ** 2 + (F.col("c3_z") - F.col("c2_z")) ** 2
        )
        inc1 = (F.col("c2_y") - F.col("c1_y")) / d12
        inc2 = (F.col("c3_y") - F.col("c2_y")) / d23
        d13 = F.sqrt(
            (F.col("c3_x") - F.col("c1_x")) ** 2 + (F.col("c3_z") - F.col("c1_z")) ** 2
        )
        rough = (
            t.where(F.abs(inc2 - inc1) / d13 > 200.0)
            .select(
                F.lit("smoothness").alias("kind"),
                F.col("c1"),
                F.col("c3").alias("c2"),
                F.concat(
                    F.round(F.abs(inc2 - inc1) * 100, 1).cast("string"),
                    F.lit("% over "),
                    F.round(d13, 1).cast("string"),
                    F.lit("m"),
                ).alias("detail"),
            )
        )
        warnings = rough if warnings is None else warnings.unionByName(rough)

    if warnings is None:
        warnings = spark.createDataFrame([], "kind string, c1 string, c2 string, detail string")
    return warnings


def validated_enforce(
    connectors: DataFrame,
    vertical: DataFrame | None = None,
    smoothness: DataFrame | None = None,
    enforcer=None,
    with_warnings: bool = False,
):
    """The EleConstraintValidator wrapper proper: pass every call through
    to the wrapped enforcer (default SimpleEleConstraintEnforcer). By
    default returns the enforced DataFrame — the same contract as every
    other ele_enforcer strategy, so registry dispatch is uniform;
    `with_warnings=True` additionally returns the contradiction rows as
    (enforced, warnings)."""
    inner = enforcer or enforce_simple
    enforced = inner(connectors)
    if with_warnings:
        return enforced, validate_constraints(connectors, vertical, smoothness)
    return enforced
