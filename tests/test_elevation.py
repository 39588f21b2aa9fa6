"""Elevation post-pass: SimpleEleConstraintEnforcer closed form + the
EleCalculator dispatch (O2WConfig.java:373-378). The synthetic profile
exercises every merge rule of EleConnector.connectsTo (EleConnector.java:
81-85) and the averaging/offset arms of SimpleEleConstraintEnforcer
(SimpleEleConstraintEnforcer.java:147-183)."""

import math

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.elevation import (
    calculate_elevations,
    enforce_simple,
    parse_osm_decimal,
)

SCHEMA = "conn_id string, x double, z double, ref string, ground_state string, ele double"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["conn_id"]: r["ele"] for r in enforce_simple(df).collect()}


def test_on_pool_averages(spark):
    # two ON connectors at the same pos, no refs -> one stiff set, averaged
    out = _run(spark, [
        ("a", 1.0, 1.0, None, "ON", 10.0),
        ("b", 1.0, 1.0, None, "ON", 20.0),
        ("c", 2.0, 1.0, None, "ON", 99.0),  # different pos: untouched
    ])
    assert out["a"] == out["b"] == 15.0
    assert out["c"] == 99.0


def test_ref_clique_without_on_stays_separate(spark):
    # same pos: an ON pool and a ref clique whose members are ABOVE/BELOW
    # (not ON) -> two separate stiff sets; ABOVE/BELOW offsets then apply
    out = _run(spark, [
        ("p1", 0.0, 0.0, None, "ON", 4.0),
        ("p2", 0.0, 0.0, None, "ON", 8.0),
        ("r1", 0.0, 0.0, "w7", "ABOVE", 100.0),
        ("r2", 0.0, 0.0, "w7", "BELOW", 200.0),
    ])
    assert out["p1"] == out["p2"] == 6.0
    assert out["r1"] == 150.0 + 5.0
    assert out["r2"] == 150.0 - 5.0


def test_ref_clique_with_on_member_merges_into_pool(spark):
    # the ref clique contains one ON member -> whole clique joins the ON
    # pool (transitively through requireSameEle), one average over all 4
    out = _run(spark, [
        ("p1", 0.0, 0.0, None, "ON", 0.0),
        ("r1", 0.0, 0.0, "w1", "ON", 8.0),     # bridges pool and clique
        ("r2", 0.0, 0.0, "w1", "ABOVE", 16.0),
        ("r3", 0.0, 0.0, "w1", "BELOW", 24.0),
    ])
    assert out["p1"] == out["r1"] == 12.0
    assert out["r2"] == 17.0
    assert out["r3"] == 7.0


def test_singletons_untouched_but_offset(spark):
    # no connecting partner -> no stiff set -> elevation kept, offsets
    # still applied (enforceConstraints' final loop covers ALL connectors)
    out = _run(spark, [
        ("s1", 5.0, 5.0, None, "ABOVE", 50.0),
        ("s2", 6.0, 6.0, None, "BELOW", 50.0),
        ("s3", 7.0, 7.0, "w9", "ABOVE", 50.0),  # lone ref member
        ("s4", 8.0, 8.0, None, "ON", None),     # null ele: stays null
    ])
    assert out["s1"] == 55.0
    assert out["s2"] == 45.0
    assert out["s3"] == 55.0
    assert out["s4"] is None


def test_all_null_stiff_set_falls_back_to_zero(spark):
    # average().orElse(0.0) (:155-158): a stiff set with only null
    # elevations is pinned to 0.0, then offset
    out = _run(spark, [
        ("a", 0.0, 0.0, None, "ON", None),
        ("b", 0.0, 0.0, None, "ON", None),
        ("c", 0.0, 0.0, "w2", "ON", None),   # joins the pool via ON
        ("d", 0.0, 0.0, "w2", "ABOVE", None),
    ])
    assert out["a"] == out["b"] == out["c"] == 0.0
    assert out["d"] == 5.0


def test_partial_null_average_skips_nulls(spark):
    out = _run(spark, [
        ("a", 0.0, 0.0, None, "ON", 10.0),
        ("b", 0.0, 0.0, None, "ON", None),
        ("c", 0.0, 0.0, None, "ON", 20.0),
    ])
    assert out["a"] == out["b"] == out["c"] == 15.0


def test_parse_osm_decimal(spark):
    cases = [
        ("12", 12.0), ("-7", -7.0), ("+3", 3.0),
        ("12.5", 12.5), ("-0.25", -0.25), ("0.075", 0.075),
        ("12,5", None), ("ele", None), ("", None), (None, None),
        ("1.2345678901234", None),  # fraction group overflows int32
        ("99999999999", None),      # int32 overflow, no decimal match
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "v string")
    got = [r[0] for r in df.select(parse_osm_decimal(F.col("v"))).collect()]
    for (raw, want), g in zip(cases, got):
        if want is None:
            assert g is None, raw
        else:
            assert g == pytest.approx(want), raw


def test_calculator_dispatch(spark):
    rows = [
        # conn_id, x, z, ref, gs, ele, ref_tags, owner_tags
        ("n_ele", 0.0, 0.0, "n1", "ON", 7.0, {"ele": "123.5"}, {}),
        ("o_bridge", 1.0, 0.0, None, "ON", 7.0, None, {"bridge": "yes"}),
        ("o_bridge_no", 2.0, 0.0, None, "ON", 7.0, None, {"bridge": "no"}),
        ("o_tunnel", 3.0, 0.0, None, "ON", 7.0, None, {"tunnel": "culvert"}),
        ("o_passage", 4.0, 0.0, None, "ON", 7.0, None, {"tunnel": "building_passage"}),
        ("plain", 5.0, 0.0, None, "ON", 7.0, {}, {}),
        # node tags win over owner tags when they parse
        ("both", 6.0, 0.0, "n2", "ON", 7.0, {"ele": "1.5"}, {"bridge": "yes"}),
        # node tags present but unparseable -> owner tags consulted
        ("bad_node", 7.0, 0.0, "n3", "ON", 7.0, {"ele": "high"}, {"bridge": "yes"}),
    ]
    schema = (
        "conn_id string, x double, z double, ref string, ground_state string, "
        "ele double, ref_tags map<string,string>, owner_tags map<string,string>"
    )
    df = spark.createDataFrame(rows, schema)

    bt = {r["conn_id"]: r["ele"] for r in calculate_elevations(df).collect()}
    assert bt["o_bridge"] == pytest.approx(7.1)
    assert bt["o_bridge_no"] == 7.0
    assert bt["o_tunnel"] == 7.0  # tunnel offset is 0.0
    assert bt["o_passage"] == 7.0
    assert bt["plain"] == 7.0
    assert bt["bad_node"] == pytest.approx(7.1)

    et = {
        r["conn_id"]: r["ele"]
        for r in calculate_elevations(df, "EleTagEleCalculator").collect()
    }
    assert et["n_ele"] == 123.5
    assert et["both"] == 1.5
    assert et["plain"] == 7.0  # no ele tag anywhere -> terrain kept

    noop = {
        r["conn_id"]: r["ele"]
        for r in calculate_elevations(df, "NoOpEleCalculator").collect()
    }
    assert noop == {r[0]: r[5] for r in rows}


def test_constraint_calculator_is_simple_enforcer(spark):
    rows = [
        ("a", 0.0, 0.0, None, "ON", 10.0, None, None),
        ("b", 0.0, 0.0, None, "ON", 30.0, None, None),
    ]
    schema = (
        "conn_id string, x double, z double, ref string, ground_state string, "
        "ele double, ref_tags map<string,string>, owner_tags map<string,string>"
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r["conn_id"]: r["ele"]
        for r in calculate_elevations(df, "ConstraintEleCalculator").collect()
    }
    assert out["a"] == out["b"] == 20.0


def test_enforcer_single_shuffle_plan(spark):
    """Both windows must reuse the one hash(x, z) exchange — the enforcer
    is a single-shuffle pass at any scale."""
    df = spark.createDataFrame(
        [("a", 1.0, 2.0, None, "ON", 1.0)], SCHEMA
    )
    plan = enforce_simple(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_random_profile_matches_bruteforce(spark):
    """Union-find brute force over connectsTo pairs == the closed form."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(300):
        x = float(rng.randrange(6))
        z = float(rng.randrange(3))
        ref = rng.choice([None, "r1", "r2", "r3"])
        gs = rng.choice(["ON", "ON", "ABOVE", "BELOW"])
        ele = rng.choice([None, float(rng.randrange(100))])
        rows.append((f"c{i}", x, z, ref, gs, ele))

    # brute force: reference union-find over all connecting pairs
    parent = list(range(len(rows)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    in_set = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if (a[1], a[2]) != (b[1], b[2]):
                continue
            if (a[3] is not None and a[3] == b[3]) or (
                a[4] == "ON" and b[4] == "ON"
            ):
                in_set.add(i)
                in_set.add(j)
                parent[find(i)] = find(j)

    comps = {}
    for i in in_set:
        comps.setdefault(find(i), []).append(i)
    want = {}
    for i, r in enumerate(rows):
        ele = r[5]
        root = find(i)
        if i in in_set:
            eles = [rows[j][5] for j in comps[root] if rows[j][5] is not None]
            ele = sum(eles) / len(eles) if eles else 0.0
        if ele is not None:
            ele += {"ABOVE": 5.0, "BELOW": -5.0}.get(r[4], 0.0)
        want[r[0]] = ele

    got = _run(spark, rows)
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(want[k]), k


def test_zero_interpolator(spark):
    from osm2world_spark import registry
    from osm2world_spark.operators.elevation import zero_interpolate

    q = spark.createDataFrame([(1, 2.0, 3.0), (2, 4.0, 5.0)], "q_id int, x double, z double")
    out = zero_interpolate(q).collect()
    assert all(r.ele == 0.0 for r in out)
    assert registry.resolve("interpolator", "ZeroInterpolator") is zero_interpolate


def test_constraint_validator_flags_contradiction(spark):
    """EleConstraintValidator: a MIN vertical-distance constraint between
    two connectors forced equal by the same-ele relation is contradictory
    (EleConstraintValidator.java:100-116)."""
    from osm2world_spark import registry
    from osm2world_spark.operators.elevation import (
        validate_constraints,
        validated_enforce,
    )

    conns = spark.createDataFrame(
        [
            # a and b: same position, both ON -> one stiff set (same ele)
            ("a", 0.0, 0.0, None, "ON", 10.0),
            ("b", 0.0, 0.0, None, "ON", 12.0),
            # c: far away singleton
            ("c", 9.0, 9.0, None, "ON", 5.0),
        ],
        "conn_id string, x double, z double, ref string, ground_state string, ele double",
    )
    vertical = spark.createDataFrame(
        [
            ("a", "b", "MIN", 2.0),   # contradiction: same ele but must differ
            ("a", "c", "MIN", 2.0),   # fine: different stiff sets
            ("a", "b", "MAX", 2.0),   # fine: MAX with positive distance doesn't separate
        ],
        "upper string, lower string, ctype string, distance double",
    )
    warns = validate_constraints(conns, vertical=vertical).collect()
    assert len(warns) == 1
    assert warns[0].kind == "vertical distance despite same ele"
    assert {warns[0].c1, warns[0].c2} == {"a", "b"}

    # wrapper passes the enforcement through unchanged
    enforced, warns2 = validated_enforce(conns, vertical=vertical, with_warnings=True)
    # uniform registry contract: the default call returns ONE DataFrame
    assert hasattr(validated_enforce(conns), "columns")
    eles = {r.conn_id: r.ele for r in enforced.collect()}
    assert eles["a"] == eles["b"] == 11.0  # stiff-set average
    assert eles["c"] == 5.0
    assert warns2.count() == 1
    assert registry.resolve("ele_enforcer", "EleConstraintValidator") is validated_enforce


def test_constraint_validator_smoothness_log(spark):
    from osm2world_spark.operators.elevation import validate_constraints

    conns = spark.createDataFrame(
        [
            # sharp kink: inclines -/+ huge over a tiny horizontal span
            ("p", 0.000, 0.0, None, "ON", 0.0),
            ("q", 0.001, 0.0, None, "ON", 5.0),
            ("r", 0.002, 0.0, None, "ON", 0.0),
            # gentle triple
            ("u", 0.0, 5.0, None, "ON", 0.0),
            ("v", 10.0, 5.0, None, "ON", 1.0),
            ("w", 20.0, 5.0, None, "ON", 2.0),
        ],
        "conn_id string, x double, z double, ref string, ground_state string, ele double",
    )
    triples = spark.createDataFrame(
        [("p", "q", "r"), ("u", "v", "w")], "c1 string, c2 string, c3 string"
    )
    warns = validate_constraints(conns, smoothness=triples).collect()
    assert len(warns) == 1
    assert warns[0].kind == "smoothness"
    assert warns[0].c1 == "p" and warns[0].c2 == "r"
