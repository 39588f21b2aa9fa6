"""roughlyContains (GeometryUtil.java:313-323) — tolerance containment,
the faithful vertex-rule FIXME, holes, and exact-vertex membership."""


def _rect(x0, z0, x1, z1):
    return [[x0, z0, x1, z0, x1, z1, x0, z1, x0, z0]]


def _run(spark, rows):
    from osm2world_spark.operators.boolean import roughly_contains

    df = spark.createDataFrame(
        rows, "pair_id string, a_geom array<array<double>>, b_geom array<array<double>>"
    )
    return {r["pair_id"]: r for r in roughly_contains(df).collect()}


def test_roughly_contains_threshold_sweep(spark):
    a = _rect(0.0, 0.0, 100.0, 80.0)
    rows = [
        ("inside", a, _rect(10.0, 10.0, 40.0, 35.0)),
        # 0.2 of 30 wide sticks out: frac = 0.2/30 = 0.00667 < 0.01
        ("sliver", a, _rect(70.2, 10.0, 100.2, 35.0)),
        # 1 of 30 out: frac = 0.0333 > 0.01
        ("over", a, _rect(71.0, 10.0, 101.0, 35.0)),
        ("half", a, _rect(85.0, 10.0, 115.0, 35.0)),
        ("disjoint", a, _rect(200.0, 10.0, 230.0, 35.0)),
    ]
    got = _run(spark, rows)
    assert got["inside"]["contains"] and got["inside"]["roughly_contains"]
    assert got["inside"]["outside_frac"] == 0.0
    assert not got["sliver"]["contains"] and got["sliver"]["roughly_contains"]
    assert abs(got["sliver"]["outside_frac"] - 0.2 / 30) < 1e-9
    assert not got["over"]["roughly_contains"]
    assert abs(got["over"]["outside_frac"] - 1.0 / 30) < 1e-9
    assert abs(got["half"]["outside_frac"] - 0.5) < 1e-9
    assert abs(got["disjoint"]["outside_frac"] - 1.0) < 1e-9
    assert not got["disjoint"]["roughly_contains"]


def test_vertex_rule_fixme_is_faithful(spark):
    # U-shaped a; b spans the notch: all 4 vertices inside the arms but
    # the top edge crosses the notch region OUTSIDE a. The reference's
    # vertex rule still reports contains=true — reproduced faithfully.
    u = [[0.0, 0.0, 30.0, 0.0, 30.0, 20.0, 20.0, 20.0, 20.0, 5.0,
          10.0, 5.0, 10.0, 20.0, 0.0, 20.0, 0.0, 0.0]]
    b = _rect(2.0, 1.0, 28.0, 4.0)          # fully inside the base: control
    bridge = _rect(2.0, 10.0, 28.0, 18.0)   # vertices in both arms
    got = _run(spark, [("control", u, b), ("bridge", u, bridge)])
    assert got["control"]["contains"]
    assert got["bridge"]["contains"]  # the documented FIXME behavior


def test_holes_block_containment(spark):
    # a = square with a central hole; b sits inside the hole
    a = [
        [0.0, 0.0, 100.0, 0.0, 100.0, 100.0, 0.0, 100.0, 0.0, 0.0],
        [40.0, 40.0, 60.0, 40.0, 60.0, 60.0, 40.0, 60.0, 40.0, 40.0],
    ]
    got = _run(spark, [
        ("in_hole", a, _rect(45.0, 45.0, 55.0, 55.0)),
        ("in_solid", a, _rect(5.0, 5.0, 20.0, 20.0)),
    ])
    assert not got["in_hole"]["contains"]
    assert abs(got["in_hole"]["outside_frac"] - 1.0) < 1e-9
    assert got["in_solid"]["contains"]


def test_exact_vertex_membership_counts_as_inside(spark):
    # b shares a's corner vertex (on the loop, PIP would say outside);
    # the reference's vertexLoop.contains(v) branch admits it
    a = _rect(0.0, 0.0, 50.0, 50.0)
    b = [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]]
    got = _run(spark, [("corner", a, b)])
    assert got["corner"]["contains"]
