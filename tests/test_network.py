"""Network calculation (NetworkCalculator.java): node classes, connector
bisector cuts, junction cut geometry on hand-checkable scenes, and
connected components vs a brute union-find."""

import math

import pytest
from pyspark.sql import functions as F

SEG_SCHEMA = "seg_id string, x1 double, z1 double, x2 double, z2 double, width double"


def _segs(spark, rows):
    return spark.createDataFrame(rows, SEG_SCHEMA)


def test_node_degrees_and_kinds(spark):
    from osm2world_spark.operators.network import node_degrees

    # a 4-way cross at (0,0), one arm continuing to a dead end
    segs = _segs(spark, [
        ("n", 0.0, 0.0, 0.0, 10.0, 4.0),
        ("s", 0.0, -10.0, 0.0, 0.0, 4.0),
        ("e", 0.0, 0.0, 10.0, 0.0, 4.0),
        ("w", -10.0, 0.0, 0.0, 0.0, 4.0),
        ("n2", 0.0, 10.0, 0.0, 20.0, 4.0),
    ])
    got = {r["node"]: (r["degree"], r["kind"]) for r in node_degrees(segs).collect()}
    assert got["0.0,0.0"] == (4, "junction")
    assert got["0.0,10.0"] == (2, "connector")
    assert got["0.0,20.0"] == (1, "end")
    assert got["0.0,-10.0"] == (1, "end")


def test_connector_cut_straight_line(spark):
    """Two collinear segments: inVector == outVector -> cut vector is the
    rightNormal, cut triple spans the width across the node."""
    from osm2world_spark.operators.network import connector_cuts

    segs = _segs(spark, [
        ("a", 0.0, 0.0, 10.0, 0.0, 4.0),   # west arm, inbound at node
        ("b", 10.0, 0.0, 20.0, 0.0, 4.0),  # east arm, outbound at node
    ])
    rows = {r["seg_id"]: r for r in connector_cuts(segs).where(F.col("node") == "10.0,0.0").collect()}
    assert set(rows) == {"a", "b"}
    # clockwise-from-+Z angle order at the node: away_b = (1,0) (pi/2)
    # sorts before away_a = (-1,0) (3pi/2), so s1 = b, s2 = a. Then
    # inVector = -away_b = (-1,0) == outVector = away_a -> cut =
    # rightNormal((-1,0)) = (0,1); cross (-0)*0 - (-1)*1 > 0, no flip.
    a = rows["a"]
    assert a["side"] == "end"
    assert (a["cut_x"], a["cut_z"]) == (0.0, 1.0)
    # a is segment2, inbound -> sign -1: toRight = (0,-2);
    # left = center - toRight
    assert (a["left_x"], a["left_z"]) == (10.0, 2.0)
    assert (a["right_x"], a["right_z"]) == (10.0, -2.0)
    b = rows["b"]
    assert b["side"] == "start"
    # b is segment1, outbound -> sign -1: same toRight
    assert (b["left_x"], b["left_z"]) == (10.0, 2.0)
    assert (b["right_x"], b["right_z"]) == (10.0, -2.0)


def test_connector_cut_right_angle_bisector(spark):
    """An L-corner: the cut is the normalized bisector of the two
    directions, pointing right of the inbound direction."""
    from osm2world_spark.operators.network import connector_cuts

    segs = _segs(spark, [
        ("a", 0.0, 0.0, 10.0, 0.0, 2.0),    # +x into the corner
        ("b", 10.0, 0.0, 10.0, 10.0, 2.0),  # +z out of the corner
    ])
    rows = {r["seg_id"]: r for r in connector_cuts(segs).collect()}
    # angle ordering at (10,0): away_a = (-1,0) angle 3pi/2; away_b =
    # (0,1) angle 0 -> s1 = b, s2 = a. inVector = -away_b = (0,-1),
    # outVector = away_a = (-1,0). cut0 = normalize((-1,0) - (0,-1)) =
    # (-1,1)/sqrt2. cross: ivz*cx - ivx*cz = (-1)(-1/sqrt2) > 0, no flip.
    s = 1.0 / math.sqrt(2.0)
    a = rows["a"]
    assert a["cut_x"] == pytest.approx(-s)
    assert a["cut_z"] == pytest.approx(s)
    # a is segment2 (s2), inbound -> sign -1: toRight = cut * 1 * -1
    assert a["left_x"] == pytest.approx(10.0 - s)
    assert a["left_z"] == pytest.approx(0.0 + s)
    b = rows["b"]
    # b is segment1, outbound -> sign -1 as well
    assert b["left_x"] == pytest.approx(10.0 - s)
    assert b["left_z"] == pytest.approx(0.0 + s)


def test_junction_symmetric_cross(spark):
    """A symmetric 4-way cross of width-4 roads: every cut sits width/2
    behind the node along its arm, interfaces span the width."""
    from osm2world_spark.operators.network import junction_cuts

    segs = _segs(spark, [
        ("n", 0.0, 0.0, 0.0, 10.0, 4.0),
        ("s", 0.0, -10.0, 0.0, 0.0, 4.0),
        ("e", 0.0, 0.0, 10.0, 0.0, 4.0),
        ("w", -10.0, 0.0, 0.0, 0.0, 4.0),
    ])
    rows = {r["seg_id"]: r for r in junction_cuts(segs).collect()}
    assert len(rows) == 4
    # neighbor-edge intersections of perpendicular width-4 roads sit at
    # (+-2, +-2); each arm's cut point is the projection farthest back:
    # 2 m along the arm away from the node
    want = {
        "n": (0.0, 2.0),
        "s": (0.0, -2.0),
        "e": (2.0, 0.0),
        "w": (-2.0, 0.0),
    }
    for seg, (cx, cz) in want.items():
        r = rows[seg]
        assert r["cut_x"] == pytest.approx(cx), seg
        assert r["cut_z"] == pytest.approx(cz), seg
        # interface spans width 4 perpendicular to the arm
        span = math.hypot(r["right_x"] - r["left_x"], r["right_z"] - r["left_z"])
        assert span == pytest.approx(4.0), seg
        # contact points are equidistant from the cut point
        dl = math.hypot(r["left_x"] - cx, r["left_z"] - cz)
        assert dl == pytest.approx(2.0), seg


def test_junction_parallel_arms_skip_intersection(spark):
    """A T-junction where two arms are collinear: their mutual edge
    intersection is skipped (parallel threshold), cuts fall back to the
    projections that exist."""
    from osm2world_spark.operators.network import junction_cuts

    segs = _segs(spark, [
        ("w", -10.0, 0.0, 0.0, 0.0, 4.0),
        ("e", 0.0, 0.0, 10.0, 0.0, 4.0),
        ("n", 0.0, 0.0, 0.0, 10.0, 2.0),
    ])
    rows = {r["seg_id"]: r for r in junction_cuts(segs).collect()}
    assert len(rows) == 3
    # the north arm must be cut behind the edge of the E-W road (|z| = 2)
    assert rows["n"]["cut_z"] == pytest.approx(2.0)
    assert rows["n"]["cut_x"] == pytest.approx(0.0)
    # east/west arms cut behind the north road's edge (|x| = 1)
    assert abs(rows["e"]["cut_x"]) == pytest.approx(1.0)
    assert abs(rows["w"]["cut_x"]) == pytest.approx(1.0)


def test_connected_components_vs_union_find(spark):
    from osm2world_spark.operators.network import connected_components

    import random

    rng = random.Random(11)
    rows = []
    # 12 chains/cycles over a grid of integer nodes, plus isolated segs
    nodes = [(float(i % 20), float(i // 20)) for i in range(80)]
    for s in range(60):
        i = rng.randrange(len(nodes))
        j = (i + rng.choice([1, 2, 20])) % len(nodes)
        rows.append((f"s{s}", *nodes[i], *nodes[j], 2.0))
    segs = _segs(spark, rows)
    got = {r["node"]: r["component"] for r in connected_components(segs, max_rounds=100).collect()}

    # brute union-find over the same edges
    parent = {}

    def find(k):
        parent.setdefault(k, k)
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    def key(x, z):
        return f"{x},{z}"

    for _, x1, z1, x2, z2, _w in rows:
        a, b = find(key(x1, z1)), find(key(x2, z2))
        if a != b:
            parent[a] = b

    comps = {}
    for k in list(parent):
        comps.setdefault(find(k), set()).add(k)
    want = {}
    for members in comps.values():
        lbl = min(members)
        for m in members:
            want[m] = lbl
    assert got == want


def test_hop_distances_bfs(spark):
    from osm2world_spark.operators.network import hop_distances

    # path 1-2-3-4-5 plus disconnected 9-10; seed at node 1
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)]]
        + [(b, a) for a, b in [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)]],
        "src bigint, dst bigint",
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["hops"] for r in hop_distances(edges, seeds, max_hops=8).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # 9/10 unreachable -> absent

    # max_hops truncates the frontier
    got3 = {r["node"]: r["hops"] for r in hop_distances(edges, seeds, max_hops=2).collect()}
    assert got3 == {1: 0, 2: 1, 3: 2}

    # multi-source takes the minimum over seeds
    seeds2 = spark.createDataFrame([(1,), (5,)], "node bigint")
    got2 = {r["node"]: r["hops"] for r in hop_distances(edges, seeds2, max_hops=8).collect()}
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_weighted_distances_relaxation(spark):
    from osm2world_spark.operators.network import weighted_distances

    # diamond: 1->2 (w=1), 1->3 (w=10), 2->3 (w=1), 3->4 (w=1); symmetric
    raw = [(1, 2, 1.0), (1, 3, 10.0), (2, 3, 1.0), (3, 4, 1.0)]
    edges = spark.createDataFrame(
        raw + [(b, a, w) for a, b, w in raw], "src bigint, dst bigint, w double"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["dist"] for r in weighted_distances(edges, seeds).collect()}
    # shortest to 3 goes around via 2 (1+1=2), NOT the direct w=10 edge
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 3.0}

    # a later round must re-improve a node settled too high in an earlier
    # round (Bellman-Ford, not BFS): direct edge relaxes 3 to 10 in round
    # 1, the 2-hop path lowers it to 2 in round 2 -> 4 must see 3.0 not 11
    seeds2 = spark.createDataFrame([(1,), (4,)], "node bigint")
    got2 = {r["node"]: r["dist"] for r in weighted_distances(edges, seeds2).collect()}
    assert got2 == {1: 0.0, 4: 0.0, 2: 1.0, 3: 1.0}


def test_shortcut_converges_in_log_rounds(spark):
    # a 400-node path: min-label alone moves the min 1 hop/round and
    # cannot finish in 12 rounds; pointer doubling must
    from osm2world_spark.operators.network import components_from_edges
    from pyspark.sql import functions as F

    n = 400
    nodes = spark.range(n).select(F.col("id").alias("node"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    fast = components_from_edges(edges, nodes, max_rounds=12, shortcut=True)
    assert fast.select("label").distinct().count() == 1
    slow = components_from_edges(edges, nodes, max_rounds=12, shortcut=False)
    assert slow.select("label").distinct().count() > 1
