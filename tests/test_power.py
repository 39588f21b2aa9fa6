"""operators/power.py vs hand-derived expectations from
PowerModule.java:66-99,399-490."""

import pytest

from osm2world_spark.operators.power import power_cable_runs, tower_flags

_SEGS = "seg_id string, start_node int, end_node int, tags map<string,string>"
_NODES = "node_id int, tags map<string,string>"


def _frames(spark):
    segs = spark.createDataFrame(
        [
            ("s1", 1, 2, {"power": "line", "cables": "3"}),
            ("s2", 2, 3, {"power": "line", "cables": "8", "voltage": "220000"}),
            ("s3", 3, 4, {"power": "line", "cables": "8", "voltage": "220000"}),
            ("s4", 4, 5, {"power": "line"}),
            ("s5", 5, 6, {"power": "minor_line", "cables": "2"}),
            ("s6", 7, 8, {"power": "line", "cables": "2"}),
            ("s7", 8, 9, {"power": "line", "cables": "5"}),
            ("s8", 9, 10, {"power": "line", "cables": "12", "voltage": "60000"}),
            ("s9", 11, 12, {"power": "line", "cables": "bad"}),
        ],
        _SEGS,
    )
    nodes = spark.createDataFrame(
        [(i, {"height": "10"} if i == 1 else {}) for i in range(1, 13)], _NODES
    )
    return segs, nodes


def test_tower_flags(spark):
    segs, _ = _frames(spark)
    got = {r["node_id"]: r for r in tower_flags(segs).collect()}
    # node 2 touches s1 (cables 3) and s2 (voltage 220000) -> high
    assert got[2]["is_high"] is True and got[2]["voltage_n"] == 220000
    # node 7/8 only touch low lines
    assert got[7]["is_high"] is False
    # cables >= 6 alone makes a tower high (s8)
    assert got[9]["is_high"] is True and got[9]["cables_n"] == 12
    # minor_line is not a power line: node 6 only via s5 -> absent
    assert 6 not in got
    # unparseable cables -> -1
    assert got[11]["cables_n"] == -1 and got[11]["is_high"] is False


def test_cable_runs(spark):
    segs, nodes = _frames(spark)
    out = power_cable_runs(segs, nodes)
    rows = {}
    for r in out.collect():
        rows.setdefault(r["seg_id"], []).append(r)
    for v in rows.values():
        v.sort(key=lambda r: r["run_idx"])

    # s4 (no cables), s5 (minor_line), s9 (unparseable) emit nothing
    assert set(rows) == {"s1", "s2", "s3", "s6", "s7", "s8"}

    # s6: normal, cables=2 -> exactly the two top runs at default height
    s6 = rows["s6"]
    assert [r["right"] for r in s6] == [2.0, -2.0]
    # y = (14 + 0.25 - 0.5) + 0.5
    assert all(r["y_start"] == pytest.approx(14.25, abs=0) for r in s6)
    assert s6[0]["n_runs"] == 2 and s6[0]["is_high_i"] == 0

    # s7: cables=5 -> 2 + center + 2 low runs; node 9 is high BUT the
    # branch keys on endpoint towers: node 8 low, node 9 high -> HIGH
    s7 = rows["s7"]
    assert s7[0]["is_high_i"] == 1

    # s6 stays normal (nodes 7, 8 both low)

    # s1: high branch via node 2; own voltage -1 -> default 30 / width 13
    s1 = rows["s1"]
    assert s1[0]["is_high_i"] == 1 and s1[0]["n_runs"] == 3
    # node 1 height=10: quantised 2.5*((int(10/2.5))//5) = 0
    assert s1[0]["right"] == 0.0 and s1[0]["y_start"] == pytest.approx(-0.5, abs=0)
    # node 2 untagged -> 30 -> quantised 2.5*(12//5) = 5 -> top 24.5
    assert s1[0]["y_end"] == pytest.approx(24.5, abs=0)
    assert s1[1]["right"] == pytest.approx(0.9 * 13, abs=0)
    assert s1[1]["y_start"] == pytest.approx(-0.7 + 10 / 2, abs=0)

    # s2: voltage 220000 -> height 40 / width 16; quantised 7.5
    s2 = rows["s2"]
    assert s2[0]["y_start"] == pytest.approx(-0.5 + 5 * 7.5, abs=0)
    assert [r["right"] for r in s2] == pytest.approx(
        [0.0, 14.4, -14.4, 7.2, -7.2, 0.9 * 0.6 * 16, -0.9 * 0.6 * 16], abs=0
    )
    assert s2[0]["n_runs"] == 7

    # s8: cables=12 (>9) -> 0.6/0.3 mid pairs + upper incl. 0.27 pair
    s8 = rows["s8"]
    assert s8[0]["n_runs"] == 11
    pw = 13.0  # voltage 60000 not > 150000
    assert [r["right"] for r in s8] == pytest.approx(
        [0.0, 0.9 * pw, -0.9 * pw, 0.6 * pw, -0.6 * pw, 0.3 * pw, -0.3 * pw,
         0.54 * pw, -0.54 * pw, 0.27 * pw, -0.27 * pw],
        abs=1e-12,
    )
