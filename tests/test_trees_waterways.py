"""operators/trees.py + operators/waterways.py vs hand-derived
expectations from TreeModule.java:130-185 / WaterModule.java:44-125."""

import math

import pytest

from osm2world_spark.operators.trees import tree_dimensions
from osm2world_spark.operators.waterways import waterway_width

_SCHEMA = "rid string, tags map<string,string>"


def _run(spark, op, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["rid"]: r.asDict() for r in op(df, **kw).collect()}


def test_tree_dimensions(spark):
    rows = [
        ("bare", {"natural": "tree"}),
        ("h", {"height": "12"}),
        ("esth", {"height": "x", "est_height": "8"}),
        ("crown", {"diameter_crown": "6"}),
        # diameter is millimetres when unitless (special default unit)
        ("trunk_mm", {"diameter": "400"}),
        ("trunk_m", {"diameter": "0.4 m"}),
        ("circ", {"circumference": "1.2"}),
        ("all", {"height": "15", "diameter_crown": "5", "diameter": "300"}),
    ]
    got = _run(spark, tree_dimensions, rows)
    assert got["bare"]["tree_height"] == 10.0
    assert got["bare"]["crown_diameter"] == 5.0
    assert got["bare"]["trunk_diameter"] is None
    assert got["h"]["tree_height"] == 12.0
    assert got["esth"]["tree_height"] == 8.0
    # crown 6 -> height 12, crown stays 6
    assert got["crown"]["tree_height"] == 12.0
    assert got["crown"]["crown_diameter"] == 6.0
    # 400 (mm) -> 0.4 m trunk; height = 0.4*30*2 = 24
    assert got["trunk_mm"]["trunk_diameter"] == pytest.approx(0.4, abs=0)
    assert got["trunk_mm"]["tree_height"] == pytest.approx(
        400 * 1e-3 * 30.0 * 2.0, abs=0
    )
    assert got["trunk_m"]["trunk_diameter"] == pytest.approx(0.4, abs=0)
    assert got["circ"]["trunk_diameter"] == pytest.approx(1.2 / math.pi, abs=0)
    assert got["all"]["tree_height"] == 15.0
    assert got["all"]["crown_diameter"] == 5.0
    # forest default height
    got20 = _run(spark, tree_dimensions, rows[:1], default_height=20.0)
    assert got20["bare"]["tree_height"] == 20.0


def test_waterway_width(spark):
    rows = [
        ("river", {"waterway": "river"}),
        ("stream", {"waterway": "stream"}),
        ("canal", {"waterway": "canal", "width": "12"}),
        ("ditch", {"waterway": "ditch", "width": "x", "est_width": "2"}),
        ("drain", {"waterway": "drain"}),
        ("weir", {"waterway": "weir", "width": "4"}),
        ("none", {"highway": "path"}),
    ]
    got = _run(spark, waterway_width, rows)
    assert got["river"]["waterway_width"] == 3.0
    assert got["stream"]["waterway_width"] == 0.5
    assert got["canal"]["waterway_width"] == 12.0
    assert got["ditch"]["waterway_width"] == 2.0
    assert got["drain"]["waterway_width"] == 1.0
    assert got["weir"]["waterway_kind"] is None
    assert got["weir"]["waterway_width"] is None
    assert got["none"]["waterway_width"] is None


def test_structure_flags(spark):
    from osm2world_spark.operators.structures import structure_flags

    rows = [
        ("b", {"bridge": "yes"}),
        ("bv", {"bridge": "viaduct"}),
        ("bn", {"bridge": "no"}),
        ("t", {"tunnel": "culvert"}),
        ("tbp", {"tunnel": "building_passage"}),
        ("cliff", {"natural": "cliff"}),
        ("cliffh", {"natural": "cliff", "height": "12"}),
        ("bp", {"amenity": "bicycle_parking", "capacity": "9"}),
        ("bp0", {"amenity": "bicycle_parking", "capacity": "0"}),
        ("bpx", {"amenity": "bicycle_parking"}),
        ("none", {}),
    ]
    got = _run(spark, structure_flags, rows)
    assert got["b"]["is_bridge"] and got["bv"]["is_bridge"]
    assert not got["bn"]["is_bridge"] and not got["none"]["is_bridge"]
    assert got["t"]["is_tunnel"] and not got["tbp"]["is_tunnel"]
    assert got["cliff"]["cliff_height"] == 5.0
    assert got["cliffh"]["cliff_height"] == 12.0
    assert got["none"]["cliff_height"] is None
    # (9+1)/2 = 5 stands
    assert got["bp"]["bicycle_stands"] == 5
    assert got["bp0"]["bicycle_stands"] is None
    assert got["bpx"]["bicycle_stands"] is None
