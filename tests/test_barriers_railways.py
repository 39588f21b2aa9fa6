"""operators/barriers.py + operators/railways.py vs hand-derived
expectations from BarrierModule.java / RailwayModule.java."""

import numpy as np
import pytest
from pyspark.sql.types import MapType, StringType, StructField, StructType

from osm2world_spark.operators.barriers import (
    BARRIER_DISPATCH,
    F002,
    F0001,
    F01,
    F082,
    F07,
    F1145,
    barrier_dimensions,
)
from osm2world_spark.operators.railways import rail_geometry

_SCHEMA = StructType([
    StructField("rid", StringType()),
    StructField("tags", MapType(StringType(), StringType())),
])


def _run(spark, op, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["rid"]: r.asDict() for r in op(df).collect()}


def test_barrier_dispatch_defaults(spark):
    rows = [
        ("wall", {"barrier": "wall"}),
        ("city", {"barrier": "city_wall"}),
        ("hedge", {"barrier": "hedge"}),
        ("railing", {"barrier": "fence", "fence_type": "railing"}),
        ("balu", {"barrier": "fence", "fence_type": "balustrade"}),
        ("chainlink", {"barrier": "fence", "fence_type": "metal"}),
        ("cable", {"barrier": "cable_barrier"}),
        ("handrail", {"barrier": "handrail"}),
        ("guard", {"barrier": "guard_rail"}),
        ("jersey", {"barrier": "jersey_barrier"}),
        ("trellis", {"barrier": "fence", "fence_type": "trellis_work"}),
        ("pole", {"barrier": "fence"}),
        ("pole2", {"barrier": "fence", "fence_type": "wood"}),
        ("bollard", {"barrier": "bollard"}),
        ("chain", {"barrier": "chain"}),
        ("none", {"barrier": "ditch"}),
        ("notag", {"highway": "residential"}),
        ("tagged", {"barrier": "wall", "height": "2.5", "width": "0.4"}),
        ("esth", {"barrier": "hedge", "height": "junk", "est_height": "3"}),
    ]
    got = _run(spark, barrier_dimensions, rows)
    exp = {
        "wall": ("wall", 1.0, 0.25),
        "city": ("city_wall", 10.0, 2.0),
        "hedge": ("hedge", 1.0, 0.5),
        "railing": ("railing", 1.0, F01),
        "balu": ("balustrade", 1.0, 0.25),
        "chainlink": ("chain_link_fence", 1.0, F002),
        "cable": ("cable_barrier", 1.0, F002),
        "handrail": ("handrail", 1.0, F002),
        "guard": ("guardrail", 0.75, F0001),
        "jersey": ("jersey_barrier", F1145, F082),
        "trellis": ("trellis_work_fence", F07, F01),
        "pole": ("pole_fence", 1.0, F002),
        "pole2": ("pole_fence", 1.0, F002),
        "bollard": ("bollard_row", 1.0, 0.3),
        "chain": ("chain_row", 1.0, F002),
        "none": (None, None, None),
        "notag": (None, None, None),
        "tagged": ("wall", 2.5, 0.4),
        "esth": ("hedge", 3.0, 0.5),
    }
    for rid, (k, h, w) in exp.items():
        g = got[rid]
        assert g["barrier_kind"] == k, (rid, g)
        if h is None:
            assert g["barrier_height"] is None and g["barrier_width"] is None
        else:
            assert g["barrier_height"] == pytest.approx(h, abs=0), (rid, g)
            assert g["barrier_width"] == pytest.approx(w, abs=0), (rid, g)
    # dispatch table covers the full reference chain
    assert len(BARRIER_DISPATCH) == 14


def test_rail_geometry(spark):
    rows = [
        ("std", {"railway": "rail"}),
        ("narrow", {"railway": "light_rail", "gauge": "1000"}),
        ("tram", {"railway": "tram"}),
        ("subway", {"railway": "subway"}),
        ("subway_open", {"railway": "subway", "tunnel": "no"}),
        ("tunnel", {"railway": "rail", "tunnel": "yes"}),
        ("culvert", {"railway": "rail", "tunnel": "culvert"}),
        ("bridge", {"railway": "rail", "bridge": "yes"}),
        ("bridge_no", {"railway": "rail", "bridge": "no"}),
        ("platform", {"railway": "platform"}),
        ("badgauge", {"railway": "rail", "gauge": "wide"}),
    ]
    got = _run(spark, rail_geometry, rows)

    def jgauge(mm):
        return float(np.float32(np.float32(mm) / np.float32(1000.0)))

    rhw = float(np.float32(0.067))
    for rid, mm in (("std", 1435), ("narrow", 1000), ("badgauge", 1435)):
        g = got[rid]
        gauge = jgauge(mm)
        assert g["gauge_m"] == pytest.approx(gauge, abs=0), (rid, g)
        assert g["rail_dist"] == pytest.approx(gauge + 2 * (0.5 * rhw), abs=0)
        sw = (gauge + 2 * rhw) + 1.0
        assert g["sleeper_width"] == pytest.approx(sw, abs=0)
        assert g["ground_width"] == pytest.approx(
            sw + 2 * float(np.float32(0.2)), abs=0
        )
        assert g["own_ground"] is True
        assert g["ground_state"] == "ON"
    assert got["tram"]["own_ground"] is False
    assert got["subway"]["ground_state"] == "BELOW"
    assert got["subway_open"]["ground_state"] == "ON"
    assert got["tunnel"]["ground_state"] == "BELOW"
    # superclass fallback (AbstractNetworkWaySegmentWorldObject:311-319)
    assert got["culvert"]["ground_state"] == "BELOW"
    assert got["bridge"]["ground_state"] == "ABOVE"
    assert got["bridge_no"]["ground_state"] == "ON"
    assert got["platform"]["gauge_m"] is None
    assert got["platform"]["ground_state"] is None
