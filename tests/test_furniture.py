"""operators/furniture.py vs hand-derived expectations from
StreetFurnitureModule.java (multi-match dispatch + per-kind dims)."""

import pytest

from osm2world_spark.operators.furniture import (
    F03,
    F08,
    F12,
    F18,
    F21,
    furniture_attributes,
)

_SCHEMA = "rid string, tags map<string,string>"


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {}
    for r in furniture_attributes(df).collect():
        got.setdefault(r["rid"], []).append(
            (r["kind"], r["furniture_height"], r["furniture_width"])
        )
    return got


def test_kinds_and_dims(spark):
    rows = [
        ("swing", {"playground": "swing", "capacity": "6"}),
        ("pole", {"man_made": "pole", "height": "7", "width": "0.4"}),
        ("flag", {"man_made": "flagpole"}),
        ("col", {"advertising": "column"}),
        ("bill", {"advertising": "billboard"}),
        ("bench", {"amenity": "bench"}),
        ("bench3", {"amenity": "bench", "seats": "3"}),
        ("table", {"leisure": "picnic_table"}),
        ("bus", {"highway": "bus_stop"}),
        ("bus2", {"public_transport": "platform", "bus": "yes"}),
        ("plat", {"public_transport": "platform"}),
        ("cross", {"man_made": "cross"}),
        ("summit", {"summit:cross": "yes"}),
        ("crossh", {"man_made": "cross", "height": "6"}),
        ("clock", {"amenity": "clock", "support": "wall"}),
        ("clockx", {"amenity": "clock"}),
        ("waste", {"amenity": "waste_basket"}),
        ("grit", {"amenity": "grit_bin"}),
        ("pb_dp", {"amenity": "post_box", "brand": "Deutsche Post"}),
        ("pb_rm", {"amenity": "post_box", "operator": "Royal Mail"}),
        ("pb_unknown", {"amenity": "post_box", "operator": "ACME"}),
        ("phone", {"amenity": "telephone", "brand": "Telekom"}),
        ("phone_x", {"amenity": "telephone", "operator": "ACME"}),
        ("locker", {"amenity": "parcel_locker"}),
        ("vend_p", {"amenity": "vending_machine", "vending": "parcel_mail_in"}),
        ("vend_c", {"amenity": "vending_machine", "vending": "condoms"}),
        ("vend_x", {"amenity": "vending_machine", "vending": "drinks"}),
        ("recyc", {"amenity": "recycling", "recycling_type": "container"}),
        ("hydrant", {"emergency": "fire_hydrant", "fire_hydrant:type": "pillar"}),
        ("lamp", {"highway": "street_lamp"}),
        ("board", {"tourism": "information", "information": "board"}),
        ("multi", {"amenity": "bench", "highway": "street_lamp"}),
        ("none", {"amenity": "cafe"}),
    ]
    got = _run(spark, rows)

    assert got["swing"] == [("swing", 1.5, 3.0)]
    assert got["pole"] == [("pole", 7.0, 0.4)]
    assert got["flag"] == [("flagpole", 10.0, None)]
    assert got["col"] == [("advertising_column", 3.0, None)]
    assert got["bill"] == [("billboard", 3.5, 4.0)]
    assert got["bench"] == [("bench", None, 2.0)]
    assert got["bench3"] == [("bench", None, 1.5)]
    t = got["table"][0]
    assert t[0] == "table" and t[1] == 0.75
    assert t[2] == pytest.approx(0.75 * F12, abs=0)
    assert got["bus"] == [("bus_stop", 3.0, None)]
    assert got["bus2"] == [("bus_stop", 3.0, None)]
    assert "plat" not in got
    # cross width = height*2/3 (or the HEIGHT tag, the reference quirk)
    assert got["cross"] == [("cross", 2.0, pytest.approx(2.0 * 2 / 3))]
    assert got["summit"] == [("cross", 4.0, pytest.approx(4.0 * 2 / 3))]
    assert got["crossh"] == [("cross", 6.0, 6.0)]
    assert got["clock"] == [("clock", 10.0, 1.0)]
    assert "clockx" not in got
    assert got["waste"] == [("waste_basket", None, None)]
    assert got["grit"] == [("grit_bin", 0.5, 1.0)]
    assert got["pb_dp"] == [("post_box", F08, F03)]
    assert got["pb_rm"] == [("post_box", 2.0, 0.5)]
    assert "pb_unknown" not in got
    assert got["phone"] == [("phone", F21, F08)]
    assert "phone_x" not in got
    assert got["locker"] == [("parcel_locker", None, None)]
    assert got["vend_p"] == [("parcel_locker", None, None)]
    assert got["vend_c"] == [("vending_machine", F18, None)]
    assert "vend_x" not in got
    assert got["recyc"] == [("recycling", None, None)]
    assert got["hydrant"] == [("fire_hydrant", 1.0, None)]
    assert got["lamp"] == [("street_lamp", 5.0, None)]
    assert got["board"] == [("board", None, None)]
    # MULTI-match: one node, several kinds, in applyToNode order
    assert got["multi"] == [("bench", None, 2.0), ("street_lamp", 5.0, None)]
    assert "none" not in got
