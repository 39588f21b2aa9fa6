"""operators/trafficsigns.py + operators/aeroways.py vs hand-derived
expectations from TrafficSignIdentifier.java / AerowayModule.java."""

from osm2world_spark.operators.aeroways import aeroway_width
from osm2world_spark.operators.trafficsigns import parse_traffic_signs


def test_parse_traffic_signs(spark):
    rows = [
        ("plain", "city_limit"),
        ("country", "DE:274-50"),
        ("bracket", "DE:265[3.8]"),
        ("multi", "GB:956;GB:957"),
        ("commas", "stop,give_way"),
        ("trail", "DE:274;"),
        ("interior", "DE:274;;310"),
        ("greedy", "DE:a[b]c[d]"),
        ("empty", ""),
        ("seps", ";;"),
        ("colon_empty", "DE:"),
        ("colon_seps", "DE:;;"),
        ("spacey", "DE: 274-60 ; 310 "),
        ("subalpha", "DE:1000-31A"),
    ]
    df = spark.createDataFrame(rows, "rid string, v string")
    out = parse_traffic_signs(df, "v")
    got = {}
    for r in out.collect():
        got.setdefault(r["rid"], []).append(r)
    for v in got.values():
        v.sort(key=lambda r: r["sign_idx"])

    assert "empty" not in got and "seps" not in got
    # "DE:" keeps one empty-sign identifier ("".split -> [""]);
    # "DE:;;" has only trailing separators -> none
    ce = got["colon_empty"][0]
    assert (ce["country"], ce["sign"], ce["config_key"]) == ("DE", "", "SIGN_DE_")
    assert "colon_seps" not in got

    p = got["plain"][0]
    assert (p["country"], p["sign"], p["bracket_text"]) == (None, "city_limit", None)
    assert p["config_key"] == "SIGN_CITY_LIMIT"

    c = got["country"][0]
    assert (c["country"], c["sign"], c["sub_type"]) == ("DE", "274-50", "50")
    assert c["config_key"] == "SIGN_DE_274_50"
    assert c["config_key_no_sub"] == "SIGN_DE_274"

    b = got["bracket"][0]
    assert (b["sign"], b["bracket_text"]) == ("265", "3.8")
    assert b["config_key"] == "SIGN_DE_265"

    m = got["multi"]
    # country prefix is everything before the FIRST ':' -> "GB",
    # second entry keeps its own "GB:957"?  No: the reference splits
    # the country ONCE for the whole value, so entry 2 is "GB:957"
    # minus nothing — sign text is "957"? Java: country="GB",
    # signs = "956;GB:957".split -> ["956", "GB:957"]
    assert [r["sign"] for r in m] == ["956", "GB:957"]

    assert [r["sign"] for r in got["commas"]] == ["stop", "give_way"]
    assert [r["sign"] for r in got["trail"]] == ["274"]
    assert [r["sign"] for r in got["interior"]] == ["274", "", "310"]

    g = got["greedy"][0]
    assert g["bracket_text"] == "b]c[d"
    # Java removes the literal "[" + bracketText + "]" = "[b]c[d]"
    assert g["sign"] == "a"

    sp = got["spacey"]
    assert [r["sign"] for r in sp] == ["274-60", "310"]
    assert sp[0]["sub_type"] == "60"

    sa = got["subalpha"][0]
    assert sa["sub_type"] == "31"
    assert sa["config_key"] == "SIGN_DE_1000_31A"
    # replace-all of "_31": "SIGN_DE_1000_31A" -> "SIGN_DE_1000A"
    assert sa["config_key_no_sub"] == "SIGN_DE_1000A"


def test_aeroway_width(spark):
    rows = [
        ("rw", {"aeroway": "runway"}),
        ("rww", {"aeroway": "runway", "width": "45"}),
        ("tw", {"aeroway": "taxiway"}),
        ("apron", {"aeroway": "apron"}),
    ]
    df = spark.createDataFrame(rows, "rid string, tags map<string,string>")
    got = {r["rid"]: r.asDict() for r in aeroway_width(df).collect()}
    assert got["rw"]["aeroway_width"] == 20.0
    assert got["rww"]["aeroway_width"] == 45.0
    assert got["tw"]["aeroway_width"] == 5.0
    assert got["apron"]["aeroway_width"] is None
    assert got["apron"]["aeroway_kind"] is None
