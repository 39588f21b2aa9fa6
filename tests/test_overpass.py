"""Overpass / OSM-JSON source tests (OverpassReader + JsonReader semantics)."""

import json

import pytest
from pyspark.sql import functions as F

from osm2world_spark.sources.overpass import (
    assemble_way_geometries,
    osm_nodes,
    osm_relations,
    osm_ways,
    overpass_bbox_query,
    parse_osm_json,
)


def test_bbox_query_string_exact():
    # OverpassReader.java:29-31, character for character
    q = overpass_bbox_query(48.5, 13.3, 48.6, 13.4)
    assert q == (
        "[out:json][bbox:48.5,13.3,48.6,13.4];"
        "(node;rel(bn)->.x;way;node(w)->.x;rel(bw););out meta;"
    )


_OVERPASS_RESPONSE = {
    # Overpass dialect: NUMERIC version (JsonReader normalizes to string)
    "version": 0.6,
    "generator": "Overpass API",
    "elements": [
        {"type": "node", "id": 1, "lat": 48.5, "lon": 13.3,
         "tags": {"amenity": "cafe"}},
        {"type": "node", "id": 2, "lat": 48.6, "lon": 13.4},
        {"type": "node", "id": 3, "lat": 48.7, "lon": 13.5},
        {"type": "way", "id": 10, "nodes": [1, 2, 3],
         "tags": {"highway": "residential"}},
        {"type": "way", "id": 11, "nodes": [2, 99]},  # 99 missing
        {"type": "relation", "id": 20,
         "members": [{"type": "way", "ref": 10, "role": "outer"}],
         "tags": {"type": "multipolygon"}},
    ],
}


def _responses(spark, *payloads):
    return spark.createDataFrame(
        [(i, json.dumps(p)) for i, p in enumerate(payloads)],
        "response_id int, json string",
    )


def test_parse_both_dialects_and_version_gate(spark):
    osm_api = dict(_OVERPASS_RESPONSE, version="0.6")       # OSM API: string
    unsupported = dict(_OVERPASS_RESPONSE, version=0.5)
    els = parse_osm_json(_responses(spark, _OVERPASS_RESPONSE, osm_api, unsupported))
    ok = els.where("version_ok").collect()
    assert len(ok) == 2 * 6
    # the 0.5 response parses but is flagged (reference throws IOException)
    bad = els.where("NOT version_ok")
    assert bad.count() == 6 and bad.select("response_id").distinct().first()[0] == 2

    nodes = osm_nodes(els.where("version_ok AND response_id = 0"))
    rows = {r.node_id: r for r in nodes.collect()}
    assert rows[1].lat == 48.5 and rows[1].tags == {"amenity": "cafe"}
    assert rows[2].tags == {}  # absent tags -> empty map (List.of())
    ways = {r.way_id: r for r in osm_ways(els.where("response_id = 0")).collect()}
    assert ways[10].node_ids == [1, 2, 3]
    rels = osm_relations(els.where("response_id = 0")).collect()
    assert rels[0].members[0].asDict() == {"type": "way", "ref": 10, "role": "outer"}


def test_way_geometry_order_and_missing_refs(spark):
    els = parse_osm_json(_responses(spark, _OVERPASS_RESPONSE))
    ways = {r.way_id: r for r in assemble_way_geometries(els).collect()}
    w10 = ways[10]
    assert w10.n_pts == 3 and w10.n_missing == 0
    assert w10.lats == [48.5, 48.6, 48.7]  # ref order, not join order
    assert w10.lons == [13.3, 13.4, 13.5]
    w11 = ways[11]
    assert w11.n_pts == 2 and w11.n_missing == 1
    assert w11.lats[0] == 48.6 and w11.lats[1] is None


def test_parse_is_jvm_side(spark):
    """The parser must stay Catalyst-native: no Python UDFs in the plan."""
    els = parse_osm_json(_responses(spark, _OVERPASS_RESPONSE))
    plan = els._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
