"""OSM XML source (OsmXmlIterator parity, OSMStreamReader.java:90-91):
plain / gzip / bz2 streams, JOSM action="delete" workaround, and
schema-identical output to the PBF path over the same fixture elements."""

import os

import pytest

from osm2world_spark.sources.osmxml import (
    parse_osm_xml,
    read_osm_xml,
    write_osm_xml,
)
from tools.make_osmpbf_fixture import file_nodes, file_relations, file_ways

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_parse_all_element_kinds_and_josm_delete(tmp_path):
    p = str(tmp_path / "t.osm")
    write_osm_xml(
        p,
        [(1, 10.5, -20.25, {"name": "a b", "x": 'q"q'})],
        [(2, [1, 1], {"highway": "path"})],
        [(3, [("node", 1, "stop"), ("way", 2, "")], {"type": "route"})],
        deleted_node_ids=(99,),
    )
    rows = parse_osm_xml(open(p, "rb").read())
    assert {r[1] for r in rows} == {1, 2, 3, 99}  # raw keeps the JOSM stub
    rows = parse_osm_xml(open(p, "rb").read(), josm_workaround=True)
    by = {(r[0], r[1]): r for r in rows}
    assert set(by) == {("node", 1), ("way", 2), ("relation", 3)}
    assert by[("node", 1)][4] == {"name": "a b", "x": 'q"q'}  # attr escaping
    assert by[("way", 2)][5] == [1, 1]
    assert by[("relation", 3)][6] == ["node", "way"]
    assert by[("relation", 3)][7] == ["stop", ""]


@pytest.mark.parametrize("name", ["fixture.osm", "fixture.osm.gz"])
def test_read_matches_pbf_fixture_elements(spark, name):
    """The .osm/.osm.gz fixtures hold the SAME elements as
    fixture.osm.pbf plus two JOSM delete stubs — with the workaround on,
    the XML read must equal the generator formulas exactly."""
    rows = read_osm_xml(
        spark, [os.path.join(FIXDIR, name)], josm_workaround=True
    ).collect()
    nodes = {r["id"]: r for r in rows if r["element_type"] == "node"}
    assert 9001 not in nodes and 9002 not in nodes
    want = file_nodes()
    assert len(nodes) == len(want)
    for nid, lat, lon, tags in want:
        assert nodes[nid]["lat"] == pytest.approx(lat, abs=1e-12)
        assert dict(nodes[nid]["tags"]) == tags
    ways = {r["id"]: r for r in rows if r["element_type"] == "way"}
    for wid, refs, tags in file_ways():
        assert list(ways[wid]["refs"]) == refs and dict(ways[wid]["tags"]) == tags
    rels = {r["id"]: r for r in rows if r["element_type"] == "relation"}
    for rid, members, tags in file_relations():
        assert list(rels[rid]["member_roles"]) == [m[2] for m in members]


def test_bz2_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.osm.bz2")
    write_osm_xml(p, [(7, 1.5, 2.5, {"k": "v"})])
    rows = read_osm_xml(spark, [p]).collect()
    assert len(rows) == 1 and rows[0]["id"] == 7
    assert rows[0]["lat"] == pytest.approx(1.5)


def test_xml_and_pbf_paths_agree_on_shared_fixture(spark):
    """Format-agnostic contract: both readers produce identical rows
    over the same logical elements (node coords differ only by the pbf
    path's 1e-7 granularity quantization)."""
    from osm2world_spark.sources.osmpbf import read_osm_pbf

    xml = read_osm_xml(
        spark, [os.path.join(FIXDIR, "fixture.osm")], josm_workaround=True
    ).collect()
    pbf = read_osm_pbf(
        spark, os.path.join(FIXDIR, "fixture.osm.pbf")
    ).collect()
    kx = {(r["element_type"], r["id"]) for r in xml}
    kp = {(r["element_type"], r["id"]) for r in pbf}
    assert kx == kp
    nx = {r["id"]: r for r in xml if r["element_type"] == "node"}
    np_ = {r["id"]: r for r in pbf if r["element_type"] == "node"}
    for nid in nx:
        assert nx[nid]["lat"] == pytest.approx(np_[nid]["lat"], abs=1e-7)
        assert dict(nx[nid]["tags"]) == dict(np_[nid]["tags"])


OSC = b"""<osmChange version="0.6" generator="test">
  <create>
    <node id="1" lat="48.5" lon="13.4"><tag k="amenity" v="cafe"/></node>
    <way id="10"><nd ref="1"/><nd ref="2"/><tag k="highway" v="path"/></way>
  </create>
  <modify>
    <node id="2" lat="48.6" lon="13.5"/>
    <relation id="20"><member type="way" ref="10" role="outer"/></relation>
  </modify>
  <delete>
    <node id="3"/>
  </delete>
</osmChange>"""


def test_parse_osm_change_blocks_and_delete_stub():
    from osm2world_spark.sources.osmxml import parse_osm_change

    rows = parse_osm_change(OSC)
    by = {(a, t, i): r for (a, t, i, *r) in [(r[0], r[1], r[2], r) for r in rows]}
    assert len(rows) == 5
    acts = [(r[0], r[1], r[2]) for r in rows]
    assert acts == [
        ("create", "node", 1), ("create", "way", 10),
        ("modify", "node", 2), ("modify", "relation", 20),
        ("delete", "node", 3),
    ]
    create_node = rows[0]
    assert create_node[3] == 48.5 and create_node[5] == {"amenity": "cafe"}
    delete_stub = rows[4]
    assert delete_stub[3] is None and delete_stub[4] is None  # no coords


def test_read_osm_change_file_and_split(spark, tmp_path):
    import gzip

    from osm2world_spark.sources.osmxml import (
        read_osm_change,
        split_change_actions,
    )

    p = tmp_path / "diff.osc.gz"
    p.write_bytes(gzip.compress(OSC))
    ch = read_osm_change(spark, [str(p)])
    assert ch.count() == 5
    ups, dels = split_change_actions(ch)
    assert {r["id"] for r in ups.collect()} == {1, 10, 2, 20}
    assert "action" not in ups.columns
    assert [(r["element_type"], r["id"]) for r in dels.collect()] == [
        ("node", 3)]


def test_decode_osm_change_payload_rows(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.sources.osmxml import decode_osm_change

    df = spark.createDataFrame([(OSC.decode(),)], "xml string")
    ch = decode_osm_change(df)
    assert ch.where(F.col("action") == "create").count() == 2
    rel = ch.where(F.col("element_type") == "relation").first()
    assert rel["member_roles"] == ["outer"] and rel["refs"] == [10]


def test_plain_osm_node_without_coords_fails_loudly():
    """A plain-.osm node missing lat/lon is corrupt input (the
    osmChange delete-stub allowance must not leak into this path)."""
    import pytest

    from osm2world_spark.sources.osmxml import parse_osm_xml

    bad = b'<osm version="0.6"><node id="7"/></osm>'
    with pytest.raises(ValueError, match="missing lat/lon"):
        parse_osm_xml(bad)
