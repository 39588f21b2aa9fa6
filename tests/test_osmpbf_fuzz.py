"""OSM PBF codec fuzz: random element sets through the write-side
mirror and the parser.  Targets the integer plumbing where fixed
fixtures are weakest — varint 7-bit boundaries, zigzag for negative
deltas (ids and coordinates in ANY order), string-table indexing for
unicode tags, and delta chains over way refs and relation member ids."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2world_spark.sources.osmpbf import make_pbf_blob, parse_pbf_blob

# 1e-7 degree units, the PBF default granularity
lat_u = st.integers(-900_000_000, 900_000_000)
lon_u = st.integers(-1_800_000_000, 1_800_000_000)
tag_text = st.text(min_size=1, max_size=8)
tags = st.dictionaries(tag_text, st.text(max_size=8), max_size=3)
oid = st.integers(1, 2**60)

nodes_s = st.lists(
    st.tuples(oid, lat_u, lon_u, tags), max_size=6,
    unique_by=lambda t: t[0],
)
ways_s = st.lists(
    st.tuples(oid, st.lists(oid, min_size=1, max_size=5), tags),
    max_size=4, unique_by=lambda t: t[0],
)
rels_s = st.lists(
    st.tuples(
        oid,
        st.lists(
            st.tuples(st.sampled_from(["node", "way", "relation"]), oid,
                      st.text(max_size=6)),
            min_size=1, max_size=4,
        ),
        tags,
    ),
    max_size=3, unique_by=lambda t: t[0],
)


@settings(max_examples=150, deadline=None)
@given(nodes=nodes_s, ways=ways_s, rels=rels_s)
def test_blob_roundtrip_fuzz(nodes, ways, rels):
    n_in = [(i, u / 1e7, v / 1e7, t) for i, u, v, t in nodes]
    rows = parse_pbf_blob(make_pbf_blob(n_in, ways, rels))

    got_n = [r for r in rows if r[0] == "node"]
    got_w = [r for r in rows if r[0] == "way"]
    got_r = [r for r in rows if r[0] == "relation"]
    assert len(got_n) == len(n_in)
    assert len(got_w) == len(ways)
    assert len(got_r) == len(rels)

    for r, (i, lat, lon, t) in zip(got_n, n_in):
        assert r[1] == i
        assert r[2] == pytest.approx(lat, abs=1e-7)
        assert r[3] == pytest.approx(lon, abs=1e-7)
        assert r[4] == t
    for r, (i, refs, t) in zip(got_w, ways):
        assert r[1] == i
        assert r[5] == refs  # zigzag delta chain survives any order
        assert r[4] == t
    for r, (i, members, t) in zip(got_r, rels):
        assert r[1] == i
        assert r[5] == [m[1] for m in members]
        assert r[6] == [m[0] for m in members]
        assert r[7] == [m[2] for m in members]
        assert r[4] == t
