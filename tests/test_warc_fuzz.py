"""WARC framing fuzz: the length-based framing (ISO 28500 §4) must be
immune to adversarial payload BYTES — fake record headers, stray
CRLF CRLF boundaries, binary noise — because record extent is declared
by Content-Length, never found by scanning.  Hypothesis drives random
multi-record files through the write-side mirror, the header-only
framing walk, the record parser, and the per-member gzip path."""

import gzip
import io

from hypothesis import assume, example, given, settings
from hypothesis import strategies as st

from osm2world_spark.sources.warc import (
    _frame_plain,
    _gz_members,
    make_warc_record,
    parse_warc_record,
)

# payloads: arbitrary bytes, biased toward framing look-alikes
payload = st.binary(min_size=0, max_size=200)
NASTY = [
    b"WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
    b"\r\n\r\n",
    b"HTTP/1.1 200 OK\r\nContent-Length: 7\r\n\r\ngotcha!",
    b"WARC/",
]
record = st.tuples(
    st.sampled_from(["response", "resource", "metadata"]),
    st.one_of(payload, st.sampled_from(NASTY)),
)


def _build(recs):
    out = []
    for i, (wtype, pl) in enumerate(recs):
        out.append(
            make_warc_record(
                wtype,
                f"<urn:uuid:{i}>",
                f"https://example.test/{i}" if wtype == "response" else None,
                "2026-01-01T00:00:00Z",
                pl,
                http_status=200 if wtype == "response" else None,
                http_content_type="text/html" if wtype == "response" else None,
            )
        )
    return out


@settings(max_examples=200, deadline=None)
@given(recs=st.lists(record, min_size=1, max_size=6))
@example(recs=[("response", NASTY[0]), ("metadata", NASTY[1]),
               ("resource", NASTY[2])])
def test_adversarial_payloads_frame_exactly(tmp_path_factory, recs):
    blobs = _build(recs)
    p = tmp_path_factory.mktemp("warc") / "fuzz.warc"
    p.write_bytes(b"".join(blobs))

    spans = _frame_plain(str(p))
    assert len(spans) == len(recs)
    # offsets are the exact byte positions of each record
    pos = 0
    for (off, _ln), blob in zip(spans, blobs):
        assert off == pos
        pos += len(blob)

    buf = p.read_bytes()
    for (off, ln), (wtype, pl), blob in zip(spans, recs, blobs):
        row, consumed = parse_warc_record(buf[off : off + ln], off)
        assert consumed == len(blob)
        assert row[2] == wtype
        assert row[10] == pl  # payload round-trips byte-exact
        assert row[11] == len(pl)


@settings(max_examples=100, deadline=None)
@given(
    recs=st.lists(record, min_size=1, max_size=4),
    data=st.data(),
)
def test_block_truncation_always_raises(recs, data):
    blobs = _build(recs)
    *head, last = blobs
    # cut strictly inside the LAST record's declared block: the parser
    # must raise, never return a short payload
    hdr_end = last.index(b"\r\n\r\n") + 4
    assume(len(last) - 5 >= hdr_end)  # zero-length block: nothing to cut
    cut = data.draw(st.integers(hdr_end, len(last) - 5), label="cut")
    buf = last[:cut]
    try:
        parse_warc_record(buf, 0)
    except ValueError:
        pass
    else:
        raise AssertionError("truncated block parsed without error")


@settings(max_examples=60, deadline=None)
@given(recs=st.lists(record, min_size=1, max_size=4))
def test_gz_member_per_record_roundtrip(tmp_path_factory, recs):
    blobs = _build(recs)
    p = tmp_path_factory.mktemp("warc") / "fuzz.warc.gz"
    out = io.BytesIO()
    for blob in blobs:  # Common Crawl layout: one gzip member per record
        out.write(gzip.compress(blob))
    p.write_bytes(out.getvalue())

    members = list(_gz_members(str(p)))
    assert [m[1] for m in members] == blobs
    # member offsets are strictly increasing compressed positions
    offs = [m[0] for m in members]
    assert offs == sorted(set(offs))
