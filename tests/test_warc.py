"""WARC source: framing walk, record parse, gzip-member stream,
header edge cases, and the documents projection."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from osm2world_spark.sources.warc import (
    _frame_plain,
    make_warc_record,
    parse_warc_record,
    read_warc,
    warc_documents,
)

FIX = "/root/repo/tests/fixtures/fixture.warc"
FIXGZ = "/root/repo/tests/fixtures/fixture.warc.gz"


def test_record_roundtrip():
    raw = make_warc_record(
        "response", "<urn:x:1>", "http://h/p", "2026-01-02T03:04:05Z",
        b"<html>hi</html>", http_status=200,
        http_content_type="text/html",
    )
    row, used = parse_warc_record(raw, 7)
    assert used == len(raw)
    (_, off, wtype, rid, uri, date, _ct, _dig, status, http_ct,
     payload, plen) = row
    assert (off, wtype, rid, uri, date) == (
        7, "response", "<urn:x:1>", "http://h/p", "2026-01-02T03:04:05Z"
    )
    assert status == 200 and http_ct == "text/html"
    assert payload == b"<html>hi</html>" and plen == 15


def test_framing_walk_is_exact():
    spans = _frame_plain(FIX)
    assert len(spans) == 60
    # contiguous, gap-free cover of the file
    pos = 0
    for off, ln in spans:
        assert off == pos
        pos += ln
    assert pos == os.path.getsize(FIX)


def test_truncated_record_raises():
    raw = make_warc_record(
        "response", "<urn:x:1>", "http://h/p", "2026-01-02T03:04:05Z",
        b"full payload bytes", http_status=200, http_content_type="t/h",
    )
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_record(raw[:-30], 0)
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\n", 0)


def test_header_case_and_obs_fold():
    raw = (
        b"WARC/1.1\r\n"
        b"warc-type: metadata\r\n"
        b"WARC-RECORD-ID: <urn:x:2>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"X-Long: first\r\n continued\r\n"
        b"Content-Length: 3\r\n"
        b"\r\nabc\r\n\r\n"
    )
    row, used = parse_warc_record(raw, 0)
    assert used == len(raw)
    assert row[2] == "metadata" and row[3] == "<urn:x:2>"
    assert row[10] == b"abc"


def test_plain_equals_gz(spark):
    a = read_warc(spark, FIX).drop("src_file", "rec_offset")
    b = read_warc(spark, FIXGZ).drop("src_file", "rec_offset")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 60


def test_gz_member_boundaries(tmp_path):
    # multi-record members must still split into records
    recs = [
        make_warc_record(
            "response", f"<urn:m:{i}>", f"http://h/{i}",
            "2026-01-01T00:00:00Z", f"body{i}".encode(),
            http_status=200, http_content_type="t/h",
        )
        for i in range(4)
    ]
    p = tmp_path / "multi.warc.gz"
    with open(p, "wb") as f:
        f.write(gzip.compress(recs[0] + recs[1], mtime=0))
        f.write(gzip.compress(recs[2] + recs[3], mtime=0))
    import osm2world_spark.sources.warc as w

    rows = []
    for off, member in w._gz_members(str(p)):
        pos = 0
        while pos < len(member):
            row, used = w.parse_warc_record(member[pos:], off)
            rows.append(row)
            pos += used
    assert [r[3] for r in rows] == [f"<urn:m:{i}>" for i in range(4)]


def test_warc_documents_filters(spark):
    recs = read_warc(spark, FIX)
    docs = warc_documents(recs)
    # 60 - 1 warcinfo - 6 requests - 5 non-warcinfo 404s = 48
    assert docs.count() == 48
    assert docs.where(F.col("media_type") != "text/html").count() == 0
    one = docs.where(F.col("doc_id") == "<urn:test:00000005>").first()
    assert one["url"] == "http://site5.example.org/page/5"
    assert "alpha 5 beta" in one["text"]


def test_gz_multi_record_offsets_unique(spark, tmp_path):
    recs = [
        make_warc_record(
            "response", f"<urn:m:{i}>", f"http://h/{i}",
            "2026-01-01T00:00:00Z", f"body{i}".encode(),
            http_status=200, http_content_type="text/html",
        )
        for i in range(4)
    ]
    p = tmp_path / "multi.warc.gz"
    with open(p, "wb") as f:
        f.write(gzip.compress(recs[0] + recs[1] + recs[2], mtime=0))
        f.write(gzip.compress(recs[3], mtime=0))
    rows = read_warc(spark, str(p)).select("rec_offset", "record_id").collect()
    offs = [r["rec_offset"] for r in rows]
    assert len(set(offs)) == 4  # member offset + intra index is unique


def test_warc_documents_drops_non_text(spark, tmp_path):
    recs = [
        make_warc_record(
            "response", "<urn:t:0>", "http://h/a", "2026-01-01T00:00:00Z",
            b"<p>hi</p>", http_status=200,
            http_content_type="text/html; charset=UTF-8",
        ),
        make_warc_record(
            "response", "<urn:t:1>", "http://h/b.png",
            "2026-01-01T00:00:00Z", b"\x89PNG binary", http_status=200,
            http_content_type="image/png",
        ),
        make_warc_record(
            "response", "<urn:t:2>", "http://h/c.txt",
            "2026-01-01T00:00:00Z", b"plain", http_status=200,
            http_content_type="text/plain",
        ),
    ]
    p = tmp_path / "mixed.warc"
    with open(p, "wb") as f:
        f.writelines(recs)
    docs = warc_documents(read_warc(spark, str(p)))
    ids = sorted(r["doc_id"] for r in docs.collect())
    assert ids == ["<urn:t:0>", "<urn:t:2>"]  # the PNG is out
