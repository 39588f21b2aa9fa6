"""Generate the committed WARC test fixtures (ISO 28500 framing)
deterministically — every record field and payload byte is a pure
function of the record index, so the driver oracle re-derives expected
rows (including payload md5) with string arithmetic, never parsing
WARC.

- tests/fixtures/fixture.warc    — plain, exercises the per-record
  byte-span framing walk
- tests/fixtures/fixture.warc.gz — the SAME records, one gzip member
  per record (the Common Crawl layout), exercising the member stream

Record i (i = 0..N_RECORDS-1):
  type: warcinfo for i==0, request for i%10==9, response otherwise
  id:   <urn:test:{i:08d}>
  uri:  http://site{i%7}.example.org/page/{i}   (responses/requests)
  date: 2026-07-{01+i%28:02d}T{i%24:02d}:00:00Z
  response status: 404 when i%9==0 else 200; Content-Type text/html
  response payload: the HTML of html_payload(i) below
Regenerate (byte-stable): python tools/make_warc_fixture.py
"""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2world_spark.sources.warc import make_warc_record  # noqa: E402

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)
N_RECORDS = 60


def html_payload(i: int) -> bytes:
    """Deterministic HTML (markup + entities + script junk) — mirrored
    in SQL by the warc_records / html_extract oracles."""
    return (
        f"<html><head><title>Doc {i} &amp; Co</title></head><body>"
        f"<p>alpha {i} beta</p><script>var x={i};</script>"
        f"<p>gamma &lt;tag&gt; delta {i * 7 % 97}</p>"
        f'<a href="/p/{i}">next</a></body></html>'
    ).encode("ascii")


def record_bytes(i: int) -> bytes:
    date = f"2026-07-{1 + i % 28:02d}T{i % 24:02d}:00:00Z"
    rid = f"<urn:test:{i:08d}>"
    uri = f"http://site{i % 7}.example.org/page/{i}"
    if i == 0:
        return make_warc_record(
            "warcinfo", rid, None, date, b"software: fixture\r\n"
        )
    if i % 10 == 9:
        return make_warc_record(
            "request", rid, uri, date,
            f"GET /page/{i} HTTP/1.1\r\nHost: h\r\n\r\n".encode("ascii"),
        )
    return make_warc_record(
        "response", rid, uri, date, html_payload(i),
        http_status=404 if i % 9 == 0 else 200,
        http_content_type="text/html; charset=UTF-8",
    )


def main() -> None:
    recs = [record_bytes(i) for i in range(N_RECORDS)]
    plain = os.path.join(FIXDIR, "fixture.warc")
    with open(plain, "wb") as f:
        f.writelines(recs)
    gz = os.path.join(FIXDIR, "fixture.warc.gz")
    with open(gz, "wb") as f:
        for r in recs:
            # one member per record, fixed mtime for byte stability
            f.write(gzip.compress(r, mtime=0))
    print(plain, os.path.getsize(plain))
    print(gz, os.path.getsize(gz))


if __name__ == "__main__":
    main()
