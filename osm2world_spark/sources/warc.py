"""WARC web-archive source — the ingest format of web-scale training
corpora (Common Crawl ships .warc.gz; ISO 28500 / the public WARC 1.1
spec defines the framing).  The reference engine has no crawl reader —
this is part of the LLM-data-pipeline surface the engine adds on top of
the reference's operators, mirroring how sources/osmpbf.py treats the
OSM binary format: pure-stdlib parsing, the natural parallel unit made
explicit, and every framing rule pinned by fixture tests.

Format (WARC 1.1 §4): a file is a concatenation of records, each

    WARC/1.1\\r\\n
    <named-field>: <value>\\r\\n ...          (header block)
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n                               (record boundary)

Response records' block is an HTTP/1.1 message (status line, headers,
CRLF CRLF, payload).  Common Crawl compresses each record as its OWN
gzip member, concatenated — so .warc.gz files decompress incrementally
member-by-member without ever holding the file.

Spark shape at 100 TB:
- plain .warc: the driver does a HEADER-ONLY framing walk (reads the
  header block, seeks over Content-Length — a few hundred bytes of I/O
  per record regardless of payload size), emitting (path, offset,
  length) splits; executors pread exactly their records.  This is the
  osmpbf blob-table pattern: bytes never pass the driver.
- .warc.gz (member-per-record): gzip members are not seekable without
  scanning, so the FILE is the unit of parallelism (the osmxml
  pattern); each task streams members through zlib with bounded
  memory.  Common Crawl's corpus layout (many ~1 GB files) makes the
  file grain the right one in practice.

Headers are parsed case-insensitively (spec §4: field names are
case-insensitive); continuation lines (obs-fold) are unfolded.  The
HTTP payload is sliced out for response/request records with the
status and Content-Type lifted; revisit/metadata/warcinfo records keep
their raw block as the payload.  Truncated trailing garbage raises —
silent tail loss is not acceptable for an ingest tool.
"""

from __future__ import annotations

import os
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "src_file string, rec_offset bigint, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, block_digest string, "
    "http_status int, http_content_type string, "
    "payload binary, payload_len bigint"
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _parse_headers(raw: bytes) -> dict[str, str]:
    """Named fields of a WARC or HTTP header block (version/status line
    excluded by the caller), case-insensitive keys, obs-fold unfolded."""
    # unfold: CRLF followed by SP/TAB is a continuation (spec §4)
    raw = raw.replace(b"\r\n ", b" ").replace(b"\r\n\t", b" ")
    out: dict[str, str] = {}
    for line in raw.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        out[k.decode("ascii", "replace").strip().lower()] = v.decode(
            "utf-8", "replace"
        ).strip()
    return out


def parse_warc_record(buf: bytes, base_offset: int = 0) -> tuple[tuple, int]:
    """One record starting at buf[0] -> (row tuple, bytes consumed
    including the trailing CRLF CRLF).  Raises on malformed framing."""
    if not buf.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record at offset {base_offset}")
    hdr_end = buf.index(_HDR_END)
    version_end = buf.index(_CRLF)
    hdrs = _parse_headers(buf[version_end + 2 : hdr_end])
    length = int(hdrs["content-length"])
    block_start = hdr_end + 4
    block = buf[block_start : block_start + length]
    if len(block) != length:
        raise ValueError(f"truncated record at offset {base_offset}")
    consumed = block_start + length
    if buf[consumed : consumed + 4] == _HDR_END:
        consumed += 4
    wtype = hdrs.get("warc-type", "")
    status: int | None = None
    http_ct: str | None = None
    payload = block
    if wtype in ("response", "request") and _HDR_END in block[:65536]:
        he = block.index(_HDR_END)
        status_line, _, rest = block[:he].partition(_CRLF)
        http_hdrs = _parse_headers(rest)
        parts = status_line.split(b" ", 2)
        if wtype == "response" and len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
        http_ct = http_hdrs.get("content-type")
        payload = block[he + 4 :]
    row = (
        None,  # src_file, filled by the reader
        base_offset,
        wtype,
        hdrs.get("warc-record-id", ""),
        hdrs.get("warc-target-uri"),
        hdrs.get("warc-date", ""),
        hdrs.get("content-type", ""),
        hdrs.get("warc-block-digest"),
        status,
        http_ct,
        payload,
        len(payload),
    )
    return row, consumed


def _frame_plain(path: str) -> list[tuple[int, int]]:
    """Header-only framing walk of a plain .warc: (offset, length) per
    record.  Reads ~the header block per record and SEEKS over the
    payload, so walking a 1 GB file costs kilobytes of I/O."""
    spans: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos < size:
            f.seek(pos)
            head = f.read(8192)
            if not head.strip(b"\r\n"):
                break
            if not head.startswith(b"WARC/"):
                raise ValueError(f"{path}: bad framing at {pos}")
            while _HDR_END not in head:
                more = f.read(8192)
                if not more:
                    raise ValueError(f"{path}: unterminated header at {pos}")
                head += more
            hdr_end = head.index(_HDR_END)
            hdrs = _parse_headers(head[head.index(_CRLF) + 2 : hdr_end])
            total = hdr_end + 4 + int(hdrs["content-length"]) + 4
            spans.append((pos, min(total, size - pos)))
            pos += total
    return spans


def _gz_members(
    path: str, chunk: int = 1 << 20
) -> Iterator[tuple[int, bytes]]:
    """(offset, decompressed bytes) per gzip member of a multi-member
    .warc.gz.  The compressed bytes are read once and fed to each
    member's decompressobj in fixed-size zero-copy memoryview slices —
    NOT the naive data[pos:] tail re-slice, which on a Common Crawl
    shard (~50k members x ~0.5 GB average tail) would memcpy tens of
    terabytes.  Peak memory = compressed file + one decompressed
    member."""
    with open(path, "rb") as f:
        data = f.read()
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(31)
        out = bytearray()
        start = pos
        while True:
            end = min(pos + chunk, n)
            out += d.decompress(view[pos:end])
            if d.eof:
                pos = end - len(d.unused_data)
                break
            pos = end
            if pos >= n:
                raise ValueError(
                    f"{path}: truncated gzip member at offset {start}"
                )
        out += d.flush()
        yield start, bytes(out)


def make_warc_record(
    warc_type: str,
    record_id: str,
    target_uri: str | None,
    date: str,
    payload: bytes,
    http_status: int | None = None,
    http_content_type: str | None = None,
) -> bytes:
    """Spec-conforming record bytes (the write-side mirror of the
    parser, used by fixtures and round-trip tests).  Response/request
    records wrap the payload in an HTTP message."""
    block = payload
    if warc_type == "response":
        block = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
    hdrs = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
        ("Content-Type",
         "application/http; msgtype=response"
         if warc_type == "response" else "application/octet-stream"),
        ("Content-Length", str(len(block))),
    ]
    if target_uri is not None:
        hdrs.insert(3, ("WARC-Target-URI", target_uri))
    head = "WARC/1.1\r\n" + "".join(f"{k}: {v}\r\n" for k, v in hdrs)
    return head.encode("ascii") + b"\r\n" + block + b"\r\n\r\n"


def read_warc(
    spark: SparkSession, path: str | list[str], n_splits: int = 64
) -> DataFrame:
    """WARC files -> one row per record (WARC_SCHEMA).  Plain .warc
    fans out per-record byte spans (driver walks framing headers only);
    .warc.gz fans out per file and each task streams its members."""
    paths = [path] if isinstance(path, str) else list(path)
    plain = [(p, o, ln) for p in paths if not p.endswith(".gz")
             for o, ln in _frame_plain(p)]
    gz = [(p, -1, -1) for p in paths if p.endswith(".gz")]
    units = spark.createDataFrame(
        plain + gz, "path string, off bigint, ln bigint"
    )
    units = units.repartition(max(1, min(n_splits, len(plain) + len(gz))))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for b in batches:
            rows = []
            for path_, off, ln in zip(b["path"], b["off"], b["ln"]):
                if off >= 0:
                    with open(path_, "rb") as f:
                        f.seek(int(off))
                        row, _ = parse_warc_record(f.read(int(ln)), int(off))
                    rows.append((path_,) + row[1:])
                else:
                    for moff, member in _gz_members(path_):
                        pos = 0
                        j = 0
                        while pos < len(member):
                            # rec_offset = member offset + intra-member
                            # record index: floor ~= the range-request
                            # locator, and unique because a member's
                            # compressed length always exceeds its
                            # record count (each record's headers alone
                            # out-compress one byte)
                            row, used = parse_warc_record(
                                member[pos:], moff + j
                            )
                            rows.append((path_,) + row[1:])
                            pos += used
                            j += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file", "rec_offset", "warc_type", "record_id",
                    "target_uri", "warc_date", "content_type",
                    "block_digest", "http_status", "http_content_type",
                    "payload", "payload_len",
                ],
            )

    return units.mapInPandas(decode, WARC_SCHEMA)


def warc_documents(records: DataFrame) -> DataFrame:
    """Response records -> the documents-table shape downstream
    operators consume: (doc_id, url, media_type, text).  Only 2xx
    responses whose Content-Type is in ``text_types`` carry text (a
    200 image/png decoded as UTF-8-with-replacement would pollute the
    corpus with mojibake documents); the payload decodes as UTF-8 with
    replacement (charset sniffing beyond the Content-Type header is a
    documented boundary)."""
    from pyspark.sql import functions as F

    text_types = ("text/html", "text/plain", "application/xhtml+xml")
    mt = F.regexp_extract("http_content_type", "^([^;]+)", 1)
    ok = records.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
        & F.trim(mt).isin(*text_types)
    )
    return ok.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.coalesce(
            F.regexp_extract("http_content_type", "^([^;]+)", 1),
            F.lit(""),
        ).alias("media_type"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )
