"""OSM PBF decoder (public OSM PBF format: protobuf wire encoding,
zlib-compressed blobs, delta-coded DenseNodes) — the inner blob decode
the reference delegates to osm4j's PbfIterator (OSMStreamReader.java:
88-89 for `.osm.pbf` files, MbtilesReader.java:63-67 for MBTiles tile
blobs). Pure stdlib + numpy, like the other codecs in this repo.

Format (public spec, wiki.openstreetmap.org/wiki/PBF_Format):
- file = repeated [ int32 BE header length | BlobHeader | Blob ]
- BlobHeader { 1: type ("OSMHeader"|"OSMData"), 3: datasize }
- Blob { 1: raw bytes | 2: raw_size | 3: zlib_data }
- OSMData blob = PrimitiveBlock { 1: stringtable, 2: primitivegroup*,
  17: granularity=100, 19: lat_offset, 20: lon_offset }
- PrimitiveGroup { 2: DenseNodes, 3: Way*, 4: Relation* } (plain Node
  groups are rare in practice; supported too)
- DenseNodes { 1: packed sint64 id deltas, 8/9: packed sint64 lat/lon
  deltas, 10: packed keys_vals (k,v string-table pairs, 0 ends a node) }
- Way { 1: id, 2/3: packed key/val ids, 8: packed sint64 ref deltas }
- Relation { 1: id, 2/3: keys/vals, 8: roles_sid, 9: memid deltas,
  10: member types (0 node, 1 way, 2 relation) }
- degrees = 1e-9 * (offset + granularity * coded)

Spark shape at 100 TB: the BLOB is the unit of parallelism — blobs are
self-contained (own string table, own delta chains), so a planet file
or a tileset of pbf blobs decodes embarrassingly parallel. The driver
does a header-only framing walk (reads 4+~40 bytes per blob, seeks over
the payloads) to build a bounded (offset, size) split table; executors
open the file themselves, read their byte ranges, and decode — payload
bytes never pass through the driver. For MBTiles, feed
`mbtiles_tiles(...)` output straight into `decode_pbf_blobs`.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

ELEMENTS_SCHEMA = StructType([
    StructField("element_type", StringType()),   # node | way | relation
    StructField("id", LongType()),
    StructField("lat", DoubleType()),            # nodes only, else null
    StructField("lon", DoubleType()),
    StructField("tags", MapType(StringType(), StringType())),
    StructField("refs", ArrayType(LongType())),  # way node refs / rel member ids
    StructField("member_types", ArrayType(StringType())),  # relations only
    StructField("member_roles", ArrayType(StringType())),  # relations only
])


# ------------------------------------------------------- protobuf wire

def _rd_varint(buf: bytes, p: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[p]
        p += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, p
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_no, wire_type, value) over a protobuf message.
    wire 0 -> varint int, wire 2 -> bytes, wire 5/1 -> raw 4/8 bytes."""
    p = 0
    n = len(buf)
    while p < n:
        key, p = _rd_varint(buf, p)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, p = _rd_varint(buf, p)
        elif wt == 2:
            ln, p = _rd_varint(buf, p)
            v = buf[p : p + ln]
            p += ln
        elif wt == 5:
            v = buf[p : p + 4]
            p += 4
        elif wt == 1:
            v = buf[p : p + 8]
            p += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes, signed: bool = False) -> list[int]:
    out = []
    p = 0
    while p < len(buf):
        v, p = _rd_varint(buf, p)
        out.append(_zigzag(v) if signed else v)
    return out


# ------------------------------------------------------------ decoding

def _blob_payload(blob: bytes) -> bytes:
    raw = None
    zdata = None
    for fno, _, v in _fields(blob):
        if fno == 1:
            raw = v
        elif fno == 3:
            zdata = v
    if raw is not None:
        return bytes(raw)
    if zdata is not None:
        return zlib.decompress(bytes(zdata))
    raise ValueError("Blob carries neither raw nor zlib_data")


def parse_pbf_blob(blob: bytes) -> list[tuple]:
    """One OSMData blob -> rows shaped like ELEMENTS_SCHEMA. The blob is
    self-contained (string table + delta chains reset per blob)."""
    block = _blob_payload(blob)
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, _, v in _fields(block):
        if fno == 1:  # stringtable
            for f2, _, s in _fields(v):
                if f2 == 1:
                    strings.append(bytes(s).decode("utf-8"))
        elif fno == 2:
            groups.append(bytes(v))
        elif fno == 17:
            gran = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    def deg(off: int, coded: int) -> float:
        return 1e-9 * (off + gran * coded)

    rows: list[tuple] = []
    for g in groups:
        for fno, _, v in _fields(g):
            if fno == 2:  # DenseNodes
                ids: list[int] = []
                lats: list[int] = []
                lons: list[int] = []
                kv: list[int] = []
                for f2, _, pv in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(pv, signed=True)
                    elif f2 == 8:
                        lats = _packed_varints(pv, signed=True)
                    elif f2 == 9:
                        lons = _packed_varints(pv, signed=True)
                    elif f2 == 10:
                        kv = _packed_varints(pv)
                cid = clat = clon = 0
                ki = 0
                for i in range(len(ids)):
                    cid += ids[i]
                    clat += lats[i]
                    clon += lons[i]
                    tags = {}
                    while ki < len(kv):
                        k = kv[ki]
                        ki += 1
                        if k == 0:
                            break
                        tags[strings[k]] = strings[kv[ki]]
                        ki += 1
                    rows.append((
                        "node", cid, deg(lat_off, clat), deg(lon_off, clon),
                        tags, None, None, None,
                    ))
            elif fno == 1:  # plain Node
                nid = lat = lon = 0
                keys: list[int] = []
                vals: list[int] = []
                for f2, wt2, pv in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(pv) if wt2 == 0 else nid
                    elif f2 == 2:
                        keys = _packed_varints(pv)
                    elif f2 == 3:
                        vals = _packed_varints(pv)
                    elif f2 == 8:
                        lat = _zigzag(pv)
                    elif f2 == 9:
                        lon = _zigzag(pv)
                rows.append((
                    "node", nid, deg(lat_off, lat), deg(lon_off, lon),
                    {strings[k]: strings[w] for k, w in zip(keys, vals)},
                    None, None, None,
                ))
            elif fno == 3:  # Way
                wid = 0
                keys = []
                vals = []
                refs: list[int] = []
                for f2, _, pv in _fields(v):
                    if f2 == 1:
                        wid = pv
                    elif f2 == 2:
                        keys = _packed_varints(pv)
                    elif f2 == 3:
                        vals = _packed_varints(pv)
                    elif f2 == 8:
                        refs = _packed_varints(pv, signed=True)
                acc = 0
                abs_refs = []
                for d in refs:
                    acc += d
                    abs_refs.append(acc)
                rows.append((
                    "way", wid, None, None,
                    {strings[k]: strings[w] for k, w in zip(keys, vals)},
                    abs_refs, None, None,
                ))
            elif fno == 4:  # Relation
                rid = 0
                keys = []
                vals = []
                roles: list[int] = []
                memids: list[int] = []
                mtypes: list[int] = []
                for f2, _, pv in _fields(v):
                    if f2 == 1:
                        rid = pv
                    elif f2 == 2:
                        keys = _packed_varints(pv)
                    elif f2 == 3:
                        vals = _packed_varints(pv)
                    elif f2 == 8:
                        roles = _packed_varints(pv)
                    elif f2 == 9:
                        memids = _packed_varints(pv, signed=True)
                    elif f2 == 10:
                        mtypes = _packed_varints(pv)
                acc = 0
                abs_ids = []
                for d in memids:
                    acc += d
                    abs_ids.append(acc)
                tname = ["node", "way", "relation"]
                rows.append((
                    "relation", rid, None, None,
                    {strings[k]: strings[w] for k, w in zip(keys, vals)},
                    abs_ids,
                    [tname[t] for t in mtypes],
                    [strings[r] for r in roles],
                ))
    return rows


def pbf_blob_table(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Framing walk over one or many .osm.pbf FILES: a bounded
    driver-side scan reading only the 4-byte lengths + BlobHeaders
    (seeking over payloads), then executors read + decode their own
    byte ranges. Returns (path, blob_idx, blob_type, offset, size)."""
    paths = [path] if isinstance(path, str) else list(path)
    frames = []
    for p in paths:
        with open(p, "rb") as f:
            idx = 0
            while True:
                hdr_len_b = f.read(4)
                if len(hdr_len_b) < 4:
                    break
                (hdr_len,) = struct.unpack(">I", hdr_len_b)
                hdr = f.read(hdr_len)
                btype = "?"
                datasize = 0
                for fno, _, v in _fields(hdr):
                    if fno == 1:
                        btype = bytes(v).decode("utf-8")
                    elif fno == 3:
                        datasize = v
                off = f.tell()
                frames.append((p, idx, btype, off, datasize))
                f.seek(datasize, 1)
                idx += 1
    return spark.createDataFrame(
        frames,
        "path string, blob_idx int, blob_type string, offset bigint, size bigint",
    )


def read_osm_pbf(
    spark: SparkSession, path: str | list[str], n_splits: int = 64
) -> DataFrame:
    """One or many .osm.pbf files -> distributed element table
    (ELEMENTS_SCHEMA): driver does the header-only framing walk; each
    task opens its files, reads its blobs' byte ranges, and decodes
    independently (file handles reused within a task)."""
    all_blobs = pbf_blob_table(spark, path)
    blobs = all_blobs.where("blob_type = 'OSMData'")
    blobs = blobs.repartition(max(1, min(n_splits, blobs.count())))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                for p, off, size in pdf[["path", "offset", "size"]].itertuples(
                    index=False
                ):
                    f = handles.get(p)
                    if f is None:
                        f = handles[p] = open(p, "rb")
                    f.seek(int(off))
                    rows = parse_pbf_blob(f.read(int(size)))
                    if rows:
                        yield pd.DataFrame(
                            rows, columns=[fl.name for fl in ELEMENTS_SCHEMA]
                        )
        finally:
            for f in handles.values():
                f.close()

    return blobs.mapInPandas(decode, ELEMENTS_SCHEMA)


def decode_pbf_blobs(
    blobs: DataFrame, blob_col: str = "tile_data", keys: tuple[str, ...] = ()
) -> DataFrame:
    """Blob-column DataFrame (e.g. mbtiles_tiles output) -> element
    table. The reference's MbtilesReader.getData path (:63-67): tile
    blob -> PbfIterator -> elements, as one mapInPandas. `keys` columns
    (e.g. zoom/tile_x/tile_y) are carried through onto every element of
    their blob."""
    key_fields = [blobs.schema[k] for k in keys]
    out_schema = StructType(key_fields + list(ELEMENTS_SCHEMA))
    el_cols = [fl.name for fl in ELEMENTS_SCHEMA]

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                rows = parse_pbf_blob(bytes(r[blob_col]))
                if rows:
                    out = pd.DataFrame(rows, columns=el_cols)
                    for k in reversed(keys):
                        out.insert(0, k, r[k])
                    yield out

    return blobs.select(*keys, blob_col).mapInPandas(decode, out_schema)


# ------------------------------------------------ fixture writer (tests)

def _w_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_zigzag(v: int) -> bytes:
    return _w_varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _w_field(fno: int, wt: int, payload: bytes) -> bytes:
    return _w_varint((fno << 3) | wt) + payload


def _w_bytes(fno: int, data: bytes) -> bytes:
    return _w_field(fno, 2, _w_varint(len(data)) + data)


def _w_packed(fno: int, vals: list[int], signed: bool = False) -> bytes:
    body = b"".join(_w_zigzag(v) if signed else _w_varint(v) for v in vals)
    return _w_bytes(fno, body)


def write_osm_pbf(
    path: str,
    nodes: list[tuple[int, float, float, dict]],
    ways: list[tuple[int, list[int], dict]] = (),
    relations: list[tuple[int, list[tuple[str, int, str]], dict]] = (),
    granularity: int = 100,
) -> None:
    """Minimal spec-conforming writer for test fixtures: one OSMHeader
    blob + one zlib OSMData blob with DenseNodes, Ways, and Relations.
    relations: (id, [(member_type, member_id, role)...], tags)."""
    strings = [""]
    sidx: dict[str, int] = {"": 0}

    def s(v: str) -> int:
        if v not in sidx:
            sidx[v] = len(strings)
            strings.append(v)
        return sidx[v]

    # DenseNodes
    ids = [n[0] for n in nodes]
    lats = [round(n[1] / (1e-9 * granularity)) for n in nodes]
    lons = [round(n[2] / (1e-9 * granularity)) for n in nodes]
    kv: list[int] = []
    for n in nodes:
        for k, v in sorted(n[3].items()):
            kv.extend((s(k), s(v)))
        kv.append(0)
    dense = (
        _w_packed(1, [b - a for a, b in zip([0] + ids[:-1], ids)], signed=True)
        + _w_packed(8, [b - a for a, b in zip([0] + lats[:-1], lats)], signed=True)
        + _w_packed(9, [b - a for a, b in zip([0] + lons[:-1], lons)], signed=True)
        + _w_packed(10, kv)
    )
    group = _w_bytes(2, dense)
    for wid, refs, tags in ways:
        deltas = [b - a for a, b in zip([0] + refs[:-1], refs)]
        way = (
            _w_field(1, 0, _w_varint(wid))
            + _w_packed(2, [s(k) for k in sorted(tags)])
            + _w_packed(3, [s(tags[k]) for k in sorted(tags)])
            + _w_packed(8, deltas, signed=True)
        )
        group += _w_bytes(3, way)
    tcode = {"node": 0, "way": 1, "relation": 2}
    for rid, members, tags in relations:
        mids = [m[1] for m in members]
        deltas = [b - a for a, b in zip([0] + mids[:-1], mids)]
        rel = (
            _w_field(1, 0, _w_varint(rid))
            + _w_packed(2, [s(k) for k in sorted(tags)])
            + _w_packed(3, [s(tags[k]) for k in sorted(tags)])
            + _w_packed(8, [s(m[2]) for m in members])
            + _w_packed(9, deltas, signed=True)
            + _w_packed(10, [tcode[m[0]] for m in members])
        )
        group += _w_bytes(4, rel)

    st = b"".join(_w_bytes(1, x.encode("utf-8")) for x in strings)
    block = _w_bytes(1, st) + _w_bytes(2, group)
    if granularity != 100:
        block += _w_field(17, 0, _w_varint(granularity))
    raw = block
    blob = _w_field(2, 0, _w_varint(len(raw))) + _w_bytes(3, zlib.compress(raw))

    header_block = _w_bytes(4, b"DenseNodes")  # required_features
    hblob = _w_bytes(1, header_block)

    def framed(btype: str, b: bytes) -> bytes:
        bh = _w_bytes(1, btype.encode()) + _w_field(3, 0, _w_varint(len(b)))
        return struct.pack(">I", len(bh)) + bh + b

    with open(path, "wb") as f:
        f.write(framed("OSMHeader", hblob))
        f.write(framed("OSMData", blob))


def make_pbf_blob(
    nodes: list[tuple[int, float, float, dict]],
    ways: list[tuple[int, list[int], dict]] = (),
    relations: list[tuple[int, list[tuple[str, int, str]], dict]] = (),
) -> bytes:
    """A bare OSMData Blob (what an MBTiles tile stores) with the given
    elements — for mbtiles->pbf end-to-end fixtures."""
    import io
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".osm.pbf")
    os.close(fd)
    try:
        write_osm_pbf(tmp, nodes, list(ways), list(relations))
        with open(tmp, "rb") as f:
            data = f.read()
    finally:
        os.remove(tmp)
    # walk to the OSMData blob and return it
    p = 0
    while p < len(data):
        (hl,) = struct.unpack(">I", data[p : p + 2 + 2])
        hdr = data[p + 4 : p + 4 + hl]
        btype = "?"
        size = 0
        for fno, _, v in _fields(hdr):
            if fno == 1:
                btype = bytes(v).decode()
            elif fno == 3:
                size = v
        body = data[p + 4 + hl : p + 4 + hl + size]
        if btype == "OSMData":
            return body
        p = p + 4 + hl + size
    raise ValueError("no OSMData blob written")


def assemble_way_geometries(elements: DataFrame) -> DataFrame:
    """ELEMENTS_SCHEMA rows (pbf or xml) -> per-way ordered coordinate
    arrays — the node-store resolution step of the reference's
    OSMToMapDataConverter, completing the full read pipeline
    (MbtilesReader/OSMFileReader -> elements -> way geometry). Same plan
    as sources/overpass.assemble_way_geometries: posexplode the refs,
    join the corpus-sized node table (shuffle join, NOT broadcast),
    ordered collect per way. Output: (way_id, tags, lats, lons, n_pts,
    n_missing); n_missing counts refs without a node in the dataset
    (the reference quarantines such ways)."""
    from pyspark.sql import functions as F

    nodes = elements.where(F.col("element_type") == "node").select(
        F.col("id").alias("_ref"), "lat", "lon"
    )
    refs = elements.where(F.col("element_type") == "way").select(
        F.col("id").alias("way_id"),
        "tags",
        F.posexplode("refs").alias("pos", "_ref"),
    )
    joined = refs.join(nodes, "_ref", "left")
    return joined.groupBy("way_id").agg(
        F.first("tags").alias("tags"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("lat"), F.col("lon")))
            ),
            lambda s: s["lat"],
        ).alias("lats"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("lat"), F.col("lon")))
            ),
            lambda s: s["lon"],
        ).alias("lons"),
        F.count("pos").alias("n_pts"),
        F.sum(F.when(F.col("lat").isNull(), 1).otherwise(0)).cast("int").alias("n_missing"),
    )
