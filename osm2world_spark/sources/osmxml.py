"""OSM XML (.osm) source — the reference's OsmXmlIterator path
(OSMStreamReader.java:90-91) with the JOSM workaround semantics of
OSMStreamReader.applyJosmWorkarounds (:100-160: elements carrying
action="delete" are dropped; the version-faking and bounds-merge parts
touch fields outside this engine's analytic schema and are documented
no-ops here, mirroring the pbf path which likewise skips DenseInfo).

Compression: .gz and .bz2 are handled via stdlib (the reference's
CompressionMethod enum declares both but its reader currently throws
NotImplementedException for them — OSMStreamReader.java:92 TODO; this
engine closes that gap since both are one stdlib call).

Spark shape at 100 TB: XML is not splittable mid-file, so the FILE is
the unit of parallelism — a corpus of .osm extracts fans out one file
per task via mapInPandas; each task streams its file through the
stdlib incremental parser (xml.etree.iterparse), so memory is bounded
by one element, not one file. Rows share ELEMENTS_SCHEMA with
sources/osmpbf.py, so downstream operators are format-agnostic.
"""

from __future__ import annotations

import bz2
import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from osm2world_spark.sources.osmpbf import ELEMENTS_SCHEMA


def _open_stream(path: str):
    """CompressionMethod.fromFileName parity (OSMStreamReader.java:53-63)
    by extension; gz/bz2 actually implemented (reference TODOs them)."""
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    return open(path, "rb")


def _element_row(el, allow_missing_coords: bool = False) -> tuple:
    """One parsed <node|way|relation> element -> ELEMENTS_SCHEMA tuple.
    Shared by the plain-.osm and osmChange parsers. Only the osmChange
    path passes allow_missing_coords (delete stubs legitimately omit
    lat/lon); a plain-.osm node without coordinates is corrupt input
    and fails loudly here rather than flowing NULLs downstream."""
    kind = el.tag
    eid = int(el.get("id"))
    tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
    if kind == "node":
        lat, lon = el.get("lat"), el.get("lon")
        if not allow_missing_coords and (lat is None or lon is None):
            raise ValueError(f"node {eid} is missing lat/lon")
        return (
            "node", eid,
            float(lat) if lat is not None else None,
            float(lon) if lon is not None else None,
            tags, None, None, None,
        )
    if kind == "way":
        refs = [int(nd.get("ref")) for nd in el.findall("nd")]
        return ("way", eid, None, None, tags, refs, None, None)
    members = el.findall("member")
    return (
        "relation", eid, None, None, tags,
        [int(m.get("ref")) for m in members],
        [m.get("type") for m in members],
        [m.get("role") or "" for m in members],
    )


def parse_osm_xml(stream, josm_workaround: bool = False) -> list[tuple]:
    """OSM XML byte stream -> rows shaped like ELEMENTS_SCHEMA, via
    incremental parsing (constant memory in file size). With
    josm_workaround, elements with action="delete" are dropped
    (applyJosmWorkarounds, OSMStreamReader.java:125-131)."""
    from xml.etree.ElementTree import iterparse

    if isinstance(stream, (bytes, bytearray)):
        stream = io.BytesIO(stream)
    rows: list[tuple] = []
    for _, el in iterparse(stream, events=("end",)):
        if el.tag not in ("node", "way", "relation"):
            continue
        if josm_workaround and el.get("action") == "delete":
            el.clear()
            continue
        rows.append(_element_row(el))
        el.clear()  # bounded memory: discard the subtree once consumed
    return rows


def parse_osm_change(stream) -> list[tuple]:
    """osmChange (.osc) byte stream -> (action, *ELEMENTS_SCHEMA) rows.

    The minutely/hourly diff format real OSM deployments consume
    (<osmChange> with <create>/<modify>/<delete> blocks wrapping plain
    elements — public OsmChange spec; the reference reads full extracts
    only, its update story being re-convert + OverwriteMode.OLDER).
    Parsed incrementally: block tags set the action context on their
    start event; elements inherit it. Feeds `TilePipeline.invalidate`:
    create/modify rows are the changed set, delete rows the deleted-id
    set — completing the production incremental-update path end to end.
    """
    from xml.etree.ElementTree import iterparse

    if isinstance(stream, (bytes, bytearray)):
        stream = io.BytesIO(stream)
    rows: list[tuple] = []
    action = None
    for ev, el in iterparse(stream, events=("start", "end")):
        if el.tag in ("create", "modify", "delete"):
            action = el.tag if ev == "start" else None
            continue
        if ev != "end" or el.tag not in ("node", "way", "relation"):
            continue
        rows.append(
            (action or "modify",)
            + _element_row(el, allow_missing_coords=True)
        )
        el.clear()
    return rows


def _change_schema():
    from pyspark.sql.types import StringType, StructField, StructType

    return StructType(
        [StructField("action", StringType())] + list(ELEMENTS_SCHEMA.fields)
    )


def decode_osm_change(payloads: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(rows carrying .osc XML strings/bytes) -> change rows
    (action + ELEMENTS_SCHEMA), one mapInPandas — the payload-as-rows
    seam the Overpass source uses (HTTP fetch out of sandbox scope)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = ["action"] + [fl.name for fl in ELEMENTS_SCHEMA]
        for pdf in batches:
            rows: list[tuple] = []
            for xml in pdf[xml_col]:
                data = xml.encode() if isinstance(xml, str) else bytes(xml)
                rows.extend(parse_osm_change(data))
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return payloads.mapInPandas(decode, _change_schema())


def read_osm_change(spark: SparkSession, paths: list[str]) -> DataFrame:
    """.osc / .osc.gz / .osc.bz2 diff files -> distributed change table
    (action + ELEMENTS_SCHEMA); one file per task like read_osm_xml."""
    files = spark.createDataFrame([(p,) for p in paths], "path string")
    files = files.repartition(max(1, min(len(paths), 64)))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = ["action"] + [fl.name for fl in ELEMENTS_SCHEMA]
        for pdf in batches:
            for p in pdf["path"]:
                with _open_stream(p) as f:
                    rows = parse_osm_change(f)
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(decode, _change_schema())


def split_change_actions(changes: DataFrame):
    """Change table -> (upserts, deleted_ids): the two inputs
    `TilePipeline.invalidate(changed_docs=, deleted_doc_ids=)` takes
    (create/modify rows keep their element payload; delete needs ids
    only, per the osmChange minimal-stub convention)."""
    from pyspark.sql import functions as F

    upserts = changes.where(F.col("action") != "delete").drop("action")
    deleted = changes.where(F.col("action") == "delete").select(
        "element_type", "id")
    return upserts, deleted


def read_osm_xml(
    spark: SparkSession,
    paths: list[str],
    josm_workaround: bool = False,
) -> DataFrame:
    """.osm / .osm.gz / .osm.bz2 files -> distributed element table
    (ELEMENTS_SCHEMA): one file per task; each task streams its own
    file, so no XML bytes pass through the driver."""
    files = spark.createDataFrame([(p,) for p in paths], "path string")
    files = files.repartition(max(1, min(len(paths), 64)))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                with _open_stream(p) as f:
                    rows = parse_osm_xml(f, josm_workaround=josm_workaround)
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[fl.name for fl in ELEMENTS_SCHEMA]
                    )

    return files.mapInPandas(decode, ELEMENTS_SCHEMA)


def write_osm_xml(
    path: str,
    nodes: list[tuple[int, float, float, dict]],
    ways: list[tuple[int, list[int], dict]] = (),
    relations: list[tuple[int, list[tuple[str, int, str]], dict]] = (),
    deleted_node_ids: tuple[int, ...] = (),
) -> None:
    """Minimal .osm writer for test fixtures (same element tuples as
    osmpbf.write_osm_pbf). deleted_node_ids emit action="delete" stubs —
    the JOSM rows the workaround must drop. .gz/.bz2 paths compress."""
    from xml.sax.saxutils import quoteattr

    out = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6">']

    def tag_lines(tags: dict) -> list[str]:
        return [
            f"  <tag k={quoteattr(k)} v={quoteattr(v)}/>"
            for k, v in sorted(tags.items())
        ]

    for nid, lat, lon, tags in nodes:
        if tags:
            out.append(f'<node id="{nid}" lat="{lat!r}" lon="{lon!r}">')
            out.extend(tag_lines(tags))
            out.append("</node>")
        else:
            out.append(f'<node id="{nid}" lat="{lat!r}" lon="{lon!r}"/>')
    for nid in deleted_node_ids:
        out.append(f'<node id="{nid}" lat="0.0" lon="0.0" action="delete"/>')
    for wid, refs, tags in ways:
        out.append(f'<way id="{wid}">')
        out.extend(f'  <nd ref="{r}"/>' for r in refs)
        out.extend(tag_lines(tags))
        out.append("</way>")
    for rid, members, tags in relations:
        out.append(f'<relation id="{rid}">')
        out.extend(
            f'  <member type="{t}" ref="{r}" role={quoteattr(role)}/>'
            for t, r, role in members
        )
        out.extend(tag_lines(tags))
        out.append("</relation>")
    out.append("</osm>")
    data = "\n".join(out).encode("utf-8")
    if path.endswith(".gz"):
        # mtime=0 keeps the committed fixture byte-deterministic
        with open(path, "wb") as raw, gzip.GzipFile(
            fileobj=raw, mode="wb", mtime=0
        ) as f:
            f.write(data)
    elif path.endswith(".bz2"):
        with bz2.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
