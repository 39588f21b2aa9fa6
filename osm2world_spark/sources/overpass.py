"""Overpass / OSM-API JSON source (S4): query builder + JSON parser.

Reference (/root/reference/core/src/main/java/org/osm2world/osm/creation/):
- OverpassReader.java:28-32 — the bbox query string:
  `[out:json][bbox:minlat,minlon,maxlat,maxlon];
   (node;rel(bn)->.x;way;node(w)->.x;rel(bw););out meta;`
- JsonReader.java:29-123 — both OSM API and Overpass JSON dialects:
  numeric `version` normalized to string (:113-118), version must be
  "0.6" (:40-42), elements dispatched on `type` into nodes
  (id, lat, lon, tags), ways (id, nodes), relations (id, members with
  type/ref/role); tags optional.

Spark shape: the HTTP POST itself is out of scope in this sandbox (no
network) and on a cluster it is an ingest concern — responses land as
rows of (response_id, json) from `spark.read.text`/object storage, the
same files-as-DataFrame seam as sources/srtm.py. Parsing is
Catalyst-native `from_json` + explode: whole-stage codegen, no Python in
the path. `assemble_way_geometries` then resolves way node-refs to
coordinates with one posexplode + join + sorted collect — the node-store
lookup OSMToMapDataConverter does in memory, as a shuffle that shards
with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_API_URL = "https://www.overpass-api.de/api/interpreter"  # OverpassReader.java:21


def overpass_bbox_query(minlat: float, minlon: float, maxlat: float, maxlon: float) -> str:
    """The exact query string OverpassReader.getData(bounds) posts
    (OverpassReader.java:29-31)."""
    return (
        f"[out:json][bbox:{minlat},{minlon},{maxlat},{maxlon}];"
        "(node;rel(bn)->.x;way;node(w)->.x;rel(bw););out meta;"
    )


_MEMBER_T = StructType(
    [
        StructField("type", StringType()),
        StructField("ref", LongType()),
        StructField("role", StringType()),
    ]
)

_ELEMENT_T = StructType(
    [
        StructField("type", StringType()),
        StructField("id", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("nodes", ArrayType(LongType())),
        StructField("members", ArrayType(_MEMBER_T)),
    ]
)

OSM_JSON_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("generator", StringType()),
        StructField("elements", ArrayType(_ELEMENT_T)),
    ]
)


def parse_osm_json(
    responses: DataFrame, json_col: str = "json", id_col: str = "response_id"
) -> DataFrame:
    """(response_id, json) rows -> one row per OSM element:
    (response_id, elem_type, elem_id, lat, lon, tags, node_ids, members).

    Dialect handling per JsonReader: a numeric `version` (Overpass) is
    normalized to string before the check (:113-118); responses whose
    version is not "0.6" raise at plan level via an ANSI assertion column?
    No — the reference throws IOException; here unsupported versions are
    FILTERED into zero rows with a `version_ok` flag callers can assert on
    (fault-tolerant iteration, O6), keeping the scan pure Column code."""
    norm = F.regexp_replace(
        F.col(json_col), r'"version"\s*:\s*([0-9]+\.?[0-9]*)', '"version": "$1"'
    )
    parsed = responses.select(
        F.col(id_col).alias("response_id"),
        F.from_json(norm, OSM_JSON_SCHEMA).alias("doc"),
    )
    return (
        parsed.select(
            "response_id",
            (F.col("doc.version") == "0.6").alias("version_ok"),
            F.explode("doc.elements").alias("e"),
        )
        .select(
            "response_id",
            "version_ok",
            F.col("e.type").alias("elem_type"),
            F.col("e.id").alias("elem_id"),
            F.col("e.lat").alias("lat"),
            F.col("e.lon").alias("lon"),
            F.coalesce(F.col("e.tags"), F.create_map().cast("map<string,string>")).alias("tags"),
            F.col("e.nodes").alias("node_ids"),
            F.col("e.members").alias("members"),
        )
    )


def osm_nodes(elements: DataFrame) -> DataFrame:
    return elements.where(F.col("elem_type") == "node").select(
        "response_id", F.col("elem_id").alias("node_id"), "lat", "lon", "tags"
    )


def osm_ways(elements: DataFrame) -> DataFrame:
    return elements.where(F.col("elem_type") == "way").select(
        "response_id", F.col("elem_id").alias("way_id"), "node_ids", "tags"
    )


def osm_relations(elements: DataFrame) -> DataFrame:
    return elements.where(F.col("elem_type") == "relation").select(
        "response_id", F.col("elem_id").alias("rel_id"), "members", "tags"
    )


def assemble_way_geometries(elements: DataFrame) -> DataFrame:
    """Resolve each way's node refs to coordinates, in ref order — the
    node-store lookup of OSMToMapDataConverter, as one posexplode + join +
    ordered collect (single shuffle pair, shards with the data; no
    broadcast of the node table, which is corpus-sized).

    Output: (response_id, way_id, tags, lats, lons, n_pts, n_missing) —
    `n_missing` counts refs without a node in the same response (the
    reference quarantines such ways)."""
    nodes = osm_nodes(elements).select(
        "response_id", F.col("node_id").alias("_ref"), "lat", "lon"
    )
    refs = osm_ways(elements).select(
        "response_id",
        "way_id",
        "tags",
        F.posexplode("node_ids").alias("pos", "_ref"),
    )
    joined = refs.join(nodes, ["response_id", "_ref"], "left")
    agg = joined.groupBy("response_id", "way_id").agg(
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
    return agg
