"""Public API facade: the engine's `O2WConverter` analogue.

Reference surface (/root/reference/core-jvm/src/main/java/org/osm2world/
O2WConverter.java:30-89): `setConfig(O2WConfig)` :45, `convert(reader, ...)`
:71, and the test-oriented `convert(MapData, ...)` :89 that skips parsing.
Config keys mirror O2WConfig where an analytics analogue exists
(`conversion/O2WConfig.java`): projection origin (:465-470),
terrainInterpolator (:510-518), clipToBounds (TilesetCommand.java:185-190).

`DocumentBuilder` is the `MapDataBuilder` analogue
(map_data/creation/MapDataBuilder.java:24-70): tests and fixtures inject
synthetic scenes as interleaved documents (`doc_id`,
`spans: array<struct<kind,text,media_ref,offset>>`), the input_hint shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .functions.projection import Origin


@dataclass
class EngineConfig:
    """O2WConfig analogue — strategy choices resolved once per run."""

    origin: Origin | None = None          # None -> dataset default origin
    interpolator: str = "leastsquares"    # O2WConfig.terrainInterpolator
    cell_size_m: float = 150.0            # spatial-join candidate grid
    golden_zoom: int = 12                 # tile key for partitioned outputs
    cell_zoom: int = 14
    clip_to_bounds: bool = True           # TilesetCommand per-tile default
    extras: dict = field(default_factory=dict)


class Engine:
    """High-level conversion API over the operator library.

    >>> eng = Engine(spark)
    >>> elements = eng.elements(docs)
    >>> tiles = eng.tile_assignments(elements)
    >>> overlaps = eng.overlaps(elements)
    >>> result = eng.convert(docs, out_dir="/data/out")   # resumable run
    """

    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        self.spark = spark
        self.config = config or EngineConfig()

    # ------------------------------------------------------ building blocks

    def _origin(self) -> Origin:
        if self.config.origin is not None:
            return self.config.origin
        from .sources.documents import DEFAULT_ORIGIN

        return DEFAULT_ORIGIN

    def elements(self, docs: DataFrame) -> DataFrame:
        """documents -> projected elements (MapData analogue)."""
        from .sources.documents import extract_elements

        return extract_elements(docs, self._origin())

    def tile_assignments(self, elements: DataFrame, with_cells: bool = True) -> DataFrame:
        from .operators.tiling import assign_tiles

        return assign_tiles(elements, with_cells=with_cells)

    def overlaps(self, elements: DataFrame) -> DataFrame:
        """Typed-overlap spatial self-join (the MapData overlaps)."""
        from .operators.spatial_join import spatial_self_join

        return spatial_self_join(elements, cell_size=self.config.cell_size_m)

    def elevations(self, queries: DataFrame, sites: DataFrame) -> DataFrame:
        """Terrain interpolation with the configured strategy
        (O2WConfig.terrainInterpolator dispatch)."""
        from .operators.knn import interpolate

        return interpolate(queries, sites, method=self.config.interpolator)

    def clip(self, elements: DataFrame, zoom: int | None = None) -> DataFrame:
        from .operators.clip import clip_to_tiles

        return clip_to_tiles(elements, self._origin(), zoom=zoom or self.config.cell_zoom)

    def subtract(self, pairs: DataFrame, snap: float | None = 1e-3) -> DataFrame:
        """CAG piece geometry: A - B result polygons with holes
        (CAGUtil.subtractPolygons)."""
        from .operators.cag import cag_pieces

        return cag_pieces(pairs, op="subtract", snap=snap)

    def intersect(self, pairs: DataFrame, snap: float | None = 1e-3) -> DataFrame:
        """CAG piece geometry: A ∩ B result polygons
        (CAGUtil.intersectPolygons)."""
        from .operators.cag import cag_pieces

        return cag_pieces(pairs, op="intersect", snap=snap)

    def srtm_sites(self, tile_dir: str, minlat: float, minlon: float,
                   maxlat: float, maxlon: float) -> DataFrame:
        """Real SRTM .hgt tiles -> metric elevation sites
        (SRTMData.getSites semantics incl. seam pad)."""
        from .sources.srtm import hgt_sites, read_hgt_dir

        files = read_hgt_dir(self.spark, tile_dir)
        return hgt_sites(files, self._origin(), minlat, minlon, maxlat, maxlon)

    def osm_elements(self, responses: DataFrame) -> DataFrame:
        """Overpass / OSM-API JSON responses -> element rows
        (OverpassReader + JsonReader semantics)."""
        from .sources.overpass import parse_osm_json

        return parse_osm_json(responses)

    def media_features(self, media: DataFrame) -> DataFrame:
        """Decode media payloads (PNG / JPEG incl. progressive / WAV PCM
        / AVI video, by magic bytes + RIFF form type) into fixed 16-dim
        feature rows."""
        from .operators.multimodal import extract_features

        return extract_features(media, real_codecs=True)

    def resize_media(self, media: DataFrame, factor: int) -> DataFrame:
        """Exact box-downsample images by an integer factor (re-encoded
        PNG); see operators/multimodal.py::resize_images."""
        from .operators.multimodal import resize_images

        return resize_images(media, factor)

    def resample_media(self, media: DataFrame, factor: int) -> DataFrame:
        """Integer-decimation audio resample (floor means, rate/factor);
        see operators/multimodal.py::resample_audio."""
        from .operators.multimodal import resample_audio

        return resample_audio(media, factor)

    # ------------------------------------------------- training pipeline

    def classify(self, docs: DataFrame, weights: DataFrame,
                 biases: list[int], n_buckets: int) -> DataFrame:
        """fastText-style hashed linear classifier inference (model-based
        quality filtering); operators/classify.py for the contract."""
        from .operators.classify import hashed_linear_scores

        return hashed_linear_scores(docs, weights, biases, n_buckets)

    def dedup_normalized(self, docs: DataFrame) -> DataFrame:
        """Exact dedup groups under the CCNet-style normalized key
        (accents/case/digits/whitespace folded)."""
        from .operators.normalize import normalized_dup_groups

        return normalized_dup_groups(docs)

    def dedup_urls(self, docs: DataFrame, url_col: str = "url") -> DataFrame:
        """Dedup groups under the canonical URL (crawl-level first
        pass); operators/web.py::canonical_url for the normalization."""
        from .operators.web import url_dup_groups

        return url_dup_groups(docs, url_col=url_col)

    def fix_text(self, docs: DataFrame, text_col: str = "text") -> DataFrame:
        """Repair UTF-8-as-Latin-1 mojibake in the text column (bounded
        lowercase-accent table; operators/normalize.py)."""
        from pyspark.sql import functions as F

        from .operators.normalize import fix_mojibake

        return docs.withColumn(text_col, fix_mojibake(F.col(text_col)))

    def shard(self, docs: DataFrame, n_shards: int,
              id_col: str = "doc_id") -> DataFrame:
        """Deterministic global shuffle + training-shard assignment
        (operators/packing.py::shard_corpus)."""
        from .operators.packing import shard_corpus

        return shard_corpus(docs, n_shards, id_col=id_col)

    def train_classifier_epoch(
        self, docs: DataFrame, labels: DataFrame, weights: DataFrame,
        biases: list[int], n_buckets: int, lr: int = 1,
    ) -> tuple[DataFrame, DataFrame]:
        """One distributed batch-perceptron epoch over the hashed linear
        model (the training side of `classify`); returns (new_weights,
        stats) — operators/classify.py::perceptron_epoch."""
        from .operators.classify import perceptron_epoch

        return perceptron_epoch(docs, labels, weights, biases, n_buckets, lr)

    def lm_score(self, docs: DataFrame, min_count: int = 2) -> DataFrame:
        """Stupid-backoff bigram LM familiarity evidence per document
        (Brants 2007; operators/text.py::stupid_backoff_score)."""
        from .operators.text import stupid_backoff_score

        return stupid_backoff_score(docs, min_count=min_count)

    def lm_buckets(
        self, scored: DataFrame, cutoffs: tuple[float, float],
        num_col: str = "sum_freq", den_col: str = "n_ngrams",
    ) -> DataFrame:
        """CCNet head/middle/tail split by fixed calibration cutoffs
        (operators/quality.py::perplexity_buckets)."""
        from .operators.quality import perplexity_buckets

        return perplexity_buckets(scored, cutoffs, num_col, den_col)

    def remove_duplicate_spans(
        self, docs: DataFrame, k: int = 8, min_count: int = 2
    ) -> DataFrame:
        """Cut every corpus-duplicated token span out of the text (Lee
        2022 ExactSubstr; operators/dedup.py::remove_dup_spans)."""
        from .operators.dedup import remove_dup_spans

        return remove_dup_spans(docs, k, min_count)

    def dedup_index(self, docs: DataFrame, k: int = 32) -> DataFrame:
        """Persistable minhash signature index of a corpus snapshot
        (operators/dedup.py::lsh_index)."""
        from .operators.dedup import lsh_index

        return lsh_index(docs, k)

    def dedup_against_index(
        self, new_docs: DataFrame, index: DataFrame,
        bands: int = 8, min_matches: int = 16, k: int = 32,
    ) -> DataFrame:
        """Scan a new batch against a prior `dedup_index` and return the
        best old near-match per new doc; unmatched docs are the inserts
        (operators/dedup.py::incremental_near_dups)."""
        from .operators.dedup import incremental_near_dups

        return incremental_near_dups(new_docs, index, bands, min_matches, k)

    def apply_changes(self, changes: DataFrame):
        """Split an osmChange table (sources/osmxml.py::read_osm_change)
        into the (upserts, deleted_ids) pair `convert`'s invalidation
        step consumes."""
        from .sources.osmxml import split_change_actions

        return split_change_actions(changes)

    # ---------------------------------------------------------- serializers

    def serialize_obj(self, faces: DataFrame) -> DataFrame:
        """Faces -> (tile, obj_text, mtl_text): Wavefront OBJ+MTL
        (ObjOutput semantics; sinks/obj.py for the input contract)."""
        from .sinks.obj import obj_per_tile

        return obj_per_tile(faces)

    def serialize_pov(self, meshes: DataFrame) -> DataFrame:
        """Meshes -> (tile, pov_text): POV-Ray scene blocks
        (POVRayOutput semantics)."""
        from .sinks.povray import pov_per_tile

        return pov_per_tile(meshes)

    def serialize_gltf(self, meshes: DataFrame, binary: bool = False) -> DataFrame:
        """Meshes -> glTF: (tile, gltf_json) with sidecar-.bin buffer
        URIs, or the full (tile, glb) binary container when binary=True
        (GltfOutput semantics)."""
        from .sinks.gltf import glb_per_tile, gltf_json_per_tile

        return glb_per_tile(meshes) if binary else gltf_json_per_tile(meshes)

    def serialize_frontend_pbf(self, meshes: DataFrame) -> DataFrame:
        """Meshes -> (tile, pbf): frontend.proto Tile messages
        (FrontendPbfOutput semantics)."""
        from .sinks.frontend_pbf import encode_frontend_pbf

        return encode_frontend_pbf(meshes)

    def render(self, meshes: DataFrame, width: int = 256, height: int = 256,
               viewport: tuple | None = None,
               n_strips: int = 1) -> DataFrame:
        """Meshes -> per-tile pixel table (orthographic north-up render,
        ImageExporter semantics); n_strips > 1 renders each tile as
        independent strip tasks (multi-pass, pixel-identical — needs an
        explicit viewport). `render_png` encodes the result."""
        from .sinks.image import rasterize_strips, rasterize_tiles

        if n_strips > 1:
            if viewport is None:
                raise ValueError("strip rendering needs an explicit viewport")
            return rasterize_strips(meshes, width, height, viewport, n_strips)
        return rasterize_tiles(meshes, width, height, viewport)

    def render_png(self, pixels: DataFrame, width: int,
                   height: int) -> DataFrame:
        """Pixel table -> one (tile, png) row per tile (stdlib codec)."""
        from .sinks.image import render_png_tiles

        return render_png_tiles(pixels, width, height)

    # ------------------------------------------- world-module attributes

    def building_attributes(self, elements: DataFrame,
                            tags_col: str = "tags", **kw) -> DataFrame:
        """Simple-3D-Buildings levels/heights (operators/buildings.py;
        LevelAndHeightData.java:108-222)."""
        from .operators.buildings import level_and_height

        return level_and_height(elements, tags_col, **kw)

    def road_attributes(self, elements: DataFrame,
                        tags_col: str = "tags") -> DataFrame:
        """RoadModule lane layout + width (operators/roads.py)."""
        from .operators.roads import road_lanes_and_width

        return road_lanes_and_width(elements, tags_col)

    def barrier_attributes(self, elements: DataFrame,
                           tags_col: str = "tags") -> DataFrame:
        """BarrierModule kind + dimensions (operators/barriers.py)."""
        from .operators.barriers import barrier_dimensions

        return barrier_dimensions(elements, tags_col)

    def railway_attributes(self, elements: DataFrame,
                           tags_col: str = "tags") -> DataFrame:
        """RailwayModule track geometry (operators/railways.py)."""
        from .operators.railways import rail_geometry

        return rail_geometry(elements, tags_col)

    def power_cables(self, segments: DataFrame, nodes: DataFrame,
                     **kw) -> DataFrame:
        """PowerModule cable runs per power line: tower-config
        aggregate over connected lines + normal/high-voltage run
        tables (operators/power.py)."""
        from .operators.power import power_cable_runs

        return power_cable_runs(segments, nodes, **kw)

    def tree_attributes(self, elements: DataFrame, tags_col: str = "tags",
                        default_height: float = 10.0) -> DataFrame:
        """TreeModule dimensions (operators/trees.py); pass
        default_height=20.0 for forest elements."""
        from .operators.trees import tree_dimensions

        return tree_dimensions(elements, tags_col, default_height)

    def waterway_attributes(self, elements: DataFrame,
                            tags_col: str = "tags") -> DataFrame:
        """WaterModule waterway widths (operators/waterways.py)."""
        from .operators.waterways import waterway_width

        return waterway_width(elements, tags_col)

    def structure_attributes(self, elements: DataFrame,
                             tags_col: str = "tags") -> DataFrame:
        """Bridge/tunnel predicates, cliff height, bicycle stands
        (operators/structures.py)."""
        from .operators.structures import structure_flags

        return structure_flags(elements, tags_col)

    def traffic_signs(self, elements: DataFrame,
                      value_col: str) -> DataFrame:
        """Explode traffic_sign tag values into identifiers
        (operators/trafficsigns.py)."""
        from .operators.trafficsigns import parse_traffic_signs

        return parse_traffic_signs(elements, value_col)

    def aeroway_attributes(self, elements: DataFrame,
                           tags_col: str = "tags") -> DataFrame:
        """AerowayModule runway/taxiway widths (operators/aeroways.py)."""
        from .operators.aeroways import aeroway_width

        return aeroway_width(elements, tags_col)

    def furniture_attributes(self, elements: DataFrame,
                             tags_col: str = "tags") -> DataFrame:
        """StreetFurnitureModule multi-match kinds + dims — one row per
        matched kind (operators/furniture.py)."""
        from .operators.furniture import furniture_attributes

        return furniture_attributes(elements, tags_col)

    # ------------------------------------------------------------- convert

    def convert(self, docs: DataFrame, out_dir: str, run_ts: str = "run0",
                with_overlaps: bool = True,
                with_models: str | None = None) -> dict:
        """Full resumable pipeline: docs -> per-tile tile_assignments +
        overlaps parquet with commit manifest and lineage (the `tileset`
        bulk flow, TilesetCommand.java:99-137). with_models adds the S8
        serialize tail — triangulated area meshes written per tile as
        "obj" / "pov" / "gltf" / "fpbf" / "png" under <out_dir>/models."""
        from .plans.pipeline import TilePipeline

        return TilePipeline(self.spark, out_dir, self._origin()).run(
            docs, run_ts=run_ts, with_overlaps=with_overlaps,
            with_models=with_models,
        )


class DocumentBuilder:
    """MapDataBuilder analogue: assemble synthetic interleaved documents.

    Geometry spans encode rings as the documents source expects:
    "lat,lon lat,lon ..." with holes appended as " hole:..." groups.
    Span order per document is preserved (offset == list position), which
    is the span-sequence invariant the engine must keep end to end.
    """

    def __init__(self) -> None:
        self._docs: dict[str, list[tuple[str, str, str]]] = {}

    def _add(self, doc_id: str, kind: str, text: str, media_ref: str = "") -> "DocumentBuilder":
        self._docs.setdefault(doc_id, []).append((kind, text, media_ref))
        return self

    def add_text(self, doc_id: str, text: str) -> "DocumentBuilder":
        return self._add(doc_id, "text", text)

    def add_media(self, doc_id: str, media_ref: str, caption: str = "") -> "DocumentBuilder":
        return self._add(doc_id, "media", caption, media_ref)

    @staticmethod
    def _fmt(points) -> str:
        return " ".join(f"{lat:.7f},{lon:.7f}" for lat, lon in points)

    def add_node(self, doc_id: str, lat: float, lon: float) -> "DocumentBuilder":
        return self._add(doc_id, "geo_point", self._fmt([(lat, lon)]))

    def add_way(self, doc_id: str, points) -> "DocumentBuilder":
        return self._add(doc_id, "geo_way", self._fmt(points))

    @staticmethod
    def _closed(ring):
        ring = list(ring)
        if ring and tuple(ring[0]) != tuple(ring[-1]):
            ring.append(ring[0])
        return ring

    def add_area(self, doc_id: str, outer, holes=()) -> "DocumentBuilder":
        text = self._fmt(self._closed(outer))
        for h in holes:
            text += " hole:" + self._fmt(self._closed(h))
        return self._add(doc_id, "geo_area", text)

    def build(self, spark: SparkSession) -> DataFrame:
        rows = []
        for doc_id in sorted(self._docs):
            spans = [
                {"kind": k, "text": t, "media_ref": m, "offset": i}
                for i, (k, t, m) in enumerate(self._docs[doc_id])
            ]
            rows.append({"doc_id": doc_id, "spans": spans})
        return spark.createDataFrame(
            rows,
            "doc_id string, spans array<struct<kind string, text string, "
            "media_ref string, offset int>>",
        )
