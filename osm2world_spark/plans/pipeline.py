"""Tile-by-tile conversion pipeline with commit-manifest resume + lineage.

Reference (/root/reference/desktop/src/main/java/org/osm2world/console/
commands/TilesetCommand.java):
- the world is processed as independent tile jobs (:99-137)
- skip-existing resume: already-written tiles are filtered out before work
  starts (filterTileNumbers :140-156, OverwriteMode NEVER/OLDER/ALWAYS
  :39-41, fileIsMissingOrOverwritable :248-259)
- per-tile failure is contained, not fatal (:222-224); errors are routed to
  a structured conversion log (conversion/ConversionLog.java:18-97)
- per-run perf stats are written as JSON (O2WConverterImpl.java:421-494)

Spark shape:
- stage outputs are parquet directories partitioned by the golden z12 tile
  (tile_z12 = packed bigint), written with DYNAMIC PARTITION OVERWRITE so a
  re-run of a tile is idempotent (recompute overwrites, never duplicates)
- the `_commits` manifest (one parquet dir) records (stage, tile_z12) after
  the stage's data is durably written; on restart, committed tiles are
  ANTI-JOINED away before any work happens — the reference's skip-existing
  semantics, but transactional: data first, then commit, so a kill between
  the two only ever causes recompute, never loss or duplication
- `_lineage` records (stage, tile_z12, rows_out, wall_ms, run_ts) per stage
  run plus parse-error quarantine counts (FaultTolerantIterationUtil
  analogue: bad rows become lineage, not job aborts)

At cluster scale the stage writes are Iceberg tables with identity
partitioning on tile_z12; parquet directories stand in here with the same
layout and pruning behavior.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tiles as T
from ..functions.projection import Origin
from ..operators.spatial_join import spatial_self_join
from ..operators.tiling import assign_tiles
from ..sources.documents import DEFAULT_ORIGIN, extract_elements

GOLDEN_ZOOM = 12

# TilesetCommand.java:185-190 — defaults applied when absent from config
DEFAULT_TILE_CONFIG = {"keepOsmElements": "false", "clipToBounds": "true"}


def partition_spec() -> dict:
    """The cluster-scale partition spec for stage tables (SURVEY S2/S3),
    stated executably rather than as prose:

    - identity(tile_z12): the golden-tile key. Every per-tile read (resume
      anti-join, neighborhood restriction, a user's bbox query mapped to
      tiles) prunes to the matching partitions — the reference's
      tile-directory layout (TilesetCommand.java:99-137) as metadata
      pruning instead of a filesystem walk.
    - bucket(64, doc_id): spreads each tile's documents over 64 files so a
      dense urban tile parallelizes across executors and small-file count
      stays bounded on sparse tiles.

    The parquet stand-in used in this sandbox implements the identity
    dimension via partitionBy(tile_z12) (same pruning behavior, asserted
    in tests/test_plan_shape.py); the bucket dimension needs a table
    catalog (Iceberg `bucket(64, doc_id)` / Spark bucketBy) and is carried
    here as the declared spec for the cluster deployment."""
    return {
        "fields": [
            {"transform": "identity", "column": "tile_z12"},
            {"transform": "bucket[64]", "column": "doc_id"},
        ]
    }


def write_bucketed_stage(
    df: DataFrame, table: str, path: str, n_buckets: int = 64
) -> None:
    """Materialize a stage under the FULL partition_spec() — both
    dimensions exercised, not just declared: identity(tile_z12) via
    partitionBy and bucket(n, doc_id) via Spark bucketBy on an external
    parquet table (the catalog records the bucketing, the files live at
    `path`). On the cluster this is the Iceberg CREATE TABLE ...
    PARTITIONED BY (tile_z12, bucket(64, doc_id)); the Spark-bucketed
    parquet stand-in has the same read-side behavior:

    - a tile predicate prunes partitions (PartitionFilters in the scan),
    - a doc_id equality prunes buckets (SelectedBucketsCount n_selected
      out of n_buckets in the scan — 1/64th of the tile's files read),
    - a join or aggregation keyed on doc_id reuses the bucketing as a
      pre-existing hash distribution (no exchange on the stage side).

    sortBy(doc_id) additionally makes each bucket file range-readable,
    the stand-in for Iceberg's metadata min/max skipping on doc_id.
    """
    (
        df.write.format("parquet")
        .partitionBy("tile_z12")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_stage_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-backed read of a bucketed stage: going through the table
    (not the bare parquet path) is what lets the optimizer see the bucket
    spec for pruning and exchange elision."""
    return spark.table(table)


def _tile_z12_col():
    return T.pack_tile(
        F.lit(GOLDEN_ZOOM),
        T.tile_x_at((F.col("minlon") + F.col("maxlon")) / 2, GOLDEN_ZOOM),
        T.tile_y_at((F.col("minlat") + F.col("maxlat")) / 2, GOLDEN_ZOOM),
    )


class TilePipeline:
    """Resumable docs -> {tile_assignments, overlaps} pipeline.

    Two commit scopes:
    - batch (scoped=False, default): commits are global per (stage, tile) —
      re-running the SAME input skips committed tiles (the reference's
      skip-existing resume; same data replayed, so skipping loses nothing).
    - streaming (scoped=True): commits are per (stage, tile, run_ts) and
      stage output is partitioned by (tile_z12, run_ts). Later micro-batches
      carry NEW data for old tiles, so a tile committed by batch 1 must NOT
      be skipped in batch 2 — only a REPLAY of the same batch (same
      run_ts = batch id) is skipped. Dynamic partition overwrite then only
      touches this batch's (tile, run_ts) partitions, so replay is
      idempotent and prior batches' rows are never overwritten.
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        origin: Origin = DEFAULT_ORIGIN,
        scoped: bool = False,
        base_config: dict | None = None,
        tile_metadata: DataFrame | None = None,
    ):
        """`base_config` + per-tile `tile_metadata` reproduce the
        reference's per-tile config assembly (TilesetCommand.java:171-190:
        per-tile metadata merged over the base config, then defaults):
        tile_metadata is a DataFrame (tile_z12, land boolean); land=false
        flags the tile isAtSea (MetadataOptions.java:48-50), which skips
        element-overlap work for that tile (its content is open water)."""
        self.spark = spark
        self.out_dir = out_dir
        self.origin = origin
        self.scoped = scoped
        self.base_config = {**DEFAULT_TILE_CONFIG, **(base_config or {})}
        self.tile_metadata = tile_metadata
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def tile_config(self, tiles: DataFrame) -> DataFrame:
        """Effective per-tile config: (tile_z12, config map<string,string>).
        Base config (with TilesetCommand defaults) plus the isAtSea
        override where metadata says land=false."""
        keys = sorted(self.base_config)
        base = F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]),
            F.array(*[F.lit(str(self.base_config[k])) for k in keys]),
        )
        out = tiles.select("tile_z12").distinct().withColumn("config", base)
        if self.tile_metadata is not None:
            md = self.tile_metadata.select(
                "tile_z12", (F.col("land") == False).alias("is_at_sea")  # noqa: E712
            )
            out = (
                out.join(md, "tile_z12", "left")
                .withColumn(
                    "config",
                    F.when(
                        F.coalesce(F.col("is_at_sea"), F.lit(False)),
                        F.map_concat(
                            F.col("config"),
                            F.create_map(F.lit("isAtSea"), F.lit("true")),
                        ),
                    ).otherwise(F.col("config")),
                )
                .drop("is_at_sea")
            )
        return out

    def _at_sea_tiles(self) -> DataFrame | None:
        if self.tile_metadata is None:
            return None
        return self.tile_metadata.where(F.col("land") == False).select("tile_z12")  # noqa: E712

    # ---------------------------------------------------------- manifest

    def _commits_path(self) -> str:
        return os.path.join(self.out_dir, "_commits")

    def committed_tiles(self, stage: str, run_ts: str | None = None) -> DataFrame:
        """tile_z12 values already committed for `stage` (empty DF if none).
        In scoped (streaming) mode only commits from the SAME run_ts count:
        a replayed micro-batch is skipped, a new one is not."""
        path = self._commits_path()
        try:
            c = self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame([], "tile_z12 bigint")
        c = c.where(F.col("stage") == stage)
        if self.scoped and run_ts is not None:
            c = c.where(F.col("ts") == run_ts)
        # a tile is committed iff its 'done' rows outnumber its
        # 'invalidated' retractions (the manifest is append-only; each
        # invalidate/recompute cycle adds one row of each kind)
        return (
            c.groupBy("tile_z12")
            .agg(
                F.sum(F.when(F.col("status") == "done", 1).otherwise(0)).alias("_d"),
                F.sum(F.when(F.col("status") == "invalidated", 1).otherwise(0)).alias("_i"),
            )
            .where(F.col("_d") > F.col("_i"))
            .select("tile_z12")
        )

    def _commit(self, stage: str, tiles: DataFrame, run_ts: str) -> None:
        tiles.select(
            F.lit(stage).alias("stage"),
            F.col("tile_z12"),
            F.lit("done").alias("status"),
            F.lit(run_ts).alias("ts"),
        ).write.mode("append").parquet(self._commits_path())

    def _lineage(self, stage: str, counts: DataFrame, wall_ms: int, run_ts: str, errors: int = 0) -> None:
        counts.select(
            F.lit(stage).alias("stage"),
            F.col("tile_z12"),
            F.col("rows_out"),
            F.lit(errors).cast("bigint").alias("errors"),
            F.lit(wall_ms).cast("bigint").alias("wall_ms"),
            F.lit(run_ts).alias("run_ts"),
        ).write.mode("append").parquet(os.path.join(self.out_dir, "_lineage"))

    def invalidate(
        self,
        changed_docs: DataFrame | None = None,
        deleted_doc_ids: DataFrame | None = None,
        run_ts: str = "invalidate",
        stages: tuple = ("tile_assignments", "overlaps"),
    ) -> DataFrame:
        """Incremental update (the production path the reference's
        OverwriteMode.OLDER approximates with file mtimes): compute the
        tiles AFFECTED by a document change set and retract their commit
        rows, so the next `run()` over the updated corpus recomputes
        exactly those tiles and skips the rest.

        Affected set = OLD cover (tiles the changed/deleted docs occupy in
        the written tile_assignments stage) UNION NEW cover (tiles of the
        changed docs' new geometry); the overlaps stage additionally
        invalidates the 3x3 tile neighborhood (a changed element can pair
        with geometry in an adjacent tile — the same neighborhood rule
        run() uses for resume). Stage partition directories of affected
        tiles are deleted eagerly: dynamic partition overwrite only
        replaces tiles that receive NEW rows, so a tile whose documents
        were all deleted would otherwise keep stale data. (On a catalog
        deployment this is a partition-level DELETE; here it is the
        parquet-directory equivalent.)

        Returns the affected (stage, tile_z12) rows (also appended to the
        manifest with status='invalidated')."""
        import shutil

        spark = self.spark
        covers = []
        ids = None
        if changed_docs is not None:
            ids = changed_docs.select("doc_id").distinct()
            new_cover = (
                extract_elements(changed_docs, self.origin)
                .withColumn("tile_z12", _tile_z12_col())
                .select("tile_z12")
                .distinct()
            )
            covers.append(new_cover)
        if deleted_doc_ids is not None:
            d = deleted_doc_ids.select("doc_id").distinct()
            ids = d if ids is None else ids.unionByName(d).distinct()
        if ids is not None:
            try:
                old = spark.read.parquet(os.path.join(self.out_dir, "tile_assignments"))
                covers.append(
                    old.join(ids, "doc_id", "left_semi").select("tile_z12").distinct()
                )
            except Exception:
                pass  # nothing written yet -> nothing old to invalidate
        if not covers:
            return spark.createDataFrame([], "stage string, tile_z12 bigint")
        affected = covers[0]
        for c in covers[1:]:
            affected = affected.unionByName(c)
        # materialize to literals BEFORE any partition purge: the lazy plan
        # reads the stage parquet, which the purge below deletes (the
        # affected set is change-set-sized metadata, like a partition
        # DELETE predicate)
        aff_ids = sorted({r.tile_z12 for r in affected.distinct().collect()})
        affected = spark.createDataFrame([(v,) for v in aff_ids], "tile_z12 bigint")

        t = T.unpack_tile(F.col("tile_z12"))
        neighborhood = affected.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dx: F.transform(
                            F.sequence(F.lit(-1), F.lit(1)),
                            lambda dy: T.pack_tile(t["zoom"], t["x"] + dx, t["y"] + dy),
                        ),
                    )
                )
            ).alias("tile_z12")
        ).distinct()

        per_stage = {
            "tile_assignments": affected,
            "overlaps": neighborhood,
        }
        out = None
        for stage in stages:
            tiles = per_stage.get(stage, affected)
            # only retract tiles that are actually committed (idempotent)
            tiles = tiles.join(self.committed_tiles(stage), "tile_z12", "left_semi")
            rows = tiles.select(
                F.lit(stage).alias("stage"),
                F.col("tile_z12"),
                F.lit("invalidated").alias("status"),
                F.lit(run_ts).alias("ts"),
            )
            rows.write.mode("append").parquet(self._commits_path())
            # eager partition purge (see docstring)
            for r in tiles.collect():
                shutil.rmtree(
                    os.path.join(self.out_dir, stage, f"tile_z12={r['tile_z12']}"),
                    ignore_errors=True,
                )
            sel = tiles.select(F.lit(stage).alias("stage"), "tile_z12")
            out = sel if out is None else out.unionByName(sel)
        return out if out is not None else spark.createDataFrame([], "stage string, tile_z12 bigint")

    # ------------------------------------------------------------ stages

    def _run_stage(self, stage: str, df: DataFrame, run_ts: str) -> int:
        """Write one stage partitioned by tile_z12, skipping committed
        tiles; returns number of newly processed tiles. `df` must carry a
        tile_z12 column."""
        t0 = time.monotonic()
        committed = self.committed_tiles(stage, run_ts)
        todo = df.join(committed, "tile_z12", "left_anti")
        if "tile_x" in todo.columns and "tile_y" in todo.columns:
            # Z-order locality: cluster each output file along the Morton
            # curve of the fine tile coordinates, so a tile-range read
            # skips row groups via parquet min/max stats instead of
            # scattering matches across the file. sortWithinPartitions =
            # no exchange, just a per-task sort before the write.
            from ..functions.tiles import morton_key

            todo = todo.sortWithinPartitions(
                "tile_z12", morton_key(F.col("tile_x"), F.col("tile_y"))
            )
        # Stage data is recomputed per uncommitted tile; dynamic partition
        # overwrite makes a retried tile idempotent.
        path = os.path.join(self.out_dir, stage)
        if self.scoped:
            # per-batch partitions: overwrite only touches this run's
            # (tile, run_ts) dirs, earlier batches' rows stay intact
            todo = todo.withColumn("run_ts", F.lit(run_ts))
            todo.write.mode("overwrite").partitionBy("tile_z12", "run_ts").parquet(path)
            written = self.spark.read.parquet(path).where(F.col("run_ts") == run_ts)
        else:
            todo.write.mode("overwrite").partitionBy("tile_z12").parquet(path)
            written = self.spark.read.parquet(path)
        counts = written.join(
            committed, "tile_z12", "left_anti"
        ).groupBy("tile_z12").agg(F.count("*").alias("rows_out"))
        n_new = counts.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._lineage(stage, counts, wall_ms, run_ts, errors=getattr(self, "_stage_errors", 0))
        self._commit(stage, counts.select("tile_z12"), run_ts)
        return n_new

    def run(
        self,
        docs: DataFrame,
        run_ts: str = "run0",
        with_overlaps: bool = True,
        with_tileset: bool = False,
        with_models: str | None = None,
    ) -> dict:
        """Execute the pipeline; safe to re-run after a kill — committed
        tiles are skipped, partially written tiles are overwritten.

        Malformed geo spans are quarantined, not fatal
        (FaultTolerantIterationUtil.java:20-54): they are written to
        `_quarantine` with the run_ts and surface as real `errors` counts
        in the lineage rows, while the valid spans proceed."""
        from ..sources.documents import geo_span_errors

        elements = extract_elements(docs, self.origin).withColumn("tile_z12", _tile_z12_col())
        elements = elements.persist()
        report = {}

        errs = geo_span_errors(docs)
        n_errors = errs.count()
        if n_errors:
            errs.withColumn("run_ts", F.lit(run_ts)).write.mode("append").parquet(
                os.path.join(self.out_dir, "_quarantine")
            )
        report["errors"] = n_errors
        self._stage_errors = n_errors

        # compute-skip on resume: restrict inputs to uncommitted tiles (plus
        # a 1-tile neighborhood for the cross-tile join stage) BEFORE the
        # expensive operators run — the reference's filterTileNumbers
        # anti-join, applied to the plan rather than the outputs.
        ta_committed = self.committed_tiles("tile_assignments", run_ts)
        ta_elements = elements.join(ta_committed, "tile_z12", "left_anti")
        tiles_df = assign_tiles(ta_elements.drop("tile_z12"), with_cells=True).join(
            elements.select("doc_id", "span_idx", "tile_z12"), ["doc_id", "span_idx"]
        )
        report["tile_assignments"] = self._run_stage("tile_assignments", tiles_df, run_ts)

        if with_overlaps:
            ov_committed = self.committed_tiles("overlaps", run_ts)
            ov_elements = elements
            at_sea = self._at_sea_tiles()
            if at_sea is not None and not at_sea.isEmpty():
                # per-tile config override: isAtSea tiles carry open water,
                # element-overlap processing is skipped for them
                ov_elements = ov_elements.join(
                    F.broadcast(at_sea), "tile_z12", "left_anti"
                )
            if not ov_committed.isEmpty():
                uncommitted = (
                    elements.select("tile_z12").distinct().join(ov_committed, "tile_z12", "left_anti")
                )
                t = T.unpack_tile(F.col("tile_z12"))
                neighborhood = uncommitted.select(
                    F.explode(
                        F.flatten(
                            F.transform(
                                F.sequence(F.lit(-1), F.lit(1)),
                                lambda dx: F.transform(
                                    F.sequence(F.lit(-1), F.lit(1)),
                                    lambda dy: T.pack_tile(t["zoom"], t["x"] + dx, t["y"] + dy),
                                ),
                            )
                        )
                    ).alias("tile_z12")
                ).distinct()
                ov_elements = elements.join(neighborhood, "tile_z12", "left_semi")
            overlaps = spatial_self_join(ov_elements.drop("tile_z12"))
            # overlap rows keyed by the z12 tile of element a's doc span
            a_key = F.split(F.col("a_id"), "#")
            keyed = overlaps.join(
                elements.select(
                    F.concat_ws("#", "doc_id", "span_idx").alias("a_prefix"), "tile_z12"
                ).dropDuplicates(["a_prefix"]),
                F.concat_ws("#", a_key[0], a_key[1]) == F.col("a_prefix"),
            ).drop("a_prefix")
            report["overlaps"] = self._run_stage("overlaps", keyed, run_ts)

        if with_tileset:
            # S8 tileset layout sink: one JSON index doc per populated z12
            # root over the z14 content tiles (TilesetOutput.java:38-120).
            # Derived from this run's full tile assignments (cheap re-agg of
            # the committed stage table keeps resume semantics simple: the
            # index is rewritten whole, it is metadata, not per-tile data).
            from .tileset import write_tileset

            all_tiles = (
                docs.sparkSession.read.parquet(os.path.join(self.out_dir, "tile_assignments"))
                .select("zoom", "tile_x", "tile_y")
            )
            write_tileset(all_tiles, os.path.join(self.out_dir, "tileset"))
            report["tileset_roots"] = (
                docs.sparkSession.read.text(os.path.join(self.out_dir, "tileset")).count()
            )

        if with_models:
            # S8 model sinks: the reference's convert-and-serialize tail
            # (map data -> triangulated world geometry -> model files per
            # tile). Areas are ear-clipped (operators/triangulate.py) into
            # ground-plane meshes keyed by their z12 tile, then serialized
            # through the requested sink into <out_dir>/models.
            report["model_tiles"] = self._write_models(elements, with_models)

        elements.unpersist()
        return report

    def _write_models(self, elements: DataFrame, fmt: str) -> int:
        from pyspark.sql import Window

        from ..operators.triangulate import triangulate
        from ..sinks.write import write_binary_files, write_text_models

        out = os.path.join(self.out_dir, "models")
        tris = triangulate(elements)
        keyed = tris.join(
            elements.select(
                F.concat_ws("#", "doc_id", "span_idx").alias("eid"),
                F.col("tile_z12").cast("string").alias("tile"),
            ).dropDuplicates(["eid"]),
            "eid",
        )
        tri_array = F.transform(
            F.array_sort(F.collect_list(F.struct(
                "tri_idx", "ax", "az", "bx", "bz", "cx", "cz"))),
            lambda s: F.array(
                F.struct(s["ax"].alias("x"), F.lit(0.0).alias("y"),
                         s["az"].alias("z")),
                F.struct(s["bx"].alias("x"), F.lit(0.0).alias("y"),
                         s["bz"].alias("z")),
                F.struct(s["cx"].alias("x"), F.lit(0.0).alias("y"),
                         s["cz"].alias("z")),
            ),
        )
        w = Window.partitionBy("tile").orderBy("eid")
        meshes = (
            keyed.groupBy("tile", "eid").agg(tri_array.alias("triangles"))
            .select(
                "tile", F.col("eid").alias("osm_id"),
                F.row_number().over(w).cast("bigint").alias("mesh_order"),
                F.lit("Area").alias("type_name"),
                F.lit("TERRAIN_DEFAULT").alias("material"),
                F.lit(147).alias("r"), F.lit(171).alias("g"),
                F.lit(132).alias("b"), "triangles",
            )
        )
        if fmt == "obj":
            from ..sinks.obj import obj_per_tile

            faces = meshes.select(
                "tile",
                (F.col("mesh_order") * 4096).alias("face_order"),
                F.col("type_name").alias("group_name"),
                F.col("osm_id").alias("object_name"),
                "material", "r", "g", "b",
                F.posexplode("triangles").alias("ti", "vertices"),
            ).select(
                "tile", (F.col("face_order") + F.col("ti")).alias("face_order"),
                "group_name", "object_name", "material", "r", "g", "b",
                "vertices",
                F.lit(None).cast(
                    "array<struct<x:double,y:double,z:double>>"
                ).alias("normals"),
                F.lit(None).cast(
                    "array<struct<u:double,v:double>>").alias("texcoords"),
            )
            docs_df = obj_per_tile(faces)
            write_text_models(docs_df, os.path.join(out, "obj"), "obj_text")
            write_text_models(docs_df, os.path.join(out, "mtl"), "mtl_text")
        elif fmt == "pov":
            from ..sinks.povray import pov_per_tile

            write_text_models(pov_per_tile(meshes), os.path.join(out, "pov"),
                              "pov_text")
        elif fmt == "gltf":
            from ..sinks.write import write_gltf_tileset

            write_gltf_tileset(meshes, os.path.join(out, "gltf"))
        elif fmt == "fpbf":
            from ..sinks.frontend_pbf import encode_frontend_pbf

            write_binary_files(encode_frontend_pbf(meshes),
                               os.path.join(out, "fpbf"), "tile", "pbf",
                               ".pbf")
        elif fmt == "png":
            from ..sinks.image import write_png_tiles

            # per-tile auto viewport (the reference's ortho camera over
            # the tile's data bbox, ImageExporter.java)
            write_png_tiles(meshes, os.path.join(out, "png"))
        else:
            raise ValueError(f"unknown model format {fmt!r}")
        return meshes.select("tile").distinct().count()
