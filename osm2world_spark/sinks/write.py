"""File materialization for the S8 serializer sinks.

The reference writes each model file through a java.io stream on the
converter thread (ObjOutput.java:74-105, GltfOutput.outputScene). Here
the serialized content is already a DataFrame — one row per output
file — so materialization is just a sink choice:

* Text formats (OBJ, MTL, POV, glTF JSON) go through Spark's
  partitioned text writer in the same hive layout the tileset sink
  uses (`plans/tileset.py::write_tileset`): ``tile=<id>/part-*.ext``.
  A serving layer maps partition dirs to file URIs 1:1. Fully
  distributed, no driver involvement, works on any Hadoop filesystem.

* Binary payloads (GLB containers, glTF .bin sidecars) have no Spark
  writer, so :func:`write_binary_files` streams them from executors
  with ``foreachPartition`` — each task writes its own files under the
  target directory. The target must be a filesystem every executor can
  reach (local dir in local mode, NFS/Lustre on a cluster); for object
  stores, land the hive-parquet form (`df.write.partitionBy("tile")`)
  and export from there instead. Documented trade-off, not a driver
  bottleneck: bytes never pass through the driver either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def write_text_models(df: DataFrame, path: str, text_col: str) -> None:
    """One text file per tile, hive layout ``tile=<id>/part-*.txt``.

    ``repartition("tile")`` keeps it to a single part file per tile
    (matching one-OBJ-per-tile), and the text writer streams the value
    column verbatim — the bytes on disk are exactly the serialized
    model plus a trailing newline per row.
    """
    (
        df.select(F.col(text_col).alias("value"), "tile")
        .repartition("tile")
        .write.partitionBy("tile")
        .mode("overwrite")
        .text(path)
    )


def write_binary_files(
    df: DataFrame, path: str, name_col: str, data_col: str, suffix: str
) -> None:
    """Write one ``<name><suffix>`` file per row from the executors.

    For GLB containers pass the glb_per_tile output with
    ``name_col="tile"``; for glTF sidecar buffers pass gltf_buffers
    with a precomputed ``<tile>_<k>`` name column. The directory must
    be reachable from every executor (see module docstring).
    """
    rows = df.select(
        F.col(name_col).cast("string").alias("name"), F.col(data_col).alias("data")
    )
    os.makedirs(path, exist_ok=True)

    def _write(it) -> None:
        for r in it:
            # names come from tile ids / buffer indexes we generated;
            # basename() guards against separator bytes regardless
            fname = os.path.basename(r["name"]) + suffix
            with open(os.path.join(path, fname), "wb") as f:
                f.write(bytes(r["data"]))

    rows.foreachPartition(_write)


def write_gltf_tileset(meshes: DataFrame, path: str) -> None:
    """Full glTF export: per tile, the JSON document (text hive layout
    under ``<path>/json``) and its ``<tile>_<k>.bin`` sidecar buffers
    (flat files under ``<path>/buffers``, the URIs the JSON references).
    """
    from .gltf import gltf_buffers, gltf_json_per_tile

    write_text_models(gltf_json_per_tile(meshes), os.path.join(path, "json"),
                      "gltf_json")
    bufs = gltf_buffers(meshes).select(
        F.concat_ws("_", "tile", "buffer_index").alias("name"), "data"
    )
    write_binary_files(bufs, os.path.join(path, "buffers"), "name", "data",
                       ".bin")
