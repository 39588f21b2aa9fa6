"""Structured Streaming ingestion tests (scale-path, not reference
parity — the reference is batch-only)."""

import os

import pytest


def _write_docs(spark, path, n, seed):
    from osm2world_spark.sources.documents import synthetic_documents

    synthetic_documents(spark, n, seed=seed).coalesce(1).write.mode("append").parquet(path)


def test_stream_tile_counts(spark, tmp_path):
    from osm2world_spark.streaming.ingest import stream_documents, stream_tile_counts

    src = str(tmp_path / "docs")
    _write_docs(spark, src, 300, seed=1)

    stream = stream_documents(spark, src)
    assert stream.isStreaming
    counts = stream_tile_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_elements) AS n FROM tile_counts").first()["n"]
    assert got > 0

    # batch equivalence: the same plan over a batch read gives the same totals
    from osm2world_spark.operators.tiling import assign_tiles
    from osm2world_spark.sources.documents import extract_elements

    batch = assign_tiles(extract_elements(spark.read.parquet(src)), with_cells=False)
    assert got == batch.count()


def test_stream_into_pipeline_resumable(spark, tmp_path):
    from osm2world_spark.streaming.ingest import stream_documents, stream_into_pipeline

    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, 200, seed=2)

    writer = stream_into_pipeline(
        stream_documents(spark, src), out, ckpt, with_overlaps=False
    )
    q = writer.start()
    q.awaitTermination(180)
    tiles1 = spark.read.parquet(os.path.join(out, "tile_assignments"))
    n1 = tiles1.count()
    assert n1 > 0
    commits = spark.read.parquet(os.path.join(out, "_commits"))
    assert commits.count() > 0

    # new data arrives; restart the stream from the checkpoint — only the
    # new files process, and already-committed tiles are skipped inside
    # the pipeline
    _write_docs(spark, src, 200, seed=3)
    q2 = stream_into_pipeline(
        stream_documents(spark, src), out, ckpt, with_overlaps=False
    ).start()
    q2.awaitTermination(180)
    n2 = spark.read.parquet(os.path.join(out, "tile_assignments")).count()
    assert n2 >= n1  # grew with the new batch, nothing lost
