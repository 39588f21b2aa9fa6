"""Structured Streaming ingestion tests (scale-path, not reference
parity — the reference is batch-only)."""

import os

import pytest
from pyspark.sql import functions as F


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
    # new files process. Commits are scoped per batch, so batch-2 docs that
    # land in tiles ALREADY committed by batch 1 must still be written
    # (streaming semantics: later batches carry new data for old tiles).
    _write_docs(spark, src, 200, seed=3)
    q2 = stream_into_pipeline(
        stream_documents(spark, src), out, ckpt, with_overlaps=False
    ).start()
    q2.awaitTermination(180)
    tiles2 = spark.read.parquet(os.path.join(out, "tile_assignments"))
    n2 = tiles2.count()

    # batch equivalence over ALL docs: nothing lost, nothing duplicated
    from osm2world_spark.operators.tiling import assign_tiles
    from osm2world_spark.sources.documents import extract_elements

    expected = assign_tiles(
        extract_elements(spark.read.parquet(src)), with_cells=True
    ).count()
    assert n2 == expected

    # the precondition that makes the check meaningful: batch 2 really did
    # hit tiles batch 1 had already committed
    b1 = tiles1.select("tile_z12").distinct()
    b2_new = tiles2.where(F.col("run_ts") == "batch1").select("tile_z12").distinct()
    assert b2_new.join(b1, "tile_z12", "left_semi").count() > 0


def test_batch_pipeline_resume_unscoped(spark, tmp_path):
    """Batch mode keeps global skip-existing semantics: re-running the SAME
    input skips committed tiles and duplicates nothing."""
    from osm2world_spark.plans.pipeline import TilePipeline
    from osm2world_spark.sources.documents import synthetic_documents

    docs = synthetic_documents(spark, 150, seed=7)
    out = str(tmp_path / "out")
    p = TilePipeline(spark, out)
    r1 = p.run(docs, run_ts="run1", with_overlaps=False)
    n1 = spark.read.parquet(os.path.join(out, "tile_assignments")).count()
    r2 = p.run(docs, run_ts="run2", with_overlaps=False)
    n2 = spark.read.parquet(os.path.join(out, "tile_assignments")).count()
    assert r1["tile_assignments"] > 0
    assert r2["tile_assignments"] == 0  # everything already committed
    assert n1 == n2


def test_stream_session_stats_matches_batch(spark, tmp_path):
    from osm2world_spark.streaming.ingest import stream_events, stream_session_stats

    src = str(tmp_path / "events")
    # two appends -> two source files, so sessions span micro-batch input files
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    out = stream_session_stats(stream_events(spark, src), gap_minutes=30.0)
    q = (
        out.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql(
            "SELECT user_id, session_start, session_end, n_events, sum_value FROM sess"
        ).collect()
    )

    want = sorted(
        tuple(r)
        for r in stream_session_stats(
            spark.read.parquet(src), gap_minutes=30.0
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_dedup_documents(spark, tmp_path):
    """Watermarked streaming dedup passes each doc_id once per watermark
    window and agrees with the batch exact-dedup count."""
    from pyspark.sql import functions as F

    from osm2world_spark.sources.documents import synthetic_documents
    from osm2world_spark.streaming.ingest import stream_dedup_documents

    src = str(tmp_path / "in")
    docs = synthetic_documents(spark, 200, seed=3).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("doc_id"), F.lit(60))),
    )
    # duplicate every row (a re-delivery within the watermark window)
    docs.unionByName(docs).write.parquet(src)

    stream = (
        spark.readStream.schema(
            "doc_id string, spans array<struct<kind string, text string, "
            "media_ref string, offset int>>, ingest_ts timestamp"
        )
        .parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_dedup_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert got.select("doc_id").distinct().count() == 200


def test_stream_hll_windowed_matches_batch(spark, tmp_path):
    from osm2world_spark.operators.sketches import hll_estimate
    from osm2world_spark.streaming.ingest import stream_events, stream_hll_windowed

    src = str(tmp_path / "hll_events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    out = stream_hll_windowed(stream_events(spark, src), p=10)
    q = (
        out.writeStream.format("memory")
        .queryName("hllw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT window_start, idx, r FROM hllw").collect()
    )
    batch = stream_hll_windowed(spark.read.parquet(src), p=10)
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(got) > 0

    # per-window estimates are within HLL error of the exact distincts
    hours = spark.sql(
        "SELECT window_start, count(*) AS nreg FROM hllw GROUP BY 1 ORDER BY 2 DESC LIMIT 1"
    ).collect()
    top = hours[0]["window_start"]
    regs = spark.sql(
        f"SELECT idx, r FROM hllw WHERE window_start = '{top}'"
    )
    est = hll_estimate(regs, p=10).first()["estimate"]
    exact = (
        spark.read.parquet(src)
        .where(F.date_trunc("hour", F.col("ts")) == F.lit(top))
        .select("user_id")
        .distinct()
        .count()
    )
    assert exact > 0 and abs(est - exact) / exact < 0.15


def test_stream_tile_state_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): after all
    micro-batches, the LAST emission per tile equals the batch
    groupBy/bit_xor over the same rows — arrival order and micro-batch
    boundaries cannot change the state (xor is order-independent)."""
    from osm2world_spark.streaming.ingest import (
        stream_documents,
        stream_tile_state,
        tile_sig_rows,
        tile_state_batch,
    )

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, 150, seed=11)

    collected = []

    def run():
        q = (
            stream_tile_state(tile_sig_rows(stream_documents(spark, src, max_files=1)))
            .writeStream.foreachBatch(
                lambda df, bid: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    # second chunk arrives; the checkpoint resumes and folds it in
    _write_docs(spark, src, 150, seed=12)
    run()

    # final state per tile = the last emission, which is also the one
    # with the highest n_elements (n strictly grows per touched tile)
    merged = {}
    for r in collected:
        k = (r["zoom"], r["tile_x"], r["tile_y"])
        if k not in merged or r["n_elements"] > merged[k][0]:
            merged[k] = (r["n_elements"], r["sig"])

    want = {
        (r["zoom"], r["tile_x"], r["tile_y"]): (r["n_elements"], r["sig"])
        for r in tile_state_batch(tile_sig_rows(spark.read.parquet(src))).collect()
    }
    assert merged == want


def test_stream_tile_state_emits_only_touched_tiles(spark, tmp_path):
    from osm2world_spark.streaming.ingest import (
        stream_documents,
        stream_tile_state,
        tile_sig_rows,
        tile_state_batch,
    )

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(spark, src, 120, seed=21)
    first = []
    q = (
        stream_tile_state(tile_sig_rows(stream_documents(spark, src)))
        .writeStream.foreachBatch(lambda df, bid: first.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(first) > 0

    # ONE new doc -> the follow-up batch emits only that doc's tiles
    _write_docs(spark, src, 1, seed=22)
    second = []
    q2 = (
        stream_tile_state(tile_sig_rows(stream_documents(spark, src)))
        .writeStream.foreachBatch(lambda df, bid: second.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    emitted = len(second)
    total = tile_state_batch(tile_sig_rows(spark.read.parquet(src))).count()
    assert 0 < emitted < total / 2, (emitted, total)


def test_tile_sig_rows_md5_mode_matches_conv(spark, tmp_path):
    """The portable md5 signature path: values fit in 60 bits and xor
    to the same batch rollup the production xxhash path structures."""
    from osm2world_spark.streaming.ingest import tile_sig_rows, tile_state_batch

    src = str(tmp_path / "docs")
    _write_docs(spark, src, 60, seed=31)
    docs = spark.read.parquet(src)
    a = tile_state_batch(tile_sig_rows(docs, hash_mode="md5"))
    b = tile_state_batch(tile_sig_rows(docs, hash_mode="xxhash"))
    ka = {(r["zoom"], r["tile_x"], r["tile_y"]): r["n_elements"] for r in a.collect()}
    kb = {(r["zoom"], r["tile_x"], r["tile_y"]): r["n_elements"] for r in b.collect()}
    assert ka == kb
    assert all(0 <= r["sig"] < (1 << 60) for r in a.collect())


def test_stream_event_correlation_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == its batch twin."""
    from osm2world_spark.streaming.ingest import (
        stream_event_correlation,
        stream_events,
    )

    src = str(tmp_path / "corr_events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    def split(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "view"),
        )

    sl, sr = split(stream_events(spark, src))
    q = (
        stream_event_correlation(sl, sr, lookback_minutes=10.0)
        .writeStream.format("memory")
        .queryName("corr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM corr").collect())

    bl, br = split(spark.read.parquet(src))
    want = sorted(
        tuple(r)
        for r in stream_event_correlation(bl, br, lookback_minutes=10.0).collect()
    )
    assert got == want and len(got) > 0
    # every pair respects the interval contract
    assert all(0.0 <= r[-1] <= 600.0 for r in got)
