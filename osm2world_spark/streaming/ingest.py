"""Streaming ingestion: continuous document arrival -> per-tile state.

The reference has NO streaming semantics (SURVEY.md §2.8) — its
"incremental" surface is batch-level skip-existing resume. This module is
therefore not reference parity; it is the engine's scale-path for
CONTINUOUS document arrival: the same batch operators (element
extraction, tile assignment, the resumable TilePipeline) applied through
Structured Streaming.

Design:
- `stream_documents(spark, path)`: a file-source stream of interleaved
  document parquet (new files under `path` are discovered per
  micro-batch; schema is the input_hint document shape).
- `stream_tile_counts(docs_stream)`: stateless transformation chain
  (extract -> assign tiles) + grouped aggregation; in append/update mode
  Spark maintains the per-tile running counts as streaming state. The
  transformation plan is IDENTICAL to the batch plan — `assign_tiles`
  and `extract_elements` are stream-agnostic DataFrame functions.
- `stream_into_pipeline(docs_stream, out_dir)`: `foreachBatch` bridge —
  every micro-batch runs through the commit-manifest TilePipeline, so a
  crashed stream resumes exactly like a killed batch job (checkpointed
  source offsets + idempotent per-tile dynamic-partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import _epoch

DOC_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def stream_documents(spark: SparkSession, path: str, max_files: int = 64) -> DataFrame:
    """File-source document stream (new parquet files under `path`)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_tile_counts(docs_stream: DataFrame) -> DataFrame:
    """docs stream -> streaming per-tile element counts (update-mode
    aggregation state keyed by tile). The plan is the batch plan — the
    operators are stream-agnostic."""
    from ..operators.tiling import assign_tiles
    from ..sources.documents import extract_elements

    elements = extract_elements(docs_stream)
    tiles = assign_tiles(elements, with_cells=False)
    return tiles.groupBy("zoom", "tile_x", "tile_y").agg(
        F.count("*").alias("n_elements")
    )


def stream_into_pipeline(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    with_overlaps: bool = True,
):
    """foreachBatch bridge into the resumable TilePipeline: each
    micro-batch is one pipeline run with commits SCOPED to its batch id.
    A replayed batch (same id, same data — Structured Streaming's replay
    contract) anti-joins away its own committed tiles, so effects are
    exactly-once; a LATER batch carrying new data for an already-committed
    tile is NOT skipped — its rows land in that tile's per-batch partition
    alongside earlier batches' rows."""
    from ..plans.pipeline import TilePipeline

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline = TilePipeline(batch_df.sparkSession, out_dir, scoped=True)
        pipeline.run(batch_df, run_ts=f"batch{batch_id}", with_overlaps=with_overlaps)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str, max_files: int = 64) -> DataFrame:
    """File-source event stream (new parquet files under `path`)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_session_stats(
    events_stream: DataFrame,
    gap_minutes: float = 30.0,
    watermark_minutes: float = 60.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time sessionization as a streaming stateful aggregation:
    watermark bounds state (sessions older than the watermark are
    finalized and evicted — without it, per-key session state grows
    forever), and `session_window` merges events whose gaps are under
    `gap_minutes` into one growing window per key. The identical
    expression runs in batch (same function, batch DataFrame in), which
    is how the test pins stream/batch agreement. This is the
    native-state sibling of the batch `operators/temporal.sessionize`
    plan (lag + running sum), whose strictly-greater gap rule differs at
    the exact-gap boundary from session_window's merge rule."""
    win = F.session_window(F.col(ts_col), f"{gap_minutes * 60:.0f} seconds")
    src = events_stream
    if events_stream.isStreaming:
        src = events_stream.withWatermark(ts_col, f"{watermark_minutes * 60:.0f} seconds")
    return (
        src.groupBy(F.col(key_col), win)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_documents(
    docs_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same doc_id whose
    event times fall within the watermark window
    (`dropDuplicatesWithinWatermark`), the streaming twin of the batch
    exact-dedup pass. State is bounded by the watermark — the dedup key
    set older than the delay is evicted, so a continuous ingest never
    accumulates unbounded keys (the property a plain dropDuplicates on a
    stream would violate)."""
    return docs_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )


def stream_hll_windowed(
    events_stream: DataFrame,
    value_col: str = "user_id",
    ts_col: str = "ts",
    window_minutes: float = 60.0,
    watermark_minutes: float = 120.0,
    p: int = 12,
) -> DataFrame:
    """Per-event-time-window HyperLogLog registers over a stream —
    rolling distinct-count estimation, the canonical streaming-sketch
    shape: the aggregation state is BOUNDED BY CONSTRUCTION (at most
    2^p registers per open window; max(rank) is mergeable, so partial
    aggregation and late-arrival merges are exact), and the watermark
    evicts finalized windows, so a continuous ingest holds at most
    (watermark / window) * 2^p rows of state. The identical expression
    runs on a batch DataFrame (no watermark applied), which is how the
    stream==batch test pins agreement; `hll_estimate` turns any one
    window's register set into the distinct-count estimate."""
    from ..operators.sketches import hll_cols

    idx, rank = hll_cols(F.col(value_col), p)
    src = events_stream
    if events_stream.isStreaming:
        src = events_stream.withWatermark(
            ts_col, f"{watermark_minutes * 60:.0f} seconds"
        )
    win = F.window(F.col(ts_col), f"{window_minutes * 60:.0f} seconds")
    # group by the window struct itself (not an extracted field) so the
    # streaming planner keeps the event-time linkage for state eviction
    return (
        src.select(win.alias("w"), idx.alias("idx"), rank.alias("rank"))
        .groupBy("w", "idx")
        .agg(F.max("rank").alias("r"))
        .select(F.col("w.start").alias("window_start"), "idx", "r")
    )


def tile_sig_rows(docs: DataFrame, hash_mode: str = "xxhash") -> DataFrame:
    """documents (batch OR stream) -> (zoom, tile_x, tile_y, sig): one
    row per (element, overlapped tile) with an order-independent 60-bit
    element signature. hash_mode='xxhash' is the production path (one
    JVM hash, no string building); 'md5' is the portable family every
    ANSI engine reproduces (the oracle path, same idiom as
    operators/sketches.bloom_build)."""
    from ..operators.tiling import assign_tiles
    from ..sources.documents import extract_elements

    tiles = assign_tiles(extract_elements(docs), with_cells=False)
    if hash_mode == "xxhash":
        sig = F.xxhash64("doc_id", "span_idx", "zoom", "tile_x", "tile_y")
    else:
        key = F.concat_ws(
            "|", F.col("doc_id"), F.col("span_idx"), F.col("zoom"),
            F.col("tile_x"), F.col("tile_y"),
        )
        sig = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return tiles.select("zoom", "tile_x", "tile_y", sig.alias("sig"))


TILE_STATE_SCHEMA = (
    "zoom int, tile_x int, tile_y int, n_elements bigint, sig bigint"
)


def stream_tile_state(sig_rows: DataFrame) -> DataFrame:
    """CUSTOM stateful streaming operator (applyInPandasWithState —
    the shape Spark's built-in streaming aggregations cannot express:
    per-key state with an arbitrary transition function and
    emit-on-change output).

    Incremental tile invalidation over a continuous ingest: state per
    tile is (n_elements, xor-signature); each micro-batch folds its
    rows into the state with one vectorized numpy pass and emits ONE
    row per TOUCHED tile — downstream consumers (tileset refresh, cache
    invalidation) see exactly the tiles whose content changed, not the
    whole world. XOR is commutative/associative/self-inverse, so the
    running signature is independent of arrival order and micro-batch
    boundaries: after any prefix of the stream the state equals the
    batch groupBy/bit_xor over the same rows (the stream==batch test),
    and feeding a retraction (the same sig again) cancels it.

    State size: O(1) per tile, bounded by the tile universe (4^zoom
    ceiling; in practice the touched set) — no watermark needed for
    boundedness, which is why NoTimeout is sound here.
    """
    import numpy as np
    import pandas as pd

    def update(key, pdfs, state):
        if state.exists:
            n, sig = state.get
        else:
            n, sig = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                sig ^= int(np.bitwise_xor.reduce(pdf["sig"].to_numpy(np.int64)))
        state.update((n, sig))
        yield pd.DataFrame(
            {
                "zoom": [key[0]],
                "tile_x": [key[1]],
                "tile_y": [key[2]],
                "n_elements": [n],
                "sig": [sig],
            }
        )

    return sig_rows.groupBy("zoom", "tile_x", "tile_y").applyInPandasWithState(
        update,
        outputStructType=TILE_STATE_SCHEMA,
        stateStructType="n bigint, sig bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def tile_state_batch(sig_rows: DataFrame) -> DataFrame:
    """Batch twin of stream_tile_state's final state: one bit_xor/count
    aggregation (map-side partial combine, one exchange)."""
    return sig_rows.groupBy("zoom", "tile_x", "tile_y").agg(
        F.count("*").alias("n_elements"),
        F.expr("bit_xor(sig)").alias("sig"),
    )


def stream_event_correlation(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback_minutes: float = 10.0,
    watermark_minutes: float = 30.0,
) -> DataFrame:
    """Stream-stream inner join: every left event paired with the right
    events of the same key whose timestamps fall in
    (left.ts - lookback, left.ts] — the click-to-preceding-view
    correlation shape. Returns (key, l_event_id, l_ts, r_event_id,
    r_ts, lag_seconds).

    Streaming semantics: BOTH sides carry watermarks and the join
    condition bounds event-time distance, which is exactly what Spark
    requires to evict buffered rows — a stream-stream join without the
    time-range condition would buffer both streams forever. Right rows
    older than watermark + lookback are dropped from state; output is
    append-mode.

    The identical expression runs in batch (same function, batch frames
    in) — that twin is the correctness pin. Note the batch PLAN is a
    range theta-join, fine at query sizes; a batch BACKFILL over two
    huge tables should use operators/temporal.interval_join (the
    bucketed form) instead — same semantics, bounded join keys.
    """
    wm = f"{watermark_minutes * 60:.0f} seconds"
    l = left.select(
        F.col(key_col).alias("_lk"),
        F.col("event_id").alias("l_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.select(
        F.col(key_col).alias("_rk"),
        F.col("event_id").alias("r_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", wm)
    if r.isStreaming:
        r = r.withWatermark("r_ts", wm)
    lb = int(lookback_minutes * 60)
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lb} SECONDS"))
    )
    return (
        l.join(r, cond)
        .select(
            F.col("_lk").alias(key_col),
            "l_event_id",
            "l_ts",
            "r_event_id",
            "r_ts",
            (_epoch(F.col("l_ts")) - _epoch(F.col("r_ts"))).alias("lag_seconds"),
        )
    )
