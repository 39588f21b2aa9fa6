"""Temporal operators over the event stream: gap-based sessionization and
an as-of (most-recent-prior) join.

The reference engine is batch-spatial and has no event-time semantics
(SURVEY.md §2.8); these are the engine's scale-path analytics for the
`events` table — the temporal siblings of the spatial kNN/attach family
(`nearest_attach` is the spatial as-of analog, operators/attach.py).

Spark shape — both are pure window/join plans, no Python:

- `sessionize`: one hash shuffle on the entity key; `lag` marks gap
  breaks, a running `sum` over the same window numbers sessions. Two
  window functions over ONE window spec → Catalyst plans a single
  Exchange + Sort, then both windows run in the same physical Window
  node. At 100 TB this is the minimal plan for sessionization: one
  shuffle, no state blow-up (contrast a stateful stream, which needs
  the same partitioning plus a state store).
- `asof_join`: each left row matched to the latest right row with
  `right.ts <= left.ts` within the entity key. Implemented as
  union-and-window (tag both sides, one window ordered by (ts, tag)
  carries the last right value forward) — one shuffle on the key,
  linear in |L|+|R|, never builds the |L|×|R| range-join intermediate
  a naive `ts_r <= ts_l` theta-join would. DuckDB's native ASOF JOIN
  is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch(col: F.Column) -> F.Column:
    """Epoch seconds (with subsecond fraction) from a TIMESTAMP or
    TIMESTAMP_NTZ column. NTZ cannot cast to double directly; going
    through TIMESTAMP is exact because the engine pins
    spark.sql.session.timeZone=UTC (session.py), so the wall-clock is
    interpreted identically to DuckDB's naive epoch()."""
    return col.cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign each event a per-key `session_id` (1-based, in time order):
    a new session starts when the gap to the previous event of the same
    key exceeds `gap_minutes`. Ties on ts are broken by event order within
    the window sort (deterministic given unique ts per key)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = _epoch(F.col(ts_col)) - F.lag(_epoch(F.col(ts_col))).over(w)
    is_new = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("session_id", F.sum(is_new).over(w))


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, session) roll-up: event count, span seconds, value sum.
    The groupBy reuses the sessionize shuffle's partitioning (same key
    prefix), so AQE coalesces rather than re-exchanging."""
    s = sessionize(events, gap_minutes, key_col, ts_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.max(_epoch(F.col(ts_col))) - F.min(_epoch(F.col(ts_col))), 6
        ).alias("span_sec"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the `value_cols` of the LATEST right row
    with right.ts <= left.ts and the same key (null if none precedes).

    Union-and-window: right rows are tagged 0, left rows 1; sorting by
    (ts, tag) inside each key puts each right row before any same-instant
    left row. The carried marker is the whole right-row STRUCT (null only
    on left rows), so `last(_, ignorenulls=True)` carries the matching
    right row even when its individual values are NULL — a legitimately
    NULL right value is returned as NULL, not skipped for an older
    non-null one. Ties at the same (key, ts) break deterministically on
    the struct's field values (greatest wins), so value_cols must be
    orderable types. One shuffle, O(|L|+|R|) — the plan a range theta-join
    cannot give."""
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    row_t = StructType([StructField(c, right.schema[c].dataType) for c in value_cols])
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast(row_t).alias("_asof_row"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_asof_tag"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_asof_row"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_asof_tag").asc(), F.col("_asof_row").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        *lcols,
        F.col("_asof_tag"),
        F.last(F.col("_asof_row"), ignorenulls=True).over(w).alias("_asof_row"),
    )
    return carried.where(F.col("_asof_tag") == 1).select(
        *lcols,
        *[F.col("_asof_row")[c].alias(f"{c}{suffix}") for c in value_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    window_seconds: float,
) -> DataFrame:
    """All (left, right) pairs with equal `key_col` and |left.ts - right.ts|
    <= window_seconds — the time-interval join (inner: the bucket
    replication makes outer variants ill-defined row-per-row).

    A naive range theta-join degenerates to a per-key cartesian product
    (Spark plans BroadcastNestedLoopJoin or a sort-merge with full range
    scan). Instead: quantize time into window-sized buckets, replicate the
    LEFT side into its bucket and both neighbors (any pair within the
    window differs by at most one bucket), and equi-join on (key, bucket)
    — one hash shuffle per side, candidate count proportional to true
    local density, exact filter after. The same cell-cover + refine shape
    as the spatial join (operators/spatial_join.py), one dimension down.

    Column layout: left columns keep their names, right columns get an
    `r_` prefix (key/ts included, so both sides' timestamps survive)."""
    w = float(window_seconds)
    lb = F.floor(_epoch(F.col(ts_col)) / w).cast("bigint")
    l_rep = left.select(
        "*", F.explode(F.array(lb - 1, lb, lb + 1)).alias("_lb")
    )
    r_tag = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.floor(_epoch(F.col(ts_col)) / w).cast("bigint").alias("_rb"),
    )
    joined = l_rep.join(
        r_tag,
        (F.col("_lb") == F.col("_rb")) & (F.col(key_col) == F.col(f"r_{key_col}")),
        "inner",
    )
    dt = _epoch(F.col(ts_col)) - _epoch(F.col(f"r_{ts_col}"))
    return (
        joined.where(F.abs(dt) <= w)
        .drop("_lb", "_rb")
        .withColumn("dt_sec", dt)
    )


def sliding_window_stats(
    events: DataFrame,
    duration_minutes: int = 60,
    slide_minutes: int = 30,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Hopping (sliding) event-time windows: (keys..., w_start, w_end,
    n_events, sum_value) — every epoch-aligned window of
    `duration_minutes` advancing by `slide_minutes` that the event falls
    in. The overlapping-window sibling of the tumbling `events_hourly`
    roll-up and the gap-based `sessionize`.

    Spark shape: `F.window(ts, duration, slide)` — each row expands to
    duration/slide window memberships BEFORE the partial aggregation,
    so the exchange carries (keys x windows) partial rows, not events:
    one shuffle, map-side combined, exactly the tumbling-window plan
    with a bounded fan-out factor. Works unchanged on a stream (the
    same expression is watermark-compatible; the batch result is the
    stream's final state)."""
    if duration_minutes % slide_minutes != 0:
        raise ValueError("duration must be a multiple of slide")
    w = F.window(
        F.col(ts_col), f"{duration_minutes} minutes", f"{slide_minutes} minutes"
    )
    return (
        events.groupBy(*keys, w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            *keys,
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
    )
