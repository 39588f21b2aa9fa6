"""Conversion-log head/tail truncation — reference A6.

Reference: O2WConverterImpl.java:478-489 — when the log holds more than
maxLogEntries rows, print the first floor(N/2) and the last ceil(N/2)
entries (by log order) and elide the middle.

Spark shape: head and tail are `orderBy(...).limit(n)` — Catalyst plans
each as TakeOrderedAndProject, a map-side distributed top-k with no
global sort or single-partition window, so truncating even a huge log
stays linear. The `part` column marks head/tail so a renderer can place
the elision marker between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truncate_log(df: DataFrame, order_cols: list[str], max_entries: int = 100) -> DataFrame:
    """Keep first floor(N/2) + last ceil(N/2) rows by `order_cols` when the
    log exceeds `max_entries`; otherwise keep everything. Adds a `part`
    column ('head' | 'tail' | 'all')."""
    head_n = max_entries // 2
    tail_n = max_entries - head_n  # ceil(N/2), O2WConverterImpl.java:487
    if df.count() <= max_entries:
        return df.withColumn("part", F.lit("all"))
    head = (
        df.orderBy(*[F.col(c).asc() for c in order_cols])
        .limit(head_n)
        .withColumn("part", F.lit("head"))
    )
    tail = (
        df.orderBy(*[F.col(c).desc() for c in order_cols])
        .limit(tail_n)
        .withColumn("part", F.lit("tail"))
    )
    return head.unionByName(tail)
