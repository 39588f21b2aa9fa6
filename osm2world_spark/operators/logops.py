"""Conversion-log head/tail truncation — reference A6.

Reference: O2WConverterImpl.java:478-489 — when the log holds more than
maxLogEntries rows, print the first floor(N/2) and the last ceil(N/2)
entries (by log order) and elide the middle.

Spark shape: two row_number windows over the given ordering (ascending
for the head, descending for the tail) — no collect; at scale the window
shuffles once on the (single) log ordering key. The `kept` flag marks
head/tail so a renderer can place the elision marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def truncate_log(df: DataFrame, order_cols: list[str], max_entries: int = 100) -> DataFrame:
    """Keep first floor(N/2) + last ceil(N/2) rows by `order_cols` when the
    log exceeds `max_entries`; otherwise keep everything. Adds a `part`
    column ('head' | 'tail' | 'all')."""
    head_n = max_entries // 2
    tail_n = max_entries - head_n  # ceil(N/2), O2WConverterImpl.java:487
    asc = Window.orderBy(*[F.col(c).asc() for c in order_cols])
    desc = Window.orderBy(*[F.col(c).desc() for c in order_cols])
    total = df.count()
    if total <= max_entries:
        return df.withColumn("part", F.lit("all"))
    ranked = df.withColumn("rn", F.row_number().over(asc)).withColumn(
        "rn_rev", F.row_number().over(desc)
    )
    return (
        ranked.where((F.col("rn") <= head_n) | (F.col("rn_rev") <= tail_n))
        .withColumn("part", F.when(F.col("rn") <= head_n, "head").otherwise("tail"))
        .drop("rn", "rn_rev")
    )
