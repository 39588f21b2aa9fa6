"""P15 LOD-range filtering and A6 log head/tail truncation tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm2world_spark.functions.lod import filter_lod, lod_range_contains, lod_range_intersection
from osm2world_spark.operators.logops import truncate_log


def test_filter_lod(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3, 4, 5],
                "lod_min": [0, 2, 0, 3, 2],
                "lod_max": [4, 2, 1, 4, 3],
            }
        )
    )
    got = sorted(r["id"] for r in filter_lod(df, target=2).collect())
    assert got == [1, 2, 5]  # ranges containing LOD2
    got0 = sorted(r["id"] for r in filter_lod(df, target=0).collect())
    assert got0 == [1, 3]


def test_lod_range_intersection(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [0, 2], "b": [2, 3], "c": [1, 0], "d": [4, 1]}))
    out = df.select(
        lod_range_intersection(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("r")
    ).collect()
    assert out[0]["r"]["min"] == 1 and out[0]["r"]["max"] == 2
    assert out[1]["r"] is None  # [2,3] x [0,1] -> empty (LODRange.java:30-40)


def test_truncate_log_small_passthrough(spark):
    df = spark.range(10).select(F.col("id").alias("seq"))
    out = truncate_log(df, ["seq"], max_entries=100).collect()
    assert len(out) == 10 and all(r["part"] == "all" for r in out)


@pytest.mark.parametrize("max_entries", [100, 101])
def test_truncate_log_head_tail(spark, max_entries):
    """first floor(N/2) + last ceil(N/2) by order, the middle elided
    (O2WConverterImpl.java:478-489)."""
    n = 500
    df = spark.range(n).select(F.col("id").alias("seq"))
    out = truncate_log(df, ["seq"], max_entries=max_entries).collect()
    head_n = max_entries // 2
    tail_n = max_entries - head_n
    heads = sorted(r["seq"] for r in out if r["part"] == "head")
    tails = sorted(r["seq"] for r in out if r["part"] == "tail")
    assert heads == list(range(head_n))
    assert tails == list(range(n - tail_n, n))
    assert len(out) == max_entries
