"""J12 sweep-and-prune all-intersections vs brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.sweep import sweep_intersections


def _segs(n, seed, span=400.0, seg_len=30.0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, span, n)
    z1 = rng.uniform(0, span, n)
    x2 = x1 + rng.uniform(-seg_len, seg_len, n)
    z2 = z1 + rng.uniform(-seg_len, seg_len, n)
    return pd.DataFrame(
        {"key": np.arange(n).astype(np.int64), "x1": x1, "z1": z1, "x2": x2, "z2": z2}
    )


def _brute(df):
    out = set()
    a = df.to_numpy()
    for i in range(len(a)):
        for j in range(i + 1, len(a)):
            _, ax1, az1, ax2, az2 = a[i]
            _, bx1, bz1, bx2, bz2 = a[j]
            vx, vz = ax2 - ax1, az2 - az1
            qx, qz = bx2 - bx1, bz2 - bz1
            denom = vz * qx - vx * qz
            if abs(denom) <= 1e-4:
                continue
            t = ((bz1 - az1) * qx - (bx1 - ax1) * qz) / denom
            s = ((bz1 - az1) * vx - (bx1 - ax1) * vz) / denom
            if 0 <= t <= 1 and 0 <= s <= 1:
                ix = ax1 + t * vx
                iz = az1 + t * vz
                out.add(
                    (str(int(a[i][0])), str(int(a[j][0])),
                     int(np.floor(ix * 1000.0 + 0.5)), int(np.floor(iz * 1000.0 + 0.5)))
                )
    return out


def test_sweep_matches_bruteforce(spark):
    pdf = _segs(400, seed=2)
    df = spark.createDataFrame(pdf)
    got = {
        (r["a_key"], r["b_key"], r["ix_mm"], r["iz_mm"])
        for r in sweep_intersections(df).collect()
    }
    want = _brute(pdf)
    assert len(want) > 50  # dense enough to be a meaningful check
    assert got == want


def test_sweep_cell_mode_is_complete(spark):
    """cell_size mode must equal the single-group (complete) result even
    when crossings straddle cell boundaries — the round-2 grouped mode
    silently dropped those pairs."""
    pdf = _segs(400, seed=2)
    df = spark.createDataFrame(pdf)
    got = {
        (r["a_key"], r["b_key"], r["ix_mm"], r["iz_mm"])
        for r in sweep_intersections(df, cell_size=50.0).collect()
    }
    want = _brute(pdf)
    assert got == want


def test_sweep_cell_mode_straddling_pair(spark):
    """A crossing exactly astride a cell boundary is reported once."""
    pdf = pd.DataFrame(
        {
            "key": np.array([1, 2], dtype=np.int64),
            # segments crossing at (100.0, 100.0) == a corner of 50-unit cells
            "x1": [90.0, 90.0],
            "z1": [90.0, 110.0],
            "x2": [110.0, 110.0],
            "z2": [110.0, 90.0],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = sweep_intersections(df, cell_size=50.0).collect()
    assert [(r["a_key"], r["b_key"], r["ix_mm"], r["iz_mm"]) for r in rows] == [
        ("1", "2", 100000, 100000)
    ]


def test_sweep_grouped_restricts_to_groups(spark):
    pdf = _segs(300, seed=9)
    df = spark.createDataFrame(pdf).withColumn(
        "grp", (F.col("key") % 4).cast("bigint")
    )
    got = {
        (r["a_key"], r["b_key"])
        for r in sweep_intersections(df, group_col="grp").collect()
    }
    want = {
        (a, b)
        for (a, b, _, _) in _brute(pdf)
        if int(a) % 4 == int(b) % 4
    }
    assert got == want
