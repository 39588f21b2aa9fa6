"""Raster gradients: numpy reference agreement (including slope/aspect
trig), no-data and border NULLs, and subsampling-gap guards."""

import numpy as np
from pyspark.sql import functions as F

from osm2world_spark.operators.rasterops import raster_gradients, slope_aspect
from osm2world_spark.sources.raster import BLANK_VALUE


def _grid_df(spark, n=12, blank=()):
    rows = []
    for py in range(n):
        for px in range(n):
            z = BLANK_VALUE if (px, py) in blank else (px * px + 3 * py + px * py)
            rows.append((13, 48, px, py, z))
    return spark.createDataFrame(
        rows, "cell_lon int, cell_lat int, px int, py int, elev int"
    )


def test_gradients_match_numpy(spark):
    n = 12
    df = _grid_df(spark, n)
    out = {
        (r["px"], r["py"]): (r["dzdx2"], r["dzdy2"], r["grad2"])
        for r in raster_gradients(df).collect()
    }
    z = np.array([[px * px + 3 * py + px * py for px in range(n)] for py in range(n)])
    for py in range(1, n - 1):
        for px in range(1, n - 1):
            dzdx2 = int(z[py, px + 1] - z[py, px - 1])
            dzdy2 = int(z[py + 1, px] - z[py - 1, px])
            assert out[(px, py)] == (dzdx2, dzdy2, dzdx2**2 + dzdy2**2)
    # borders are NULL
    assert out[(0, 5)][0] is None and out[(5, 0)][1] is None


def test_gradients_nodata_and_gap_nulls(spark):
    df = _grid_df(spark, 8, blank={(3, 4)})
    out = {
        (r["px"], r["py"]): r for r in raster_gradients(df).collect()
    }
    # the blank pixel's neighbors lose the gradient across it
    assert out[(2, 4)]["dzdx2"] is None and out[(4, 4)]["dzdx2"] is None
    assert out[(3, 3)]["dzdy2"] is None and out[(3, 5)]["dzdy2"] is None
    # the blank pixel itself has no gradient in the crossing axis only
    assert out[(3, 4)]["dzdx2"] is not None and out[(3, 4)]["grad2"] is not None

    # a subsampled grid (every 2nd px) must not fake adjacency
    sub = _grid_df(spark, 8).where(F.col("px") % 2 == 0)
    assert all(r["dzdx2"] is None for r in raster_gradients(sub).collect())


def test_slope_aspect_matches_numpy(spark):
    df = _grid_df(spark, 6)
    out = slope_aspect(raster_gradients(df), pixel_size_m=30.0).collect()
    for r in out:
        if r["dzdx2"] is None or r["dzdy2"] is None:
            continue
        p, q = r["dzdx2"] / 60.0, r["dzdy2"] / 60.0
        assert abs(r["slope_deg"] - np.degrees(np.arctan(np.hypot(p, q)))) < 1e-9
        assert abs(r["aspect_deg"] - np.degrees(np.arctan2(q, -p))) < 1e-9


def test_gradients_plan_two_exchanges(spark):
    plan = (
        raster_gradients(_grid_df(spark, 6))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one exchange per window axis, nothing else (no join, no python)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_hillshade_matches_numpy(spark):
    import math

    from osm2world_spark.operators.rasterops import hillshade

    df = _grid_df(spark, 6)
    out = hillshade(
        raster_gradients(df), pixel_size_m=30.0,
        azimuth_deg=315.0, altitude_deg=45.0,
    ).collect()
    zen = math.radians(45.0)
    az = math.radians(360.0 - 315.0 + 90.0)
    checked = 0
    for r in out:
        if r["dzdx2"] is None or r["dzdy2"] is None:
            assert r["shade"] is None
            continue
        p, q = r["dzdx2"] / 60.0, r["dzdy2"] / 60.0
        slope = np.arctan(np.hypot(p, q))
        aspect = np.arctan2(q, -p)
        want = 255.0 * (
            math.cos(zen) * np.cos(slope)
            + math.sin(zen) * np.sin(slope) * np.cos(az - aspect)
        )
        assert abs(r["shade"] - max(0.0, want)) < 1e-9
        checked += 1
    assert checked > 0


def test_hillshade_flat_terrain_is_ambient(spark):
    """Flat ground: slope 0, shade = 255*cos(zenith) regardless of
    azimuth — the ambient level every hillshade renderer pins."""
    import math

    from osm2world_spark.operators.rasterops import hillshade

    n = 5
    rows = [(0, 0, x, y, 100) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(
        rows, "cell_lon int, cell_lat int, px int, py int, elev int"
    )
    out = hillshade(raster_gradients(df), altitude_deg=60.0).collect()
    interior = [r for r in out if r["shade"] is not None]
    assert len(interior) == (n - 2) * (n - 2)
    want = 255.0 * math.cos(math.radians(30.0))
    for r in interior:
        assert abs(r["shade"] - want) < 1e-9


def test_hillshade_stays_projection(spark):
    from osm2world_spark.operators.rasterops import hillshade

    grads = raster_gradients(_grid_df(spark, 6))
    base = grads._jdf.queryExecution().executedPlan().toString()
    shaded = hillshade(grads)._jdf.queryExecution().executedPlan().toString()
    # no new exchange, join, or python beyond the gradient plan
    assert shaded.count("Exchange") == base.count("Exchange")
    assert "BatchEvalPython" not in shaded
