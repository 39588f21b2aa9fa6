"""Contour stitching: shared-crossing node identity across cells,
closed-ring vs open-chain topology, degree bounds, and multi-level
separation."""

import numpy as np
from pyspark.sql import functions as F

from osm2world_spark.operators.contours import (
    contour_segments,
    endpoint_nodes,
    stitch_contours,
)
from osm2world_spark.sources.raster import BLANK_VALUE


def _grid_df(spark, z):
    rows = []
    for py in range(z.shape[0]):
        for px in range(z.shape[1]):
            rows.append((13, 48, px, py, int(z[py, px])))
    return spark.createDataFrame(
        rows, "cell_lon int, cell_lat int, px int, py int, elev int"
    )


def _bowl(n=20, den=2):
    yy, xx = np.mgrid[0:n, 0:n]
    c = n // 2
    return ((xx - c) ** 2 + (yy - c) ** 2) // den


def test_shared_crossings_have_one_node(spark):
    segs = contour_segments(_grid_df(spark, _bowl()), interval=10)
    eps = endpoint_nodes(segs, interval=10)
    # every node is mentioned at most twice (marching squares is degree<=2)
    deg = eps.groupBy("node").count().agg(F.max("count")).first()[0]
    assert deg == 2
    # and interior rings share every crossing: node count == segment count
    n_segs = segs.count()
    n_nodes = eps.select("node").distinct().count()
    assert n_nodes <= n_segs * 2


def test_bowl_rings_are_closed_lines(spark):
    # interior levels -> one closed ring each
    lines = stitch_contours(
        contour_segments(_grid_df(spark, _bowl(22, 2)), interval=12),
        interval=12,
    ).collect()
    inner = [r for r in lines if 0 < r["level"] and 2 * r["level"] < 81]
    assert inner, "no interior rings"
    for r in inner:
        assert r["closed"] and r["n_open_ends"] == 0
        assert r["n_segments"] == r["n_nodes"]  # ring: V == E
        assert r["n_segments"] >= 8


def test_boundary_chains_are_open(spark):
    # a ramp: straight contours crossing the whole grid -> open chains
    n = 10
    z = np.tile(np.arange(n) * 10, (n, 1))
    lines = stitch_contours(
        contour_segments(_grid_df(spark, z), interval=25), interval=25
    ).collect()
    assert lines
    for r in lines:
        assert not r["closed"] and r["n_open_ends"] == 2
        assert r["n_nodes"] == r["n_segments"] + 1  # path: V == E + 1


def test_levels_never_merge(spark):
    lines = stitch_contours(
        contour_segments(_grid_df(spark, _bowl(18, 1)), interval=20),
        interval=20,
    )
    # every line carries exactly one level by construction of the node
    # key; cross-check: per level, count lines and compare node totals
    per = lines.groupBy("level").count().collect()
    assert len(per) >= 3
    assert all(r["count"] >= 1 for r in per)


def test_nodata_splits_a_ring(spark):
    z = _bowl(20, 2)
    df = _grid_df(spark, z)
    holed = df.withColumn(
        "elev",
        F.when(
            (F.col("px") == 14) & (F.col("py") == 10), F.lit(BLANK_VALUE)
        ).otherwise(F.col("elev")),
    )
    # pick a level whose ring passes through the holed cells: r ~ 4
    lines = {
        r["level"]: r
        for r in stitch_contours(
            contour_segments(holed, interval=8), interval=8
        ).collect()
    }
    # level 8: radius sqrt(16)=4 -> passes x=14 band at y=10
    assert 8 in lines
    assert not lines[8]["closed"] and lines[8]["n_open_ends"] == 2


# ------------------------------------------------------- seam crossing


def _four_cells(spark, n=24, den=4):
    """The _bowl paraboloid centered at the 4-corner junction of a 2x2
    grid of n-pixel cells at (-180,-90): global pixel (gx,gy) elevation
    ((gx-n)^2+(gy-n)^2)//den, so every interior ring crosses all four
    tile seams."""
    from pyspark.sql import functions as F

    g = spark.range(4 * n * n).select(
        (F.col("id") % (2 * n)).cast("int").alias("gx"),
        F.floor(F.col("id") / (2 * n)).cast("int").alias("gy"),
    )
    elev = (
        (F.col("gx") - n) * (F.col("gx") - n)
        + (F.col("gy") - n) * (F.col("gy") - n)
    ) / F.lit(float(den))
    return g.select(
        (F.lit(-180) + F.floor(F.col("gx") / n)).cast("int").alias("cell_lon"),
        (F.lit(-90) + F.floor(F.col("gy") / n)).cast("int").alias("cell_lat"),
        (F.col("gx") % n).cast("int").alias("px"),
        (F.col("gy") % n).cast("int").alias("py"),
        F.floor(elev).cast("int").alias("elev"),
    )


def _as_global(spark, cells, n):
    """The same raster as ONE cell at (-180,-90) with global pixels."""
    from pyspark.sql import functions as F

    return cells.select(
        F.lit(-180).cast("int").alias("cell_lon"),
        F.lit(-90).cast("int").alias("cell_lat"),
        ((F.col("cell_lon") + 180) * n + F.col("px")).cast("int").alias("px"),
        ((F.col("cell_lat") + 90) * n + F.col("py")).cast("int").alias("py"),
        "elev",
    )


def test_seam_rings_close_across_cells(spark):
    from osm2world_spark.operators.contours import halo_raster

    n = 24
    cells = _four_cells(spark, n)
    lines = stitch_contours(
        contour_segments(halo_raster(cells, n), interval=40),
        interval=40,
        cell_pixels=n,
    ).collect()
    # interior levels: radius sqrt(den*level) < n  ->  level < n^2/den
    inner = [r for r in lines if 0 < r["level"] < (n * n) // 4]
    assert inner, "no interior rings"
    for r in inner:
        assert r["closed"] and r["n_open_ends"] == 0
        assert r["n_segments"] == r["n_nodes"]


def test_halo_stitch_equals_single_grid(spark):
    # the planet-scale contract: 4-cell halo computation == one global
    # grid, row for row INCLUDING line ids (the -180/-90 anchor makes
    # the global-pixel formula coincide)
    from osm2world_spark.operators.contours import halo_raster

    n = 24
    cells = _four_cells(spark, n)
    dist = stitch_contours(
        contour_segments(halo_raster(cells, n), interval=40),
        interval=40,
        cell_pixels=n,
    )
    single = stitch_contours(
        contour_segments(_as_global(spark, cells, n), interval=40),
        interval=40,
        cell_pixels=2 * n,
    )
    a = sorted(map(tuple, dist.collect()))
    b = sorted(map(tuple, single.collect()))
    assert a == b and len(a) > 0


def test_halo_anchors_nothing_twice(spark):
    # every marching-squares cell computes exactly once: segment COUNT
    # of the halo-per-cell pass equals the global-grid pass
    from osm2world_spark.operators.contours import halo_raster

    n = 24
    cells = _four_cells(spark, n)
    n_dist = contour_segments(halo_raster(cells, n), interval=40).count()
    n_single = contour_segments(
        _as_global(spark, cells, n), interval=40
    ).count()
    assert n_dist == n_single > 0


# ------------------------------------------------------- vertex ordering


def _check_ordered(rows, topo):
    lines = {}
    for r in rows:
        lines.setdefault(r["line_id"], []).append(r)
    assert set(lines) == set(topo)
    for lid, es in lines.items():
        es.sort(key=lambda r: r["seq"])
        t = topo[lid]
        assert [e["seq"] for e in es] == list(range(1, len(es) + 1))
        assert len(es) == t["n_segments"]
        assert all(e["level"] == t["level"] for e in es)
        for i in range(len(es) - 1):
            assert es[i]["dst"] == es[i + 1]["src"]
        if t["closed"]:
            assert es[-1]["dst"] == es[0]["src"] == lid  # head = min node
        else:
            # head is the smaller open end
            assert es[0]["src"] < es[-1]["dst"]


def test_order_contours_rings_and_chains(spark):
    from osm2world_spark.operators.contours import order_contours

    segs = contour_segments(_grid_df(spark, _bowl(22, 2)), interval=12)
    rows = order_contours(segs, interval=12).collect()
    topo = {
        r["line_id"]: r
        for r in stitch_contours(segs, interval=12).collect()
    }
    _check_ordered(rows, topo)
    assert any(t["closed"] for t in topo.values())
    assert any(not t["closed"] for t in topo.values())


def test_order_converges_in_log_rounds(spark):
    # a ~150-segment ring needs ~9 doubling rounds; a sequential walk
    # would need 150 — max_rounds=11 only passes with pointer jumping
    from osm2world_spark.operators.contours import order_contours

    segs = contour_segments(_grid_df(spark, _bowl(52, 6)), interval=64)
    out = order_contours(segs, interval=64, max_rounds=11)
    topo = stitch_contours(segs, interval=64)
    big = topo.agg(F.max("n_segments")).first()[0]
    assert big > 100
    assert out.count() == topo.agg(F.sum("n_segments")).first()[0]


def test_order_across_seams(spark):
    from osm2world_spark.operators.contours import (
        halo_raster,
        order_contours,
    )

    n = 24
    cells = _four_cells(spark, n)
    segs = contour_segments(halo_raster(cells, n), interval=40)
    rows = order_contours(segs, interval=40, cell_pixels=n).collect()
    topo = {
        r["line_id"]: r
        for r in stitch_contours(
            segs, interval=40, cell_pixels=n
        ).collect()
    }
    _check_ordered(rows, topo)


# ------------------------------------------------------- guard rails


def test_multi_cell_without_cell_pixels_raises(spark):
    import pytest

    cells = _four_cells(spark, 12)
    segs = contour_segments(cells, interval=40)
    with pytest.raises(ValueError, match="cell_pixels"):
        stitch_contours(segs, interval=40)


def test_cell_pixels_overflow_raises(spark):
    import pytest
    from osm2world_spark.operators.contours import segment_nodes

    segs = contour_segments(_grid_df(spark, _bowl(8)), interval=10)
    with pytest.raises(ValueError, match="overflows"):
        segment_nodes(segs, interval=10, cell_pixels=3601)


def test_order_nonconvergence_raises(spark):
    import pytest
    from osm2world_spark.operators.contours import order_contours

    segs = contour_segments(_grid_df(spark, _bowl(22, 2)), interval=12)
    with pytest.raises(RuntimeError, match="converge"):
        order_contours(segs, interval=12, max_rounds=2)


# ------------------------------------------------- randomized seam property


def _array_cells(spark, z, n, split):
    """A 2n x 2n global elevation array as a raster DataFrame: either
    split into 2x2 cells of n pixels at (-180,-90) or as one global
    grid — the two inputs whose contour output must coincide."""
    rows = []
    for gy in range(2 * n):
        for gx in range(2 * n):
            if split:
                rows.append(
                    (-180 + gx // n, -90 + gy // n, gx % n, gy % n, int(z[gy, gx]))
                )
            else:
                rows.append((-180, -90, gx, gy, int(z[gy, gx])))
    return spark.createDataFrame(
        rows, "cell_lon int, cell_lat int, px int, py int, elev int"
    )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**32 - 1), holes=st.booleans())
def test_random_grids_halo_equals_single(spark, seed, holes):
    """Randomized planet-scale contract: for arbitrary elevation fields
    (noise exercises every marching-squares case incl. saddles, and
    random nodata holes exercise gap handling), the 4-cell halo-exchange
    computation equals the single-global-grid computation row for row.
    Grids are kept small/low-relief so each example stays a few seconds
    of iterative stitching; the ordered-traversal consistency is pinned
    separately by the targeted seam tests above."""
    from osm2world_spark.operators.contours import halo_raster

    n = 6
    rng = np.random.RandomState(seed)
    z = rng.randint(0, 21, size=(2 * n, 2 * n))
    if holes:
        z[rng.rand(2 * n, 2 * n) < 0.05] = BLANK_VALUE
    dist = stitch_contours(
        contour_segments(
            halo_raster(_array_cells(spark, z, n, split=True), n), interval=10
        ),
        interval=10,
        cell_pixels=n,
    ).collect()
    single = stitch_contours(
        contour_segments(_array_cells(spark, z, n, split=False), interval=10),
        interval=10,
        cell_pixels=2 * n,
    ).collect()
    assert sorted(map(tuple, dist)) == sorted(map(tuple, single))
