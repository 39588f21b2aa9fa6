"""Marching-squares contours: scalar numpy-replica agreement, saddle
disambiguation, level selection, no-data/border gaps, closed-ring
topology on a paraboloid, and the two-exchange plan contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.contours import (
    contour_points,
    contour_segments,
    corner_frame,
    segments_case_codes,
    segments_for,
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


def _reference_segments(z, interval):
    """Scalar marching squares over an int grid, same contract."""
    out = []
    h, w = z.shape
    for py in range(h - 1):
        for px in range(w - 1):
            zs = [int(z[py, px]), int(z[py, px + 1]), int(z[py + 1, px]),
                  int(z[py + 1, px + 1])]
            z00, z10, z01, z11 = zs
            zmin, zmax = min(zs), max(zs)
            lo = (zmin + interval - 1) // interval
            hi = (zmax + interval - 1) // interval - 1
            for k in range(lo, hi + 1):
                lvl = k * interval
                case = (
                    (z00 > lvl) + 2 * (z10 > lvl) + 4 * (z11 > lvl) + 8 * (z01 > lvl)
                )
                center = (z00 + z10 + z11 + z01) > 4 * lvl
                first = {0: z00, 1: z10, 2: z01, 3: z00}
                second = {0: z10, 1: z11, 2: z11, 3: z01}
                for i, (ea, eb) in enumerate(segments_for(case, center)):
                    out.append(
                        (px, py, lvl, i,
                         ea, lvl - first[ea], second[ea] - first[ea],
                         eb, lvl - first[eb], second[eb] - first[eb])
                    )
    return sorted(out)


def test_matches_scalar_reference(spark):
    rng = np.random.RandomState(7)
    z = rng.randint(0, 120, size=(10, 10))
    got = sorted(
        (r["px"], r["py"], r["level"], r["seg"],
         r["ea"], r["ta_num"], r["ta_den"],
         r["eb"], r["tb_num"], r["tb_den"])
        for r in contour_segments(_grid_df(spark, z), interval=25).collect()
    )
    assert got == _reference_segments(z, 25)
    assert len(got) > 20  # non-trivial coverage


@pytest.mark.parametrize(
    "grid,want",
    [
        # case 5 (TL+BR > 5): below-corners at 3 -> sum 26 > 20 (above)
        ([[10, 3], [3, 10]], {(0, 1), (2, 3)}),
        # case 5, below-corners at 0 -> sum 20, not > 20 (below)
        ([[10, 0], [0, 10]], {(0, 3), (1, 2)}),
        # case 10 (TR+BL > 5), center above
        ([[3, 10], [10, 3]], {(0, 3), (1, 2)}),
        # case 10, center below
        ([[0, 10], [10, 0]], {(0, 1), (2, 3)}),
    ],
)
def test_saddle_disambiguation(spark, grid, want):
    z = np.array(grid)
    segs = (
        contour_segments(_grid_df(spark, z), interval=5)
        .where(F.col("level") == 5)
        .collect()
    )
    assert {(r["ea"], r["eb"]) for r in segs} == want
    assert len(segs) == 2 and {r["seg"] for r in segs} == {0, 1}


def test_level_selection_and_rationals(spark):
    # single cell, corners 0/10/0/10 (case 10 at every level 1..9)
    z = np.array([[0, 10], [10, 0]])
    segs = contour_segments(_grid_df(spark, z), interval=3).collect()
    # levels 3, 6, 9 (0 excluded: no corner > 0 is false but zmin<=0<zmax
    # requires level >= zmin = 0 -> k from ceil(0/3)=0; level 0 has
    # case 10 (two corners >0) -> segments exist at level 0 too
    assert sorted({r["level"] for r in segs}) == [0, 3, 6, 9]
    for r in segs:
        # t in [0,1]: 0 when the first corner sits ON the level, 1 when
        # the second does (b = z > level puts both on the edge)
        assert 0 <= r["ta_num"] * (1 if r["ta_den"] > 0 else -1) <= abs(r["ta_den"])
        assert r["ta_den"] != 0 and r["tb_den"] != 0


def test_border_and_nodata_gaps(spark):
    z = np.full((6, 6), 50)
    z[2:4, 2:4] = 100
    df = _grid_df(spark, z)
    base = contour_segments(df, interval=60)
    n_base = base.count()
    assert n_base > 0
    # poke a hole next to the bump: every cell touching it vanishes
    holed = df.withColumn(
        "elev",
        F.when((F.col("px") == 2) & (F.col("py") == 2), F.lit(BLANK_VALUE)).otherwise(
            F.col("elev")
        ),
    )
    segs = contour_segments(holed, interval=60).collect()
    assert 0 < len(segs) < n_base
    assert all(
        not (r["px"] in (1, 2) and r["py"] in (1, 2)) for r in segs
    )
    # corner_frame drops all border-anchored cells
    cf = corner_frame(df)
    assert cf.where((F.col("px") == 5) | (F.col("py") == 5)).count() == 0


def test_paraboloid_rings_close(spark):
    # bowl: every contour is a closed ring -> each endpoint appears an
    # even number of times and the ring length is sane
    n = 24
    yy, xx = np.mgrid[0:n, 0:n]
    z = ((xx - 12) ** 2 + (yy - 12) ** 2) // 2
    pts = contour_points(
        contour_segments(_grid_df(spark, z), interval=15)
    ).collect()
    by_level = {}
    for r in pts:
        # only fully interior rings close (radius sqrt(2*lvl) < 10);
        # higher levels exit through the grid boundary by construction
        if r["level"] > 0 and 2 * r["level"] < 100:
            by_level.setdefault(r["level"], []).append(r)
    assert len(by_level) >= 3
    for lvl, rows in by_level.items():
        ends = {}
        for r in rows:
            for x, y in ((r["xa"], r["ya"]), (r["xb"], r["yb"])):
                ends[(round(x, 9), round(y, 9))] = ends.get((round(x, 9), round(y, 9)), 0) + 1
        odd = [k for k, v in ends.items() if v % 2]
        assert odd == [], f"level {lvl}: open endpoints {odd[:4]}"
        # endpoints sit near the circle sqrt(2*lvl) around (12,12)
        rad = np.sqrt(2 * lvl)
        for (x, y) in ends:
            assert abs(np.hypot(x - 12, y - 12) - rad) < 1.6


def test_case_code_table_roundtrip():
    codes = dict(segments_case_codes())
    assert len(codes) == 18  # 14 plain + 2 saddles x 2 centers
    for kind, lst in codes.items():
        case = int(kind.split("/")[0])
        center = kind.endswith("above")
        segs = segments_for(case, center)
        assert lst == [i * 100 + a * 10 + b for i, (a, b) in enumerate(segs)]
    assert codes["0"] == [] and codes["15"] == []
    assert codes["5/above"] == [1, 123] and codes["5/below"] == [3, 112]


def test_two_exchange_plan(spark):
    z = np.zeros((4, 4), dtype=int)
    plan = contour_segments(
        _grid_df(spark, z), interval=10
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Generate explode" in plan
