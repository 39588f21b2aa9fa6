"""interpolate_on / point_at_offset / interpolate_ele_of_polyline vs
line-for-line Python replicas of the Java loops."""

import math
import random

import pyspark.sql.functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _ref_interpolate_between(p1, p2, t):
    return (p1[0] * (1 - t) + p2[0] * t, p1[1] * (1 - t) + p2[1] * t)


def _dist(a, b):
    dx, dz = b[0] - a[0], b[1] - a[1]
    return math.sqrt(dx * dx + dz * dz)


def _ref_interpolate_on(pts, ratio):
    """GeometryUtil.interpolateOn:440-467, literal replica."""
    total = 0.0
    for i in range(len(pts) - 1):
        total += _dist(pts[i], pts[i + 1])
    rem = ratio * total
    for i in range(len(pts) - 1):
        d = _dist(pts[i], pts[i + 1])
        if rem <= d:
            return _ref_interpolate_between(pts[i], pts[i + 1], rem / d)
        rem -= d
    return pts[-1]


def _ref_point_at_offset(pts, offset):
    """PolylineShapeXZ.pointAtOffset:87-116, literal replica."""
    for i in range(len(pts) - 1):
        d = _dist(pts[i], pts[i + 1])
        if offset <= d:
            return _ref_interpolate_between(pts[i], pts[i + 1], max(0.0, offset / d))
        offset -= d
    return pts[-1]


def _ref_ele(pts, e1, e2):
    total = 0.0
    for i in range(len(pts) - 1):
        total += _dist(pts[i], pts[i + 1])
    out = []
    for i in range(len(pts)):
        j = next(k for k in range(len(pts)) if pts[k] == pts[i])  # indexOf
        prefix = 0.0
        for m in range(j):
            prefix += _dist(pts[m], pts[m + 1])
        r = prefix / total
        out.append(e1 * (1 - r) + e2 * r)
    return out


def _poly_rows(seed=13, n_rows=30):
    rng = random.Random(seed)
    rows = []
    for k in range(n_rows):
        npts = rng.randint(2, 7)
        pts = [
            (round(rng.uniform(-100, 100), 3), round(rng.uniform(-100, 100), 3))
            for _ in range(npts)
        ]
        if k % 5 == 0 and npts >= 4:
            pts[npts - 2] = pts[0]  # revisited vertex: indexOf path
        flat = [c for p in pts for c in p]
        rows.append((k, flat, pts))
    return rows


def test_walk_functions_match_java_replicas(spark):
    from osm2world_spark.functions.polyline import (
        interpolate_on,
        point_at_offset,
    )

    rows = _poly_rows()
    schema = StructType(
        [StructField("k", LongType()), StructField("g", ArrayType(DoubleType()))]
    )
    df = spark.createDataFrame([(k, flat) for k, flat, _ in rows], schema)
    ratio = (F.col("k") % 10).cast("double") / F.lit(9.0)
    # offset beyond total for k%9==0 exercises the fallback via clamp walk
    out = df.select(
        "k",
        interpolate_on(F.col("g"), ratio).alias("ip"),
        point_at_offset(F.col("g"), (F.col("k") % 7).cast("double") * 3.5).alias("op"),
    ).collect()
    got = {r["k"]: r for r in out}
    for k, _, pts in rows:
        rr = (k % 10) / 9.0
        want_i = _ref_interpolate_on(pts, rr)
        want_o = _ref_point_at_offset(pts, (k % 7) * 3.5)
        assert got[k]["ip"]["px"] == want_i[0] and got[k]["ip"]["pz"] == want_i[1], k
        assert got[k]["op"]["px"] == want_o[0] and got[k]["op"]["pz"] == want_o[1], k


def test_ele_interpolation_matches_java_replica(spark):
    from osm2world_spark.functions.polyline import interpolate_ele_of_polyline

    rows = _poly_rows(seed=7)
    schema = StructType(
        [StructField("k", LongType()), StructField("g", ArrayType(DoubleType()))]
    )
    df = spark.createDataFrame([(k, flat) for k, flat, _ in rows], schema)
    out = df.select(
        "k",
        interpolate_ele_of_polyline(
            F.col("g"), (F.col("k") % 50).cast("double"), (F.col("k") % 70).cast("double")
        ).alias("e"),
    ).collect()
    got = {r["k"]: list(r["e"]) for r in out}
    for k, _, pts in rows:
        want = _ref_ele(pts, float(k % 50), float(k % 70))
        assert got[k] == want, k


def test_ele_endpoints_and_monotonicity(spark):
    from osm2world_spark.functions.polyline import interpolate_ele_of_polyline

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 10.0, 0.0, 30.0, 0.0, 60.0, 0.0])],
        "k long, g array<double>",
    )
    e = df.select(
        interpolate_ele_of_polyline(F.col("g"), 100.0, 160.0).alias("e")
    ).first()["e"]
    assert e[0] == 100.0 and e[-1] == 160.0
    assert e == sorted(e)
    # linear in arc length: vertex 1 at 10/60, vertex 2 at 30/60
    assert abs(e[1] - 110.0) < 1e-9 and abs(e[2] - 130.0) < 1e-9
