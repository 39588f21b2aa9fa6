"""Line/segment scalar primitives vs line-for-line Java replicas
(GeometryUtil.java:189-359), including the float-literal EPSILON quirk
and the JTS clamp/unclamped projection split."""

import math
import random

from pyspark.sql import functions as F

from osm2world_spark.functions.lines import (
    EPSILON,
    distance_from_line,
    distance_from_line_segment,
    is_between,
    is_right_of,
    line_intersection,
    project_perpendicular,
    segment_intersection,
    true_segment_intersection,
)

SCHEMA = (
    "i int, a1x double, a1z double, a2x double, a2z double, "
    "b1x double, b1z double, b2x double, b2z double"
)


def _py_seg_int(a1, a2, b1, b2):
    vx, vz = a2[0] - a1[0], a2[1] - a1[1]
    qx, qz = b2[0] - b1[0], b2[1] - b1[1]
    denom = vz * qx - vx * qz
    if -EPSILON <= denom <= EPSILON:
        return None
    denom = 1 / denom
    amcx, amcz = b1[0] - a1[0], b1[1] - a1[1]
    t = (amcz * qx - amcx * qz) * denom
    if t < 0 or t > 1:
        return None
    s = (amcz * vx - amcx * vz) * denom
    if s < 0 or s > 1:
        return None
    return (a1[0] + t * vx, a1[1] + t * vz)


def _rows(rng, n):
    out = []
    for i in range(n):
        out.append(
            (i,) + tuple(round(rng.uniform(-10, 10), 3) for _ in range(8))
        )
    return out


def test_segment_intersection_matches_replica(spark):
    rng = random.Random(11)
    rows = _rows(rng, 200)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i",
            segment_intersection(
                *[F.col(c) for c in ("a1x", "a1z", "a2x", "a2z", "b1x", "b1z", "b2x", "b2z")]
            ).alias("o"),
        ).collect()
    }
    for row in rows:
        i = row[0]
        a1, a2, b1, b2 = (row[1], row[2]), (row[3], row[4]), (row[5], row[6]), (row[7], row[8])
        want = _py_seg_int(a1, a2, b1, b2)
        if want is None:
            assert got[i] is None, i
        else:
            assert got[i] is not None and got[i]["x"] == want[0] and got[i]["z"] == want[1], i


def test_true_segment_intersection_shared_endpoint(spark):
    # X-crossing intersects; sharing an endpoint returns NULL
    df = spark.createDataFrame(
        [
            (0, 0.0, 0.0, 2.0, 2.0, 0.0, 2.0, 2.0, 0.0),  # crosses at (1,1)
            (1, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0, 3.0, 0.0),  # shares (2,2)
        ],
        SCHEMA,
    )
    cols = [F.col(c) for c in ("a1x", "a1z", "a2x", "a2z", "b1x", "b1z", "b2x", "b2z")]
    got = {r["i"]: r["o"] for r in df.select("i", true_segment_intersection(*cols).alias("o")).collect()}
    assert got[0] is not None and (got[0]["x"], got[0]["z"]) == (1.0, 1.0)
    assert got[1] is None


def test_line_intersection_parallel_epsilon(spark):
    """denominators inside the float-literal EPSILON band return NULL;
    just outside they intersect (the 0.0001f quirk)."""
    rows = [
        (0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0, EPSILON / 2),       # |denom| < eps
        (1, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 1.0, EPSILON * 1.5),     # just outside
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i",
            line_intersection(
                F.col("a1x"), F.col("a1z"), F.col("a2x"), F.col("a2z"),
                F.col("b1x"), F.col("b1z"), F.col("b2x"), F.col("b2z"),
            ).alias("o"),
        ).collect()
    }
    assert got[0] is None
    assert got[1] is not None


def test_orientation_and_between(spark):
    df = spark.createDataFrame(
        [(0, 1.0, -1.0), (1, 1.0, 1.0), (2, 1.0, 0.0), (3, 5.0, 0.0)],
        "i int, px double, pz double",
    )
    out = {
        r["i"]: (r["r"], r["b"])
        for r in df.select(
            "i",
            is_right_of(F.col("px"), F.col("pz"), F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(0.0)).alias("r"),
            is_between(F.col("px"), F.col("pz"), F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(0.0)).alias("b"),
        ).collect()
    }
    # line +x: z<0 is right of it per the Java sign convention
    assert out[0][0] != out[1][0]  # opposite sides
    assert out[2][1] is True       # midpoint is between
    assert out[3][1] is False      # far beyond l2
    assert out[2][0] is False      # on the line: not strictly right


def test_distances_and_projection(spark):
    df = spark.createDataFrame([(0, 3.0, 4.0)], "i int, px double, pz double")
    a = (F.lit(0.0), F.lit(0.0))
    b = (F.lit(10.0), F.lit(0.0))
    r = df.select(
        distance_from_line(F.col("px"), F.col("pz"), *a, *b).alias("dl"),
        distance_from_line_segment(F.col("px"), F.col("pz"), *a, *b).alias("ds"),
        project_perpendicular(F.col("px"), F.col("pz"), *a, *b).alias("pp"),
    ).first()
    assert r["dl"] == 4.0 and r["ds"] == 4.0
    assert (r["pp"]["x"], r["pp"]["z"]) == (3.0, 0.0)
    # beyond the end: segment clamps, line and projection do not
    df2 = spark.createDataFrame([(0, 13.0, 4.0)], "i int, px double, pz double")
    r2 = df2.select(
        distance_from_line(F.col("px"), F.col("pz"), *a, *b).alias("dl"),
        distance_from_line_segment(F.col("px"), F.col("pz"), *a, *b).alias("ds"),
        project_perpendicular(F.col("px"), F.col("pz"), *a, *b).alias("pp"),
    ).first()
    assert r2["dl"] == 4.0
    assert r2["ds"] == 5.0  # clamped to endpoint (10,0): 3-4-5
    assert (r2["pp"]["x"], r2["pp"]["z"]) == (13.0, 0.0)


def test_distance_degenerate_segment(spark):
    df = spark.createDataFrame([(0, 3.0, 4.0)], "i int, px double, pz double")
    r = df.select(
        distance_from_line_segment(
            F.col("px"), F.col("pz"), F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)
        ).alias("ds")
    ).first()
    assert r["ds"] == 5.0
