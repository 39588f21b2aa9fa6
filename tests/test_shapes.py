"""Circle/sector outline generation vs line-for-line Java replicas
(CircleXZ.java:45-65, CircularSectorXZ.java:28-56, Angle.java:63-77)."""

import math
import random

from pyspark.sql import functions as F

from osm2world_spark.functions.shapes import (
    circle_vertices,
    sector_area,
    sector_vertices,
    sequence_above,
)

TWO_PI = 2 * math.pi


def _fit(r):
    return ((r % TWO_PI) + TWO_PI) % TWO_PI


def _py_circle(cx, cz, r, n):
    out = []
    ai = TWO_PI / n
    for i in range(n):
        a = -i * ai
        out.append((cx + r * math.sin(a), cz + r * math.cos(a)))
    return out + [out[0]]


def _py_sector(cx, cz, r, s, e, n):
    sa = _fit(s)
    interval = _fit(_fit(e) - sa) / (n - 1)
    pts = []
    for i in range(n):
        a = _fit(sa + _fit(interval * i))
        pts.append((cx + math.sin(a) * r, cz + math.cos(a) * r))
    pts.reverse()
    return pts + [pts[0]]


def test_circle_and_sector_match_replicas(spark):
    rng = random.Random(13)
    rows = [
        (
            i,
            round(rng.uniform(-9, 9), 3),
            round(rng.uniform(-9, 9), 3),
            round(rng.uniform(0.5, 6), 3),
            round(rng.uniform(-7, 7), 3),
            round(rng.uniform(-7, 7), 3),
            rng.randint(3, 9),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "i int, cx double, cz double, r double, s double, e double, n int"
    )
    got = {
        r["i"]: (r["circ"], r["sec"], r["area"])
        for r in df.select(
            "i",
            circle_vertices(F.col("cx"), F.col("cz"), F.col("r"), F.col("n")).alias("circ"),
            sector_vertices(
                F.col("cx"), F.col("cz"), F.col("r"), F.col("s"), F.col("e"), F.col("n")
            ).alias("sec"),
            sector_area(F.col("r"), F.col("s"), F.col("e")).alias("area"),
        ).collect()
    }
    for i, cx, cz, r, s, e, n in rows:
        circ, sec, area = got[i]
        want_c = _py_circle(cx, cz, r, n)
        assert len(circ) == n + 1
        for g, w in zip(circ, want_c):
            assert abs(g["x"] - w[0]) < 1e-12 and abs(g["z"] - w[1]) < 1e-12
        want_s = _py_sector(cx, cz, r, s, e, n)
        for g, w in zip(sec, want_s):
            assert abs(g["x"] - w[0]) < 1e-12 and abs(g["z"] - w[1]) < 1e-12
        want_area = r * r * math.pi * _fit(_fit(e) - _fit(s)) / TWO_PI
        assert abs(area - want_area) < 1e-12


def test_sector_is_counterclockwise_closed(spark):
    # quarter arc from 0 to pi/2: reversed output runs (1,0)... to (0,1)?
    df = spark.createDataFrame([(1,)], "i int")
    sec = df.select(
        sector_vertices(
            F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0), F.lit(math.pi / 2), F.lit(3)
        ).alias("s")
    ).first()["s"]
    # raw arc: angle 0 -> (0,1); pi/4 -> (√2/2,√2/2); pi/2 -> (1,0); reversed:
    assert abs(sec[0]["x"] - 1.0) < 1e-12 and abs(sec[0]["z"]) < 1e-12
    assert abs(sec[2]["x"]) < 1e-12 and abs(sec[2]["z"] - 1.0) < 1e-12
    assert sec[3] == sec[0]  # closed


def test_sequence_above(spark):
    df = spark.createDataFrame(
        [(1, [(0.0, 1.0, 2.0), (3.0, 4.0, 5.0)])],
        "i int, vs array<struct<x double, y double, z double>>",
    )
    out = df.select(sequence_above(F.col("vs"), F.lit(-2.5)).alias("o")).first()["o"]
    assert [(v["x"], v["y"], v["z"]) for v in out] == [(0.0, -1.5, 2.0), (3.0, 1.5, 5.0)]
