"""Triangle strip/fan assembly vs line-for-line replicas of the Java
loops (GeometryUtil.java:54-186), including the odd-triangle flip and
the malformed-input conventions."""

import random

from pyspark.sql import functions as F

from osm2world_spark.functions.meshes import (
    triangle_normal_list_from_strip_or_fan,
    triangle_vertex_list_from_fan,
    triangle_vertex_list_from_strip,
    triangles_from_vertex_list,
)


def _py_strip(vs):
    out = []
    for t in range(len(vs) - 2):
        if t % 2 == 0:
            out += [vs[t], vs[t + 1], vs[t + 2]]
        else:
            out += [vs[t], vs[t + 2], vs[t + 1]]
    return out


def _py_fan(vs):
    out = []
    for t in range(len(vs) - 2):
        out += [vs[0], vs[t + 1], vs[t + 2]]
    return out


def _py_normals(vs):
    out = []
    for t in range(len(vs) - 2):
        out += [vs[t + 2]] * 3
    return out


def _run(spark, rows, fn):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(rows)], "i int, vs array<bigint>")
    got = {r["i"]: r["o"] for r in df.select("i", fn(F.col("vs")).alias("o")).collect()}
    return [got[i] for i in range(len(rows))]


def test_strip_fan_normals_random(spark):
    rng = random.Random(3)
    rows = [[rng.randrange(1000) for _ in range(n)] for n in
            [0, 1, 2, 3, 4, 5, 6, 7, 11] + [rng.randrange(20) for _ in range(20)]]
    for got, want in zip(_run(spark, rows, triangle_vertex_list_from_strip),
                         [_py_strip(r) for r in rows]):
        assert list(got) == want
    for got, want in zip(_run(spark, rows, triangle_vertex_list_from_fan),
                         [_py_fan(r) for r in rows]):
        assert list(got) == want
    for got, want in zip(_run(spark, rows, triangle_normal_list_from_strip_or_fan),
                         [_py_normals(r) for r in rows]):
        assert list(got) == want


def test_triangles_from_vertex_list(spark):
    rows = [[], [1, 2, 3], [1, 2, 3, 4, 5, 6], [1, 2], [1, 2, 3, 4]]
    got = _run(spark, rows, triangles_from_vertex_list)
    assert list(got[0]) == []
    assert [list(t) for t in got[1]] == [[1, 2, 3]]
    assert [list(t) for t in got[2]] == [[1, 2, 3], [4, 5, 6]]
    assert got[3] is None and got[4] is None  # not a multiple of 3


def test_strip_composition_matches_reference_chain(spark):
    # trianglesXZFromTriangleStrip == trianglesXZFromVertexList(strip list)
    vs = [10, 20, 30, 40, 50]
    rows = [vs]
    strip = _run(spark, rows, lambda c: triangles_from_vertex_list(
        triangle_vertex_list_from_strip(c)))[0]
    assert [list(t) for t in strip] == [[10, 20, 30], [20, 40, 30], [30, 40, 50]]


def test_plan_is_projection_only(spark):
    df = spark.createDataFrame([(1, [1, 2, 3, 4])], "i int, vs array<bigint>")
    plan = (
        df.select(triangle_vertex_list_from_strip(F.col("vs")).alias("o"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
