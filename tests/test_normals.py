"""NormalCalculationUtil parity: flat strip/fan normals vs line-for-line
replicas of the Java loops, smooth vertex normals on constructed meshes
(axis-aligned cube, shared-edge roof), and the plan-shape contracts."""

import math
import random

from pyspark.sql import functions as F

from osm2world_spark.functions.normals import (
    fan_flat_normals,
    flat_triangle_normals,
    strip_flat_normals,
)
from osm2world_spark.operators.normals import smooth_vertex_normals

VSCHEMA = "i int, vs array<struct<x double, y double, z double>>"


# ------------------------------------------------------------- replicas

def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _cn(a, b):
    x = a[1] * b[2] - a[2] * b[1]
    y = a[2] * b[0] - a[0] * b[2]
    z = a[0] * b[1] - a[1] * b[0]
    ln = math.sqrt(x * x + y * y + z * z)
    return (x / ln, y / ln, z / ln)


def _py_per_triangle(vs, fan):
    normals = [None] * len(vs)
    for tri in range(len(vs) - 2):
        i = tri + 1
        v_before = vs[0] if fan else vs[i - 1]
        to_before = _sub(v_before, vs[i])
        to_after = _sub(vs[i + 1], vs[i])
        if tri % 2 == 0 or fan:
            normals[i + 1] = _cn(to_before, to_after)
        else:
            normals[i + 1] = _cn(to_after, to_before)
    normals[0] = normals[2]
    normals[1] = normals[2]
    return normals


def _rand_vs(rng, n):
    return [
        (rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-5, 5)) for _ in range(n)
    ]


def _run(spark, rows, fn):
    df = spark.createDataFrame(list(enumerate(rows)), VSCHEMA)
    got = {r["i"]: r["o"] for r in df.select("i", fn(F.col("vs")).alias("o")).collect()}
    return [got[i] for i in range(len(rows))]


def _close(a, b):
    return all(abs(x - y) < 1e-12 for x, y in zip(a, b))


def test_strip_and_fan_flat_normals_match_java_loop(spark):
    rng = random.Random(9)
    rows = [_rand_vs(rng, n) for n in (3, 4, 5, 6, 9, 12)]
    for got, vs in zip(_run(spark, rows, strip_flat_normals), rows):
        want = _py_per_triangle(vs, fan=False)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert _close((g["x"], g["y"], g["z"]), w)
    for got, vs in zip(_run(spark, rows, fan_flat_normals), rows):
        want = _py_per_triangle(vs, fan=True)
        for g, w in zip(got, want):
            assert _close((g["x"], g["y"], g["z"]), w)


def test_flat_triangle_normals(spark):
    # one CCW triangle in the XZ plane -> normal +y, repeated 3x
    tri = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)]
    got = _run(spark, [tri], flat_triangle_normals)[0]
    assert len(got) == 3
    for g in got:
        assert _close((g["x"], g["y"], g["z"]), (0.0, 1.0, 0.0))
    # size not a multiple of 3 -> NULL
    assert _run(spark, [tri[:2]], flat_triangle_normals)[0] is None


def _mesh_df(spark, tris):
    return spark.createDataFrame(
        [("m", i, [tuple(v) for v in t]) for i, t in enumerate(tris)],
        "mesh_id string, tri_idx int, verts array<struct<x double, y double, z double>>",
    )


def test_smooth_normals_coplanar_dedupe(spark):
    """Two coplanar triangles sharing an edge: every vertex's adjacent
    normal SET is {+y} (the multimap collapses the duplicate), so every
    smooth normal is exactly +y."""
    tris = [
        [(0, 0, 0), (1, 0, 0), (0, 0, 1)],
        [(1, 0, 0), (1, 0, 1), (0, 0, 1)],
    ]
    tris = [[tuple(map(float, v)) for v in t] for t in tris]
    out = smooth_vertex_normals(_mesh_df(spark, tris)).collect()
    assert len(out) == 4  # distinct vertices
    for r in out:
        n = r["normal"]
        assert _close((n["x"], n["y"], n["z"]), (0.0, 1.0, 0.0))


def test_smooth_normals_roof_edge_averages(spark):
    """Two faces meeting at a ridge: ridge vertices average the two face
    normals; outer vertices keep their face's normal."""
    # face A in plane y=z (normal (0, 1, -1)/sqrt2 direction), face B in y=-z
    a = [(0.0, 0.0, 0.0), (0.0, 1.0, 1.0), (1.0, 0.0, 0.0)]
    # triangle B shares the edge (0,0,0)-(1,0,0)
    b = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, -1.0)]
    out = {
        (r["vertex"]["x"], r["vertex"]["y"], r["vertex"]["z"]): r["normal"]
        for r in smooth_vertex_normals(_mesh_df(spark, [a, b])).collect()
    }
    na = _cn(_sub(a[1], a[0]), _sub(a[1], a[2]))  # getNormal of A
    nb = _cn(_sub(b[1], b[0]), _sub(b[1], b[2]))
    s = tuple(x + y for x, y in zip(sorted([na, nb])[0], sorted([na, nb])[1]))
    ln = math.sqrt(sum(c * c for c in s))
    want_ridge = tuple(c / ln for c in s)
    for rv in ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)):
        n = out[rv]
        assert _close((n["x"], n["y"], n["z"]), want_ridge)
    n = out[(0.0, 1.0, 1.0)]
    assert _close((n["x"], n["y"], n["z"]), na)


def test_smooth_normals_degenerate_fallback(spark):
    """Opposite normals cancel: the fallback is the lowest-tri_idx
    adjacent normal (deterministic stand-in for Java's set iteration)."""
    up = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)]
    down = [(0.0, 0.0, 0.0), (0.0, 0.0, 1.0), (1.0, 0.0, 0.0)]  # same, CW
    out = {
        (r["vertex"]["x"], r["vertex"]["y"], r["vertex"]["z"]): r["normal"]
        for r in smooth_vertex_normals(_mesh_df(spark, [up, down])).collect()
    }
    for v, n in out.items():
        assert _close((n["x"], n["y"], n["z"]), (0.0, 1.0, 0.0)), v


def test_smooth_normals_two_exchanges(spark):
    tris = [[(0.0, 0.0, 0.0), (0.0, 0.0, 1.0), (1.0, 0.0, 0.0)]]
    plan = (
        smooth_vertex_normals(_mesh_df(spark, tris))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
