"""JL random projection + int8 scalar quantization
(operators/similarity.py::jl_project / quantize_embeddings).

Oracle: exact-integer scalar replicas over the same u6 fixed-point
inputs; a distance-preservation property check for the JL contract.
"""

from __future__ import annotations

import math

import pytest

VECS = [
    (0, [0.5, -0.25, 0.125, 1.0]),
    (1, [-1.0, 0.75, 0.0, -0.125]),
    (2, [0.000001, -0.0000004, 0.0, 0.0]),   # u6 rounding edge
    (3, [0.0, 0.0, 0.0, 0.0]),               # zero vector
]
IN_DIM = 4
OUT_DIM = 3


def _u6(x: float) -> int:
    return math.floor(x * 1000000.0 + 0.5)


def _df(spark):
    return spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in VECS],
        "vec_id bigint, embedding array<float>",
    )


def test_jl_matches_scalar_replica(spark):
    from osm2world_spark.operators.similarity import jl_project, jl_sign_matrix

    m = jl_sign_matrix(OUT_DIM, IN_DIM)
    got = {
        (r["vec_id"], r["j"]): r["y"]
        for r in jl_project(_df(spark), OUT_DIM, IN_DIM).collect()
    }
    for vid, vec in VECS:
        xu = [_u6(v) for v in vec]
        for j in range(OUT_DIM):
            want = sum(m[j][i] * xu[i] for i in range(IN_DIM))
            assert got[(vid, j)] == want, (vid, j)
    assert len(got) == len(VECS) * OUT_DIM


def test_jl_matrix_is_deterministic_and_signed(spark):
    from osm2world_spark.operators.similarity import jl_sign_matrix

    a = jl_sign_matrix(8, 16, seed=7)
    b = jl_sign_matrix(8, 16, seed=7)
    assert a == b
    assert all(v in (-1, 1) for row in a for v in row)
    assert a != jl_sign_matrix(8, 16, seed=8)  # seed actually matters


def test_jl_preserves_distances_statistically(spark):
    """The JL contract on real-ish data: pairwise squared distances in
    the projected space, rescaled by in_dim/out_dim, stay within a loose
    (1 +- 0.75) band of the originals for a 64->16 projection."""
    import numpy as np

    from osm2world_spark.operators.similarity import jl_sign_matrix

    rng = np.random.RandomState(0)
    x = rng.randn(20, 64)
    m = np.array(jl_sign_matrix(16, 64))
    y = x @ m.T
    ratios = []
    for a in range(20):
        for b in range(a + 1, 20):
            d0 = ((x[a] - x[b]) ** 2).sum()
            d1 = ((y[a] - y[b]) ** 2).sum() / 16.0
            ratios.append(d1 / d0)
    # per-pair ratios concentrate around 1 (rel std ~ sqrt(2/16) per
    # JL); the mean over 190 pairs must sit tight and every single pair
    # inside a generous envelope
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15, mean
    assert all(0.2 < r < 2.5 for r in ratios), (min(ratios), max(ratios))


def test_quantize_matches_scalar_replica(spark):
    from osm2world_spark.operators.similarity import quantize_embeddings

    rows = quantize_embeddings(_df(spark)).collect()
    got = {}
    for r in rows:
        got.setdefault(r["vec_id"], (r["scale_u6"], {}))[1][r["i"]] = r["q"]
    for vid, vec in VECS:
        xu = [_u6(v) for v in vec]
        s = max(abs(v) for v in xu)
        scale, qs = got[vid]
        assert scale == s
        for i, x in enumerate(xu):
            if s == 0:
                assert qs[i] is None
            else:
                want = math.floor((x * 254 + s) / (2.0 * s))
                assert qs[i] == want, (vid, i)
                assert -127 <= qs[i] <= 127


def test_quantize_extremes_hit_full_range(spark):
    from osm2world_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(9, [1.0, -1.0, 0.5, 0.0])], "vec_id bigint, embedding array<float>"
    )
    qs = {r["i"]: r["q"] for r in quantize_embeddings(df).collect()}
    assert qs[0] == 127 and qs[1] == -127
    assert qs[2] == 64  # 0.5 -> 63.5+0.5 = 64 under round-half-up
    assert qs[3] == 0


def test_projection_plans_are_shuffle_free(spark):
    from osm2world_spark.operators.similarity import (
        jl_project,
        quantize_embeddings,
    )

    df = _df(spark)
    for plan_df in (jl_project(df, OUT_DIM, IN_DIM), quantize_embeddings(df)):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan
