"""Natural-neighbor (Sibson) interpolation tests: brute Voronoi
stolen-area oracle on a grid, linear precision, at-site exactness, and
the grid-partitioned (halo) path matching the single-group exact path.

Reference semantics: NaturalNeighborInterpolator.java:19-57 +
DelaunayTriangulation.probe (:565-653)."""

import numpy as np
import pandas as pd
import pytest

from osm2world_spark.operators.natural import (
    _Delaunay,
    _interpolate_group,
    natural_neighbor_interpolate,
)


def _cloud(n=60, seed=5):
    rng = np.random.default_rng(seed)
    sx = rng.uniform(0, 1000, n)
    sz = rng.uniform(0, 1000, n)
    sy = rng.uniform(0, 100, n)
    return sx, sz, sy


def _brute_sibson(sx, sz, sy, qx, qz, grid_n=1400):
    """Grid-sampled stolen-area oracle: fraction of the probe's new
    Voronoi cell stolen from each site's old cell, frame corners y=0."""
    pad = 100.0
    minx, maxx = sx.min() - pad, sx.max() + pad
    minz, maxz = sz.min() - pad, sz.max() + pad
    fx = np.array([minx, maxx, maxx, minx])
    fz = np.array([minz, minz, maxz, maxz])
    ax = np.concatenate([fx, sx])
    az = np.concatenate([fz, sz])
    ay = np.concatenate([np.zeros(4), sy])
    gx, gz = np.meshgrid(np.linspace(minx, maxx, grid_n), np.linspace(minz, maxz, grid_n))
    gx, gz = gx.ravel(), gz.ravel()
    d_old = (gx[:, None] - ax[None, :]) ** 2 + (gz[:, None] - az[None, :]) ** 2
    near_old = d_old.argmin(1)
    stolen = (gx - qx) ** 2 + (gz - qz) ** 2 < d_old.min(1)
    w = np.bincount(near_old[stolen], minlength=len(ax)).astype(float)
    w /= w.sum()
    return float((w * ay).sum())


def test_matches_brute_voronoi_oracle():
    sx, sz, sy = _cloud()
    qs = np.array([[500.0, 500.0], [200.0, 800.0], [730.0, 310.0], [420.0, 260.0]])
    got = _interpolate_group(sx, sz, sy, qs[:, 0], qs[:, 1])
    for i, (qx, qz) in enumerate(qs):
        want = _brute_sibson(sx, sz, sy, qx, qz)
        assert got[i] == pytest.approx(want, abs=0.1), (qx, qz)


def test_linear_precision_interior():
    """Sibson interpolation reproduces linear fields exactly (its defining
    property) for queries whose neighbors are all real sites."""
    rng = np.random.default_rng(11)
    sx = rng.uniform(0, 1000, 200)
    sz = rng.uniform(0, 1000, 200)
    sy = 3.0 + 0.01 * sx - 0.02 * sz
    qx = rng.uniform(200, 800, 50)
    qz = rng.uniform(200, 800, 50)
    got = _interpolate_group(sx, sz, sy, qx, qz)
    want = 3.0 + 0.01 * qx - 0.02 * qz
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_probe_at_site_returns_site_value():
    sx, sz, sy = _cloud()
    got = _interpolate_group(sx, sz, sy, sx[:5], sz[:5])
    np.testing.assert_allclose(got, sy[:5], atol=0)


def test_weights_sum_to_one_and_nonnegative():
    sx, sz, sy = _cloud(n=40, seed=9)
    tri = _Delaunay(sx.min() - 100, sz.min() - 100, sx.max() + 100, sz.max() + 100)
    for i in np.lexsort((sz, sx)):
        tri.insert(float(sx[i]), float(sz[i]))
    for qx, qz in [(300.0, 300.0), (512.3, 648.9), (901.0, 120.0)]:
        nn = tri.probe(qx, qz)
        ws = [w for _, w in nn]
        assert all(w >= 0 for w in ws)
        assert sum(ws) == pytest.approx(1.0, abs=1e-12)


def test_spark_single_group_and_halo_path_agree(spark):
    """cell_size=None (exact, one group) and the grid-partitioned halo
    path must agree for queries whose Sibson neighborhood is local."""
    rng = np.random.default_rng(3)
    n = 400
    pts = rng.uniform(0, 2000, (n, 2))
    sites = spark.createDataFrame(
        pd.DataFrame(
            {
                "s_id": [f"s{i}" for i in range(n)],
                "x": pts[:, 0],
                "z": pts[:, 1],
                "y": 5.0 + 0.003 * pts[:, 0] + 0.001 * pts[:, 1],
            }
        )
    )
    q = rng.uniform(400, 1600, (40, 2))
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [f"q{i}" for i in range(40)], "x": q[:, 0], "z": q[:, 1]})
    )
    exact = {
        r["q_id"]: r["ele"]
        for r in natural_neighbor_interpolate(queries, sites).collect()
    }
    parts = {
        r["q_id"]: r["ele"]
        for r in natural_neighbor_interpolate(queries, sites, cell_size=500.0, halo=1).collect()
    }
    assert set(exact) == set(parts) == {f"q{i}" for i in range(40)}
    for k in exact:
        assert parts[k] == pytest.approx(exact[k], abs=1e-6), k
    # linear field -> linear precision end-to-end as well
    for i in range(40):
        want = 5.0 + 0.003 * q[i, 0] + 0.001 * q[i, 1]
        assert exact[f"q{i}"] == pytest.approx(want, abs=1e-6)


def test_interpolate_dispatch(spark):
    from osm2world_spark.operators.knn import interpolate

    sites = spark.createDataFrame(
        pd.DataFrame(
            {"s_id": ["a", "b", "c", "d"], "x": [0.0, 100.0, 0.0, 100.0],
             "z": [0.0, 0.0, 100.0, 100.0], "y": [1.0, 2.0, 3.0, 4.0]}
        )
    )
    queries = spark.createDataFrame(pd.DataFrame({"q_id": ["q"], "x": [50.0], "z": [50.0]}))
    got = interpolate(queries, sites, method="naturalneighbor").first()
    assert got["ele"] == pytest.approx(2.5, abs=1e-9)  # symmetric center
