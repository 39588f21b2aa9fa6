"""kNN / IDW / zonal join tests with brute-force numpy oracles
(FIXTURES.md section 5: golden = exact brute-force kNN, ascending distance,
ties by site id)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.knn import idw_join, knn_join
from osm2world_spark.functions.projection import Origin


SEED = 123


def _sites_queries(spark, n_sites=2000, n_queries=200):
    rng = np.random.default_rng(SEED)
    # clustered sites: a few dense blobs + uniform background, ~3 km extent
    centers = rng.uniform(-1500, 1500, (8, 2))
    blob = centers[rng.integers(0, 8, n_sites)] + rng.normal(0, 60, (n_sites, 2))
    uniform = rng.uniform(-1500, 1500, (n_sites // 4, 2))
    pts = np.vstack([blob, uniform])
    y = rng.uniform(100, 900, len(pts))
    sites = spark.createDataFrame(
        pd.DataFrame(
            {"s_id": [f"s{i:06d}" for i in range(len(pts))], "x": pts[:, 0], "z": pts[:, 1], "y": y}
        )
    )
    q = rng.uniform(-1600, 1600, (n_queries, 2))
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [f"q{i:05d}" for i in range(n_queries)], "x": q[:, 0], "z": q[:, 1]})
    )
    return sites, queries, pts, y, q


def _brute_knn(pts, q, k):
    d = np.sqrt(((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    out = {}
    for i in range(len(q)):
        order = np.lexsort((np.arange(len(pts)), d[i]))[:k]
        out[f"q{i:05d}"] = [(f"s{j:06d}", d[i, j]) for j in order]
    return out


@pytest.mark.parametrize("k", [9, 29])
def test_knn_exact_vs_bruteforce(spark, k):
    sites, queries, pts, y, q = _sites_queries(spark)
    got = knn_join(queries, sites, k=k).collect()
    golden = _brute_knn(pts, q, k)
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.s_id, r.dist))
    assert len(by_q) == len(q)
    for qid, rows in by_q.items():
        rows.sort()
        assert len(rows) == k
        for (rank, s_id, dist), (g_sid, g_dist) in zip(rows, golden[qid]):
            assert s_id == g_sid, (qid, rank, s_id, g_sid)
            assert dist == pytest.approx(g_dist, abs=1e-9)


def test_knn_fewer_sites_than_k(spark):
    sites = spark.createDataFrame(
        pd.DataFrame({"s_id": ["a", "b", "c"], "x": [0.0, 10.0, 20.0], "z": [0.0, 0.0, 0.0], "y": [1.0, 2.0, 3.0]})
    )
    queries = spark.createDataFrame(pd.DataFrame({"q_id": ["q1"], "x": [5.0], "z": [5.0]}))
    got = knn_join(queries, sites, k=9).collect()
    assert len(got) == 3  # all available sites, no silent drop


def test_idw_vs_bruteforce(spark):
    sites, queries, pts, y, q = _sites_queries(spark, n_sites=1000, n_queries=100)
    got = {r.q_id: r.ele for r in idw_join(queries, sites, cutoff=300.0, exponent=2.0).collect()}
    for i in range(len(q)):
        d = np.sqrt(((q[i] - pts) ** 2).sum(-1))
        m = d < 300.0
        if not m.any():
            assert f"q{i:05d}" not in got
            continue
        w = d[m] ** -2.0
        expected = (w * y[m]).sum() / w.sum()
        assert got[f"q{i:05d}"] == pytest.approx(expected, rel=1e-9)


def test_zonal_pipeline(spark):
    from osm2world_spark.sources.documents import synthetic_documents, extract_elements, DEFAULT_ORIGIN, BBOX
    from osm2world_spark.sources.raster import synthetic_raster, raster_sites
    from osm2world_spark.operators.zonal import elevation_join, zonal_stats

    docs = synthetic_documents(spark, 150, seed=42)
    els = extract_elements(docs).cache()
    raster = synthetic_raster(spark, *BBOX, step=4)
    sites = raster_sites(raster, DEFAULT_ORIGIN)
    elevated = elevation_join(els, sites, method="idw").cache()
    n = elevated.count()
    assert n > 0
    # every connector got an elevation (raster covers the whole bbox)
    assert elevated.where(F.col("ele").isNull()).count() == 0
    stats = zonal_stats(elevated, els).collect()
    assert len(stats) > 3
    for r in stats:
        assert 0 < r.avg_ele < 1000
        assert r.min_ele <= r.avg_ele <= r.max_ele
    elevated.unpersist()
    els.unpersist()


def test_raster_site_formula(spark):
    """Pixel-center rule: lat = cell_lat + (py+0.5)/1201 (SRTMData.java:139-155)."""
    from osm2world_spark.sources.raster import synthetic_raster, raster_sites, PIXELS, BLANK_VALUE
    from osm2world_spark.functions.projection import np_to_xz

    origin = Origin(48.56687, 13.45127)
    raster = synthetic_raster(spark, 48.52, 13.37, 48.58, 13.44, step=3).cache()
    n_blank = raster.where(F.col("elev") == BLANK_VALUE).count()
    n_total = raster.count()
    assert 0 < n_blank / n_total < 0.05  # ~2% no-data
    r = raster.where(F.col("elev") != BLANK_VALUE).first()
    sites = raster_sites(raster, origin)
    s = sites.where(F.col("s_id") == f"{r.cell_lon}_{r.cell_lat}_{r.px}_{r.py}").first()
    lat = r.cell_lat + (r.py + 0.5) / PIXELS
    lon = r.cell_lon + (r.px + 0.5) / PIXELS
    x, z = np_to_xz(np.array([lat]), np.array([lon]), origin)
    assert s.x == pytest.approx(x[0], abs=1e-9)
    assert s.z == pytest.approx(z[0], abs=1e-9)
    assert s.y == float(r.elev)
    raster.unpersist()


def test_knn_far_outlier_settles_exactly(spark):
    """A query far outside the sites' extent (plus a tiny max_rounds) must
    still settle EXACTLY via the broadcast exhaustive tail — never be
    silently dropped, never explode a planet-wide cell cover."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-500, 500, (300, 2))
    sites = spark.createDataFrame(
        pd.DataFrame({"s_id": [f"s{i:06d}" for i in range(len(pts))], "x": pts[:, 0], "z": pts[:, 1]})
    )
    q = np.array([[0.0, 0.0], [9.9e6, -9.9e6]])  # center + ~14,000 km outlier
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": ["q00000", "q00001"], "x": q[:, 0], "z": q[:, 1]})
    )
    got = knn_join(queries, sites, k=5, max_rounds=2).collect()
    golden = _brute_knn(pts, q, 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rank, r.s_id, r.dist))
    assert set(by_q) == {"q00000", "q00001"}  # outlier present, not dropped
    for qid, rows in by_q.items():
        rows.sort()
        assert [s for _, s, _ in rows] == [s for s, _ in golden[qid]]
        for (_, _, dist), (_, g_dist) in zip(rows, golden[qid]):
            assert dist == pytest.approx(g_dist, rel=1e-12)
