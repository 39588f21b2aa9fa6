"""Freeze the golden-parquet oracle for the `natural_elevation` driver
query (J9 Sibson natural-neighbor interpolation,
NaturalNeighborInterpolator.java:19-57).

DuckDB cannot express incremental Delaunay, so the driver's hash gate
compares the Spark query against this committed parquet instead
(`oracle_sql()["natural_elevation"]` reads it via read_parquet). The
parquet is NOT self-certifying: before writing, this tool validates a
deterministic sample of rows against an INDEPENDENT windowed
brute-Voronoi stolen-area oracle (pure numpy, no code shared with the
engine's Bowyer-Watson kernel), using Sibson's linear-precision
property for interior queries (sites carry y = x/100 + z/200 exactly,
so any query with no frame-corner neighbor must interpolate to
qx/100 + qz/200) and grid-counted stolen-area weights for edge queries.
tests/test_natural_golden.py re-runs the same validation in CI.

The golden is frozen at sf0.01 — the scale the driver's correctness
gate runs at. Regenerate ONLY on an intentional semantics change:
    python tools/make_natural_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "natural_elevation", "golden.parquet",
)
SF_DIR = "/root/testdata/sf0.01"
BBOX_PAD = 100.0  # must match operators/natural.py BBOX_PAD
N_SAMPLE = 14


def load_inputs(sf_dir: str = SF_DIR):
    """Rebuild the query/site clouds the driver query uses, engine-free:
    read the parquet with pyarrow and evaluate the same planar formulas
    numerically (X_M/Z_M are deterministic closed forms of the key)."""
    import duckdb

    import __spark_entry__ as em

    con = duckdb.connect()
    x = em.X_M.format(k="o_orderkey")
    z = em.Z_M.format(k="o_orderkey")
    sites = con.sql(
        f"SELECT o_orderkey AS s_id, {x} AS x, {z} AS z "
        f"FROM read_parquet('{sf_dir}/orders.parquet') WHERE o_orderkey % 17 = 0"
    ).fetchnumpy()
    xq = em.X_M.format(k="c_custkey")
    zq = em.Z_M.format(k="c_custkey")
    qs = con.sql(
        f"SELECT CAST(c_custkey AS VARCHAR) AS q_id, {xq} AS x, {zq} AS z "
        f"FROM read_parquet('{sf_dir}/customer.parquet') WHERE c_custkey % 11 = 0"
    ).fetchnumpy()
    sy = sites["x"] / 100.0 + sites["z"] / 200.0
    return (
        np.asarray(sites["x"], float), np.asarray(sites["z"], float), sy,
        list(qs["q_id"]), np.asarray(qs["x"], float), np.asarray(qs["z"], float),
    )


def brute_sibson_windowed(sx, sz, sy, qx, qz, grid_n=1100):
    """Independent Sibson value at one query: grid-count the stolen
    areas inside an adaptively-grown window around the query (the
    stolen region is the query's new Voronoi cell, so it is bounded —
    grow the window until no stolen point touches the boundary ring).

    Returns (value, corner_frac): corner_frac > 0 means some weight is
    stolen from the y=0 frame corners (edge query — linear precision
    does not apply there)."""
    minx, maxx = sx.min() - BBOX_PAD, sx.max() + BBOX_PAD
    minz, maxz = sz.min() - BBOX_PAD, sz.max() + BBOX_PAD
    ax = np.concatenate([[minx, maxx, maxx, minx], sx])
    az = np.concatenate([[minz, minz, maxz, maxz], sz])
    ay = np.concatenate([np.zeros(4), sy])

    d2q = (ax - qx) ** 2 + (az - qz) ** 2
    r = 4.0 * np.sqrt(np.partition(d2q, 1)[1] + 1e-12)
    for _ in range(12):
        gx = np.linspace(max(qx - r, minx), min(qx + r, maxx), grid_n)
        gz = np.linspace(max(qz - r, minz), min(qz + r, maxz), grid_n)
        GX, GZ = np.meshgrid(gx, gz)
        GX, GZ = GX.ravel(), GZ.ravel()
        # chunked old-owner argmin (full matrix would be ~10 GB)
        near = np.empty(len(GX), np.int64)
        dmin = np.empty(len(GX))
        step = 50_000
        for i in range(0, len(GX), step):
            d = (GX[i:i + step, None] - ax[None, :]) ** 2 + (
                GZ[i:i + step, None] - az[None, :]
            ) ** 2
            near[i:i + step] = d.argmin(1)
            dmin[i:i + step] = d.min(1)
        stolen = (GX - qx) ** 2 + (GZ - qz) ** 2 < dmin
        # grown enough? no stolen point on the outermost ring (unless
        # the ring is clamped to the global frame, which bounds the cell)
        S = stolen.reshape(grid_n, grid_n)
        ring = np.concatenate([S[0], S[-1], S[:, 0], S[:, -1]])
        open_lo_x = gx[0] > minx + 1e-9
        open_hi_x = gx[-1] < maxx - 1e-9
        open_lo_z = gz[0] > minz + 1e-9
        open_hi_z = gz[-1] < maxz - 1e-9
        leak = (
            (S[0].any() and open_lo_z) or (S[-1].any() and open_hi_z)
            or (S[:, 0].any() and open_lo_x) or (S[:, -1].any() and open_hi_x)
        )
        del ring
        if not leak:
            break
        r *= 2.0
    w = np.bincount(near[stolen], minlength=len(ax)).astype(float)
    tot = w.sum()
    if tot == 0:
        return float("nan"), 0.0
    w /= tot
    return float((w * ay).sum()), float(w[:4].sum())


def validate(golden_rows: dict[str, float], sx, sz, sy, q_ids, qx, qz,
             n_sample: int = N_SAMPLE, verbose: bool = True) -> float:
    """Check a deterministic sample of golden rows against the brute
    oracle. Interior queries must match the affine field to 1e-6 (Sibson
    linear precision — exact, independent); edge queries match the
    grid-counted value to 2% of the local field scale. Returns the max
    relative deviation seen on edge queries."""
    order = np.argsort(np.asarray(q_ids))
    sample = order[:: max(1, len(order) // n_sample)][:n_sample]
    worst = 0.0
    for i in sample:
        qid = q_ids[i]
        got = golden_rows[qid]
        brute, corner_frac = brute_sibson_windowed(sx, sz, sy, qx[i], qz[i])
        affine = qx[i] / 100.0 + qz[i] / 200.0
        if corner_frac == 0.0:
            dev = abs(got - affine)
            assert dev < 1e-5, (qid, got, affine, "interior linear precision")
            kind = "interior"
        else:
            scale = max(abs(affine), 1.0)
            dev = abs(got - brute) / scale
            assert dev < 0.02, (qid, got, brute, corner_frac)
            worst = max(worst, dev)
            kind = f"edge(corner_w={corner_frac:.3f})"
        if verbose:
            print(f"  {qid}: golden={got:.6f} brute={brute:.4f} "
                  f"affine={affine:.4f} [{kind}] dev={dev:.2e}")
    return worst


def main() -> None:
    from osm2world_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark(app_name="make_natural_golden", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = em.queries()["natural_elevation"](spark, SF_DIR)
    pdf = df.toPandas().sort_values("q_id").reset_index(drop=True)
    spark.stop()
    print(f"natural_elevation at sf0.01: {len(pdf)} rows")

    sx, sz, sy, q_ids, qx, qz = load_inputs()
    golden_rows = dict(zip(pdf["q_id"], pdf["ele_r"]))
    worst = validate(golden_rows, sx, sz, sy, q_ids, qx, qz)
    print(f"validation OK (worst edge-query relative deviation {worst:.2e})")

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "q_id": pa.array(pdf["q_id"], pa.string()),
        "ele_r": pa.array(pdf["ele_r"], pa.float64()),
    })
    pq.write_table(table, GOLDEN)
    print("golden written:", GOLDEN)


if __name__ == "__main__":
    main()
