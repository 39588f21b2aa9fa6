"""Clip operator tests: center-in-tile ownership and Sutherland-Hodgman /
Liang-Barsky tile clipping (MeshStore.ClipToBounds semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.clip import (
    _clip_polyline,
    _clip_segment,
    _sh_clip_ring,
    clip_to_tiles,
    owner_tile,
)
from osm2world_spark.sources.documents import (
    DEFAULT_ORIGIN,
    extract_elements,
    synthetic_documents,
)


def test_sh_clip_square_overlap():
    ring = np.array([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0])
    res = _sh_clip_ring(ring[0::2], ring[1::2], 5.0, 5.0, 20.0, 20.0)
    xs, zs = res
    # clipped to the [5,10]x[5,10] square
    assert xs.min() == 5.0 and xs.max() == 10.0
    assert zs.min() == 5.0 and zs.max() == 10.0
    assert xs[0] == xs[-1] and zs[0] == zs[-1]  # closed


def test_sh_clip_fully_inside_and_outside():
    ring = np.array([1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0, 2.0, 1.0, 1.0])
    res = _sh_clip_ring(ring[0::2], ring[1::2], 0.0, 0.0, 10.0, 10.0)
    np.testing.assert_array_equal(res[0], ring[0::2])
    assert _sh_clip_ring(ring[0::2], ring[1::2], 5.0, 5.0, 10.0, 10.0) is None


def test_clip_segment():
    assert _clip_segment(-5, 5, 15, 5, 0, 0, 10, 10) == ((0.0, 5.0), (10.0, 5.0))
    assert _clip_segment(-5, -5, -1, -1, 0, 0, 10, 10) is None
    assert _clip_segment(1, 1, 2, 2, 0, 0, 10, 10) == ((1, 1), (2, 2))


def test_clip_polyline_crossing():
    xs = np.array([-5.0, 15.0])
    zs = np.array([5.0, 5.0])
    pieces = _clip_polyline(xs, zs, 0, 0, 10, 10)
    assert len(pieces) == 1
    cx, cz = pieces[0]
    assert cx.tolist() == [0.0, 10.0] and cz.tolist() == [5.0, 5.0]


def test_clip_polyline_exit_reenter_splits():
    # way leaves the rect through the top and comes back: the clip must
    # yield TWO disjoint pieces, not one polyline with a fabricated segment
    # bridging the gap along the boundary
    xs = np.array([2.0, 4.0, 6.0, 8.0])
    zs = np.array([5.0, 15.0, 15.0, 5.0])
    pieces = _clip_polyline(xs, zs, 0, 0, 10, 10)
    assert len(pieces) == 2
    (ax, az), (bx, bz) = pieces
    # first piece ends on the top boundary, second starts on it
    assert az.tolist()[0] == 5.0 and az.tolist()[-1] == 10.0
    assert bz.tolist()[0] == 10.0 and bz.tolist()[-1] == 5.0
    # no piece contains the out-of-rect excursion
    for px, pz in pieces:
        assert pz.max() <= 10.0
    # and the two pieces are disjoint (exit x != re-entry x)
    assert ax.tolist()[-1] != bx.tolist()[0]


def test_clip_polyline_fully_outside():
    xs = np.array([20.0, 30.0, 25.0])
    zs = np.array([20.0, 20.0, 30.0])
    assert _clip_polyline(xs, zs, 0, 0, 10, 10) == []


def test_owner_unique_and_clip_cover(spark):
    docs = synthetic_documents(spark, 200, seed=42)
    els = extract_elements(docs).cache()
    owned = owner_tile(els, zoom=12)
    # exactly one owner row per element
    assert owned.count() == els.count()

    clipped = clip_to_tiles(els, DEFAULT_ORIGIN, zoom=14).cache()
    n = clipped.count()
    assert n >= els.count() * 0.5  # most elements survive somewhere
    # every clipped area ring is closed and within its tile's metric box
    # (spot-check a few rows)
    rows = clipped.where("element_type = 'area'").limit(10).collect()
    from osm2world_spark.functions.tiles import py_tile_bounds
    from osm2world_spark.functions.projection import np_to_xz

    for r in rows:
        minlat, minlon, maxlat, maxlon = py_tile_bounds(r.zoom, r.tile_x, r.tile_y)
        xa, za = np_to_xz(np.array([minlat, maxlat]), np.array([minlon, maxlon]), DEFAULT_ORIGIN)
        minx, maxx = sorted(xa)
        minz, maxz = sorted(za)
        for ring in r.geom:
            xs, zs = np.array(ring[0::2]), np.array(ring[1::2])
            assert xs.min() >= minx - 1e-6 and xs.max() <= maxx + 1e-6
            assert zs.min() >= minz - 1e-6 and zs.max() <= maxz + 1e-6
            assert xs[0] == xs[-1] and zs[0] == zs[-1]
    clipped.unpersist()
    els.unpersist()


def _scalar_clip_reference(pdf, origin):
    """The pre-vectorization per-row kernel, kept as the semantics oracle
    for _clip_batch (emission order and float arithmetic must match
    exactly)."""
    import pandas as pd

    from osm2world_spark.functions.projection import np_to_xz
    from osm2world_spark.functions.tiles import py_tile_bounds

    out = {k: [] for k in ("doc_id", "span_idx", "element_type", "zoom", "tile_x", "tile_y", "geom")}
    for row in pdf.itertuples(index=False):
        minlat, minlon, maxlat, maxlon = py_tile_bounds(row.zoom, row.tile_x, row.tile_y)
        xa, za = np_to_xz(np.array([minlat, maxlat]), np.array([minlon, maxlon]), origin)
        minx, maxx = sorted((xa[0], xa[1]))
        minz, maxz = sorted((za[0], za[1]))
        rings_out = []
        for ring in row.geom:
            arr = np.asarray(ring)
            xs, zs = arr[0::2].copy(), arr[1::2].copy()
            if row.element_type == "node":
                if minx <= xs[0] <= maxx and minz <= zs[0] <= maxz:
                    rings_out.append(list(ring))
                continue
            if row.element_type == "way":
                for kx, kz in _clip_polyline(xs, zs, minx, minz, maxx, maxz):
                    p = np.empty(len(kx) * 2)
                    p[0::2], p[1::2] = kx, kz
                    rings_out.append(p.tolist())
                continue
            res = _sh_clip_ring(xs, zs, minx, minz, maxx, maxz)
            if res is not None:
                p = np.empty(len(res[0]) * 2)
                p[0::2], p[1::2] = res
                rings_out.append(p.tolist())
        if not rings_out:
            continue
        for k in ("doc_id", "span_idx", "element_type", "zoom", "tile_x", "tile_y"):
            out[k].append(getattr(row, k))
        out["geom"].append(rings_out)
    return pd.DataFrame(out)


def test_clip_batch_matches_scalar_kernel_exactly():
    """_clip_batch (flat vectorized) == per-row scalar kernel, bit-for-bit:
    same surviving rows, same ring/piece order, identical float coords."""
    import pandas as pd

    from osm2world_spark.functions.projection import np_to_xz
    from osm2world_spark.functions.tiles import py_tile_bounds
    from osm2world_spark.operators.clip import _clip_batch

    rng = np.random.default_rng(7)
    rows = []
    zoom = 14
    for i in range(600):
        tx, ty = int(rng.integers(8605, 8609)), int(rng.integers(5745, 5749))
        minlat, minlon, maxlat, maxlon = py_tile_bounds(zoom, tx, ty)
        xa, za = np_to_xz(np.array([minlat, maxlat]), np.array([minlon, maxlon]), DEFAULT_ORIGIN)
        cx, cz = xa.mean(), za.mean()
        w = abs(xa[1] - xa[0])
        et = ["node", "way", "area"][i % 3]
        rings = []
        for _ in range(1 if et == "node" else int(rng.integers(1, 4))):
            pts = 1 if et == "node" else int(rng.integers(2 if et == "way" else 3, 12))
            xs = cx + rng.uniform(-1.5, 1.5, pts) * w
            zs = cz + rng.uniform(-1.5, 1.5, pts) * w
            if et == "area":
                xs = np.append(xs, xs[0])
                zs = np.append(zs, zs[0])
            p = np.empty(len(xs) * 2)
            p[0::2], p[1::2] = xs, zs
            rings.append(p.tolist())
        rows.append(
            dict(doc_id=f"d{i}", span_idx=i % 5, element_type=et, zoom=zoom,
                 tile_x=tx, tile_y=ty, geom=rings)
        )
    pdf = pd.DataFrame(rows)
    a = _scalar_clip_reference(pdf, DEFAULT_ORIGIN)
    b = _clip_batch(pdf, DEFAULT_ORIGIN)
    assert b is not None and len(a) == len(b)
    for i in range(len(a)):
        ra, rb = a.iloc[i], b.iloc[i]
        for c in ("doc_id", "span_idx", "element_type", "zoom", "tile_x", "tile_y"):
            assert ra[c] == rb[c], (i, c)
        ga = ra["geom"]
        gb = [list(r) for r in rb["geom"]]
        assert len(ga) == len(gb), (i, ra["doc_id"])
        for ka, kb in zip(ga, gb):
            assert np.array_equal(np.asarray(ka), np.asarray(kb)), (i, ka[:4], kb[:4])
