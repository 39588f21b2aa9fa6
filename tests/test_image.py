"""PNG render sink (sinks/image.py): rasterization semantics + PNG layer.

Oracle strategy mirrors the module contract:
* axis-aligned rect scenes reduce to closed interval tests (the driver
  query's DuckDB oracle form) — checked here against a brute numpy
  painter that never sees the triangle kernel;
* general polygons: rasterized coverage == even-odd point-in-polygon of
  the pixel centers (triangulation partitions the polygon), on vertices
  placed so no center lies exactly on an edge;
* the PNG byte layer round-trips through the stdlib decoder to exactly
  the pixel table, and `write_png_tiles` lands decodable files.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def _rect_meshes(spark, rects):
    """rects: list of (tile, order, (r,g,b), x0, z0, x1, z1) -> meshes DF
    with the two-CCW-triangle split used by the driver query."""
    rows = []
    for tile, order, (r, g, b), x0, z0, x1, z1 in rects:
        tri = lambda a, bb, c: [
            {"x": float(a[0]), "y": 0.0, "z": float(a[1])},
            {"x": float(bb[0]), "y": 0.0, "z": float(bb[1])},
            {"x": float(c[0]), "y": 0.0, "z": float(c[1])},
        ]
        rows.append(
            (
                tile,
                order,
                r,
                g,
                b,
                [
                    tri((x0, z0), (x1, z0), (x1, z1)),
                    tri((x0, z0), (x1, z1), (x0, z1)),
                ],
            )
        )
    return spark.createDataFrame(
        rows,
        "tile string, mesh_order bigint, r int, g int, b int, "
        "triangles array<array<struct<x double, y double, z double>>>",
    )


def _pixels_to_img(pdf, w, h):
    img = np.zeros((h, w, 3), dtype=np.int64)
    for row in pdf.itertuples(index=False):
        img[row.py, row.px] = (row.r, row.g, row.b)
    return img


def _brute_rect_paint(rects, w, h, vp, bg=(0, 0, 0)):
    """Interval-test painter: the oracle form, no triangles anywhere."""
    minx, minz, maxx, maxz = vp
    xc = minx + (np.arange(w) + 0.5) * (maxx - minx) / w
    zc = maxz - (np.arange(h) + 0.5) * (maxz - minz) / h
    img = np.zeros((h, w, 3), dtype=np.int64)
    img[:] = bg
    for _, order, (r, g, b), x0, z0, x1, z1 in sorted(rects, key=lambda t: t[1]):
        cov = (
            (xc[None, :] >= x0)
            & (xc[None, :] <= x1)
            & (zc[:, None] >= z0)
            & (zc[:, None] <= z1)
        )
        img[cov] = (r, g, b)
    return img


def test_rect_scene_matches_interval_oracle(spark):
    from osm2world_spark.sinks.image import rasterize_tiles

    rng = np.random.RandomState(7)
    rects = []
    for i in range(40):
        x0, z0 = rng.randint(0, 160, 2)
        wdt, hgt = rng.randint(4, 33, 2)
        color = tuple(int(v) for v in rng.randint(0, 256, 3))
        rects.append(("t0", i + 1, color, x0, z0, x0 + wdt, z0 + hgt))
    vp = (0.0, 0.0, 192.0, 192.0)
    df = rasterize_tiles(_rect_meshes(spark, rects), 48, 48, viewport=vp)
    got = _pixels_to_img(df.toPandas(), 48, 48)
    want = _brute_rect_paint(rects, 48, 48, vp)
    assert np.array_equal(got, want)


def test_painter_order_not_input_order(spark):
    """Rows delivered in any order — mesh_order decides the winner."""
    from osm2world_spark.sinks.image import rasterize_tiles

    rects = [
        ("t", 2, (200, 0, 0), 0, 0, 8, 8),  # drawn second: wins overlap
        ("t", 1, (0, 200, 0), 4, 4, 12, 12),
    ]
    vp = (0.0, 0.0, 16.0, 16.0)
    for order in (rects, rects[::-1]):
        df = rasterize_tiles(_rect_meshes(spark, order), 16, 16, viewport=vp)
        img = _pixels_to_img(df.toPandas(), 16, 16)
        want = _brute_rect_paint(rects, 16, 16, vp)
        assert np.array_equal(img, want)


def test_degenerate_triangle_covers_nothing(spark):
    from osm2world_spark.sinks.image import rasterize_tiles

    df = spark.createDataFrame(
        [
            (
                "t",
                1,
                255,
                255,
                255,
                [
                    [
                        {"x": 0.0, "y": 0.0, "z": 0.0},
                        {"x": 8.0, "y": 0.0, "z": 8.0},
                        {"x": 4.0, "y": 0.0, "z": 4.0},  # collinear
                    ]
                ],
            )
        ],
        "tile string, mesh_order bigint, r int, g int, b int, "
        "triangles array<array<struct<x double, y double, z double>>>",
    )
    pix = rasterize_tiles(df, 8, 8, viewport=(0.0, 0.0, 8.0, 8.0)).toPandas()
    assert int(pix[["r", "g", "b"]].to_numpy().sum()) == 0


def _pip_even_odd(xs, zs, px, pz):
    """Scalar even-odd ray cast for the property oracle."""
    inside = False
    n = len(xs)
    for i in range(n):
        x1, z1 = xs[i], zs[i]
        x2, z2 = xs[(i + 1) % n], zs[(i + 1) % n]
        if (z1 > pz) != (z2 > pz):
            xi = x1 + (pz - z1) * (x2 - x1) / (z2 - z1)
            if px < xi:
                inside = not inside
    return inside


def test_polygon_coverage_equals_even_odd_pip(spark):
    """Triangulating a simple polygon and rasterizing the triangles
    paints exactly the pixel centers even-odd-inside the polygon
    (triangulation partitions the polygon; centers are generic)."""
    from osm2world_spark.operators.triangulate import triangulate
    from osm2world_spark.sinks.image import rasterize_tiles

    # a concave octagon with non-round vertices (no center ever lies on
    # an edge: centers are at k/32 offsets, vertices use 1/7 fractions)
    xs = [1 / 7, 6.0, 9 + 1 / 7, 6.0, 9.0, 4.5, 2 + 1 / 7, 3.0]
    zs = [1 / 7, 1.5, 2 + 1 / 7, 4.5, 8 + 1 / 7, 6.0, 8.0, 4 + 1 / 7]
    ring = [[c for xz in zip(xs, zs) for c in xz] + [xs[0], zs[0]]]
    elems = spark.createDataFrame(
        [("d1", 1, "area", ring)],
        "doc_id string, span_idx int, element_type string, "
        "geom array<array<double>>",
    )
    tris = triangulate(elems)
    meshes = tris.groupBy("eid").agg(
        F.collect_list(
            F.array(
                F.struct(F.col("ax").alias("x"), F.lit(0.0).alias("y"), F.col("az").alias("z")),
                F.struct(F.col("bx").alias("x"), F.lit(0.0).alias("y"), F.col("bz").alias("z")),
                F.struct(F.col("cx").alias("x"), F.lit(0.0).alias("y"), F.col("cz").alias("z")),
            )
        ).alias("triangles")
    ).select(
        F.lit("t").alias("tile"),
        F.lit(1).cast("bigint").alias("mesh_order"),
        F.lit(255).alias("r"), F.lit(0).alias("g"), F.lit(0).alias("b"),
        "triangles",
    )
    w = h = 32
    vp = (0.0, 0.0, 10.0, 10.0)
    pix = rasterize_tiles(meshes, w, h, viewport=vp).toPandas()
    got = _pixels_to_img(pix, w, h)[..., 0] > 0
    xc = vp[0] + (np.arange(w) + 0.5) * (vp[2] - vp[0]) / w
    zc = vp[3] - (np.arange(h) + 0.5) * (vp[3] - vp[1]) / h
    want = np.zeros((h, w), dtype=bool)
    for py in range(h):
        for px in range(w):
            want[py, px] = _pip_even_odd(xs, zs, xc[px], zc[py])
    assert np.array_equal(got, want)


def test_png_layer_roundtrips_pixels(spark, tmp_path):
    from osm2world_spark.functions.png import decode_png
    from osm2world_spark.sinks.image import (
        rasterize_tiles,
        render_png_tiles,
        write_png_tiles,
    )

    rects = [
        ("a", 1, (10, 20, 30), 0, 0, 10, 10),
        ("a", 2, (250, 5, 99), 5, 5, 14, 14),
        ("b", 1, (1, 2, 3), 2, 2, 15, 15),
    ]
    meshes = _rect_meshes(spark, rects)
    vp = (0.0, 0.0, 16.0, 16.0)
    pix = rasterize_tiles(meshes, 16, 16, viewport=vp)
    pngs = {r["tile"]: bytes(r["png"]) for r in render_png_tiles(pix, 16, 16).collect()}
    assert set(pngs) == {"a", "b"}
    pixels = pix.toPandas()
    for tile, data in pngs.items():
        img = decode_png(data)
        assert img.shape == (16, 16, 3)
        want = _pixels_to_img(pixels[pixels["tile"] == tile], 16, 16)
        assert np.array_equal(img.astype(np.int64), want)

    out = str(tmp_path / "png")
    write_png_tiles(meshes, out, 16, 16, viewport=vp)
    files = sorted(glob.glob(os.path.join(out, "*.png")))
    assert [os.path.basename(f) for f in files] == ["a.png", "b.png"]
    assert decode_png(open(files[0], "rb").read()).shape == (16, 16, 3)


def test_auto_viewport_covers_scene(spark):
    """viewport=None uses the tile's own bbox — every vertex maps inside
    the raster and a full-bbox rect paints every pixel."""
    from osm2world_spark.sinks.image import rasterize_tiles

    rects = [("t", 1, (9, 9, 9), 3, 7, 23, 19)]
    pix = rasterize_tiles(_rect_meshes(spark, rects), 8, 8).toPandas()
    assert (pix[["r", "g", "b"]].to_numpy() == 9).all()


def test_pipeline_png_models(spark, tmp_path):
    """End-to-end: synthetic docs -> TilePipeline.run(with_models='png')
    lands one decodable PNG per content tile."""
    from osm2world_spark.functions.png import decode_png
    from osm2world_spark.plans.pipeline import TilePipeline
    from osm2world_spark.sources.documents import synthetic_documents

    docs = synthetic_documents(spark, 120, seed=5)
    pipe = TilePipeline(spark, str(tmp_path / "out"))
    report = pipe.run(docs, with_models="png")
    files = glob.glob(str(tmp_path / "out" / "models" / "png" / "*.png"))
    assert len(files) == report["model_tiles"] > 0
    img = decode_png(open(files[0], "rb").read())
    assert img.shape == (256, 256, 3)


def _pixels_df(spark, rows):
    return spark.createDataFrame(
        rows, "zoom int, tile_x int, tile_y int, px int, py int, "
        "r int, g int, b int")


def test_pyramid_rollup_matches_brute(spark):
    from osm2world_spark.sinks.image import pyramid_pixels

    rng = np.random.RandomState(21)
    w = h = 4
    imgs = {}
    rows = []
    for tx in range(2):
        for ty in range(2):
            img = rng.randint(0, 256, (h, w, 3))
            imgs[(tx, ty)] = img
            for py in range(h):
                for px in range(w):
                    rows.append((5, 2 + tx, 6 + ty, px, py,
                                 *[int(v) for v in img[py, px]]))
    got = {
        (r["px"], r["py"]): (r["r"], r["g"], r["b"], r["n_src"],
                             r["zoom"], r["tile_x"], r["tile_y"])
        for r in pyramid_pixels(_pixels_df(spark, rows), w, h).collect()
    }
    # brute mosaic: 8x8 parent image from the 2x2 children, then 2x reduce
    mosaic = np.zeros((2 * h, 2 * w, 3), dtype=np.int64)
    for (tx, ty), img in imgs.items():
        mosaic[ty * h:(ty + 1) * h, tx * w:(tx + 1) * w] = img
    want = mosaic.reshape(h, 2, w, 2, 3).transpose(0, 2, 1, 3, 4).reshape(
        h, w, 4, 3).sum(axis=2) // 4
    assert len(got) == w * h
    for (px, py), (r, g, b, n, z, x, y) in got.items():
        assert (z, x, y, n) == (4, 1, 3, 4)
        assert (r, g, b) == tuple(want[py, px])


def test_pyramid_missing_child_quadrant_absent(spark):
    from osm2world_spark.sinks.image import pyramid_pixels

    w = h = 4
    rows = [
        (1, tx, ty, px, py, 10, 20, 30)
        for (tx, ty) in [(0, 0), (1, 0), (0, 1)]  # child (1,1) missing
        for py in range(h) for px in range(w)
    ]
    out = pyramid_pixels(_pixels_df(spark, rows), w, h).collect()
    # 3 of 4 quadrants present; every present parent pixel fully covered
    assert len(out) == 3 * (w // 2) * (h // 2) * 4 // 4 * 1  # 12 rows
    assert all(r["n_src"] == 4 for r in out)
    quads = {(r["px"] >= w // 2, r["py"] >= h // 2) for r in out}
    assert (True, True) not in quads


def test_pyramid_two_levels(spark):
    from osm2world_spark.sinks.image import pyramid_pixels

    rng = np.random.RandomState(9)
    w = h = 8
    rows = []
    vals = {}
    for tx in range(4):
        for ty in range(4):
            img = rng.randint(0, 256, (h, w, 3))
            vals[(tx, ty)] = img
            for py in range(h):
                for px in range(w):
                    rows.append((2, tx, ty, px, py,
                                 *[int(v) for v in img[py, px]]))
    lvl1 = pyramid_pixels(_pixels_df(spark, rows), w, h)
    lvl0 = pyramid_pixels(lvl1.drop("n_src"), w, h)
    out = lvl0.collect()
    assert len(out) == w * h  # one zoom-0 tile
    assert all(r["zoom"] == 0 and r["n_src"] == 4 for r in out)
    # spot-check one pixel against the double floor-mean brute
    mosaic = np.zeros((4 * h, 4 * w, 3), dtype=np.int64)
    for (tx, ty), img in vals.items():
        mosaic[ty * h:(ty + 1) * h, tx * w:(tx + 1) * w] = img
    l1 = mosaic.reshape(2 * h, 2, 2 * w, 2, 3).transpose(
        0, 2, 1, 3, 4).reshape(2 * h, 2 * w, 4, 3).sum(axis=2) // 4
    l0 = l1.reshape(h, 2, w, 2, 3).transpose(0, 2, 1, 3, 4).reshape(
        h, w, 4, 3).sum(axis=2) // 4
    got = {(r["px"], r["py"]): (r["r"], r["g"], r["b"]) for r in out}
    for (px, py), rgb in got.items():
        assert rgb == tuple(l0[py, px])


def test_equal_mesh_order_ties_break_by_color(spark):
    """Two meshes sharing a mesh_order composite deterministically
    (color tie-break), independent of input row order."""
    from osm2world_spark.sinks.image import rasterize_tiles

    rects = [
        ("t", 1, (200, 0, 0), 0, 0, 8, 8),
        ("t", 1, (0, 200, 0), 0, 0, 8, 8),  # same order, same area
    ]
    vp = (0.0, 0.0, 8.0, 8.0)
    imgs = []
    for order in (rects, rects[::-1]):
        df = rasterize_tiles(
            _rect_meshes(spark, order).repartition(3), 8, 8, viewport=vp)
        imgs.append(_pixels_to_img(df.toPandas(), 8, 8))
    assert np.array_equal(imgs[0], imgs[1])
    # the higher color tuple paints last
    assert tuple(imgs[0][4, 4]) == (200, 0, 0)


def test_strip_render_identical_to_single_pass(spark):
    """Distributed multi-pass render == single-pass, row for row — on an
    awkward float viewport where a locally-derived sub-viewport could
    drift by an ulp."""
    from osm2world_spark.sinks.image import rasterize_strips, rasterize_tiles

    rng = np.random.RandomState(13)
    rects = []
    for i in range(25):
        x0 = float(rng.uniform(0.0, 7.0))
        z0 = float(rng.uniform(0.0, 7.0))
        color = tuple(int(v) for v in rng.randint(0, 256, 3))
        rects.append(
            ("t", i + 1, color, x0, z0,
             x0 + float(rng.uniform(0.3, 2.0)),
             z0 + float(rng.uniform(0.3, 2.0))))
    meshes = _rect_meshes(spark, rects)
    vp = (0.1, 0.2, 9.7, 8.9)  # non-integral extent / width ratio
    single = rasterize_tiles(meshes, 48, 24, viewport=vp)
    strips = rasterize_strips(meshes, 48, 24, viewport=vp, n_strips=6)
    a = sorted(map(tuple, single.collect()))
    b = sorted(map(tuple, strips.collect()))
    assert a == b

    import pytest

    with pytest.raises(ValueError):
        rasterize_strips(meshes, 50, 24, viewport=vp, n_strips=7)
