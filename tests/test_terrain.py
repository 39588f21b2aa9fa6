"""EmptyTerrainBuilder-analogue tests: 30 m patch grid generator."""

import numpy as np
import pytest


def test_empty_terrain_patches_small(spark):
    from osm2world_spark.operators.terrain import empty_terrain_patches

    # bounds 0..400 m: padded grid indices ceil((0-30+0.01)/30) = 0 wait:
    # start = ceil((-29.99)/30) = ceil(-0.9996) = 0 -> first node at x=0
    rows = {(r["patch_x"], r["patch_z"]): np.asarray(r["ring"]) for r in
            empty_terrain_patches(spark, 0.0, 0.0, 400.0, 400.0).collect()}
    # size = floor((430-0.01)/30) - 0 + 1 = 14+1 = 15 points per axis
    # patches = (15+8)//10 = 2 per axis
    assert set(rows) == {(0, 0), (0, 1), (1, 0), (1, 1)}

    r00 = rows[(0, 0)]
    xs, zs = r00[0::2], r00[1::2]
    # full 10x10 patch: nx = nz = 11 -> 2*11 + 2*11 - 3 = 41 points
    assert len(xs) == 41
    assert xs[0] == xs[-1] and zs[0] == zs[-1]          # closed
    assert xs.min() == 0.0 and xs.max() == 300.0         # 10 squares x 30 m
    assert zs.min() == 0.0 and zs.max() == 300.0
    # walk order: first row left->right along z = 0
    assert list(xs[:11]) == [i * 30.0 for i in range(11)]
    assert (zs[:11] == 0.0).all()

    # truncated edge patch: indices 10..14 -> nx = 5
    r11 = rows[(1, 1)]
    xs11 = r11[0::2]
    assert xs11.min() == 300.0 and xs11.max() == 420.0
    assert len(xs11) == 2 * 5 + 2 * 5 - 3

    # neighboring patches share their boundary nodes (connected grid)
    r10 = rows[(1, 0)]
    shared = {(x, z) for x, z in zip(r00[0::2], r00[1::2])} & {
        (x, z) for x, z in zip(r10[0::2], r10[1::2])
    }
    assert len(shared) >= 11  # the whole x=300 column


def test_empty_terrain_covers_bounds(spark):
    from osm2world_spark.operators.terrain import empty_terrain_patches

    df = empty_terrain_patches(spark, 13.0, -47.0, 520.0, 333.0)
    rows = df.collect()
    allx, allz = [], []
    for r in rows:
        arr = np.asarray(r["ring"])
        allx += [arr[0::2].min(), arr[0::2].max()]
        allz += [arr[1::2].min(), arr[1::2].max()]
    # the union of patches covers the (unpadded) bounds
    assert min(allx) <= 13.0 and max(allx) >= 520.0
    assert min(allz) <= -47.0 and max(allz) >= 333.0
    # all coordinates are exact multiples of the 30 m grid
    for r in rows:
        arr = np.asarray(r["ring"])
        assert np.all(arr % 30.0 == 0.0)
