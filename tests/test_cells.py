"""S2 and hex-grid cell encoder tests (pure numpy)."""

import numpy as np

from osm2world_spark.functions.cells import (
    hex_cell_id,
    hex_disk_offsets,
    hex_distance_qr,
    hex_edge_m,
    hex_k_disk,
    hex_qr,
    hex_ring_offsets,
    hex_unpack,
    s2_cell_id,
    s2_parent,
    s2_range,
)


# --------------------------------------------------------------------- S2

def test_s2_faces_cardinal():
    """Face selection must follow the cube-face convention: +x=0, +y=1,
    +z=2, -x=3, -y=4, -z=5. The face occupies the top 3 bits of the id."""
    pts = {
        (0.0, 0.0): 0,     # +x
        (0.0, 90.0): 1,    # +y
        (90.0, 0.0): 2,    # +z
        (0.0, 180.0): 3,   # -x
        (0.0, -90.0): 4,   # -y
        (-90.0, 0.0): 5,   # -z
    }
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    ids = s2_cell_id(lat, lon, 13).astype(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert faces.tolist() == list(pts.values())


def test_s2_leaf_in_parent_range():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    leaf = s2_cell_id(lat, lon, 30).astype(np.uint64)
    for level in (5, 10, 13, 20):
        cell = s2_cell_id(lat, lon, level)
        lo, hi = s2_range(cell, level)
        assert np.all(leaf >= lo.astype(np.uint64))
        assert np.all(leaf <= hi.astype(np.uint64))
        # parent of leaf == direct encoding at that level
        assert np.array_equal(s2_parent(s2_cell_id(lat, lon, 30), level), cell)


def test_s2_nesting_is_monotone():
    """A level-l cell's range must nest inside its level-(l-1) parent's."""
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 200)
    lon = rng.uniform(-180, 180, 200)
    prev_lo = prev_hi = None
    for level in (20, 15, 13, 9, 4):
        cell = s2_cell_id(lat, lon, level)
        lo, hi = s2_range(cell, level)
        lo, hi = lo.astype(np.uint64), hi.astype(np.uint64)
        if prev_lo is not None:
            assert np.all(lo <= prev_lo) and np.all(hi >= prev_hi)
        prev_lo, prev_hi = lo, hi


def test_s2_locality():
    """Points ~10 m apart must share a level-13 cell (~1 km scale) almost
    always; points 10 deg apart never."""
    base_lat, base_lon = 48.56687, 13.45127
    lat = np.array([base_lat, base_lat + 0.00005, base_lat + 10.0])
    lon = np.array([base_lon, base_lon + 0.00005, base_lon + 10.0])
    ids = s2_cell_id(lat, lon, 13)
    assert ids[0] == ids[1]
    assert ids[0] != ids[2]


def test_s2_determinism_and_validity():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-89, 89, 1000)
    lon = rng.uniform(-180, 180, 1000)
    a = s2_cell_id(lat, lon, 13)
    b = s2_cell_id(lat, lon, 13)
    assert np.array_equal(a, b)
    # level-13 ids end in exactly lsb = 1 << 34
    lsb = np.uint64(1 << 34)
    ua = a.astype(np.uint64)
    assert np.all((ua & (np.uint64(2) * lsb - np.uint64(1))) == lsb)


# --------------------------------------------------------------- hex grid

def test_hex_edge_ladder():
    # H3 mean edge lengths: res 9 ~ 174.4 m (aperture-7 ladder)
    assert abs(hex_edge_m(9) - 174.375668) < 0.01
    assert abs(hex_edge_m(0) - 1107712.591) < 1e-3


def test_hex_locality_and_separation():
    lat = np.array([48.56687, 48.566875, 48.576])
    lon = np.array([13.45127, 13.451275, 13.462])
    c = hex_cell_id(lat, lon, 9)
    assert c[0] == c[1]
    assert c[0] != c[2]


def test_hex_roundtrip_pack():
    lat = np.linspace(-60, 60, 100)
    lon = np.linspace(-170, 170, 100)
    cells = hex_cell_id(lat, lon, 9)
    res, q, r = hex_unpack(cells)
    assert np.all(res == 9)
    q2, r2 = hex_qr(lat, lon, 9)
    assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_hex_disk_sizes():
    # |disk(k)| = 1 + 3k(k+1); |ring(k)| = 6k
    for k in range(0, 5):
        assert len(hex_disk_offsets(k)) == 1 + 3 * k * (k + 1)
    assert len(hex_ring_offsets(0)) == 1
    for k in range(1, 5):
        assert len(hex_ring_offsets(k)) == 6 * k


def test_hex_k_disk_contains_neighbors():
    lat = np.array([48.56687])
    lon = np.array([13.45127])
    c = hex_cell_id(lat, lon, 9)
    disk = hex_k_disk(c, 2)
    assert disk.shape == (1, 19)
    assert c[0] in disk[0]
    # a point one edge-length east must fall in the 1-disk
    dlon = hex_edge_m(9) * 1.8 / 111320.0  # ~1.8 edges east in degrees
    c2 = hex_cell_id(lat, lon + dlon, 9)
    assert c2[0] in disk[0]


def test_hex_distance():
    assert hex_distance_qr(0, 0, 3, -1) == 3
    assert hex_distance_qr(0, 0, 0, 0) == 0
    assert hex_distance_qr(np.array([2]), np.array([-2]), 0, 0)[0] == 2
