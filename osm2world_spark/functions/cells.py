"""Spatial cell encoders: S2 cell ids and an H3-analog hex grid.

These supply the cell keys the engine shuffles on (alongside slippy z14
tiles): the spatial self-join explodes each geometry to the cells its bbox
overlaps and equi-joins on the cell id; kNN expands hex k-rings.

S2 (`s2_cell_id`)
  A from-scratch vectorized implementation of the public S2 geometry cell
  scheme (quadratic s-t projection + Hilbert curve, as documented in the
  open-source s2geometry library): lat/lng -> unit XYZ -> cube face + (u,v)
  -> (s,t) -> 30-bit (i,j) -> Hilbert position -> 64-bit cell id, then
  parent() to the requested level (default 13 per the north rule). Pure
  numpy; lookup tables built once at import.

Hex grid (`hex_cell_id`, `hex_k_ring`)
  An H3-*analog*: axial hexagon binning in the spherical-Mercator plane
  whose edge lengths match H3's per-resolution mean edge lengths
  (edge(res) = 1107712.591 m / sqrt(7)^res, so res 9 ~ 174.4 m). This is a
  flat hex grid, NOT the icosahedral H3 projection — documented deviation:
  it provides the same operational surface (fixed-size hex cells, k-ring
  neighborhoods, aperture-7-style resolution ladder) with exact, simple
  math that needs no external library. Cell ids pack (res, q, r) into one
  bigint.

The reference engine's analogous structure is the ad-hoc IndexGrid
(/root/reference/core/src/main/java/org/osm2world/math/datastructures/
IndexGrid.java) — a per-dataset rectangular grid. Our cells are global and
hierarchical so they remain valid partition keys at planet scale.
"""

from __future__ import annotations

import math

import numpy as np

# ----------------------------------------------------------------- S2 ----

_LOOKUP_BITS = 4
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02
_MAX_LEVEL = 30

_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # bits inverted
        [3, 1, 0, 2],  # swapped & inverted
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
    else:
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            _init_lookup_cell(
                level,
                i + (int(r[index]) >> 1),
                j + (int(r[index]) & 1),
                orig_orientation,
                pos + index,
                orientation ^ int(_POS_TO_ORIENTATION[index]),
            )


for _o in (0, _SWAP_MASK, _INVERT_MASK, _SWAP_MASK | _INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _o, 0, _o)


def _latlon_to_xyz(lat: np.ndarray, lon: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    return np.cos(theta) * cosphi, np.sin(theta) * cosphi, np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ucalc, vcalc) in enumerate(
        [
            (lambda: y / x, lambda: z / x),      # face 0: +x
            (lambda: -x / y, lambda: z / y),     # face 1: +y
            (lambda: -x / z, lambda: -y / z),    # face 2: +z
            (lambda: z / x, lambda: y / x),      # face 3: -x
            (lambda: z / y, lambda: -x / y),     # face 4: -y
            (lambda: -y / z, lambda: -x / z),    # face 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ucalc()[m]
                v[m] = vcalc()[m]
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # quadratic projection (s2geometry S2_QUADRATIC_PROJECTION); np.where
    # evaluates both branches, so clamp the radicands to keep sqrt defined
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * (1 << _MAX_LEVEL)), 0, (1 << _MAX_LEVEL) - 1).astype(np.int64)


def _face_ij_to_cell_id(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert-encode (face,i,j) to a leaf (level-30) cell id. Vectorized
    version of the 8-step lookup loop from s2geometry's FromFaceIJ."""
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP_MASK).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _lookup_pos[bits]
        n |= (bits.astype(np.uint64) >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP_MASK | _INVERT_MASK
    return (n * np.uint64(2) + np.uint64(1)).astype(np.int64)


def s2_lsb_for_level(level: int) -> int:
    return 1 << (2 * (_MAX_LEVEL - level))


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    lsb = np.int64(s2_lsb_for_level(level))
    return (cell_id & -lsb) | lsb


def s2_cell_id(lat: np.ndarray, lon: np.ndarray, level: int = 13) -> np.ndarray:
    """Vectorized lat/lon (degrees) -> S2 cell id at `level` (int64)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _face_ij_to_cell_id(face, i, j)
    if level >= _MAX_LEVEL:
        return leaf
    return s2_parent(leaf, level)


def s2_range(cell_id: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids contained in the cell."""
    lsb = np.int64(s2_lsb_for_level(level))
    return cell_id - (lsb - 1), cell_id + (lsb - 1)


def s2_token(cell_id: int) -> str:
    """Standard S2 token: hex with trailing zeros stripped."""
    h = format(cell_id & 0xFFFFFFFFFFFFFFFF, "016x").rstrip("0")
    return h or "X"


# ----------------------------------------------------------- hex grid ----

_EARTH_R = 6378137.0
_HEX_EDGE_RES0_M = 1107712.591  # H3 res-0 mean edge length in meters
_SQRT3 = math.sqrt(3.0)


def hex_edge_m(res: int) -> float:
    """Mean hex edge length at `res` (matches H3's resolution ladder)."""
    return _HEX_EDGE_RES0_M / (7.0 ** (res / 2.0))


def _mercator_m(lat: np.ndarray, lon: np.ndarray):
    x = _EARTH_R * np.radians(lon)
    y = _EARTH_R * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


def hex_qr(lat: np.ndarray, lon: np.ndarray, res: int = 9) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) hex coordinates (pointy-top) in the Mercator plane."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    a = hex_edge_m(res)
    x, y = _mercator_m(lat, lon)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / a
    rf = (2.0 / 3.0 * y) / a
    return _cube_round(qf, rf)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


_HEX_OFFSET = 1 << 27


def hex_pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """(res, q, r) -> bigint: res<<56 | (q+2^27)<<28 | (r+2^27)."""
    return (
        (np.int64(res) << np.int64(56))
        | ((q + _HEX_OFFSET).astype(np.int64) << np.int64(28))
        | (r + _HEX_OFFSET).astype(np.int64)
    )


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 56
    q = ((cell >> 28) & ((1 << 28) - 1)) - _HEX_OFFSET
    r = (cell & ((1 << 28) - 1)) - _HEX_OFFSET
    return res, q, r


def hex_cell_id(lat: np.ndarray, lon: np.ndarray, res: int = 9) -> np.ndarray:
    q, r = hex_qr(lat, lon, res)
    return hex_pack(res, q, r)


def hex_disk_offsets(k: int) -> np.ndarray:
    """(n, 2) array of all (dq, dr) with hex distance <= k (the k-disk);
    the k-ring boundary is hex distance == k."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return np.asarray(out, dtype=np.int64)


def hex_ring_offsets(k: int) -> np.ndarray:
    """(n, 2) offsets at exactly hex distance k (the ring boundary)."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    disk = hex_disk_offsets(k)
    d = hex_distance_qr(disk[:, 0], disk[:, 1], 0, 0)
    return disk[d == k]


def hex_distance_qr(q1, r1, q2, r2) -> np.ndarray:
    dq = np.asarray(q1) - np.asarray(q2)
    dr = np.asarray(r1) - np.asarray(r2)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def hex_k_disk(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within hex distance k of each input cell: (n, disk_size)."""
    res, q, r = hex_unpack(cell)
    off = hex_disk_offsets(k)
    qq = q[:, None] + off[None, :, 0]
    rr = r[:, None] + off[None, :, 1]
    return hex_pack(int(res[0]) if len(res) else 9, qq, rr)


def hex_parent(cell: np.ndarray) -> np.ndarray:
    """Aperture-7-style parent: the res-1 cell containing this cell's
    center. (H3 analog; exactness of child->parent nesting is approximate
    at hex boundaries, as in real aperture-7 H3.)"""
    res, q, r = hex_unpack(cell)
    a = hex_edge_m(int(res[0]) if len(res) else 9)
    # center of (q, r) in Mercator meters (pointy-top axial)
    x = a * _SQRT3 * (q + r / 2.0)
    y = a * 1.5 * r
    pa = hex_edge_m(int(res[0]) - 1 if len(res) else 8)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / pa
    rf = (2.0 / 3.0 * y) / pa
    pq, pr = _cube_round(qf, rf)
    return hex_pack(int(res[0]) - 1 if len(res) else 8, pq, pr)


def hex_center_m(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_unpack(cell)
    a = np.array([hex_edge_m(int(v)) for v in np.atleast_1d(res)])
    x = a * _SQRT3 * (q + r / 2.0)
    y = a * 1.5 * r
    return x, y


# ----------------------------------------------------------------- geohash

#: the standard geohash base-32 alphabet (public encoding, Niemeyer 2008)
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat, lon, precision: int = 6):
    """Geohash cell id of a WGS84 point as a `precision`-char string —
    the classic hierarchical cell codec, completing the engine's index
    family (slippy z12/z14, S2 L13, hex r9, Morton): a shared PREFIX of
    length p means the same cell at precision p, so prefix ranges give
    multi-resolution locality the same way tile ancestors do.

    Construction (public spec): interleave the binary refinements of
    lon (even global bit positions, MSB first) and lat (odd), 5 bits
    per base-32 character. Bit b of lon is bit (n_lon-1-b) of
    floor((lon+180)/360 * 2^n_lon) — one multiply instead of a
    per-bit bisection loop. Pure Column arithmetic with constant shift
    amounts: whole-stage codegen, no UDF; the identical expression tree
    is replayed by the SQL oracle."""
    from pyspark.sql import functions as F

    n_bits = 5 * precision
    n_lon = (n_bits + 1) // 2
    n_lat = n_bits // 2
    one = F.lit(1).cast("bigint")
    lon_i = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lon))),
        F.lit((1 << n_lon) - 1),
    ).cast("bigint")
    lat_i = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat))),
        F.lit((1 << n_lat) - 1),
    ).cast("bigint")
    chars = []
    for c in range(precision):
        val = None
        for j in range(5):
            i = 5 * c + j  # global bit index, MSB first
            if i % 2 == 0:
                bit = F.shiftright(lon_i, n_lon - 1 - i // 2).bitwiseAND(one)
            else:
                bit = F.shiftright(lat_i, n_lat - 1 - i // 2).bitwiseAND(one)
            val = bit if val is None else F.shiftleft(val, 1) + bit
        chars.append(F.substr(F.lit(GEOHASH32), (val + 1).cast("int"), F.lit(1)))
    return F.concat(*chars)


def geohash_decode(gh, precision: int = 6):
    """struct(lat, lon, lat_err, lon_err): the center and half-widths of
    a `precision`-char geohash cell — the inverse of geohash_encode
    (same bit layout, reassembled into the integer refinements and
    mapped back through the cell midpoint). Pure Column arithmetic.
    A string shorter than `precision` or containing a non-alphabet
    character decodes to NULL lat/lon (never silently-wrong coords)."""
    from pyspark.sql import functions as F

    n_bits = 5 * precision
    n_lon = (n_bits + 1) // 2
    n_lat = n_bits // 2
    one = F.lit(1).cast("bigint")
    lon_i, lat_i = F.lit(0).cast("bigint"), F.lit(0).cast("bigint")
    for c in range(precision):
        pos = F.array_position(
            F.array(*[F.lit(ch) for ch in GEOHASH32]),
            F.substr(gh, F.lit(c + 1), F.lit(1)),
        )
        # array_position returns 0 for a short string or a char outside
        # the alphabet ('a','i','l','o', uppercase): NULL out instead of
        # letting v=-1 sign-extend every bit to 1
        v = F.when(pos > 0, pos - 1).cast("bigint")
        for j in range(5):
            i = 5 * c + j
            bit = F.shiftright(v, 4 - j).bitwiseAND(one)
            if i % 2 == 0:
                lon_i = F.shiftleft(lon_i, 1) + bit
            else:
                lat_i = F.shiftleft(lat_i, 1) + bit
    lon_w = 360.0 / float(1 << n_lon)
    lat_w = 180.0 / float(1 << n_lat)
    return F.struct(
        ((lat_i.cast("double") + F.lit(0.5)) * F.lit(lat_w) - F.lit(90.0)).alias("lat"),
        ((lon_i.cast("double") + F.lit(0.5)) * F.lit(lon_w) - F.lit(180.0)).alias("lon"),
        F.lit(lat_w / 2.0).alias("lat_err"),
        F.lit(lon_w / 2.0).alias("lon_err"),
    )
