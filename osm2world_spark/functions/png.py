"""Minimal pure-stdlib PNG codec (zlib + numpy scanline filters).

The sandbox has no PIL/libav, but PNG's mandatory pieces are public spec
(RFC 2083 / W3C PNG) over zlib, which IS in the stdlib — so the engine's
media decode path can be real for PNG instead of stubbed: 8-bit
greyscale/RGB/RGBA, all five scanline filters on decode, filter-0 (None)
on encode. This is a correctness-first decoder for the Arrow-batched
feature extractor (osm2world_spark.operators.multimodal); throughput at
scale comes from batching images per Arrow batch, not from this codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) greyscale or (H, W, 3|4) color -> PNG bytes
    (filter 0 on every scanline)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
        h, w = a.shape
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        h, w = a.shape[:2]
        color_type = {2: 4, 3: 2, 4: 6}[a.shape[2]]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), a.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth_row(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Paeth unfilter: sequential along the row (each pixel needs the
    reconstructed left neighbor)."""
    out = np.empty_like(row)
    n = len(row)
    for i in range(n):
        left = int(out[i - bpp]) if i >= bpp else 0
        up = int(prev[i])
        ul = int(prev[i - bpp]) if i >= bpp else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        if pa <= pb and pa <= pc:
            pred = left
        elif pb <= pc:
            pred = up
        else:
            pred = ul
        out[i] = (int(row[i]) + pred) & 0xFF
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) for greyscale or (H, W, C).
    Supports 8-bit depth, color types 0/2/4/6, no interlacing."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = []
    w = h = None
    color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch + 1
    raw = raw[: h * stride].reshape(h, stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.uint8)
    out = np.zeros_like(rows)
    prev = np.zeros(w * ch, np.uint8)
    bpp = ch
    for y in range(h):
        f = filters[y]
        row = rows[y]
        if f == 0:  # None
            cur = row.copy()
        elif f == 1:  # Sub: cumulative sum per channel lane
            cur = row.reshape(-1, bpp)
            cur = np.cumsum(cur.astype(np.uint64), axis=0).astype(np.uint8)
            cur = cur.reshape(-1)
        elif f == 2:  # Up
            cur = row + prev
        elif f == 3:  # Average: sequential (left is reconstructed)
            cur = np.empty_like(row)
            for i in range(len(row)):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = _paeth_row(row, prev, bpp)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def block_mean_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Image -> grid x grid mean-luminance features in [0, 1] (float32):
    the deterministic 16-dim embedding the feature extractor emits.
    Color images use the integer ITU-R BT.601 luma approximation."""
    if img.ndim == 3:
        c = img.shape[2]
        if c >= 3:
            lum = (
                299 * img[:, :, 0].astype(np.uint32)
                + 587 * img[:, :, 1].astype(np.uint32)
                + 114 * img[:, :, 2].astype(np.uint32)
            ) // 1000
        else:
            lum = img[:, :, 0].astype(np.uint32)
    else:
        lum = img.astype(np.uint32)
    h, w = lum.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    feats = np.empty(grid * grid, np.float32)
    k = 0
    for i in range(grid):
        for j in range(grid):
            block = lum[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            feats[k] = (block.mean() / 255.0) if block.size else 0.0
            k += 1
    return feats
