"""Minimal pure-stdlib WAV (RIFF/WAVE PCM) codec.

Like functions/png.py and functions/jpeg.py, this makes the AUDIO arm of
the multimodal decode path real instead of stubbed (no libav/soundfile in
the sandbox; the RIFF/WAVE container and PCM encoding are public spec).
Scope: PCM integer samples (8/16/32-bit), mono or interleaved
multi-channel, chunk-walking parser (fmt /data in any order, unknown
chunks skipped). Decode is one `np.frombuffer` view — the per-payload
cost is header parsing only.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes."""
    a = np.asarray(samples, dtype="<i2")
    ch = 1 if a.ndim == 1 else a.shape[1]
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (samples (n,) or (n, ch), sample_rate).
    Walks chunks; raises ValueError for non-RIFF or non-PCM payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_format, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_format != 1:
                raise ValueError(f"only PCM supported, got format {audio_format}")
            if bits not in _DTYPES:
                raise ValueError(f"unsupported bit depth {bits}")
            fmt = (ch, rate, bits)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    ch, rate, bits = fmt
    samples = np.frombuffer(data, dtype=_DTYPES[bits])
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


def audio_window_features(samples: np.ndarray, windows: int = 8) -> np.ndarray:
    """Fixed-size audio evidence: per window, (sum of |sample|, count of
    sign changes) — 2 * windows values, integer-exact (so the driver
    oracle can recompute them), returned float32 like the image grid.
    Multi-channel input uses channel 0."""
    s = samples[:, 0] if samples.ndim == 2 else samples
    # 8-bit PCM is UNSIGNED with a 128 offset (RIFF spec) — center it so
    # the sign-change feature is meaningful for every supported depth
    if s.dtype == np.uint8:
        s = s.astype(np.int64) - 128
    else:
        s = s.astype(np.int64)
    n = len(s)
    edges = np.linspace(0, n, windows + 1).astype(int)
    out = np.empty(windows * 2, np.float32)
    for w in range(windows):
        seg = s[edges[w] : edges[w + 1]]
        out[2 * w] = float(np.abs(seg).sum())
        if len(seg) > 1:
            sign = seg >= 0
            out[2 * w + 1] = float(np.count_nonzero(sign[1:] != sign[:-1]))
        else:
            out[2 * w + 1] = 0.0
    return out
