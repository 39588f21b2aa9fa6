"""Minimal pure-stdlib AVI (RIFF) codec for uncompressed DIB video.

Completes the multimodal decode family (PNG `functions/png.py`, JPEG
`functions/jpeg.py`, WAV `functions/wav.py`): the third media_type in
MEDIA_SCHEMA is "video", and this gives it a REAL container + frame
decode path (no libav in the sandbox; the RIFF/AVI container and the
BI_RGB DIB frame layout are public spec — msdn AVI RIFF File Reference,
BITMAPINFOHEADER). Scope: uncompressed 24-bit BI_RGB 'DIB ' streams —
the classic raw AVI — one video stream; compressed fourccs raise.

DIB frame layout (the part a from-scratch decoder gets wrong first):
rows are stored BOTTOM-UP, pixels are BGR, and every row is padded to a
4-byte boundary. The decoder is numpy slicing over one frombuffer view;
frame sampling (`sample_frames`) is the every-k-th primitive a training
pipeline's frame extractor applies before featurization.
"""

from __future__ import annotations

import struct

import numpy as np


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> RIFF/AVI bytes (BI_RGB 24bpp,
    bottom-up BGR rows padded to 4 bytes, one 'vids' stream, idx1)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = _row_stride(w)
    frame_bytes = stride * h

    # per-frame '00db' payloads: bottom-up rows, BGR, zero padding
    padded = np.zeros((n, h, stride), dtype=np.uint8)
    padded[:, :, : w * 3] = frames[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    payloads = [p.tobytes() for p in padded]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0, 0x10,                   # padding, AVIF_HASINDEX
        n, 0, 1, frame_bytes,      # totalframes, initial, streams, bufsize
        w, h, 0, 0,                # width, height, reserved[4]
        0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,                    # dwScale, dwRate (fps = rate/scale)
        0, n, frame_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00db", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to 'movi' tag position
    idx = b""
    off = 4
    for p in payloads:
        idx += struct.pack("<4sIII", b"00db", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/AVI bytes -> ((n, h, w, 3) uint8 RGB frames, fps). Walks the
    chunk tree; raises ValueError on non-AVI or compressed streams."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    top_down = False
    rate, scale = 0, 1
    frames_raw: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, rate, scale, top_down
        while pos + 8 <= end:
            tag = buf[pos: pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body0 = pos + 8
            if tag == b"LIST":
                walk(buf, body0 + 4, body0 + size)
            elif tag == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", buf, body0)
                if fcc_type == b"vids":
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
                        raise ValueError(
                            f"compressed video stream {handler!r} unsupported")
                    scale, rate = struct.unpack_from("<II", buf, body0 + 20)
            elif tag == b"strf" and w is None:
                _, bw, bh, _, bpp, comp = struct.unpack_from(
                    "<IiiHHI", buf, body0)
                if bpp != 24 or comp != 0:
                    raise ValueError("only BI_RGB 24bpp DIB frames supported")
                # negative biHeight = top-down DIB (rows already in
                # image order); positive = the classic bottom-up form
                w, h, top_down = bw, abs(bh), bh < 0
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(buf[body0: body0 + size])
            pos = body0 + size + (size & 1)

    walk(payload, 12, len(payload))
    if w is None or not frames_raw:
        raise ValueError("missing video format or frame chunks")
    stride = _row_stride(w)
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < stride * h:
            raise ValueError("short frame chunk")
        rows = np.frombuffer(raw, np.uint8, stride * h).reshape(h, stride)
        # undo bottom-up rows (unless top-down DIB) and BGR order
        if not top_down:
            rows = rows[::-1]
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    fps = rate // scale if scale else 0
    return out, fps


def sample_frames(frames: np.ndarray, every: int) -> np.ndarray:
    """Every ``every``-th frame starting at 0 — the frame-sampling
    primitive feature extractors apply before per-frame featurization."""
    return frames[:: max(1, int(every))]
