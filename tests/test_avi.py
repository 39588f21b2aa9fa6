"""RIFF/AVI video codec (functions/avi.py) + multimodal video path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2world_spark.functions.avi import (
    _row_stride,
    decode_avi,
    encode_avi,
    sample_frames,
)


def _rand_frames(rng, n, h, w):
    return rng.randint(0, 256, (n, h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("n,h,w", [(6, 13, 15), (3, 16, 16), (1, 1, 1),
                                   (2, 5, 2)])
def test_roundtrip(n, h, w):
    rng = np.random.RandomState(n * 100 + h * 10 + w)
    frames = _rand_frames(rng, n, h, w)
    out, fps = decode_avi(encode_avi(frames, fps=24))
    assert fps == 24
    assert np.array_equal(out, frames)


def test_byte_layout_bottom_up_bgr_padded():
    """Pin the DIB frame layout against hand-computed bytes: 2x2 frame,
    stride (2*3+3)&~3 = 8 -> 2 pad bytes per row; first stored row is
    the image's BOTTOM row in BGR order."""
    frame = np.array(
        [[[1, 2, 3], [4, 5, 6]],      # top row:    RGB (1,2,3) (4,5,6)
         [[7, 8, 9], [10, 11, 12]]],  # bottom row: RGB (7,8,9) (10,11,12)
        dtype=np.uint8,
    )
    data = encode_avi(frame[None], fps=10)
    i = data.index(b"00db")
    size = struct.unpack_from("<I", data, i + 4)[0]
    assert size == _row_stride(2) * 2 == 16
    body = data[i + 8: i + 8 + size]
    assert body == bytes(
        [9, 8, 7, 12, 11, 10, 0, 0,   # bottom row first, BGR, 2 pad
         3, 2, 1, 6, 5, 4, 0, 0]      # then top row
    )


def test_sample_frames():
    frames = np.arange(6 * 2 * 2 * 3, dtype=np.uint8).reshape(6, 2, 2, 3)
    s = sample_frames(frames, 2)
    assert s.shape[0] == 3
    assert np.array_equal(s[1], frames[2])


def test_rejects_non_avi_and_compressed():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    data = bytearray(encode_avi(np.zeros((1, 2, 2, 3), np.uint8)))
    i = data.index(b"vids") + 4
    data[i: i + 4] = b"mjpg"  # compressed fourcc must raise
    with pytest.raises(ValueError):
        decode_avi(bytes(data))


def test_video_evidence_matches_closed_form(spark):
    from osm2world_spark.operators.multimodal import (
        synthetic_avi_media,
        video_frame_evidence,
    )

    keys = spark.createDataFrame([(7,), (123,)], "k bigint")
    rows = video_frame_evidence(
        synthetic_avi_media(keys, "k"), every=2).collect()
    assert len(rows) == 2 * 3  # frames 0, 2, 4
    for r in rows:
        k, f = int(r["doc_id"]), r["frame"]
        xs, ys = np.arange(15), np.arange(13)
        rvals = (k + f + xs) % 256
        gvals = (k * 3 + f * 7 + ys) % 256
        assert r["w"] == 15 and r["h"] == 13 and r["n_frames"] == 6
        assert r["sum_r"] == 13 * int(rvals.sum())
        assert r["wx_r"] == 13 * int((xs * rvals).sum())
        assert r["sum_g"] == 15 * int(gvals.sum())
        assert r["wy_g"] == 15 * int((ys * gvals).sum())
        assert r["sum_b"] == 15 * 13 * ((k * 5 + f * 11) % 256)


def test_real_codec_dispatch_routes_all_four_formats(spark):
    """One mixed batch of PNG + JPEG + WAV + AVI payloads through
    extract_features(real_codecs=True): the magic-byte dispatch (incl.
    the RIFF WAVE-vs-AVI form-type split) must route every row."""
    from pyspark.sql import functions as F

    from osm2world_spark.operators.multimodal import (
        extract_features,
        synthetic_avi_media,
        synthetic_jpeg_media,
        synthetic_png_media,
        synthetic_wav_media,
    )

    keys = spark.createDataFrame([(1,), (2,)], "k bigint")
    media = (
        synthetic_png_media(keys, "k")
        .unionAll(synthetic_jpeg_media(keys, "k"))
        .unionAll(synthetic_wav_media(keys, "k"))
        .unionAll(synthetic_avi_media(keys, "k"))
    )
    feats = extract_features(media, real_codecs=True)
    rows = feats.select("doc_id", F.size("feature").alias("d")).collect()
    assert len(rows) == 8
    assert all(r["d"] == 16 for r in rows)


def test_top_down_dib_decodes_unflipped():
    """Negative biHeight = top-down DIB: rows are already in image
    order and must NOT be flipped."""
    frames = np.arange(2 * 3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 2, 3)
    data = bytearray(encode_avi(frames, fps=5))
    i = data.index(b"strf")
    # biHeight sits at offset 8 of BITMAPINFOHEADER (after the chunk tag
    # + size header)
    h = struct.unpack_from("<i", data, i + 8 + 8)[0]
    struct.pack_into("<i", data, i + 8 + 8, -h)
    out, _ = decode_avi(bytes(data))
    # encoder wrote bottom-up; claiming top-down must yield the V-flip
    assert np.array_equal(out, frames[:, ::-1])
