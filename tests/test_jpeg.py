"""Baseline JPEG codec tests (ITU-T T.81 semantics, pure-stdlib codec)."""

import struct

import numpy as np
import pytest

from osm2world_spark.functions.jpeg import (
    _STD_AC_LUM,
    _STD_DC_LUM,
    _BitWriter,
    _huff_codes,
    decode_jpeg,
    encode_jpeg_gray,
)


def test_constant_blocks_roundtrip_exact():
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg_gray(img))
    np.testing.assert_array_equal(dec, img)


def test_smooth_image_near_exact_with_unit_quant():
    yy, xx = np.mgrid[0:32, 0:24]
    img = ((yy * 11 + xx * 3) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_noise_bounded_error():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rejects_non_jpeg_and_arithmetic():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # minimal stream with an arithmetic-coded SOF9 marker (progressive
    # SOF2 is SUPPORTED since round 5 — see the progressive tests below)
    arith = (
        b"\xff\xd8"
        + b"\xff\xc9" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    )
    with pytest.raises(ValueError, match="baseline or progressive"):
        decode_jpeg(arith)


def _color_jpeg(y_val, cb_val, cr_val, h_samp=1, v_samp=1, size=8):
    """Hand-craft a 3-component JFIF with CONSTANT planes (DC-only blocks),
    luma subsampled h_samp x v_samp relative to chroma. size = luma edge."""
    dc_codes = _huff_codes(*_STD_DC_LUM)
    ac_codes = _huff_codes(*_STD_AC_LUM)
    bw = _BitWriter()

    luma_blocks_per_mcu = h_samp * v_samp
    mcus = (size // (8 * h_samp)) * (size // (8 * v_samp))
    pred = {1: 0, 2: 0, 3: 0}

    def put_block(comp, val):
        dc = int(round(8.0 * (val - 128.0)))
        diff = dc - pred[comp]
        pred[comp] = dc
        if diff == 0:
            size_, amp = 0, 0
        else:
            size_ = abs(diff).bit_length()
            amp = diff if diff > 0 else diff + (1 << size_) - 1
        code, length = dc_codes[size_]
        bw.write(code, length)
        if size_:
            bw.write(amp, size_)
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)

    for _ in range(mcus):
        for _ in range(luma_blocks_per_mcu):
            put_block(1, y_val)
        put_block(2, cb_val)
        put_block(3, cr_val)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    q = bytes([0]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, size, size, 3)
    sof += bytes([1, (h_samp << 4) | v_samp, 0])  # Y
    sof += bytes([2, 0x11, 0])  # Cb
    sof += bytes([3, 0x11, 0])  # Cr
    out = b"\xff\xd8"
    out += seg(0xDB, q)
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUM[0]) + bytes(_STD_DC_LUM[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUM[0]) + bytes(_STD_AC_LUM[1]))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return out + bytes(bw.buf) + b"\xff\xd9"


@pytest.mark.parametrize("h_samp,v_samp,size", [(1, 1, 8), (2, 2, 16)])
def test_color_decode(h_samp, v_samp, size):
    y, cb, cr = 120, 150, 100
    rgb = decode_jpeg(_color_jpeg(y, cb, cr, h_samp, v_samp, size))
    assert rgb.shape == (size, size, 3)
    # JFIF YCbCr -> RGB closed form on constant planes
    want_r = round(y + 1.402 * (cr - 128))
    want_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    want_b = round(y + 1.772 * (cb - 128))
    got = rgb[size // 2, size // 2].astype(int)
    assert abs(got[0] - want_r) <= 1
    assert abs(got[1] - want_g) <= 1
    assert abs(got[2] - want_b) <= 1
    # constant everywhere
    assert (rgb == rgb[0, 0]).all()


def test_encoder_requires_8_multiple():
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((10, 8), np.uint8))


def test_media_dispatch_both_formats(spark):
    """extract_features(real_codecs=True) must route PNG and JPEG payloads
    by magic bytes and produce the closed-form block features for both."""
    import pyspark.sql.functions as F

    from osm2world_spark.operators.multimodal import (
        extract_features,
        synthetic_jpeg_media,
        synthetic_png_media,
    )

    keys = spark.range(5).select((F.col("id") * 50).alias("k"))
    png = synthetic_png_media(keys, "k", size=16)
    jpg = synthetic_jpeg_media(keys.select((F.col("k") + 7).alias("k")), "k", blocks=2)
    feats = {
        r.doc_id: r.feature
        for r in extract_features(png.unionByName(jpg), real_codecs=True).collect()
    }
    assert len(feats) == 10
    for i in range(5):
        k = i * 50
        # PNG: gradient image, cell 0 mean = mean of (y*16+x+k)%256 over 4x4
        vals = [(y * 16 + x + k) % 256 for y in range(4) for x in range(4)]
        assert feats[str(k)][0] == pytest.approx(np.mean(vals) / 255.0, abs=1e-6)
        # JPEG: constant blocks, cell 0 is inside block 0 -> (0 + 7k') % 256
        kj = k + 7
        assert feats[str(kj)][0] == pytest.approx(((kj * 7) % 256) / 255.0, abs=1e-6)


# ------------------------------------------------------------ progressive

def test_progressive_equals_baseline_gray():
    """SOF2 multi-scan streams (DC first/refine, banded AC with EOB
    runs, AC correction bits) decode to the identical pixels as the
    baseline encoding of the same quantized coefficients."""
    import numpy as np

    from osm2world_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    for img in [
        rng.integers(0, 256, (24, 32), dtype=np.uint8),
        np.full((16, 16), 77, np.uint8),
        np.where(rng.random((48, 48)) < 0.02, 255, 128).astype(np.uint8),
    ]:
        base = decode_jpeg(encode_jpeg_gray(img))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert np.array_equal(base, prog)


def test_progressive_equals_baseline_color_and_quantized():
    import numpy as np

    from osm2world_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color444,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    q = np.clip(np.arange(64).reshape(8, 8) + 1, 1, 32)
    for quant in (None, q):
        base = decode_jpeg(encode_jpeg_color444(rgb, quant))
        prog = decode_jpeg(encode_jpeg_progressive(rgb, quant))
        assert np.array_equal(base, prog)


def test_progressive_randomized_sweep():
    """Property sweep over sizes, content shapes (smooth -> long EOB
    runs; sparse spikes -> ZRL + correction-bit interleave), and quant
    tables: progressive == baseline on every stream."""
    import numpy as np

    from osm2world_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color444,
        encode_jpeg_progressive,
    )

    for seed in range(16):
        rng = np.random.default_rng(seed)
        h, w = 8 * int(rng.integers(1, 6)), 8 * int(rng.integers(1, 6))
        kind = seed % 4
        if kind == 0:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif kind == 1:
            img = (
                128
                + 60 * np.sin(np.arange(h)[:, None] / 9.0)
                * np.cos(np.arange(w)[None, :] / 7.0)
            ).astype(np.uint8)
        elif kind == 2:
            img = np.full((h, w), 100, np.uint8)
            ys, xs = rng.integers(0, h, 12), rng.integers(0, w, 12)
            img[ys, xs] = 255
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        q = (
            np.ones((8, 8), np.int64)
            if seed % 3 == 0
            else np.clip(rng.integers(1, 24, (8, 8)), 1, None)
        )
        base = decode_jpeg(encode_jpeg_color444(img, q))
        prog = decode_jpeg(encode_jpeg_progressive(img, q))
        assert np.array_equal(base, prog), seed


def test_non_huffman_modes_still_rejected():
    import numpy as np
    import pytest as _pytest

    from osm2world_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

    data = bytearray(encode_jpeg_gray(np.full((8, 8), 50, np.uint8)))
    # rewrite SOF0 marker to SOF9 (arithmetic sequential)
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_restart_intervals_baseline_and_progressive():
    """DRI/RSTn markers (T.81 E.1.2): the decoder must byte-align, skip
    the marker, and reset DC prediction (+ EOB runs in progressive
    scans) — decoded pixels identical to the marker-free stream at
    every interval."""
    import numpy as np

    from osm2world_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color444,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    q = np.clip(rng.integers(1, 20, (8, 8)), 1, None)
    plain = decode_jpeg(encode_jpeg_gray(img, q))
    for ri in (1, 3, 7):
        assert np.array_equal(
            plain, decode_jpeg(encode_jpeg_gray(img, q, restart_interval=ri))
        ), ("baseline", ri)
        assert np.array_equal(
            plain,
            decode_jpeg(encode_jpeg_progressive(img, q, restart_interval=ri)),
        ), ("progressive", ri)
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_color444(rgb, q))
    for ri in (2, 5):
        assert np.array_equal(
            base,
            decode_jpeg(encode_jpeg_progressive(rgb, q, restart_interval=ri)),
        ), ("progressive-color", ri)
