"""Multimodal media path: the pure-stdlib PNG codec (functions/png.py)
and the REAL decode branch of extract_features — generated image bytes
round-trip through Spark's Arrow-batched kernel to the expected
block-luminance features."""

import numpy as np
import pytest

from osm2world_spark.functions.png import (
    block_mean_features,
    decode_png,
    encode_png,
)


def _img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [None, 2, 3, 4])
def test_png_roundtrip(c):
    img = _img(13, 17, c, seed=c or 7)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_all_decode_filters():
    """Hand-build IDAT rows with every filter type (1=Sub, 2=Up,
    3=Average, 4=Paeth) and check reconstruction against a straight
    per-pixel reference implementation."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    h, w, ch = 6, 9, 3
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)

    # reference filterers (PNG spec definitions)
    flat = img.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    rows = []
    for y in range(h):
        f = [0, 1, 2, 3, 4, 1][y]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        filt = np.empty(w * ch, np.int32)
        for i in range(w * ch):
            left = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            filt[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_block_mean_features():
    img = np.zeros((8, 8), np.uint8)
    img[:4, :4] = 255  # top-left quadrant white
    f = block_mean_features(img, grid=2)
    assert f.shape == (4,)
    assert f[0] == pytest.approx(1.0)
    assert f[1] == f[2] == f[3] == 0.0


def test_extract_features_real_codecs_through_spark(spark):
    """End-to-end: encode real PNGs, ship them through the Arrow-batched
    mapInPandas kernel with real_codecs=True, and match the locally
    computed block-luminance features bit-for-bit (float32)."""
    from osm2world_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = []
    want = {}
    for i in range(20):
        img = _img(16 + i, 24 + i, 3 if i % 2 else None, seed=i)
        payload = encode_png(img)
        ref = f"m{i}"
        rows.append((f"d{i}", i, ref, "image", bytearray(payload), img.shape[1], img.shape[0]))
        want[ref] = block_mean_features(img, grid=4)

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_ref"]: np.array(r["feature"], np.float32)
        for r in extract_features(media, real_codecs=True).collect()
    }
    assert set(got) == set(want)
    for ref in want:
        assert np.array_equal(got[ref], want[ref]), ref


def test_wav_codec_roundtrip():
    import numpy as np
    import pytest as _pytest

    from osm2world_spark.functions.wav import (
        audio_window_features,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32767, 1000).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, sample_rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(s, mono)
    # stereo interleave roundtrip
    stereo = rng.integers(-32768, 32767, (500, 2)).astype(np.int16)
    s2, _ = decode_wav(encode_wav(stereo))
    np.testing.assert_array_equal(s2, stereo)
    # odd-size chunk word alignment: extra unknown chunk before data
    raw = encode_wav(mono)
    injected = raw[:12] + b"LIST\x05\x00\x00\x00hello\x00" + raw[12:]
    fixed = injected[:4] + (len(injected) - 8).to_bytes(4, "little") + injected[8:]
    s3, _ = decode_wav(fixed)
    np.testing.assert_array_equal(s3, mono)
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG1234567890")
    # windowed evidence closed form
    samples = np.array([3, -4, 5, -6, 7, 8, -9, 10], dtype=np.int16)
    f = audio_window_features(samples, windows=2)
    assert f.tolist() == [3 + 4 + 5 + 6, 3.0, 7 + 8 + 9 + 10, 2.0]


def test_audio_dispatch_in_extract_features(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from osm2world_spark.operators.multimodal import (
        extract_features,
        synthetic_wav_media,
    )

    keys = spark.range(3).select((F.col("id") * 50 + 21).alias("k"))
    media = synthetic_wav_media(keys, "k", n_samples=1024)
    rows = {r.doc_id: r.feature for r in extract_features(media, real_codecs=True).collect()}
    assert len(rows) == 3
    for k_str, feat in rows.items():
        k = int(k_str)
        idx = np.arange(1024, dtype=np.int64)
        s = ((idx * (k % 31 + 3) + k) % 2048) - 1024
        seg = s[:128]
        assert feat[0] == float(np.abs(seg).sum())
        sign = seg >= 0
        assert feat[1] == float(np.count_nonzero(sign[1:] != sign[:-1]))


def test_resize_box_floor_mean_gray_and_rgb(spark):
    import numpy as np

    from osm2world_spark.functions.png import decode_png, encode_png
    from osm2world_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    rgb = rng.randint(0, 256, (17, 18, 3)).astype(np.uint8)  # crops to 16x16
    media = spark.createDataFrame(
        [("g", 0, "g", "image", bytearray(encode_png(gray)), 16, 16),
         ("c", 0, "c", "image", bytearray(encode_png(rgb)), 18, 17)],
        "doc_id string, span_idx int, media_ref string, media_type string, "
        "payload binary, width int, height int",
    )
    out = {r["doc_id"]: r for r in resize_images(media, 4).collect()}
    assert (out["g"]["height"], out["g"]["width"]) == (4, 4)
    assert (out["c"]["height"], out["c"]["width"]) == (4, 4)

    got_g = decode_png(bytes(out["g"]["payload"]))
    want_g = gray.astype(np.int64).reshape(4, 4, 4, 4).transpose(
        0, 2, 1, 3).reshape(4, 4, 16).sum(axis=2) // 16
    assert np.array_equal(got_g.astype(np.int64), want_g)

    got_c = decode_png(bytes(out["c"]["payload"]))
    crop = rgb[:16, :16].astype(np.int64)
    want_c = np.stack(
        [crop[..., ch].reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
         .reshape(4, 4, 16).sum(axis=2) // 16 for ch in range(3)], axis=2)
    assert np.array_equal(got_c.astype(np.int64), want_c)


def test_resized_evidence_matches_closed_form_and_resize(spark):
    import numpy as np

    from osm2world_spark.functions.png import decode_png
    from osm2world_spark.operators.multimodal import (
        resize_images,
        resized_pixel_evidence,
        synthetic_png_media,
    )

    keys = spark.createDataFrame([(5,), (300,)], "k bigint")
    media = synthetic_png_media(keys, "k", size=16)
    rows = resized_pixel_evidence(media, 4).collect()
    assert len(rows) == 2 * 16
    resized = {
        r["doc_id"]: decode_png(bytes(r["payload"]))
        for r in resize_images(media, 4).collect()
    }
    for r in rows:
        k = int(r["doc_id"])
        block = [
            ((4 * r["y"] + dy) * 16 + 4 * r["x"] + dx + k) % 256
            for dy in range(4) for dx in range(4)
        ]
        assert r["bsum"] == sum(block)
        assert r["v"] == sum(block) // 16
        # evidence value IS the production resize output pixel
        assert r["v"] == int(resized[r["doc_id"]][r["y"], r["x"]])


def test_resample_audio_mono_stereo_and_evidence(spark):
    import numpy as np

    from osm2world_spark.functions.wav import decode_wav, encode_wav
    from osm2world_spark.operators.multimodal import (
        resample_audio,
        resampled_audio_evidence,
        synthetic_wav_media,
    )

    rng = np.random.RandomState(11)
    mono = rng.randint(-1024, 1024, 103).astype(np.int16)  # crops to 100
    stereo = rng.randint(-1024, 1024, (40, 2)).astype(np.int16)
    media = spark.createDataFrame(
        [("m", 0, "m", "audio", bytearray(encode_wav(mono, 8000)), 103, 1),
         ("s", 0, "s", "audio", bytearray(encode_wav(stereo, 4000)), 40, 1)],
        "doc_id string, span_idx int, media_ref string, media_type string, "
        "payload binary, width int, height int",
    )
    out = {r["doc_id"]: r for r in resample_audio(media, 4).collect()}
    got_m, rate_m = decode_wav(bytes(out["m"]["payload"]))
    assert rate_m == 2000 and out["m"]["width"] == 25
    want_m = np.floor_divide(
        mono[:100].astype(np.int64).reshape(25, 4).sum(axis=1), 4)
    assert np.array_equal(got_m.astype(np.int64), want_m)
    got_s, rate_s = decode_wav(bytes(out["s"]["payload"]))
    assert rate_s == 1000 and got_s.shape == (10, 2)
    want_s = np.floor_divide(
        stereo.astype(np.int64).reshape(10, 4, 2).sum(axis=1), 4)
    assert np.array_equal(got_s.astype(np.int64), want_s)

    # evidence values == production resample output (mono fixtures)
    keys = spark.createDataFrame([(9,)], "k bigint")
    fx = synthetic_wav_media(keys, "k")
    ev = {r["i"]: (r["ssum"], r["v"])
          for r in resampled_audio_evidence(fx, 8).collect()}
    prod, _ = decode_wav(bytes(resample_audio(fx, 8).first()["payload"]))
    assert len(ev) == 128 == len(prod)
    for i, (ssum, v) in ev.items():
        assert v == int(prod[i])
        assert v == ssum // 8  # python floor div == numpy floor_divide
