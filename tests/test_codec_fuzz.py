"""Property-based fuzz of the pure-stdlib media/terrain codecs: arbitrary
inputs must roundtrip exactly (PNG, WAV, SRTM) or within the documented
bound (JPEG at unit quantization)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _gray_images(draw, max_hw=48, multiple=1):
    h = draw(st.integers(1, max_hw // multiple)) * multiple
    w = draw(st.integers(1, max_hw // multiple)) * multiple
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)


@settings(max_examples=25, deadline=None)
@given(img=_gray_images(), channels=st.sampled_from([1, 3, 4]))
def test_png_roundtrip_fuzz(img, channels):
    from osm2world_spark.functions.png import decode_png, encode_png

    if channels > 1:
        img = np.repeat(img[:, :, None], channels, axis=2)
        img[..., -1] = (img[..., 0] * 7 + 13) % 256  # de-correlate a channel
    dec = decode_png(encode_png(img))
    np.testing.assert_array_equal(dec.reshape(img.shape), img)


@settings(max_examples=25, deadline=None)
@given(img=_gray_images(max_hw=32, multiple=8))
def test_jpeg_roundtrip_fuzz_bounded(img):
    from osm2world_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

    dec = decode_jpeg(encode_jpeg_gray(img))
    assert dec.shape == img.shape
    # unit quantization: worst-case DCT/IDCT rounding error is tiny
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 4000),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_fuzz(n, ch, rate, seed):
    from osm2world_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, (n, ch)).astype(np.int16)
    if ch == 1:
        samples = samples[:, 0]
    dec, got_rate = decode_wav(encode_wav(samples, sample_rate=rate))
    assert got_rate == rate
    np.testing.assert_array_equal(dec, samples)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), zipped=st.booleans())
def test_hgt_roundtrip_fuzz(seed, zipped):
    from osm2world_spark.sources.raster import PIXELS
    from osm2world_spark.sources.srtm import _decode_payload, encode_hgt

    grid = (
        np.random.default_rng(seed)
        .integers(-32768, 32767, (PIXELS, PIXELS))
        .astype(np.int16)
    )
    np.testing.assert_array_equal(_decode_payload(encode_hgt(grid, zipped=zipped)), grid)
