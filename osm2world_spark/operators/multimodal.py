"""Multimodal (image/audio/video) span plumbing.

Media payloads are opaque `binary` columns + typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over `mapInPandas`. Every media_type in MEDIA_SCHEMA has a REAL decode
path — PNG (functions/png.py, stdlib zlib + numpy scanline filters),
baseline+progressive JPEG (functions/jpeg.py, pure-stdlib ITU-T T.81),
RIFF/WAVE PCM audio (functions/wav.py), and RIFF/AVI uncompressed video
(functions/avi.py, bottom-up BGR DIB frames + every-k-th frame
sampling) — no PIL/libav in this sandbox:
`extract_features(real_codecs=True)` dispatches on magic bytes,
reconstructs actual pixels/samples/frames, and reduces them to a 16-dim
feature. The deterministic hash stub (`_fake_decode`) remains for
synthetic payloads that are not real media bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("payload", BinaryType()),      # opaque bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("feature", ArrayType(FloatType())),  # fixed 16-dim
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> one row per media span with synthesized opaque payload
    metadata (payload bytes = utf8 of media_ref here; a real pipeline reads
    object storage by media_ref)."""
    m = docs.select("doc_id", F.posexplode("spans").alias("span_idx", "span")).where(
        F.col("span.kind") == "media"
    )
    h = F.conv(F.substring(F.md5(F.col("span.media_ref")), 1, 8), 16, 10).cast("bigint")
    return m.select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.media_ref").alias("media_ref"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(h, F.lit(3)) + 1).cast("int")).alias("media_type"),
        F.encode(F.col("span.media_ref"), "utf-8").alias("payload"),
        (F.pmod(h, F.lit(1024)) + 64).cast("int").alias("width"),
        (F.pmod(F.floor(h / 7).cast("bigint"), F.lit(1024)) + 64).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from the payload bytes,
    for synthetic payloads that are not real media. The real-codec branch
    (`real_codecs=True`) decodes actual PNG bytes instead."""
    h = np.frombuffer(payload.ljust(16, b"\0")[:16], dtype=np.uint8).astype(np.float32)
    return h / 255.0


def synthetic_png_media(keys: DataFrame, key_col: str, size: int = 16) -> DataFrame:
    """One REAL PNG per key: a deterministic gradient image
    img[y, x] = (y*size + x + key) % 256, encoded with the stdlib codec.
    Gives the real-codec path a driver-checkable fixture whose decoded
    block statistics have a closed form (pixel values are pure integer
    arithmetic in the key)."""
    from osm2world_spark.functions.png import encode_png

    base = keys.select(F.col(key_col).cast("bigint").alias("k"))

    def gen(batches):
        ramp = np.arange(size * size, dtype=np.int64).reshape(size, size)
        for pdf in batches:
            ks = pdf["k"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": [str(k) for k in ks],
                    "span_idx": np.zeros(len(ks), np.int32),
                    "media_ref": [str(k) for k in ks],
                    "media_type": ["image"] * len(ks),
                    "payload": [
                        encode_png(((ramp + int(k)) % 256).astype(np.uint8))
                        for k in ks
                    ],
                    "width": np.full(len(ks), size, np.int32),
                    "height": np.full(len(ks), size, np.int32),
                }
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_jpeg_media(
    keys: DataFrame, key_col: str, blocks: int = 2, progressive: bool = False
) -> DataFrame:
    """One REAL JPEG per key: a (blocks*8 x blocks*8) image whose
    8x8 blocks are each CONSTANT, value (block_row * blocks + block_col +
    key * 7) % 256, encoded with the all-ones quantization table — constant
    blocks quantize to exact DC-only coefficients, so the lossy format
    roundtrips EXACTLY and the decoded pixels have a closed form the
    driver oracle can state. progressive=True emits the same pixels as a
    SOF2 multi-scan stream (DC first/refine + banded AC scans with EOB
    runs) — byte-different, pixel-identical."""
    from osm2world_spark.functions.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    enc = encode_jpeg_progressive if progressive else encode_jpeg_gray
    base = keys.select(F.col(key_col).cast("bigint").alias("k"))
    size = blocks * 8

    def gen(batches):
        by, bx = np.mgrid[0:blocks, 0:blocks]
        block_idx = (by * blocks + bx).astype(np.int64)
        for pdf in batches:
            ks = pdf["k"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": [str(k) for k in ks],
                    "span_idx": np.zeros(len(ks), np.int32),
                    "media_ref": [str(k) for k in ks],
                    "media_type": ["image"] * len(ks),
                    "payload": [
                        enc(
                            np.repeat(
                                np.repeat(((block_idx + int(k) * 7) % 256).astype(np.uint8), 8, axis=0),
                                8,
                                axis=1,
                            )
                        )
                        for k in ks
                    ],
                    "width": np.full(len(ks), size, np.int32),
                    "height": np.full(len(ks), size, np.int32),
                }
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _real_decode_features(payload: bytes) -> np.ndarray:
    """REAL decode path: dispatch on magic bytes — PNG (functions/png.py),
    baseline/progressive JPEG (functions/jpeg.py), RIFF/WAVE PCM audio
    (functions/wav.py), or RIFF/AVI uncompressed video (functions/avi.py;
    the RIFF form type at bytes 8:12 splits the two RIFF families), all
    pure-stdlib codecs. Images reduce to the 4x4 block mean-luminance
    grid; audio reduces to 8 windows x (abs-sum, sign-change count);
    video reduces to the MEAN over every-2nd-frame samples of the
    per-frame 4x4 block-luma grid — all 16-dim."""
    from osm2world_spark.functions.png import block_mean_features, decode_png

    payload = bytes(payload)
    if payload[:2] == b"\xff\xd8":
        from osm2world_spark.functions.jpeg import decode_jpeg

        return block_mean_features(decode_jpeg(payload), grid=4)
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"AVI ":
            from osm2world_spark.functions.avi import decode_avi, sample_frames

            frames = sample_frames(decode_avi(payload)[0], 2)
            grids = np.stack(
                [block_mean_features(f, grid=4) for f in frames])
            return grids.mean(axis=0).astype(np.float32)
        from osm2world_spark.functions.wav import audio_window_features, decode_wav

        return audio_window_features(decode_wav(payload)[0], windows=8)
    return block_mean_features(decode_png(payload), grid=4)


# backwards-compatible alias (round-3 name)
_png_decode_features = _real_decode_features


def extract_features(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """media rows -> 16-dim feature vectors via Arrow batches. The batch
    shape (one numpy matrix per Arrow batch) is what a real image encoder
    consumes.

    real_codecs=True decodes payloads as PNG with the pure-stdlib codec
    (zlib scanline filters in numpy) — a genuinely decoded image path,
    exercising the exact schema/batching a PIL/libav decoder would use.
    real_codecs=False keeps the deterministic hash stub for synthetic
    payloads that are not real image bytes (e.g. media_table's
    utf8-of-media_ref placeholders)."""
    decode = _real_decode_features if real_codecs else _fake_decode

    def kernel(batches):
        for pdf in batches:
            feats = np.stack([decode(p) for p in pdf["payload"]]) if len(pdf) else np.zeros((0, 16), np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "feature": [row.astype(np.float32) for row in feats],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def synthetic_wav_media(keys: DataFrame, key_col: str, n_samples: int = 1024) -> DataFrame:
    """One REAL RIFF/WAVE PCM payload per key: 16-bit mono, sample i =
    ((i * (k % 31 + 3) + k) % 2048) - 1024 — pure integer arithmetic, so
    the decoded windowed evidence (abs-sum, sign changes) has a closed
    form the driver oracle can recompute."""
    from osm2world_spark.functions.wav import encode_wav

    base = keys.select(F.col(key_col).cast("bigint").alias("k"))

    def gen(batches):
        idx = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ks = pdf["k"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": [str(k) for k in ks],
                    "span_idx": np.zeros(len(ks), np.int32),
                    "media_ref": [str(k) for k in ks],
                    "media_type": ["audio"] * len(ks),
                    "payload": [
                        encode_wav(
                            (((idx * (int(k) % 31 + 3) + int(k)) % 2048) - 1024).astype(np.int16)
                        )
                        for k in ks
                    ],
                    "width": np.full(len(ks), n_samples, np.int32),
                    "height": np.ones(len(ks), np.int32),
                }
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_avi_media(
    keys: DataFrame, key_col: str, n_frames: int = 6, w: int = 15, h: int = 13
) -> DataFrame:
    """One REAL RIFF/AVI payload per key (functions/avi.py): uncompressed
    24-bit DIB frames whose channels are closed-form gradients —
    r(x) = (k + f + x) % 256, g(y) = (k*3 + f*7 + y) % 256,
    b = (k*5 + f*11) % 256 for frame f — so the decoded per-frame sums
    AND coordinate-weighted sums the driver oracle recomputes pin the
    row order (bottom-up flip), channel order (BGR swap) and row padding
    (w=15 -> 45-byte rows padded to 48). Width/height odd on purpose."""
    from osm2world_spark.functions.avi import encode_avi

    base = keys.select(F.col(key_col).cast("bigint").alias("k"))
    xs = np.arange(w, dtype=np.int64)[None, None, :]
    ys = np.arange(h, dtype=np.int64)[None, :, None]
    fs = np.arange(n_frames, dtype=np.int64)[:, None, None]

    def gen(batches):
        for pdf in batches:
            ks = pdf["k"].to_numpy(np.int64)
            payloads = []
            for k in ks:
                frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
                frames[..., 0] = (int(k) + fs + xs) % 256
                frames[..., 1] = (int(k) * 3 + fs * 7 + ys) % 256
                frames[..., 2] = ((int(k) * 5 + fs * 11) % 256)
                payloads.append(encode_avi(frames, fps=10))
            yield pd.DataFrame(
                {
                    "doc_id": [str(k) for k in ks],
                    "span_idx": np.zeros(len(ks), np.int32),
                    "media_ref": [str(k) for k in ks],
                    "media_type": ["video"] * len(ks),
                    "payload": payloads,
                    "width": np.full(len(ks), w, np.int32),
                    "height": np.full(len(ks), h, np.int32),
                }
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def video_frame_evidence(media: DataFrame, every: int = 2) -> DataFrame:
    """Decode AVI payloads, sample every-k-th frame, and emit the exact
    integer evidence per (doc, frame): channel sums and coordinate-
    weighted sums — the hash-verification surface of the video path
    (driver query `video_frames`)."""
    schema = (
        "doc_id string, frame int, n_frames int, w int, h int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, "
        "wx_r bigint, wy_g bigint"
    )

    def kernel(batches):
        from osm2world_spark.functions.avi import decode_avi, sample_frames

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame", "n_frames", "w", "h",
                "sum_r", "sum_g", "sum_b", "wx_r", "wy_g")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _ = decode_avi(bytes(payload))
                n, h, w, _c = frames.shape
                xs = np.arange(w, dtype=np.int64)
                ys = np.arange(h, dtype=np.int64)
                for fi in range(0, n, max(1, every)):
                    f = frames[fi].astype(np.int64)
                    rows["doc_id"].append(doc_id)
                    rows["frame"].append(fi)
                    rows["n_frames"].append(n)
                    rows["w"].append(w)
                    rows["h"].append(h)
                    rows["sum_r"].append(int(f[..., 0].sum()))
                    rows["sum_g"].append(int(f[..., 1].sum()))
                    rows["sum_b"].append(int(f[..., 2].sum()))
                    rows["wx_r"].append(int((f[..., 0] * xs[None, :]).sum()))
                    rows["wy_g"].append(int((f[..., 1] * ys[:, None]).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=schema)


def _decode_image(payload: bytes) -> np.ndarray:
    """Image payload -> (h, w, c) uint8 via the magic-byte dispatch
    (PNG or JPEG); greyscale normalizes to c=1."""
    payload = bytes(payload)
    if payload[:2] == b"\xff\xd8":
        from osm2world_spark.functions.jpeg import decode_jpeg

        img = decode_jpeg(payload)
    else:
        from osm2world_spark.functions.png import decode_png

        img = decode_png(payload)
    return img[..., None] if img.ndim == 2 else img


def _box_reduce(img: np.ndarray, factor: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact box downsample: crop to factor multiples, then per output
    pixel the integer block SUM over factor x factor x channels and the
    floor-mean value sum // (factor^2 * c). Returns (sums int64 (H, W),
    values uint8 (H, W, c) with per-channel floor means)."""
    f = int(factor)
    h, w, c = img.shape
    hh, ww = (h // f) * f, (w // f) * f
    img = img[:hh, :ww].astype(np.int64)
    blocks = img.reshape(hh // f, f, ww // f, f, c)
    ch_sums = blocks.sum(axis=(1, 3))            # (H, W, c)
    sums = ch_sums.sum(axis=2)                   # (H, W) all-channel sum
    vals = (ch_sums // (f * f)).astype(np.uint8)  # per-channel floor mean
    return sums, vals


def resize_images(media: DataFrame, factor: int) -> DataFrame:
    """The resize step of the multimodal pipeline: exact integer box
    downsample by ``factor`` (output pixel = floor mean of the
    factor x factor block, trailing rows/cols cropped to multiples),
    re-encoded as PNG — deterministic by construction (no float filter
    kernels, so no engine/library skew). Arrow-batched `mapInPandas`,
    same MEDIA_SCHEMA out (payload/width/height replaced)."""
    from osm2world_spark.functions.png import encode_png

    f = int(factor)

    def kernel(batches):
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p in pdf["payload"]:
                _, vals = _box_reduce(_decode_image(p), f)
                img = vals[..., 0] if vals.shape[2] == 1 else vals
                payloads.append(encode_png(img))
                heights.append(vals.shape[0])
                widths.append(vals.shape[1])
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = np.asarray(widths, np.int32)
            out["height"] = np.asarray(heights, np.int32)
            yield out

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def resized_pixel_evidence(media: DataFrame, factor: int) -> DataFrame:
    """Hash-verification surface of the resize: one row per output
    pixel with the exact ALL-CHANNEL block sum and its floor mean
    (driver query `image_resize`) — shares `_box_reduce` with
    `resize_images`. Channel-summed evidence is blind to per-channel
    ordering by construction; the per-channel floor means that
    `resize_images` actually writes are pinned against numpy on an RGB
    image in tests/test_multimodal.py."""
    f = int(factor)
    schema = "doc_id string, y int, x int, bsum bigint, v int"

    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "y", "x", "bsum", "v")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = _decode_image(p)
                sums, vals = _box_reduce(img, f)
                c = img.shape[2]
                hh, ww = sums.shape
                ys, xs = np.mgrid[0:hh, 0:ww]
                rows["doc_id"].extend([doc_id] * (hh * ww))
                rows["y"].extend(ys.ravel().tolist())
                rows["x"].extend(xs.ravel().tolist())
                rows["bsum"].extend(sums.ravel().tolist())
                rows["v"].extend(
                    (sums // (f * f * c)).ravel().tolist())
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=schema)


def resample_audio(media: DataFrame, factor: int) -> DataFrame:
    """Audio downsample by an integer factor: each output sample is the
    floor mean of ``factor`` consecutive input samples (exact integer
    box filter — the anti-aliased decimation a training pipeline applies
    before audio featurization; trailing remainder samples cropped).
    Decodes RIFF/WAVE PCM, re-encodes at sample_rate // factor. Same
    MEDIA_SCHEMA out (width = new sample count)."""
    from osm2world_spark.functions.wav import decode_wav, encode_wav

    f = int(factor)

    def kernel(batches):
        for pdf in batches:
            payloads, widths = [], []
            for p in pdf["payload"]:
                samples, rate = decode_wav(bytes(p))
                s = samples.reshape(len(samples), -1).astype(np.int64)
                n = (s.shape[0] // f) * f
                out = s[:n].reshape(n // f, f, s.shape[1])
                means = np.floor_divide(out.sum(axis=1), f)
                flat = means.astype(np.int16)
                if samples.ndim == 1:
                    flat = flat[:, 0]
                payloads.append(encode_wav(flat, sample_rate=max(1, rate // f)))
                widths.append(n // f)
            out_pdf = pdf.copy()
            out_pdf["payload"] = payloads
            out_pdf["width"] = np.asarray(widths, np.int32)
            yield out_pdf

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def resampled_audio_evidence(media: DataFrame, factor: int) -> DataFrame:
    """Hash surface of the resample: per output sample index the exact
    block sum and floor mean (driver query `audio_resample`); mono
    16-bit payloads."""
    from osm2world_spark.functions.wav import decode_wav

    f = int(factor)
    schema = "doc_id string, i int, ssum bigint, v int"

    def kernel(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "i", "ssum", "v")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = decode_wav(bytes(p))
                s = samples.astype(np.int64)
                n = (len(s) // f) * f
                blocks = s[:n].reshape(n // f, f)
                sums = blocks.sum(axis=1)
                rows["doc_id"].extend([doc_id] * len(sums))
                rows["i"].extend(range(len(sums)))
                rows["ssum"].extend(sums.tolist())
                rows["v"].extend(np.floor_divide(sums, f).tolist())
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=schema)
