"""dHash perceptual hashing: numpy reference parity, perturbation
behavior, Hamming-LSH pair exactness, and the real-PNG-decode path."""

import numpy as np
import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _ref_dhash(img: np.ndarray) -> tuple[int, int]:
    """Line-for-line reference of the operator's definition: 8x9 block
    sums, cross-multiplied mean comparison, bit i = r*8+c, hi/lo halves."""
    h, w = img.shape
    ys = [(r * h) // 8 for r in range(9)]
    xs = [(c * w) // 9 for c in range(10)]
    hi = lo = 0
    for r in range(8):
        for c in range(8):
            sl = int(img[ys[r]:ys[r + 1], xs[c]:xs[c + 1]].sum())
            nl = (ys[r + 1] - ys[r]) * (xs[c + 1] - xs[c])
            sr = int(img[ys[r]:ys[r + 1], xs[c + 1]:xs[c + 2]].sum())
            nr = (ys[r + 1] - ys[r]) * (xs[c + 2] - xs[c + 1])
            if sl * nr > sr * nl:
                i = r * 8 + c
                if i >= 32:
                    hi |= 1 << (i - 32)
                else:
                    lo |= 1 << i
    return hi, lo


def _hash_df(spark, imgs):
    rows = [
        (k, img.flatten().astype(int).tolist(), img.shape[1], img.shape[0])
        for k, img in imgs
    ]
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("px", ArrayType(IntegerType())),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
        ]
    )
    from osm2world_spark.operators.phash import dhash_from_pixels

    return spark.createDataFrame(rows, schema).select(
        "doc_id",
        dhash_from_pixels(F.col("px"), F.col("w"), F.col("h")).alias("d"),
    ).select("doc_id", "d.hi", "d.lo")


def test_dhash_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    imgs = [
        (0, rng.randint(0, 256, (16, 18))),
        (1, rng.randint(0, 256, (32, 32))),
        (2, rng.randint(0, 256, (9, 10))),   # minimum-ish size
        (3, np.zeros((16, 16), int)),          # constant: all bits 0
    ]
    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in _hash_df(spark, imgs).collect()}
    for k, img in imgs:
        assert got[k] == _ref_dhash(img), f"img {k}"
    assert got[3] == (0, 0)


def test_dhash_small_perturbation_small_distance(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (16, 18))
    tweaked = base.copy()
    tweaked[3, 4] += 40            # one pixel: flips at most 2 bits
    other = rng.randint(0, 256, (16, 18))
    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in _hash_df(
        spark, [(0, base), (1, tweaked), (2, other)]
    ).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(got[0], got[1]) <= 2
    assert ham(got[0], got[2]) > 10  # unrelated images are far


def test_near_dups_equal_exact_pair_set(spark):
    from osm2world_spark.operators.phash import dhash_near_dups

    rng = np.random.RandomState(3)
    imgs = []
    for g in range(6):
        base = rng.randint(0, 256, (16, 18))
        for v in range(3):
            im = base.copy()
            if v:
                im[v, v] += 25 * v
            imgs.append((g * 3 + v, im))
    hdf = _hash_df(spark, imgs)
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_dups(hdf, max_hamming=3).collect()
    )
    # brute-force truth
    hs = {r["doc_id"]: (r["hi"], r["lo"]) for r in hdf.collect()}
    want = []
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if d <= 3:
                want.append((a, b, d))
    assert got == sorted(want)
    assert len(got) >= 3  # the perturbed variants do surface as pairs


def test_dhash_over_real_png_decode(spark):
    """End-to-end: PNG bytes -> stdlib decode -> dHash; the perturbed
    re-encode lands within distance 2 of the original."""
    from osm2world_spark.functions.png import decode_png, encode_png

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 18)).astype(np.uint8)
    tweaked = img.copy()
    tweaked[2, 2] ^= 0x30
    imgs = []
    for k, im in ((0, img), (1, tweaked)):
        dec = decode_png(encode_png(im))
        assert np.array_equal(dec, im)  # lossless roundtrip
        imgs.append((k, dec.astype(int)))
    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in _hash_df(spark, imgs).collect()}
    d = bin(got[0][0] ^ got[1][0]).count("1") + bin(got[0][1] ^ got[1][1]).count("1")
    assert d <= 2


def test_dhash_plan_is_shuffle_free(spark):
    rng = np.random.RandomState(1)
    df = _hash_df(spark, [(0, rng.randint(0, 256, (16, 18)))])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
