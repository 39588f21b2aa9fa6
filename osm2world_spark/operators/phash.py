"""Perceptual image hashing (dHash) and Hamming-LSH near-duplicate
pairs — the image-side twin of MinHash text dedup in a multimodal
training-data pipeline (the difference-hash construction is the public
one popularized by Krawetz; banded Hamming LSH is the standard
bit-sampling family).

Everything is EXACT integer arithmetic on pixel values: the 9x8
downscale uses block SUMS and compares means by cross-multiplication
(sum_l * cnt_r > sum_r * cnt_l), so no float rounding exists anywhere
and a SQL oracle reproduces the hash bit-for-bit.

Scale shapes:
- dhash_from_pixels: shuffle-free projection (one nested
  higher-order-function tree per row, JVM-side; lambda-bound like the
  PQ fold so the expression stays inside codegen method limits).
- dhash_near_dups: band explode (4 rows/image) -> equi-join on
  (band, value) -> exact Hamming verify. Never all-pairs; by
  pigeonhole any pair within max_hamming <= 3 shares at least one of
  the 4 16-bit bands, so the candidate join has NO recall loss and the
  verified output equals the exact hamming<=threshold pair set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIT32 = [1 << b for b in range(32)]


def dhash_from_pixels(pixels: Column, width, height) -> Column:
    """64-bit difference hash of a row-major grayscale pixel array
    (integer values), returned as struct(hi, lo) of two 32-bit halves
    packed in BIGINTs (bit 63 would not fit a signed bigint literal).

    Grid cell (r, c) of the 8x9 downscale covers pixel rows
    [floor(r*h/8), floor((r+1)*h/8)) x cols [floor(c*w/9),
    floor((c+1)*w/9)); bit r*8+c is 1 iff mean(cell[r][c]) >
    mean(cell[r][c+1]), compared exactly by cross-multiplication."""
    w = F.lit(width) if isinstance(width, int) else width
    h = F.lit(height) if isinstance(height, int) else height

    def y0(r):
        return F.floor(r * h / 8).cast("bigint")

    def x0(c):
        return F.floor(c * w / 9).cast("bigint")

    def cell(r, c):
        ys = F.sequence(y0(r), y0(r + 1) - 1)
        xs = F.sequence(x0(c), x0(c + 1) - 1)
        s = F.aggregate(
            ys,
            F.lit(0).cast("bigint"),
            lambda a, y: a
            + F.aggregate(
                xs,
                F.lit(0).cast("bigint"),
                lambda b, x: b
                + F.element_at(pixels, (y * w + x + 1).cast("int")).cast(
                    "bigint"
                ),
            ),
        )
        cnt = (y0(r + 1) - y0(r)) * (x0(c + 1) - x0(c))
        return F.struct(s.alias("s"), cnt.alias("n"))

    # 8x9 cell sums as ONE nested-lambda array (72 inlined copies of the
    # aggregate blow past the codegen method limit, the PQ lesson)
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda r: F.transform(F.sequence(F.lit(0), F.lit(8)), lambda c: cell(r, c)),
    )

    def packed(cs):
        def bit(i):
            r, c = (i / 8).cast("int"), F.pmod(i, 8).cast("int")
            left = F.element_at(F.element_at(cs, r + 1), c + 1)
            right = F.element_at(F.element_at(cs, r + 1), c + 2)
            return left["s"] * right["n"] > right["s"] * left["n"]

        def half(lo_bit):
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(31)),
                F.lit(0).cast("bigint"),
                lambda a, i: a
                + F.when(
                    bit(i + lo_bit),
                    F.element_at(F.lit(_BIT32), (i + 1).cast("int")).cast(
                        "bigint"
                    ),
                ).otherwise(F.lit(0).cast("bigint")),
            )

        return F.struct(half(32).alias("hi"), half(0).alias("lo"))

    # LET-bind the cell table so it evaluates once, not per bit
    return F.element_at(F.transform(F.array(cells), packed), 1)


def dhash_bands(hi: Column, lo: Column) -> Column:
    """The four 16-bit bands of a (hi, lo) dHash as an array of structs
    (band, value) — the Hamming-LSH bucketing key."""
    m16 = F.lit(0xFFFF).cast("bigint")
    vals = [
        lo.bitwiseAND(m16),
        F.shiftright(lo, 16).bitwiseAND(m16),
        hi.bitwiseAND(m16),
        F.shiftright(hi, 16).bitwiseAND(m16),
    ]
    return F.array(
        *[
            F.struct(F.lit(i).alias("band"), v.alias("value"))
            for i, v in enumerate(vals)
        ]
    )


def dhash_near_dups(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hi_col: str = "hi",
    lo_col: str = "lo",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair of images whose dHashes
    differ in at most `max_hamming` bits. Requires max_hamming <= 3 so
    the 4-band pigeonhole guarantees no candidate is missed; the output
    is then EXACTLY the hamming<=threshold pair set, not an
    approximation."""
    if max_hamming > 3:
        raise ValueError("max_hamming > 3 breaks the 4-band pigeonhole guarantee")
    b = hashes.select(
        F.col(id_col).alias("id"),
        F.col(hi_col).alias("hi"),
        F.col(lo_col).alias("lo"),
        F.explode(dhash_bands(F.col(hi_col), F.col(lo_col))).alias("bb"),
    ).select("id", "hi", "lo", "bb.band", "bb.value")
    left = b.select(
        F.col("id").alias("id_a"), F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"), "band", "value",
    )
    right = b.select(
        F.col("id").alias("id_b"), F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"), "band", "value",
    )
    cand = (
        left.join(right, ["band", "value"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
