"""Distributed sketches: count-min frequency estimation and HyperLogLog
distinct counting, built from public constructions (Cormode/Muthukrishnan
2005; Flajolet et al. 2007) with a deterministic md5-prefix hash family so
results are engine-reproducible (the same reason the MinHash driver mode
is portable).

Scale shapes — both sketches are ONE aggregation pass:
- count-min: token rows explode to d (row, bucket) cells; the sketch is a
  groupBy over d*width cells (map-side combine), so the shuffle volume is
  bounded by the SKETCH size, not the corpus. Point estimates join the
  queried keys against the d cells and take the min.
- HLL: each value hashes once; its register index is the low bits, its
  rank is 1 + leading zero count of the remaining bits; the sketch is
  max(rank) per register — a groupBy over `2^p` rows, mergeable across
  any partitioning (max is associative), the textbook distributed
  cardinality shape. (Spark's approx_count_distinct is the production
  choice; this explicit construction exists for engine-portable
  verification and as the mergeable-sketch pattern.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(col, salt):
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col)), 1, 15), 16, 10).cast(
        "bigint"
    )


def count_min_sketch(
    items: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Item rows -> the (row, bucket, cnt) cells of a depth x width
    count-min sketch (deterministic salted-md5 row hashes)."""
    d = items.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    F.pmod(_h60(F.col(value_col), r), F.lit(width)).cast("int").alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("cell")
    )
    return (
        d.select("cell.row", "cell.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-estimate counts for `keys` from a count-min sketch: the MIN
    over the key's depth cells (over-count only, never under)."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    F.pmod(_h60(F.col(key_col), r), F.lit(width)).cast("int").alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("cell"),
    ).select("key", "cell.row", "cell.bucket")
    return (
        probes.join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def hll_cols(col, p: int = 12):
    """(idx, rank) Columns of the HLL construction for one value column:
    idx = low p bits of the 60-bit value hash, rank = 1 + leading-zero
    count of the remaining (60 - p) bits. Shared by the batch register
    builder and the streaming windowed variant."""
    h = _h60(col, "hll")
    rest_bits = 60 - p
    # high bits via shiftright — float division would lose exactness
    # above 2^53 on the 60-bit hash
    rest = F.shiftright(h, p)
    # rank = rest_bits + 1 - bitlength(rest); bit length via the binary
    # string (conv base 2) — INTEGER arithmetic, because floor(log2(x))
    # through float log is not engine-portable on exact powers of two
    bitlen = F.length(F.conv(rest, 10, 2))
    rank = F.when(rest > 0, F.lit(rest_bits + 1) - bitlen).otherwise(
        F.lit(rest_bits + 1)
    )
    return (
        F.pmod(h, F.lit(1 << p)).cast("int"),
        rank.cast("int"),
    )


def hll_registers(items: DataFrame, value_col: str, p: int = 12) -> DataFrame:
    """Item rows -> HyperLogLog registers (idx, rank): register value =
    max(rank). Mergeable by max under any partitioning."""
    idx, rank = hll_cols(F.col(value_col), p)
    return (
        items.select(idx.alias("idx"), rank.alias("rank"))
        .groupBy("idx")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Registers -> one row (n_registers, estimate): the standard HLL
    estimator with the small-range linear-counting correction. Absent
    registers count as rank 0."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.coalesce(F.count("*"), F.lit(0)).alias("nz"),
        # empty input -> sum is NULL; 0.0 keeps the linear-counting branch
        # live (zeros == m -> estimate 0), not a NULL estimate
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("r"))), F.lit(0.0)).alias("s"),
    )
    s_total = F.col("s") + (F.lit(m) - F.col("nz"))  # 2^0 for empty registers
    raw = F.lit(alpha * m * m) / s_total
    zeros = F.lit(m) - F.col("nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(F.col("nz") == 0, F.lit(0.0)).otherwise(
        F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    )
    return agg.select(
        F.col("nz").cast("int").alias("n_registers"),
        est.alias("estimate"),
    )


# ------------------------------------------------------------------ bloom

# single-bit masks as a literal lookup table: Column-valued shift amounts
# are awkward (F.shiftleft takes only Python ints) and float pow loses
# nothing here but a table lookup is exact by construction
_BIT32 = [1 << b for b in range(32)]


def _bloom_cell(col, j: int, n_bits: int):
    """(word, mask) for hash function j of `col`: bit position is the
    salted 60-bit md5 hash mod n_bits, packed 32 bits per word."""
    pos = F.pmod(_h60(col, f"bf{j}"), F.lit(n_bits))
    word = F.floor(pos / F.lit(32)).cast("int")  # pos < 2^30: exact in double
    mask = F.element_at(
        F.lit(_BIT32), (F.pmod(pos, F.lit(32)) + 1).cast("int")
    ).cast("bigint")
    return word, mask


def bloom_build(
    items: DataFrame, value_col: str, n_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Item rows -> a Bloom filter as (word, bits) rows, 32 bits packed
    per word (Bloom 1970; the construction behind Spark's own runtime
    row-group filters). ONE aggregation pass: k cells per item, bit_or
    per word with map-side combine — shuffle volume is bounded by the
    FILTER size (n_bits/32 rows), not the item count."""
    cells = []
    for j in range(k):
        w, m = _bloom_cell(F.col(value_col), j, n_bits)
        cells.append(F.struct(w.alias("word"), m.alias("mask")))
    return (
        items.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.word").alias("word"))
        .agg(F.bit_or("c.mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    words: DataFrame,
    value_col: str,
    n_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Relational membership probe: every probe row gains a
    might_contain column (true may be a false positive, false is exact).
    The words table is broadcast (it is at most n_bits/32 rows); the
    probe side is never shuffled — k cell checks land as k scalar
    subquery-free broadcast lookups via explode + bool_and."""
    pid = F.monotonically_increasing_id()
    cells = []
    for j in range(k):
        w, m = _bloom_cell(F.col(value_col), j, n_bits)
        cells.append(F.struct(w.alias("word"), m.alias("mask")))
    tagged = probes.withColumn("_pid", pid).withColumn(
        "_cell", F.explode(F.array(*cells))
    )
    joined = tagged.join(
        F.broadcast(words), tagged["_cell.word"] == words["word"], "left"
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_cell.mask"))
        != 0
    )
    keep = [c for c in probes.columns]
    return (
        joined.groupBy("_pid")
        .agg(
            *[F.first(c).alias(c) for c in keep],
            F.bool_and(hit).alias("might_contain"),
        )
        .drop("_pid")
    )


def bloom_predicate(words: DataFrame, n_bits: int = 1 << 16, k: int = 5):
    """Collect the filter ONCE into a literal array and return a Column
    predicate factory: pred(col) is a pure map-side expression (array
    lookups + bitwise AND), usable inside higher-order-function lambdas
    — the corpus side of a decontamination pass runs with ZERO shuffles
    and no join, exactly how Spark injects its runtime bloom filters.
    The collect is bounded by construction: n_bits/32 rows (n_bits=2^20
    -> 32768 bigints, ~256 KiB broadcast as one literal)."""
    arr = [0] * ((n_bits + 31) // 32)
    for r in words.collect():
        arr[r["word"]] = int(r["bits"])
    lit_words = F.lit(arr)

    def pred(col) -> "F.Column":
        checks = None
        for j in range(k):
            w, m = _bloom_cell(col, j, n_bits)
            hit = F.element_at(lit_words, (w + 1).cast("int")).bitwiseAND(m) != 0
            checks = hit if checks is None else (checks & hit)
        return checks

    return pred
