"""Sketch tests: count-min over-count invariant and HLL accuracy."""

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.sketches import (
    count_min_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
)


def test_count_min_never_undercounts_and_is_exact_when_wide(spark):
    items = spark.range(5000).select(
        F.concat(F.lit("tok"), F.pmod(F.col("id") * 7919, F.lit(40))).alias("v")
    )
    exact = items.groupBy(F.col("v").alias("key")).agg(F.count("*").alias("exact"))

    # narrow sketch: estimates are upper bounds
    sk = count_min_sketch(items, "v", depth=4, width=16)
    est = count_min_estimate(sk, exact.select("key"), "key", depth=4, width=16)
    joined = est.join(exact, "key").collect()
    assert all(r.est >= r.exact for r in joined)
    assert any(r.est > r.exact for r in joined)  # collisions at width 16

    # wide sketch: 40 keys in 4x4096 cells collide with negligible chance
    sk2 = count_min_sketch(items, "v", depth=4, width=4096)
    est2 = count_min_estimate(sk2, exact.select("key"), "key", depth=4, width=4096)
    assert all(r.est == r.exact for r in est2.join(exact, "key").collect())


def test_count_min_absent_key_estimates_bounded(spark):
    items = spark.range(100).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
    sk = count_min_sketch(items, "v", depth=4, width=2048)
    ghosts = spark.createDataFrame([("never-seen",)], "key string")
    est = count_min_estimate(sk, ghosts, "key", depth=4, width=2048).first()
    assert 0 <= est.est <= 2  # at most a couple of collisions


def test_hll_estimate_within_tolerance(spark):
    for n in (100, 5000):
        items = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
        regs = hll_registers(items, "v", p=12)
        est = hll_estimate(regs, p=12).first().estimate
        # p=12 -> ~1.04/sqrt(4096) = 1.6% standard error; allow 5%
        assert est == pytest.approx(n, rel=0.05), (n, est)


def test_hll_registers_mergeable(spark):
    """max-merge of two shards' registers == registers of the union."""
    a = spark.range(0, 400).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    b = spark.range(300, 700).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    ra = hll_registers(a, "v", p=10)
    rb = hll_registers(b, "v", p=10)
    merged = (
        ra.unionByName(rb).groupBy("idx").agg(F.max("r").alias("r"))
    )
    direct = hll_registers(a.unionByName(b), "v", p=10)
    assert {(x.idx, x.r) for x in merged.collect()} == {
        (x.idx, x.r) for x in direct.collect()
    }
