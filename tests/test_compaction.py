"""Compaction planner semantics (bin assignment, keep rules, exchange
bound) and the end-to-end directory executor (row-identical content,
fewer files)."""

from pyspark.sql import functions as F

from osm2world_spark.plans.compaction import (
    compact_parquet_dir,
    list_partitioned_parquet,
    plan_compaction,
)


def _files(spark, rows):
    return spark.createDataFrame(rows, "partition string, file_path string, size_bytes bigint")


def test_plan_bins_and_keep_rules(spark):
    rows = [
        ("p1", "f_big", 500),   # >= target: keep, no group
        ("p1", "f_a", 90),
        ("p1", "f_b", 80),
        ("p1", "f_c", 40),      # 90+80 -> bin0 full at 170 >= 100? next-fit: see below
        ("p2", "f_solo", 10),   # alone in its bin -> keep
    ]
    out = {r["file_path"]: r for r in plan_compaction(_files(spark, rows), 100).collect()}
    assert out["f_big"]["action"] == "keep" and out["f_big"]["group_id"] is None
    # next-fit order (size desc): 90 -> bin0 (cum_before 0), 80 -> bin0
    # (cum_before 90 < 100), 40 -> bin1 (cum_before 170)
    assert out["f_a"]["group_id"] == 0 and out["f_b"]["group_id"] == 0
    assert out["f_c"]["group_id"] == 1
    assert out["f_a"]["action"] == "rewrite" and out["f_b"]["action"] == "rewrite"
    assert out["f_c"]["action"] == "keep" and out["f_c"]["n_in_group"] == 1
    assert out["f_a"]["group_bytes"] == 170
    assert out["f_solo"]["action"] == "keep"


def test_plan_single_exchange(spark):
    plan = (
        plan_compaction(_files(spark, [("p", "f", 10)]), 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows cluster on the partition key; the second's key extends
    # the first's, so one hash exchange serves both
    assert plan.count("Exchange hashpartitioning") == 1


def test_compact_parquet_dir_roundtrip(spark, tmp_path):
    root = str(tmp_path / "stage")
    df = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("pt"),
        F.col("id").alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    # many tiny files: 16 writer tasks x 4 partition values
    df.repartition(16).write.partitionBy("pt").parquet(root)
    before = list_partitioned_parquet(spark, root, "pt")
    n_before = before.count()
    assert n_before >= 32
    baseline = sorted(
        (r["pt"], r["v"], r["payload"])
        for r in spark.read.parquet(root).select("pt", "v", "payload").collect()
    )

    summary = compact_parquet_dir(spark, root, "pt", target_bytes=1 << 20)
    assert summary["groups_rewritten"] == 4  # everything fits one bin per pt
    assert summary["files_removed"] == n_before

    after = list_partitioned_parquet(spark, root, "pt")
    assert after.count() == 4  # one file per partition
    got = sorted(
        (r["pt"], r["v"], r["payload"])
        for r in spark.read.parquet(root).select("pt", "v", "payload").collect()
    )
    assert got == baseline

    # idempotent: a second pass finds nothing to do
    assert compact_parquet_dir(spark, root, "pt", target_bytes=1 << 20) == {
        "groups_rewritten": 0,
        "files_removed": 0,
    }


def test_compact_parquet_dir_uri_encoded_partition_values(spark, tmp_path):
    """Partition values needing URI encoding (spaces) must compact
    losslessly — input_file_name returns percent-encoded paths."""
    root = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [("New York", i, f"v{i}") for i in range(40)]
        + [("sao paulo", i, f"w{i}") for i in range(40)],
        "pt string, v long, payload string",
    )
    df.repartition(8).write.partitionBy("pt").parquet(root)
    baseline = sorted(
        (r["pt"], r["v"], r["payload"]) for r in spark.read.parquet(root).collect()
    )
    n_before = list_partitioned_parquet(spark, root, "pt").count()
    assert n_before > 2
    summary = compact_parquet_dir(spark, root, "pt", target_bytes=1 << 20)
    assert summary["files_removed"] == n_before and summary["files_written"] == 2
    got = sorted(
        (r["pt"], r["v"], r["payload"]) for r in spark.read.parquet(root).collect()
    )
    assert got == baseline
    assert list_partitioned_parquet(spark, root, "pt").count() == 2
