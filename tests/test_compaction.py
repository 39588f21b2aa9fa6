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


def test_compact_untouched_partitions_pruned_and_preserved(spark, tmp_path):
    """Partitions with nothing to rewrite are never read or touched: the
    executor's directory scan is filtered by a broadcast join on the
    partition column, which Catalyst turns into dynamic partition
    pruning (the 100-TB guarantee that maintenance cost scales with the
    rewrite set, not the table)."""
    import os

    root = str(tmp_path / "stage")
    df = spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("pt"), F.col("id").alias("v")
    )
    # pt=0: one big file (keep); pt=1: many small files (rewrite)
    df.where("pt = '0'").coalesce(1).write.partitionBy("pt").parquet(root)
    df.where("pt = '1'").repartition(8).write.mode("append").partitionBy(
        "pt"
    ).parquet(root)

    keep_dir = os.path.join(root, "pt=0")
    keep_files = {
        fn: os.path.getmtime(os.path.join(keep_dir, fn))
        for fn in os.listdir(keep_dir)
        if fn.endswith(".parquet")
    }

    listing = list_partitioned_parquet(spark, root, "pt")
    plan = plan_compaction(listing, 1 << 20, partition_cols=("pt",))
    # pt=0's single big-or-lone file must be keep; pt=1 all rewrite
    acts = {(r["pt"], r["action"]) for r in plan.collect()}
    assert ("0", "rewrite") not in acts and ("1", "rewrite") in acts

    summary = compact_parquet_dir(spark, root, "pt", target_bytes=1 << 20)
    assert summary["groups_rewritten"] == 1

    # untouched partition: same files, same mtimes, data intact
    got = {
        fn: os.path.getmtime(os.path.join(keep_dir, fn))
        for fn in os.listdir(keep_dir)
        if fn.endswith(".parquet")
    }
    assert got == keep_files
    assert spark.read.parquet(root).count() == 400

    # scan shape: the executor's static partition filter prunes the
    # untouched directory entirely — the filtered reader lists no pt=0
    # file (the same inputFiles set the Spark scan will read)
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("v", spark.read.parquet(root).schema["v"].dataType),
         StructField("pt", StringType())]
    )
    reader = spark.read.schema(schema).parquet(root).where(
        F.col("pt").isin(["1"])
    )
    plan_str = reader._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str and "pt" in plan_str.split(
        "PartitionFilters"
    )[1].split("]")[0], plan_str[:1500]
    # and the pruned scan actually reads only the touched directory
    files = {
        r[0]
        for r in reader.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert files and all("pt=0" not in f for f in files), files
