"""Physical-plan shape assertions: the optimizations the engine claims
(column pruning into the parquet scan, broadcast joins for dimensions,
a single wide exchange in the spatial join) must be visible in
`explain()` output — not just intended."""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    """token_stats projects 2 columns; the parquet scan must read ONLY
    those (ReadSchema pruned by Catalyst)."""
    import __spark_entry__ as e

    df = e.queries()["token_stats"](spark, SF)
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}


def test_filter_pushdown_reaches_scan(spark):
    """A key filter must appear in PushedFilters of the parquet scan."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "LessThan(o_orderkey,100)" in plan


def test_dimension_join_broadcasts(spark):
    """customer x nation x region resolves to broadcast hash joins, not
    shuffle joins."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["dim_join_agg"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_spatial_join_single_wide_exchange(spark):
    """The single-shuffle design: exactly one hashpartitioning exchange
    carries the geometry (the gkey repartition); the only other exchange
    allowed is the tiny broadcast of the dense-cell profile."""
    from osm2world_spark.operators.spatial_join import spatial_self_join
    from osm2world_spark.sources.documents import extract_elements, synthetic_documents

    docs = synthetic_documents(spark, 200, seed=5)
    plan = _plan(spatial_self_join(extract_elements(docs)))
    wide = re.findall(r"Exchange hashpartitioning\(gkey", plan)
    assert len(wide) == 1, plan
    # no dropDuplicates-style exchange over pair columns
    assert "Exchange hashpartitioning(a_eid" not in plan


def test_whole_stage_codegen_on_tile_math(spark):
    """Tile-assignment Column math stays inside whole-stage codegen."""
    import __spark_entry__ as e

    df = e.queries()["tile_points_z14"](spark, SF)
    jqe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = jqe.explainString(mode)
    # the tile math is a pure JVM relational pipeline over the columnar
    # scan (Project/HashAggregate only — whole-stage-codegen eligible),
    # with map-side partial aggregation and no Python in the path
    assert "Batched: true" in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    ops = set(re.findall(r"^\((\d+)\) (\w+)", plan, re.M))
    names = {o[1] for o in ops}
    assert names <= {"Scan", "Project", "HashAggregate", "Exchange", "AdaptiveSparkPlan"}, names


def test_stage_partition_pruning(spark, tmp_path):
    """The pipeline's identity(tile_z12) partition dimension must show up
    as metadata pruning: reading one tile from a stage directory carries a
    PartitionFilters entry on tile_z12 and no data-file filter."""
    from pyspark.sql import functions as F

    from osm2world_spark.plans.pipeline import TilePipeline, partition_spec
    from osm2world_spark.sources.documents import synthetic_documents

    spec = partition_spec()
    assert spec["fields"][0] == {"transform": "identity", "column": "tile_z12"}

    out = str(tmp_path / "out")
    docs = synthetic_documents(spark, 150, seed=3)
    TilePipeline(spark, out).run(docs, with_overlaps=False)
    stage = spark.read.parquet(f"{out}/tile_assignments")
    one_tile = stage.select("tile_z12").first()["tile_z12"]
    plan = _plan(stage.where(F.col("tile_z12") == one_tile))
    assert re.search(r"PartitionFilters: \[[^\]]*tile_z12", plan), plan
