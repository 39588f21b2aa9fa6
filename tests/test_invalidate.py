"""Incremental tile invalidation: a document change set recomputes exactly
the affected tiles, and the result equals a from-scratch run on the
updated corpus (including deletions, whose tiles must not keep stale
rows)."""

import os

from pyspark.sql import functions as F

from osm2world_spark.plans.pipeline import TilePipeline
from osm2world_spark.sources.documents import synthetic_documents


def _read_sorted(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        tuple(None if isinstance(v, list) else v for v in r)
        for r in df.select(sorted(df.columns)).collect()
    )


def test_invalidate_recomputes_only_affected(spark, tmp_path):
    docs_v1 = synthetic_documents(spark, 250, seed=42).cache()

    # v2: one document's spans swapped for another's (its geometry moves),
    # one document deleted
    moved_id, donor_id, deleted_id = "doc_000000000003", "doc_000000000200", "doc_000000000007"
    donor_spans = docs_v1.where(F.col("doc_id") == donor_id).select(
        F.lit(moved_id).alias("doc_id"), "spans"
    )
    docs_v2 = (
        docs_v1.where(~F.col("doc_id").isin(moved_id, deleted_id))
        .unionByName(donor_spans)
        .cache()
    )

    # reference: from-scratch run on v2
    ref_dir = str(tmp_path / "ref")
    TilePipeline(spark, ref_dir).run(docs_v2, run_ts="ref")

    # incremental: run v1, invalidate the change set, run v2
    inc_dir = str(tmp_path / "inc")
    pipe = TilePipeline(spark, inc_dir)
    pipe.run(docs_v1, run_ts="v1")
    n_tiles_total = (
        spark.read.parquet(os.path.join(inc_dir, "tile_assignments"))
        .select("tile_z12").distinct().count()
    )

    affected = pipe.invalidate(
        changed_docs=donor_spans,
        deleted_doc_ids=spark.createDataFrame([(deleted_id,)], "doc_id string"),
        run_ts="inv1",
    ).cache()
    aff = {(r.stage, r.tile_z12) for r in affected.collect()}
    aff_ta = {t for s, t in aff if s == "tile_assignments"}
    assert 0 < len(aff_ta) < n_tiles_total, "change set must be a strict subset"

    report = pipe.run(docs_v2, run_ts="v2")
    # only the invalidated tiles were recomputed
    assert report["tile_assignments"] == len(aff_ta)
    lineage = spark.read.parquet(os.path.join(inc_dir, "_lineage"))
    recomputed = {
        r.tile_z12
        for r in lineage.where("run_ts = 'v2' AND stage = 'tile_assignments'").collect()
    }
    assert recomputed == aff_ta

    # final state equals the from-scratch v2 run, row for row — including
    # the deleted document being gone everywhere
    for stage in ("tile_assignments", "overlaps"):
        got = _read_sorted(spark, os.path.join(inc_dir, stage))
        want = _read_sorted(spark, os.path.join(ref_dir, stage))
        assert got == want, f"{stage} differs from the from-scratch run"
    ta = spark.read.parquet(os.path.join(inc_dir, "tile_assignments"))
    assert ta.where(F.col("doc_id") == deleted_id).count() == 0

    # idempotent: invalidating an uncommitted tile set again is a no-op
    report2 = pipe.run(docs_v2, run_ts="v3")
    assert report2["tile_assignments"] == 0
    docs_v1.unpersist()
    docs_v2.unpersist()
