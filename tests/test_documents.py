"""Synthetic document source + extraction tests.

Covers the input_hint invariants (BASELINE.json:15): span-sequence equality
(kind, text, media_ref, order) per document must survive every stage."""

import numpy as np
from pyspark.sql import functions as F

from osm2world_spark.sources.documents import (
    extract_elements,
    parse_geo_spans,
    synthetic_documents,
    way_segments,
    BBOX,
)


def test_deterministic_across_partitionings(spark):
    a = synthetic_documents(spark, 300, seed=42, partitions=1).collect()
    b = synthetic_documents(spark, 300, seed=42, partitions=7).collect()
    da = {r.doc_id: r.spans for r in a}
    db = {r.doc_id: r.spans for r in b}
    assert da == db
    assert len(da) == 300


def test_span_offsets_strictly_increasing(spark):
    docs = synthetic_documents(spark, 200, seed=42)
    bad = docs.select(
        F.exists(
            F.zip_with(
                F.col("spans"),
                F.slice(F.col("spans"), 2, F.size("spans") - 1),
                lambda a, b: b["offset"] <= a["offset"],
            ),
            lambda x: x,
        ).alias("bad")
    ).where("bad").count()
    assert bad == 0


def test_span_sequence_roundtrip(spark):
    """Explode + regroup must reproduce the exact span sequence."""
    docs = synthetic_documents(spark, 150, seed=42).cache()
    rebuilt = (
        docs.select("doc_id", F.posexplode("spans").alias("i", "span"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "span"))).alias("pairs"))
        .select("doc_id", F.transform("pairs", lambda p: p["span"]).alias("spans"))
    )
    joined = docs.alias("a").join(rebuilt.alias("b"), "doc_id")
    n_bad = joined.where(F.col("a.spans") != F.col("b.spans")).count()
    assert n_bad == 0
    docs.unpersist()


def test_parse_geo_spans(spark):
    docs = synthetic_documents(spark, 200, seed=42)
    parsed = parse_geo_spans(docs)
    rows = parsed.collect()
    assert len(rows) > 50
    for r in rows[:100]:
        assert r.kind in ("geo_point", "geo_way", "geo_area")
        outer = r.rings[0]
        assert len(outer) % 2 == 0
        lats, lons = outer[0::2], outer[1::2]
        assert all(BBOX[0] <= la <= BBOX[2] for la in lats)
        assert all(BBOX[1] <= lo <= BBOX[3] for lo in lons)
        if r.kind == "geo_point":
            assert len(outer) == 2
        if r.kind == "geo_area":
            # closed loop
            assert outer[0] == outer[-2] and outer[1] == outer[-1]


def test_extract_elements(spark):
    docs = synthetic_documents(spark, 200, seed=42)
    els = extract_elements(docs).cache()
    types = {r.element_type for r in els.select("element_type").distinct().collect()}
    assert types == {"node", "way", "area"}
    r = els.where("element_type = 'area'").first()
    assert r.minx <= r.maxx and r.minz <= r.maxz
    # mm snap: projected coords have at most 3 decimals
    coords = np.array(r.geom[0])
    assert np.allclose(coords * 1000, np.round(coords * 1000), atol=1e-9)
    # metric plausibility: test bbox is ~9.6 km wide -> |x| < 20 km
    assert abs(r.minx) < 20000 and abs(r.minz) < 20000
    els.unpersist()


def test_way_segments(spark):
    docs = synthetic_documents(spark, 300, seed=42)
    els = extract_elements(docs)
    segs = way_segments(els)
    n_ways = els.where("element_type='way'").count()
    n_segs = segs.count()
    assert n_segs >= n_ways  # every way has >= 1 segment (>= 2 points)
    r = segs.first()
    assert r.x1 != r.x2 or r.z1 != r.z2


def test_malformed_geo_spans_quarantined(spark, tmp_path):
    """Bad geometry text must not fail the task: extract_elements drops it,
    geo_span_errors reports it, and the pipeline writes real error counts
    into lineage plus the rows into _quarantine (FaultTolerantIterationUtil
    semantics: per-element failure -> log row, job continues)."""
    import os

    from pyspark.sql import functions as F

    from osm2world_spark.plans.pipeline import TilePipeline
    from osm2world_spark.sources.documents import (
        DOCS_SCHEMA,
        extract_elements,
        geo_span_errors,
    )

    def doc(doc_id, kind, text):
        return (doc_id, [{"kind": kind, "text": text, "media_ref": "", "offset": 0}])

    docs = spark.createDataFrame(
        [
            doc("good1", "geo_point", "48.5660,13.4500"),
            doc("good2", "geo_way", "48.5660,13.4500 48.5661,13.4501"),
            doc("bad1", "geo_point", "not-a-coordinate"),
            doc("bad2", "geo_way", "48.5660,13.4500 garbage,values"),
            doc("bad3", "geo_area", "48.5660,abc 48.5661,13.4501 48.5660,13.4500"),
            doc("bad4", "geo_point", ""),
        ],
        DOCS_SCHEMA,
    )
    els = extract_elements(docs)
    got_ids = {r["doc_id"] for r in els.collect()}   # must not raise
    assert got_ids == {"good1", "good2"}

    errs = {(r["doc_id"], r["reason"]) for r in geo_span_errors(docs).collect()}
    assert {d for d, _ in errs} == {"bad1", "bad2", "bad3", "bad4"}
    assert all(reason == "unparseable_coordinates" for _, reason in errs)

    out = str(tmp_path / "out")
    report = TilePipeline(spark, out).run(docs, run_ts="runq", with_overlaps=False)
    assert report["errors"] == 4
    lineage = spark.read.parquet(os.path.join(out, "_lineage"))
    assert lineage.agg(F.max("errors")).first()[0] == 4
    quarantine = spark.read.parquet(os.path.join(out, "_quarantine"))
    assert quarantine.count() == 4
