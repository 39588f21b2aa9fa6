"""Generate the golden parquet fixtures (FIXTURES.md §2/§3): expected
tile-assignment and PIP-join (typed-overlap) outputs over the
deterministic sf_unit document table. Committed to tests/golden/ and
compared ROW-FOR-ROW by tests/test_golden_parquet.py — any semantic drift
in projection, tiling, or the spatial join shows up as a diff.

Regenerate ONLY on an intentional semantics change:
    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
N_DOCS = 1000
SEED = 20260817


def build(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.operators.spatial_join import spatial_self_join
    from osm2world_spark.operators.tiling import assign_tiles
    from osm2world_spark.sources.documents import extract_elements, synthetic_documents

    docs = synthetic_documents(spark, N_DOCS, seed=SEED)
    elements = extract_elements(docs).persist()
    tiles = assign_tiles(elements, with_cells=True).select(
        "doc_id", "span_idx", "element_type", "zoom", "tile_x", "tile_y", "h3_r9", "s2_l13"
    )
    overlaps = spatial_self_join(elements).select(
        "a_id", "a_type", "b_id", "b_type", "overlap_kind",
        F.to_json(F.col("positions")).alias("positions_json"),
    )
    return tiles, overlaps


def main() -> None:
    from osm2world_spark.session import get_spark

    spark = get_spark(app_name="make_golden", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    tiles, overlaps = build(spark)
    tiles.orderBy("doc_id", "span_idx", "zoom", "tile_x", "tile_y").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(GOLDEN_DIR, "tile_assignments"))
    overlaps.orderBy("a_id", "b_id", "overlap_kind").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(GOLDEN_DIR, "pip_join"))
    print(
        "golden written:",
        tiles.count(), "tile rows,",
        overlaps.count(), "overlap rows ->", GOLDEN_DIR,
    )
    spark.stop()


if __name__ == "__main__":
    main()
