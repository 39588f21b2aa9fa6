"""Row-for-row golden parquet comparison (the BASELINE.json correctness
gate shape): recompute tile assignments + typed overlaps over the
deterministic sf_unit table and diff against the checked-in golden
parquet (tools/make_golden.py)."""

import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _canon(df, keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


@pytest.fixture(scope="module")
def built(spark):
    import tools.make_golden as mg

    return mg.build(spark)


def test_golden_tile_assignments(spark, built):
    tiles, _ = built
    golden = spark.read.parquet(os.path.join(GOLDEN_DIR, "tile_assignments"))
    assert tiles.columns == golden.columns
    keys = ["doc_id", "span_idx", "zoom", "tile_x", "tile_y"]
    got = _canon(tiles.select(*golden.columns), keys)
    want = _canon(golden, keys)
    assert len(got) == len(want)
    assert got == want  # row-for-row, including the cell ids


def test_golden_pip_join(spark, built):
    _, overlaps = built
    golden = spark.read.parquet(os.path.join(GOLDEN_DIR, "pip_join"))
    assert overlaps.columns == golden.columns
    keys = ["a_id", "b_id", "overlap_kind"]
    got = _canon(overlaps.select(*golden.columns), keys)
    want = _canon(golden, keys)
    assert len(got) == len(want)
    assert got == want  # row-for-row, including intersection positions


def test_cell_ids_driver_golden(spark):
    """The driver-scale (sf0.01) golden for the cell_ids query: engine
    output must match the committed parquet exactly (the equality the
    driver's hash gate checks); semantic correctness of the encoders is
    pinned by tests/test_cells.py vectors and the sf_unit golden above."""
    import os

    import pyarrow.parquet as pq
    import pytest as _pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        _pytest.skip("sf0.01 testdata not present")
    import __spark_entry__ as em

    got = {
        tuple(r) for r in em.queries()["cell_ids"](spark, sf).collect()
    }
    g = pq.read_table(
        os.path.join(os.path.dirname(__file__), "golden", "cell_ids", "golden.parquet")
    ).to_pylist()
    want = {
        (r["doc_id"], r["span_idx"], r["element_type"], r["zoom"],
         r["tile_x"], r["tile_y"], r["h3_r9"], r["s2_l13"]) for r in g
    }
    assert got == want
