"""Golden-parquet oracle for the natural_elevation driver query (J9
Sibson, NaturalNeighborInterpolator.java:19-57).

Two independent guards:
1. The engine at sf0.01 reproduces the committed golden EXACTLY —
   the same equality the driver's hash gate checks.
2. A deterministic sample of golden rows re-validates against the
   windowed brute-Voronoi oracle (tools/make_natural_golden.py):
   interior rows must equal the affine field (Sibson linear precision),
   edge rows match grid-counted stolen-area weights.
"""

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "natural_elevation", "golden.parquet"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present"
)


def test_engine_matches_golden_exactly(spark):
    import __spark_entry__ as em

    got = {
        r["q_id"]: r["ele_r"]
        for r in em.queries()["natural_elevation"](spark, SF_DIR).collect()
    }
    g = pq.read_table(GOLDEN).to_pydict()
    want = dict(zip(g["q_id"], g["ele_r"]))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k


def test_golden_rows_match_independent_brute_oracle():
    from tools.make_natural_golden import brute_sibson_windowed, load_inputs

    g = pq.read_table(GOLDEN).to_pydict()
    golden = dict(zip(g["q_id"], g["ele_r"]))
    sx, sz, sy, q_ids, qx, qz = load_inputs(SF_DIR)
    # small deterministic sample (CI budget); the freeze tool checks 14
    import numpy as np

    order = np.argsort(np.asarray(q_ids))
    for i in order[:: max(1, len(order) // 4)][:4]:
        qid = q_ids[i]
        brute, corner_frac = brute_sibson_windowed(
            sx, sz, sy, qx[i], qz[i], grid_n=900
        )
        affine = qx[i] / 100.0 + qz[i] / 200.0
        if corner_frac == 0.0:
            assert golden[qid] == pytest.approx(affine, abs=1e-5), qid
        else:
            assert golden[qid] == pytest.approx(
                brute, abs=0.02 * max(abs(affine), 1.0)
            ), qid
