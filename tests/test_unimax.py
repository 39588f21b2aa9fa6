"""UniMax allocation: sequential-waterfill replica agreement, the
capped/uniform boundary, epoch-cap and budget conservation invariants,
degenerate inputs, and the all-window plan (no joins, no collects)."""

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.packing import unimax_allocation


def _sequential_unimax(counts, budget, cap):
    """The paper's loop, integerized with DIV at the uncapped share."""
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    remaining, out = budget, {}
    n = len(items)
    for i, (src, c) in enumerate(items):
        share_num, share_den = remaining, n - i
        if c * cap * share_den <= share_num:
            out[src] = c * cap
        else:
            out[src] = share_num // share_den
        remaining -= out[src]
    return out


def _counts_df(spark, counts):
    return spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "source string, n_tokens long"
    )


@pytest.mark.parametrize(
    "counts,budget,cap",
    [
        ({"a": 10, "b": 100, "c": 1000, "d": 10000}, 5000, 3),
        ({"a": 10, "b": 100, "c": 1000, "d": 10000}, 100000, 3),  # all capped
        ({"a": 7, "b": 7, "c": 7}, 10, 2),  # ties + tiny budget
        ({"x": 1}, 0, 5),  # zero budget
        ({f"s{i}": (i * 37) % 501 + 1 for i in range(40)}, 3000, 2),
    ],
)
def test_matches_sequential_waterfill(spark, counts, budget, cap):
    got = {
        r["source"]: r["alloc_tokens"]
        for r in unimax_allocation(_counts_df(spark, counts), budget, cap).collect()
    }
    assert got == _sequential_unimax(counts, budget, cap)


def test_invariants(spark):
    counts = {f"s{i}": 10 * (i + 1) ** 2 for i in range(12)}
    budget, cap = 2500, 4
    rows = unimax_allocation(_counts_df(spark, counts), budget, cap).collect()
    total = sum(r["alloc_tokens"] for r in rows)
    # conservation: exact when any source is uncapped (the remainder
    # cascade spends every token), never over budget otherwise
    n_uncapped = sum(not r["capped"] for r in rows)
    assert total <= budget
    if n_uncapped:
        assert total == budget
    for r in rows:
        assert r["alloc_tokens"] <= r["n_tokens"] * cap
        assert r["epochs_u6"] <= cap * 1_000_000
    # capped sources form the ascending-size prefix
    by_rank = sorted(rows, key=lambda r: r["src_rank"])
    flags = [r["capped"] for r in by_rank]
    assert flags == sorted(flags, reverse=True)
    # uncapped shares differ by at most 1, larger ones last
    un = [r["alloc_tokens"] for r in by_rank if not r["capped"]]
    assert un == sorted(un) and (not un or un[-1] - un[0] <= 1)


def test_zero_count_source(spark):
    rows = unimax_allocation(
        _counts_df(spark, {"empty": 0, "big": 100}), 50, 2
    ).collect()
    out = {r["source"]: r for r in rows}
    assert out["empty"]["alloc_tokens"] == 0
    assert out["empty"]["epochs_u6"] is None
    assert out["big"]["alloc_tokens"] == 50


def test_rejects_bad_args(spark):
    df = _counts_df(spark, {"a": 1})
    with pytest.raises(ValueError):
        unimax_allocation(df, -1, 2)
    with pytest.raises(ValueError):
        unimax_allocation(df, 10, 0)


def test_plan_is_windows_only(spark):
    df = _counts_df(spark, {"a": 10, "b": 20})
    plan = (
        unimax_allocation(df, 15, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Window") >= 2
