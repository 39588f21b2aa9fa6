"""Temporal operators: gap sessionization and as-of join semantics."""

import datetime as dt

from pyspark.sql import functions as F

from osm2world_spark.operators.temporal import asof_join, session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp_ntz, value double"
    )


def test_sessionize_gap_boundaries(spark):
    # user 1: events at 0, 29, 59 min (gaps 29, 30 -> same session: rule is
    # STRICTLY greater than the gap), then 90 min (gap 31 -> new session)
    rows = [
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(29), 1.0),
        (3, 1, _ts(59), 1.0),
        (4, 1, _ts(90), 1.0),
        (5, 2, _ts(0), 1.0),  # other user: independent numbering
    ]
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(_events(spark, rows), gap_minutes=30.0).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 2
    assert out[5] == 1


def test_session_stats_rollup(spark):
    rows = [
        (1, 1, _ts(0), 2.0),
        (2, 1, _ts(10), 3.0),
        (3, 1, _ts(100), 5.0),
    ]
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["span_sec"], r["sum_value"])
        for r in session_stats(_events(spark, rows), gap_minutes=30.0).collect()
    }
    assert got[(1, 1)] == (2, 600.0, 5.0)
    assert got[(1, 2)] == (1, 0.0, 5.0)


def test_asof_join_most_recent_prior(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, _ts(20)), (12, 1, _ts(1)), (13, 2, _ts(5))],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 7.0), (1, _ts(20), 9.0), (2, _ts(6), 4.0)],
        "user_id bigint, ts timestamp_ntz, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[10] == 7.0  # latest right at/before 5 min is 2 min
    assert out[11] == 9.0  # equal timestamps match (<= semantics)
    assert out[12] is None  # nothing precedes 1 min
    assert out[13] is None  # user 2's only right row is AFTER the left row


def test_asof_join_preserves_left_rows_and_one_shuffle(spark):
    left = spark.createDataFrame(
        [(i, i % 3, _ts(i)) for i in range(30)],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(u, _ts(-1), float(u)) for u in range(3)],
        "user_id bigint, ts timestamp_ntz, v double",
    )
    out = asof_join(left, right, "user_id", "ts", ["v"])
    assert out.count() == 30
    assert out.where(F.col("v_asof").isNull()).count() == 0
    # union-and-window plan: exactly one exchange (the window's key hash);
    # no join node at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_interval_join_window_and_buckets(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10.0)), (2, 2, _ts(10.0))],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (100, 1, _ts(9.0)),   # 60s before -> in window
            (101, 1, _ts(20.0)),  # 600s after -> boundary, inclusive
            (102, 1, _ts(20.001)),  # just past the window
            (103, 2, _ts(10.0)),  # other key, dt=0
            (104, 1, _ts(0.05)),  # 597s before, crosses a 600s bucket edge
        ],
        "event_id bigint, user_id bigint, ts timestamp_ntz",
    )
    from osm2world_spark.operators.temporal import interval_join

    out = interval_join(left, right, "user_id", "ts", 600.0)
    pairs = {(r["event_id"], r["r_event_id"]) for r in out.collect()}
    assert pairs == {(1, 100), (1, 101), (1, 104), (2, 103)}
    # bucketed equi-join, not a nested-loop range join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_sliding_window_stats(spark):
    import datetime as dt

    from osm2world_spark.operators.temporal import sliding_window_stats

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), "a", float(v))
        for m, v in [(5, 1.0), (35, 2.0), (65, 4.0)]
    ]
    events = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["w_start"].minute + 60 * r["w_start"].hour): (r["n_events"], r["sum_value"])
        for r in sliding_window_stats(events, 60, 30).collect()
    }
    # event@10:05 -> windows starting 09:30 and 10:00; @10:35 -> 10:00,
    # 10:30; @11:05 -> 10:30, 11:00
    assert out[9 * 60 + 30] == (1, 1.0)
    assert out[10 * 60] == (2, 3.0)
    assert out[10 * 60 + 30] == (2, 6.0)
    assert out[11 * 60] == (1, 4.0)
    # every event lands in exactly duration/slide windows
    total = sum(n for n, _ in out.values())
    assert total == len(rows) * 2


def test_sliding_window_rejects_ragged_slide(spark):
    import pytest as _pytest

    from osm2world_spark.operators.temporal import sliding_window_stats

    events = spark.createDataFrame([], "ts timestamp, event_type string, value double")
    with _pytest.raises(ValueError):
        sliding_window_stats(events, 60, 45)
