"""S5 bounded reader views + §2.9 strategy registry."""

import pytest
from pyspark.sql import functions as F

from osm2world_spark import registry
from osm2world_spark.sources.views import BoundedView, tile_bounds


# ------------------------------------------------------------------ registry


def test_registry_aliases_resolve_same_factory():
    # the reference's Java class names keep working as config strings
    # (O2WConfig.java:511-518 switch arms)
    assert registry.resolve("interpolator", "LeastSquaresInterpolator") is (
        registry.resolve("interpolator", "leastsquares")
    )
    assert registry.resolve("projection", "OrthographicAzimuthalMapProjection") is (
        registry.resolve("projection", "ortho")
    )


def test_registry_unknown_lists_available():
    with pytest.raises(ValueError) as e:
        registry.resolve("interpolator", "cubic-hermite")
    assert "leastsquares" in str(e.value)
    with pytest.raises(ValueError):
        registry.resolve("no-such-category", "x")


def test_registry_user_override_shadows_builtin():
    sentinel = object()
    original = registry.resolve("dedup", "exact")
    try:
        registry.register("dedup", "exact", lambda df: sentinel)
        assert registry.resolve("dedup", "EXACT")(None) is sentinel
    finally:
        registry.register("dedup", "exact", original)
    assert registry.resolve("dedup", "exact") is original


def test_registry_dispatch_reaches_operator(spark):
    # end-to-end: a config string picks the implementation that runs
    sites = spark.createDataFrame(
        [("a", 0.0, 0.0, 7.0), ("b", 100.0, 0.0, 7.0), ("c", 0.0, 100.0, 7.0)],
        "s_id string, x double, z double, y double",
    )
    queries = spark.createDataFrame([("q", 40.0, 30.0)], "q_id string, x double, z double")
    from osm2world_spark.operators.knn import interpolate

    row = interpolate(queries, sites, method="LinearInterpolator").first()
    assert abs(row["ele"] - 7.0) < 1e-9


# -------------------------------------------------------------- bounded view


def _points(spark):
    rows = [(i, 48.0 + i * 0.1, 13.0 + i * 0.1) for i in range(10)]
    return spark.createDataFrame(rows, "key bigint, lat double, lon double")


def test_bounds_and_tile_are_exclusive(spark):
    with pytest.raises(ValueError):
        BoundedView(_points(spark), bounds=(0, 0, 1, 1), tile=(12, 1, 1))


def test_bounded_point_data_and_cache(spark):
    view = BoundedView(_points(spark), bounds=(48.15, 13.15, 48.55, 13.55), name="v_pts")
    df = view.data()
    assert sorted(r["key"] for r in df.collect()) == [2, 3, 4, 5]
    assert df.is_cached
    assert view.data() is df  # read-once cache, OSMDataReaderView.java:55-69
    # the named view serves SQL over the same materialization
    n = spark.sql("SELECT count(*) AS n FROM v_pts").first()["n"]
    assert n == 4
    view.release()
    assert not df.is_cached
    assert "v_pts" not in [t.name for t in spark.catalog.listTables()]


def test_bbox_rows_use_intersection_semantics(spark):
    elems = spark.createDataFrame(
        [
            (1, 48.00, 13.00, 48.10, 13.10),  # fully inside
            (2, 48.05, 13.05, 48.30, 13.30),  # straddles the bound
            (3, 48.50, 13.50, 48.60, 13.60),  # outside
        ],
        "id bigint, minlat double, minlon double, maxlat double, maxlon double",
    )
    view = BoundedView(elems, bounds=(47.9, 12.9, 48.2, 13.2), cache=False)
    assert sorted(r["id"] for r in view.data().collect()) == [1, 2]


def test_tile_bound_and_reported_bounds(spark):
    b = tile_bounds(12, 2200, 1343)
    view = BoundedView(_points(spark), tile=(12, 2200, 1343), cache=False)
    assert view.bounds() == b
    got = view.data()
    manual = _points(spark).where(
        (F.col("lat") >= b[0]) & (F.col("lat") < b[2])
        & (F.col("lon") >= b[1]) & (F.col("lon") < b[3])
    )
    assert sorted(r["key"] for r in got.collect()) == sorted(
        r["key"] for r in manual.collect()
    )


def test_extent_fallback_bounds(spark):
    view = BoundedView(_points(spark), cache=False)
    minlat, minlon, maxlat, maxlon = view.bounds()
    assert (minlat, minlon) == (48.0, 13.0)
    assert abs(maxlat - 48.9) < 1e-9 and abs(maxlon - 13.9) < 1e-9


def test_bound_pushes_into_parquet_scan(spark, tmp_path):
    # the whole point of expressing the bound as a WHERE clause: it must
    # reach the file scan as PushedFilters, not trim rows post-read
    path = str(tmp_path / "pts")
    _points(spark).write.parquet(path)
    view = BoundedView(spark.read.parquet(path), bounds=(48.1, 13.1, 48.5, 13.5), cache=False)
    plan = view.data()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(lat,48.1" in plan
