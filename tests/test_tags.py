"""Tag ruleset predicate tests (HardcodedRuleset semantics)."""

from pyspark.sql import functions as F


def _tags_df(spark, rows):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(rows)], "id int, tags map<string,string>"
    )


def test_is_area_tagged(spark):
    from osm2world_spark.functions.tags import is_area_tagged

    rows = [
        {"building": "yes"},                 # area key -> True
        {"area": "yes"},                     # area tag -> True
        {"natural": "water"},                # (key,value) area tag -> True
        {"natural": "cliff"},                # not an area value -> False
        {"highway": "residential"},          # not area -> False
        {"building": "yes", "area": "no"},   # explicit area=no -> False
        {"leisure": "pitch"},                # both key and tag -> True
    ]
    df = _tags_df(spark, rows).withColumn("a", is_area_tagged(F.col("tags")))
    got = [r["a"] for r in df.orderBy("id").collect()]
    assert got == [True, True, True, False, False, False, True]


def test_land_sea_tags(spark):
    from osm2world_spark.functions.tags import is_land_tagged, is_sea_tagged

    rows = [
        {"landuse": "forest"},
        {"route": "ferry"},
        {"wetland": "tidalflat"},
        {"landuse": "residential"},
    ]
    df = _tags_df(spark, rows).select(
        "id",
        is_land_tagged(F.col("tags")).alias("land"),
        is_sea_tagged(F.col("tags")).alias("sea"),
    )
    got = [(r["land"], r["sea"]) for r in df.orderBy("id").collect()]
    assert got == [(True, False), (False, True), (False, True), (False, False)]


def test_is_relevant_relation(spark):
    from osm2world_spark.functions.tags import is_relevant_relation

    rows = [
        {"type": "multipolygon", "building": "yes"},        # mp with main tag
        {"type": "multipolygon", "place": "sea"},           # mp without -> False (the perf filter)
        {"type": "multipolygon", "natural": "water"},       # mp natural=water
        {"type": "multipolygon", "natural": "cliff"},       # wrong value -> False
        {"type": "bridge"},                                  # whitelist
        {"type": "route"},                                   # not whitelisted
    ]
    df = _tags_df(spark, rows).withColumn("r", is_relevant_relation(F.col("tags")))
    got = [r["r"] for r in df.orderBy("id").collect()]
    assert got == [True, False, True, False, True, False]


def test_interpolator_dispatch(spark):
    from osm2world_spark.operators.knn import interpolate

    sites = spark.createDataFrame(
        [(f"s{i}", float(i % 5) * 30.0, float(i // 5) * 30.0, 7.0) for i in range(25)],
        "s_id string, x double, z double, y double",
    )
    # off-grid query point: IDW weight d^-p diverges at d == 0 (the
    # reference has the same pole at exact site positions)
    queries = spark.createDataFrame([("q", 61.0, 59.0)], "q_id string, x double, z double")
    for method in ("idw", "linear", "leastsquares"):
        rows = interpolate(queries, sites, method=method).collect()
        assert len(rows) == 1 and abs(rows[0]["ele"] - 7.0) < 1e-9, method
    try:
        interpolate(queries, sites, method="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
