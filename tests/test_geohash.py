"""Geohash codec: agreement with an independent bisection reference,
known public anchor hashes, prefix-hierarchy property, and the
encode->decode->encode roundtrip."""

from pyspark.sql import functions as F

from osm2world_spark.functions.cells import GEOHASH32, geohash_decode, geohash_encode


def _ref_geohash(lat, lon, precision):
    """Classic bisection implementation (independent of the bit-shift
    form under test)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, "", True
    val = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                val = (val << 1) | 1
                lon_lo = mid
            else:
                val = val << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                val = (val << 1) | 1
                lat_lo = mid
            else:
                val = val << 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out += GEOHASH32[val]
            bits, val = 0, 0
    return out


POINTS = [
    (48.86, 2.35),      # Paris
    (-33.8568, 151.2153),
    (0.0, 0.0),
    (89.999, 179.999),
    (-89.999, -179.999),
    (48.56687, 13.45127),  # the repo's golden tile vector
]


def test_geohash_matches_reference_and_anchor(spark):
    df = spark.createDataFrame(POINTS, "lat double, lon double")
    got = {
        (r["lat"], r["lon"]): r["gh"]
        for r in df.select("lat", "lon", geohash_encode(F.col("lat"), F.col("lon"), 7).alias("gh")).collect()
    }
    for lat, lon in POINTS:
        assert got[(lat, lon)] == _ref_geohash(lat, lon, 7), (lat, lon)
    # public anchor: geohash of (48.86, 2.35) starts with u09
    assert got[(48.86, 2.35)].startswith("u09")


def test_geohash_prefix_hierarchy(spark):
    df = spark.createDataFrame(POINTS, "lat double, lon double")
    out = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 4).alias("g4"),
        geohash_encode(F.col("lat"), F.col("lon"), 7).alias("g7"),
    ).collect()
    assert all(r["g7"].startswith(r["g4"]) for r in out)


def test_geohash_roundtrip(spark):
    df = spark.createDataFrame(POINTS, "lat double, lon double")
    dec = geohash_decode(geohash_encode(F.col("lat"), F.col("lon"), 8), 8)
    out = df.select("lat", "lon", dec.alias("d")).collect()
    for r in out:
        assert abs(r["d"]["lat"] - r["lat"]) <= r["d"]["lat_err"] * 1.0000001
        assert abs(r["d"]["lon"] - r["lon"]) <= r["d"]["lon_err"] * 1.0000001
    # decode->encode is identity on the center point
    back = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 8).alias("gh"),
    ).select(
        "gh",
        geohash_encode(
            geohash_decode(F.col("gh"), 8)["lat"],
            geohash_decode(F.col("gh"), 8)["lon"],
            8,
        ).alias("gh2"),
    ).collect()
    assert all(r["gh"] == r["gh2"] for r in back)


def test_geohash_plan_is_projection(spark):
    df = spark.createDataFrame(POINTS, "lat double, lon double")
    plan = (
        df.select(geohash_encode(F.col("lat"), F.col("lon"), 6).alias("gh"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_geohash_decode_invalid_is_null(spark):
    df = spark.createDataFrame(
        [("u09t",), ("u09tuq",), ("uXyzzy",), ("u09tua",)], "gh string"
    )
    out = {r["gh"]: r["d"] for r in df.select("gh", geohash_decode(F.col("gh"), 6).alias("d")).collect()}
    assert out["u09tuq"]["lat"] is not None
    assert out["u09t"]["lat"] is None          # too short
    assert out["uXyzzy"]["lat"] is None        # uppercase not in alphabet
    assert out["u09tua"]["lat"] is None        # 'a' not in geohash32


def test_haversine_reference_points(spark):
    import math

    from osm2world_spark.functions.projection import haversine_m

    def ref(lat1, lon1, lat2, lon2):
        r = 6371008.8
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    pairs = [
        (48.8566, 2.3522, 51.5074, -0.1278),   # Paris -> London
        (0.0, 0.0, 0.0, 180.0),                # antipodal on equator
        (48.56687, 13.45127, 48.56688, 13.45128),  # ~1.3 m apart
        (90.0, 0.0, -90.0, 0.0),
    ]
    df = spark.createDataFrame(pairs, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for (r, p) in zip(got, pairs):
        assert abs(r["d"] - ref(*p)) < 1e-6
    # Paris -> London is ~343.5 km
    assert abs(got[0]["d"] - 343_500) < 1_500
    # poles: half the circumference of the sphere
    import math as m
    assert abs(got[3]["d"] - m.pi * 6371008.8) < 1e-3
