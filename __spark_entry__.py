"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline (documents -> elements -> tile
assignment + typed-overlap spatial self-join) on sf0.001.

`queries()` exposes one entry per implemented operator family from
SURVEY.md section 2; `oracle_sql()` carries the DuckDB-equivalent ANSI SQL.
Geometry inputs are derived *deterministically from the driver tables* via
integer arithmetic that both engines evaluate identically (same op tree,
same doubles), so the oracle comparison is bit-exact for integer outputs
and round(6)-stable for floating aggregates.

Queries without an oracle entry (the driver records a rows-only check) are
the genuinely non-SQL-expressible ops — the cell encoders (the S2 Hilbert
walk has no DuckDB analogue), the Sibson/Delaunay interpolator, and the
iterative k-means IVF codebook; each is pinned by a brute-force numpy /
golden-parquet pytest oracle instead. Everything else is hash-checked,
including the distributed ops verified through equivalent closed forms:
the spatial self-join's typed pair set over axis-aligned fixtures,
MinHash-LSH under a portable md5 hash family, sign-LSH ANN with inlined
hyperplane literals, LSQ elevation under the linear-precision property,
triangulation via Euler/shoelace invariants, and the ring/coastline
assemblers on closed-form synthetic relations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

# Deterministic geometry derivations, shared verbatim with the oracle SQL
# (identical op tree => identical IEEE doubles in both engines). Every
# fractional literal is CAST(... AS DOUBLE): both Spark 4 and DuckDB parse
# bare decimal literals as DECIMAL, and their decimal division semantics
# differ — forcing doubles keeps the arithmetic bit-identical.
LAT = "CAST(48.52 AS DOUBLE) + ((({k}) * 2654435761) % 100000) / CAST(100000 AS DOUBLE) * CAST(0.10 AS DOUBLE)"
LON = "CAST(13.37 AS DOUBLE) + ((({k}) * 40503) % 100000) / CAST(100000 AS DOUBLE) * CAST(0.13 AS DOUBLE)"
X_M = "((({k}) * 2654435761) % 100000) / CAST(10 AS DOUBLE)"
Z_M = "((({k}) * 40503) % 100000) / CAST(10 AS DOUBLE)"
DLAT = "CAST(0.0005 AS DOUBLE) + ((({k}) * 13) % 40) / CAST(20000 AS DOUBLE)"
DLON = "CAST(0.0008 AS DOUBLE) + ((({k}) * 29) % 40) / CAST(12000 AS DOUBLE)"
RLAT = "(CAST(48.52 AS DOUBLE) + (py + CAST(0.5 AS DOUBLE)) / CAST(3000 AS DOUBLE))"
RLON = "(CAST(13.37 AS DOUBLE) + (px + CAST(0.5 AS DOUBLE)) / CAST(3000 AS DOUBLE))"

TX14 = "cast(floor(({lon} + 180.0) / 360.0 * 16384) as int)"
TY14 = "cast(floor((1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat}))) / pi()) / 2.0 * 16384) as int)"

# simplify_ring geometry: a rectangle (w x h) with four perturbed edge
# midpoints, vertex order A Mb B Mr C Mt D Ml (counterclockwise). The
# perpendicular midpoint offsets db/dr/dl sweep across the 0.05-tolerance
# deletion threshold (|dot-1| < tol <=> offset < ~0.16 * half-edge) with k,
# Mt is exactly collinear (deleted at every tolerance), and the deleted
# bulge area crosses the 10% retry threshold for large-offset keys. The
# same coordinate strings build the ring in Spark and the vertex table in
# DuckDB, so every branch input is bit-identical.
_SR_W = "CAST(40 + k % 13 AS DOUBLE)"
_SR_H = "CAST(30 + (k * 3) % 11 AS DOUBLE)"
_SR_DB = f"({_SR_W} / 2 * (CAST(0.05 AS DOUBLE) + CAST(0.25 AS DOUBLE) * CAST(k % 7 AS DOUBLE) / CAST(6 AS DOUBLE)))"
_SR_DR = f"({_SR_H} / 2 * (CAST(0.05 AS DOUBLE) + CAST(0.25 AS DOUBLE) * CAST((k * 3) % 5 AS DOUBLE) / CAST(4 AS DOUBLE)))"
_SR_DL = f"({_SR_H} / 2 * (CAST(0.02 AS DOUBLE) + CAST(0.2 AS DOUBLE) * CAST((k * 7) % 9 AS DOUBLE) / CAST(8 AS DOUBLE)))"
_SR_X0 = f"({X_M.format(k='k')})"
_SR_Z0 = f"({Z_M.format(k='k')})"
# per-vertex x/z as CASE over j (0..7); identical text on both sides
_SR_XS = (
    f"CASE j WHEN 0 THEN {_SR_X0} WHEN 1 THEN {_SR_X0} + {_SR_W} / 2"
    f" WHEN 2 THEN {_SR_X0} + {_SR_W} WHEN 3 THEN {_SR_X0} + {_SR_W} + {_SR_DR}"
    f" WHEN 4 THEN {_SR_X0} + {_SR_W} WHEN 5 THEN {_SR_X0} + {_SR_W} / 2"
    f" WHEN 6 THEN {_SR_X0} ELSE {_SR_X0} - {_SR_DL} END"
)
_SR_ZS = (
    f"CASE j WHEN 0 THEN {_SR_Z0} WHEN 1 THEN {_SR_Z0} - {_SR_DB}"
    f" WHEN 2 THEN {_SR_Z0} WHEN 3 THEN {_SR_Z0} + {_SR_H} / 2"
    f" WHEN 4 THEN {_SR_Z0} + {_SR_H} WHEN 5 THEN {_SR_Z0} + {_SR_H}"
    f" WHEN 6 THEN {_SR_Z0} + {_SR_H} ELSE {_SR_Z0} + {_SR_H} / 2 END"
)

# convex_hull geometry: radial star polygons (r(theta) single-valued =>
# weakly externally visible => the reference's Sklansky chain equals the
# true hull, which the oracle gift-wraps); odd keys reverse the angular
# direction to exercise the counterclockwise branch
_CH_M = "(8 + k % 5)"
_CH_TH = (
    f"(CAST(2 AS DOUBLE) * pi() * CAST(j AS DOUBLE) / CAST({_CH_M} AS DOUBLE)"
    " * (CASE WHEN k % 2 = 1 THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)"
    " + CAST(k % 89 AS DOUBLE) / CAST(89 AS DOUBLE))"
)
_CH_R = (
    "(CAST(15 + k % 11 AS DOUBLE)"
    " + CAST((k * 37 + j * 101) % 1000 AS DOUBLE) / CAST(1000 AS DOUBLE) * CAST(12 AS DOUBLE))"
)
# cos/sin are NOT bit-identical between java.lang.Math and libm, so snap
# the generated coordinates to a 1/1024 grid (floor + exact power-of-two
# division): after the snap both engines hold bit-identical doubles and
# every downstream hull branch input matches exactly
_CH_X = (
    f"(floor(({X_M.format(k='k')} + {_CH_R} * cos({_CH_TH}))"
    " * CAST(1024 AS DOUBLE)) / CAST(1024 AS DOUBLE))"
)
_CH_Z = (
    f"(floor(({Z_M.format(k='k')} + {_CH_R} * sin({_CH_TH}))"
    " * CAST(1024 AS DOUBLE)) / CAST(1024 AS DOUBLE))"
)

# Shared path-length bound for the weighted shortest-path pair: the engine's
# Bellman-Ford max_rounds and the oracle's recursive-CTE hop cutoff explore
# exactly the paths of <= NET_MAX_ROUNDS edges, so both truncate identically
# on graphs whose shortest paths need more hops.
NET_MAX_ROUNDS = 8

# fixed fixture polygons for the PIP-membership query (closed rings,
# lat/lon plane). poly 3 is concave.
PIP_POLYGONS = {
    1: [(48.53, 13.38), (48.53, 13.43), (48.57, 13.43), (48.57, 13.38), (48.53, 13.38)],
    2: [(48.58, 13.44), (48.58, 13.49), (48.61, 13.49), (48.58, 13.44)],
    3: [(48.54, 13.44), (48.54, 13.49), (48.575, 13.49), (48.575, 13.465),
        (48.555, 13.465), (48.555, 13.44), (48.54, 13.44)],
}


# the z12 tile bounding the bounded_view driver query (covers roughly the
# SW half of the synthetic point cloud); both the Spark query and the
# DuckDB oracle derive their predicate from this one tuple
BOUNDED_VIEW_TILE = (12, 2200, 1414)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _points(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        F.col(key).alias("key"),
        F.expr(LAT.format(k=key)).alias("lat"),
        F.expr(LON.format(k=key)).alias("lon"),
    )


def _pip_udf(packed: list[float]):
    """Ray-cast membership UDF for one fixed polygon (factory: pandas_udf
    type-hint inference rejects extra default args, so close over
    `packed`)."""
    import pandas as pd
    from pyspark.sql.types import BooleanType

    def inside(lon, lat):
        from osm2world_spark.functions.geometry import contains_point, flatten

        flat = flatten([[packed]] * len(lon))
        return pd.Series(contains_point(lon.values, lat.values, flat))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve from a nested scope — set real objects
    inside.__annotations__ = {"lon": pd.Series, "lat": pd.Series, "return": pd.Series}
    return F.pandas_udf(inside, BooleanType())


def _canon_safe(df: DataFrame) -> DataFrame:
    """Project complex-typed columns (array/struct/map) through to_json so
    the driver's pandas-side canonicalizer (sort_values + factorize) can
    hash them — lists aren't hashable in pandas. Operators keep returning
    typed arrays; only the driver-facing query surface stringifies."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _planar(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        F.col(key).alias("key"),
        F.expr(X_M.format(k=key)).alias("x"),
        F.expr(Z_M.format(k=key)).alias("z"),
    )


# ----------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: driver documents -> interleaved geo documents -> elements
    -> z12/z14 tile assignment joined with the typed-overlap self-join
    summary. Returns per-tile counts (stable schema, >= 0 rows)."""
    from osm2world_spark.sources.documents import extract_elements
    from osm2world_spark.operators.tiling import assign_tiles
    from osm2world_spark.operators.spatial_join import spatial_self_join

    sf_dir = "/root/testdata/sf0.001"
    docs = _geo_docs_from_driver_documents(spark, sf_dir)
    elements = extract_elements(docs).cache()
    tiles = assign_tiles(elements, with_cells=True)
    overlaps = spatial_self_join(elements)
    tile_counts = tiles.groupBy("zoom", "tile_x", "tile_y").agg(
        F.count("*").alias("n_elements"),
        F.countDistinct("h3_r9").alias("n_hex_cells"),
        F.countDistinct("s2_l13").alias("n_s2_cells"),
    )
    ov_counts = overlaps.groupBy("overlap_kind").agg(F.count("*").alias("n"))
    total_overlaps = ov_counts.agg(F.sum("n").alias("n_overlaps")).select(
        F.lit(1).alias("join_key"), "n_overlaps"
    )
    return (
        tile_counts.withColumn("join_key", F.lit(1))
        .join(total_overlaps, "join_key")
        .drop("join_key")
        .orderBy("zoom", "tile_x", "tile_y")
    )


def _geo_docs_from_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build interleaved text+geo documents FROM the driver documents
    table: the text span carries the original text (span-sequence source of
    truth); geo spans are derived from doc_id arithmetic."""
    d = _t(spark, sf_dir, "documents")
    lat = F.expr(LAT.format(k="doc_id"))
    lon = F.expr(LON.format(k="doc_id"))
    lat2 = F.expr(LAT.format(k="doc_id * 7 + 3"))
    lon2 = F.expr(LON.format(k="doc_id * 7 + 3"))
    point = F.concat_ws(",", F.format_number(lat, 7), F.format_number(lon, 7))
    way = F.concat_ws(
        " ",
        F.concat_ws(",", F.format_number(lat, 7), F.format_number(lon, 7)),
        F.concat_ws(",", F.format_number(lat2, 7), F.format_number(lon2, 7)),
    )
    dla, dlo = 0.0006, 0.0009
    area = F.concat_ws(
        " ",
        F.concat_ws(",", F.format_number(lat - dla, 7), F.format_number(lon - dlo, 7)),
        F.concat_ws(",", F.format_number(lat - dla, 7), F.format_number(lon + dlo, 7)),
        F.concat_ws(",", F.format_number(lat + dla, 7), F.format_number(lon + dlo, 7)),
        F.concat_ws(",", F.format_number(lat + dla, 7), F.format_number(lon - dlo, 7)),
        F.concat_ws(",", F.format_number(lat - dla, 7), F.format_number(lon - dlo, 7)),
    )
    kind2 = F.element_at(
        F.array(F.lit("geo_point"), F.lit("geo_way"), F.lit("geo_area")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    geo_text = (
        F.when(kind2 == "geo_point", point).when(kind2 == "geo_way", way).otherwise(area)
    )
    return d.select(
        F.concat(F.lit("doc_"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                kind2.alias("kind"),
                geo_text.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("media payload").alias("text"),
                F.concat(F.lit("media://"), F.md5(F.col("text"))).alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
        ).alias("spans"),
    )


# --------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- P3: point tile assignment (TileNumber.atLatLon)
    def tile_points_z14(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        return (
            pts.select(
                T.tile_x_at(F.col("lon"), 14).alias("tile_x"),
                T.tile_y_at(F.col("lat"), 14).alias("tile_y"),
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_points"))
        )

    q["tile_points_z14"] = tile_points_z14

    # --- P5: ancestor roll-up (TileNumber.ancestor)
    def tile_ancestor_z12(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        anc = T.ancestor_xy(
            T.tile_x_at(F.col("lon"), 14), T.tile_y_at(F.col("lat"), 14), 14, 12
        )
        return (
            pts.select(anc["x"].alias("tile_x"), anc["y"].alias("tile_y"))
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_points"))
        )

    q["tile_ancestor_z12"] = tile_ancestor_z12

    # --- P4: bbox tile cover (TileNumber.tilesForBounds)
    def tile_cover_z14(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "customer"), "c_custkey")
        dlat = F.expr(DLAT.format(k="key"))
        dlon = F.expr(DLON.format(k="key"))
        cover = T.tiles_for_bounds(
            14, F.col("lat") - dlat, F.col("lon") - dlon, F.col("lat") + dlat, F.col("lon") + dlon
        )
        return pts.select(F.col("key").alias("c_custkey"), F.explode(cover).alias("t")).select(
            "c_custkey", F.col("t.x").alias("tile_x"), F.col("t.y").alias("tile_y")
        )

    q["tile_cover_z14"] = tile_cover_z14

    # --- string codec + TMS flip (TileNumber PATTERN, flippedY)
    def tile_codec(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        tx = T.tile_x_at(F.col("lon"), 14)
        ty = T.tile_y_at(F.col("lat"), 14)
        return pts.select(
            F.col("key").alias("o_orderkey"),
            T.format_tile(F.lit(14), tx, ty, "/").alias("tile_str"),
            T.flipped_y(F.lit(14), ty).alias("tms_y"),
        )

    q["tile_codec"] = tile_codec

    # --- tile -> latLonBounds (tile2lat/tile2lon)
    def tile_bounds(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "customer"), "c_custkey")
        tiles = pts.select(
            T.tile_x_at(F.col("lon"), 14).alias("tile_x"),
            T.tile_y_at(F.col("lat"), 14).alias("tile_y"),
        ).distinct()
        b = T.tile_lat_lon_bounds(F.lit(14), F.col("tile_x"), F.col("tile_y"))
        return tiles.select(
            "tile_x",
            "tile_y",
            F.round(b["minlat"], 9).alias("minlat"),
            F.round(b["minlon"], 9).alias("minlon"),
            F.round(b["maxlat"], 9).alias("maxlat"),
            F.round(b["maxlon"], 9).alias("maxlon"),
        )

    q["tile_bounds"] = tile_bounds

    # --- S5: bounded reader view — customer points limited to one z12
    # tile (OSMDataReaderView semantics: bound -> WHERE -> scan pushdown,
    # parse-once cache), then a per-z14-tile rollup of the bounded region
    def bounded_view(spark, sf_dir):
        from osm2world_spark.functions import tiles as T
        from osm2world_spark.sources.views import BoundedView

        pts = _points(_t(spark, sf_dir, "customer"), "c_custkey")
        view = BoundedView(pts, tile=BOUNDED_VIEW_TILE)
        return (
            view.data()
            .select(
                T.tile_x_at(F.col("lon"), 14).alias("tile_x"),
                T.tile_y_at(F.col("lat"), 14).alias("tile_y"),
                "key",
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_points"), F.sum("key").alias("sum_key"))
        )

    q["bounded_view"] = bounded_view

    # --- P8/P9: point-in-polygon membership over the real ray-cast kernel
    def pip_membership(spark, sf_dir):
        pts = _points(_t(spark, sf_dir, "customer"), "c_custkey")
        out = None
        for pid, ring in PIP_POLYGONS.items():
            packed = [c for p in ring for c in (p[1], p[0])]  # x=lon, z=lat
            inside = _pip_udf(packed)
            part = pts.where(inside(F.col("lon"), F.col("lat"))).select(
                F.col("key").alias("c_custkey"), F.lit(pid).alias("poly_id")
            )
            out = part if out is None else out.unionByName(part)
        return out

    q["pip_membership"] = pip_membership

    # --- J7: exact kNN (ring expansion) — customer queries x supplier sites
    def knn9(spark, sf_dir):
        from osm2world_spark.operators.knn import knn_join

        queries_df = _planar(_t(spark, sf_dir, "customer"), "c_custkey").select(
            F.col("key").alias("q_id"), "x", "z"
        )
        sites = _planar(_t(spark, sf_dir, "supplier"), "s_suppkey").select(
            F.col("key").alias("s_id"), "x", "z"
        )
        nn = knn_join(queries_df, sites, k=9, cell_size=500.0)
        return nn.select("q_id", "rank", "s_id", F.round("dist", 6).alias("dist_r"))

    q["knn9"] = knn9

    # --- J8: fixed-radius IDW join
    def idw300(spark, sf_dir):
        from osm2world_spark.operators.knn import idw_join

        queries_df = _planar(_t(spark, sf_dir, "customer"), "c_custkey").select(
            F.col("key").alias("q_id"), "x", "z"
        )
        sites = _planar(_t(spark, sf_dir, "supplier"), "s_suppkey").join(
            _t(spark, sf_dir, "supplier").select("s_suppkey", F.col("s_acctbal").alias("y")),
            F.col("key") == F.col("s_suppkey"),
        ).select(F.col("key").alias("s_id"), "x", "z", "y")
        return idw_join(queries_df, sites, cutoff=300.0, exponent=2.0).select(
            "q_id", F.round("ele", 6).alias("ele_r")
        )

    q["idw300"] = idw300

    # --- J10: raster -> tile zonal aggregation (integer-exact)
    def raster_zonal(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        n = 300
        px = (F.col("id") % n).cast("int")
        py = F.floor(F.col("id") / n).cast("int")
        grid = spark.range(n * n).select(
            px.alias("px"),
            py.alias("py"),
            ((F.col("id") % n) * 7919 + F.floor(F.col("id") / n) * 104729).cast("bigint").alias("raw"),
        )
        grid = grid.withColumn("elev", F.col("raw") % 1000).drop("raw")
        lat = F.expr(RLAT)
        lon = F.expr(RLON)
        return (
            grid.select(
                T.tile_x_at(lon, 14).alias("tile_x"),
                T.tile_y_at(lat, 14).alias("tile_y"),
                "elev",
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_px"), F.sum("elev").alias("sum_elev"))
        )

    q["raster_zonal"] = raster_zonal

    # --- J3/J12: segment x segment intersection positions (pure Column)
    def ww_intersections(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        seg = o.select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_orderkey") % 97).alias("bucket"),
            F.expr(X_M.format(k="o_orderkey")).alias("x1"),
            F.expr(Z_M.format(k="o_orderkey")).alias("z1"),
            F.expr(X_M.format(k="o_orderkey * 3 + 1")).alias("x2"),
            F.expr(Z_M.format(k="o_orderkey * 3 + 1")).alias("z2"),
        )
        a = seg.alias("a")
        b = seg.alias("b")
        vx = F.col("a.x2") - F.col("a.x1")
        vz = F.col("a.z2") - F.col("a.z1")
        qx = F.col("b.x2") - F.col("b.x1")
        qz = F.col("b.z2") - F.col("b.z1")
        denom = vz * qx - vx * qz
        amcx = F.col("b.x1") - F.col("a.x1")
        amcz = F.col("b.z1") - F.col("a.z1")
        t = (amcz * qx - amcx * qz) / denom
        s = (amcz * vx - amcx * vz) / denom
        hit = (F.abs(denom) > 0.0001) & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1)
        return (
            a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.key") < F.col("b.key")))
            .where(hit)
            .select(
                F.col("a.key").alias("a_key"),
                F.col("b.key").alias("b_key"),
                # mm fixed-point snap (floor(v*1000+0.5), the reference's
                # Math.round idiom) — cross-engine-stable unlike round()
                F.floor((F.col("a.x1") + t * vx) * 1000.0 + 0.5).cast("bigint").alias("ix_mm"),
                F.floor((F.col("a.z1") + t * vz) * 1000.0 + 0.5).cast("bigint").alias("iz_mm"),
            )
        )

    q["ww_intersections"] = ww_intersections

    # --- J12: sweep-and-prune all-intersections (LineSegmentIntersection-
    # Finder semantics, short road-like segments). cell_size mode: segments
    # replicate into every overlapped 500 m cell and crossings dedup by the
    # cell owning the intersection point, so pairs straddling cell
    # boundaries ARE reported — the oracle is the lossless all-pairs
    # interval-overlap join.
    def sweep_intersections_q(spark, sf_dir):
        from osm2world_spark.operators.sweep import sweep_intersections

        o = _t(spark, sf_dir, "orders")
        # dense 1 km square of short segments — the road-network shape
        x1 = F.expr("((o_orderkey * 2654435761) % 100000) / CAST(100 AS DOUBLE)")
        z1 = F.expr("((o_orderkey * 40503) % 100000) / CAST(100 AS DOUBLE)")
        dx = F.expr("((o_orderkey * 7) % 200 - 100) / CAST(10 AS DOUBLE)")
        dz = F.expr("((o_orderkey * 11) % 200 - 100) / CAST(10 AS DOUBLE)")
        seg = o.select(
            F.col("o_orderkey").alias("key"),
            x1.alias("x1"), z1.alias("z1"),
            (x1 + dx).alias("x2"), (z1 + dz).alias("z2"),
        )
        # cell 100 m on the 1 km extent: ~100 independent groups (vs 4-9 at
        # 500 m, which starved a 32-core run); crossings are cell-size-
        # invariant (complete mode dedups by owning cell) — 2.2x measured
        return sweep_intersections(seg, cell_size=100.0)

    q["sweep_intersections"] = sweep_intersections_q

    # --- A1: extent aggregation
    def extent_agg(spark, sf_dir):
        c = _t(spark, sf_dir, "customer")
        pts = c.select(
            "c_nationkey",
            F.expr(LAT.format(k="c_custkey")).alias("lat"),
            F.expr(LON.format(k="c_custkey")).alias("lon"),
        )
        return pts.groupBy("c_nationkey").agg(
            F.min("lat").alias("minlat"),
            F.max("lat").alias("maxlat"),
            F.min("lon").alias("minlon"),
            F.max("lon").alias("maxlon"),
            F.count("*").alias("n"),
        )

    q["extent_agg"] = extent_agg

    # --- A4/2.5: top-k per group via window
    def topk_orders(spark, sf_dir):
        from pyspark.sql import Window

        o = _t(spark, sf_dir, "orders")
        w = Window.partitionBy("o_orderpriority").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        return (
            o.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 5)
            .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
        )

    q["topk_orders"] = topk_orders

    # --- 2.6: anti-join (skip-existing tiles)
    def anti_join_tiles(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        cust = _points(_t(spark, sf_dir, "customer"), "c_custkey").select(
            T.tile_x_at(F.col("lon"), 14).alias("tile_x"),
            T.tile_y_at(F.col("lat"), 14).alias("tile_y"),
        ).distinct()
        supp = _points(_t(spark, sf_dir, "supplier"), "s_suppkey").select(
            T.tile_x_at(F.col("lon"), 14).alias("tile_x"),
            T.tile_y_at(F.col("lat"), 14).alias("tile_y"),
        ).distinct()
        return cust.join(supp, ["tile_x", "tile_y"], "left_anti")

    q["anti_join_tiles"] = anti_join_tiles

    # --- A3: grouped counting stats with cube (StatisticsOutput analogue)
    def stats_cube(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        return (
            d.cube("lang", "source")
            .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
            .select(
                F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
                F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
                "n_docs",
                "sum_chars",
            )
        )

    q["stats_cube"] = stats_cube

    # --- dedup: exact
    def dedup_exact(spark, sf_dir):
        from osm2world_spark.operators.dedup import exact_dup_groups

        d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        g = exact_dup_groups(d)
        return g.select(
            "fp_md5", "n_docs", F.concat_ws(",", F.col("doc_ids")).alias("doc_ids_str")
        )

    q["dedup_exact"] = dedup_exact

    # --- text: token stats
    def token_stats(spark, sf_dir):
        from osm2world_spark.operators.text import token_stats as ts

        return ts(_t(spark, sf_dir, "documents"))

    q["token_stats"] = token_stats

    # --- text: quality scoring
    def quality_score(spark, sf_dir):
        from osm2world_spark.operators.text import quality_score as qs

        return qs(_t(spark, sf_dir, "documents"))

    q["quality_score"] = quality_score

    # --- text: language id
    def lang_id(spark, sf_dir):
        from osm2world_spark.operators.text import lang_id as li

        return li(_t(spark, sf_dir, "documents"))

    q["lang_id"] = lang_id

    # --- text: fingerprint
    def fingerprint(spark, sf_dir):
        from osm2world_spark.operators.text import fingerprint as fp

        return fp(_t(spark, sf_dir, "documents"))

    q["fingerprint"] = fingerprint

    # --- dedup: n-gram jaccard pairs
    def ngram_jaccard(spark, sf_dir):
        from osm2world_spark.operators.dedup import ngram_jaccard_pairs

        d = _t(spark, sf_dir, "documents")
        return ngram_jaccard_pairs(d, threshold=0.05, n=3, group_col="source")

    q["ngram_jaccard"] = ngram_jaccard

    # --- dedup: simhash fingerprints
    def simhash(spark, sf_dir):
        from osm2world_spark.operators.dedup import simhash64

        return simhash64(_t(spark, sf_dir, "documents"))

    q["simhash"] = simhash

    # --- similarity: exact cosine top-k
    def cosine_topk(spark, sf_dir):
        from osm2world_spark.operators.similarity import cosine_topk as ct

        e = _t(spark, sf_dir, "embeddings")
        return ct(e.where(F.col("vec_id") < 20), e, k=5)

    q["cosine_topk"] = cosine_topk

    # --- span-sequence invariant: explode + reassemble == original
    def span_roundtrip(spark, sf_dir):
        d = _t(spark, sf_dir, "documents")
        spans = d.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("offset", "tok")
        )
        rebuilt = (
            spans.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("offset", "tok"))).alias("ps"))
            .select(
                "doc_id",
                F.concat_ws(" ", F.transform("ps", lambda p: p["tok"])).alias("rebuilt"),
            )
        )
        return rebuilt

    q["span_roundtrip"] = span_roundtrip

    # --- events: hourly grouped agg
    def events_hourly(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        return (
            e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        )

    q["events_hourly"] = events_hourly

    # hopping event-time windows (60 min / 30 min): the overlapping
    # sibling of the tumbling hourly roll-up
    def events_sliding(spark, sf_dir):
        from osm2world_spark.operators.temporal import sliding_window_stats

        return sliding_window_stats(_t(spark, sf_dir, "events"), 60, 30)

    q["events_sliding"] = events_sliding

    # batch twin of the watermarked stream-stream interval join: clicks
    # paired with same-user views in the preceding 10 minutes
    def event_correlation(spark, sf_dir):
        from osm2world_spark.streaming.ingest import stream_event_correlation

        e = _t(spark, sf_dir, "events")
        return stream_event_correlation(
            e.where(F.col("event_type") == "click"),
            e.where(F.col("event_type") == "view"),
            lookback_minutes=30.0,
        )

    q["event_correlation"] = event_correlation

    # --- temporal: gap-based sessionization roll-up (one-shuffle window plan)
    def sessionize_events(spark, sf_dir):
        from osm2world_spark.operators.temporal import session_stats

        return session_stats(_t(spark, sf_dir, "events"), gap_minutes=30.0)

    q["sessionize_events"] = sessionize_events

    # --- temporal: as-of join — each click gets the most recent prior error
    # value for the same user (union-and-window, O(|L|+|R|), one shuffle)
    def asof_events(spark, sf_dir):
        from osm2world_spark.operators.temporal import asof_join

        e = _t(spark, sf_dir, "events")
        clicks = e.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        # dedup right on (user_id, ts) so the latest-row choice is
        # deterministic for both engines
        errors = (
            e.where(F.col("event_type") == "error")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("err_value"))
        )
        out = asof_join(clicks, errors, "user_id", "ts", ["err_value"])
        return out.select(
            "event_id", "user_id", F.round(F.col("err_value_asof"), 6).alias("err_value_asof")
        )

    q["asof_events"] = asof_events

    # --- temporal: native session_window agg (the streaming-stateful
    # sibling of sessionize_events; merge rule is diff < gap, so the
    # exact-gap boundary splits — unlike sessionize's strictly-greater rule)
    def session_windows(spark, sf_dir):
        from osm2world_spark.streaming.ingest import stream_session_stats

        return stream_session_stats(_t(spark, sf_dir, "events"), gap_minutes=30.0)

    q["session_windows"] = session_windows

    # --- temporal: bucketed interval join (clicks x errors within 10 min,
    # same user) — cell-cover + refine, one dimension down from the
    # spatial join; never the per-key cartesian a range theta-join plans
    def interval_events(spark, sf_dir):
        from osm2world_spark.operators.temporal import interval_join

        e = _t(spark, sf_dir, "events")
        clicks = e.where(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = e.where(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        )
        out = interval_join(clicks, errors, "user_id", "ts", 600.0)
        return out.select(
            "event_id",
            F.col("r_event_id"),
            F.round(F.col("dt_sec"), 6).alias("dt_sec"),
        )

    q["interval_events"] = interval_events

    # --- A7: ordered collect per group
    def collect_sorted(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        return (
            e.groupBy("user_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("evs")
            )
            .select(
                "user_id",
                F.concat_ws(",", F.transform("evs", lambda p: p["event_type"])).alias("event_seq"),
            )
        )

    q["collect_sorted"] = collect_sorted

    # --- P1/P2: metric Mercator projection with mm snap (MetricMapProjection)
    def mercator_xz(spark, sf_dir):
        from osm2world_spark.functions.projection import to_lat, to_lon, to_x, to_z
        from osm2world_spark.sources.documents import DEFAULT_ORIGIN as ORG

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        x = to_x(F.col("lon"), ORG)
        z = to_z(F.col("lat"), ORG)
        return pts.select(
            F.col("key").alias("o_orderkey"),
            F.floor(x * 1000.0 + 0.5).cast("bigint").alias("x_mm"),
            F.floor(z * 1000.0 + 0.5).cast("bigint").alias("z_mm"),
            # inverse round-trip, snapped to 1e-9 deg
            F.floor(to_lat(z, ORG) * 1e9 + 0.5).cast("bigint").alias("lat_n9"),
            F.floor(to_lon(x, ORG) * 1e9 + 0.5).cast("bigint").alias("lon_n9"),
        )

    q["mercator_xz"] = mercator_xz

    # --- A2/P10: shoelace area + centroid + winding over the REAL numpy
    # kernel (ring_signed_area/ring_centroid, SimplePolygonXZ.java:664-672,
    # :214-236, :240-245); polygons are an L-shape scaled+translated by
    # integer key arithmetic so every vertex coordinate is an exact double
    def centroid_area(spark, sf_dir):
        import pandas as pd
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        base = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4), (0, 0)]
        c = _t(spark, sf_dir, "customer")
        s = (1 + F.col("c_custkey") % 7).cast("double")
        tx = ((F.col("c_custkey") * 31) % 1000).cast("double")
        tz = ((F.col("c_custkey") * 17) % 1000).cast("double")
        packed = F.array(*[v for px_, pz_ in base for v in (s * px_ + tx, s * pz_ + tz)])
        src = c.select(F.col("c_custkey"), packed.alias("ring"))

        out_schema = StructType(
            [
                StructField("c_custkey", LongType()),
                StructField("area_x2", LongType()),
                StructField("winding", StringType()),
                StructField("cx_u6", LongType()),
                StructField("cz_u6", LongType()),
            ]
        )

        def kernel(batches):
            import numpy as np

            from osm2world_spark.functions.geometry import (
                flatten,
                ring_centroid,
                ring_signed_area,
            )

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                flat = flatten([[r] for r in pdf["ring"]])
                signed = ring_signed_area(flat)
                cx, cz = ring_centroid(flat)
                yield pd.DataFrame(
                    {
                        "c_custkey": pdf["c_custkey"].values,
                        "area_x2": np.floor(2.0 * np.abs(signed) + 0.5).astype(np.int64),
                        "winding": np.where(signed > 0, "CCW", "CW"),
                        "cx_u6": np.floor(cx * 1e6 + 0.5).astype(np.int64),
                        "cz_u6": np.floor(cz * 1e6 + 0.5).astype(np.int64),
                    }
                )

        return src.mapInPandas(kernel, schema=out_schema)

    q["centroid_area"] = centroid_area

    # --- GeometryUtil interpolateBetween: equally spaced points on segments
    def polyline_interp(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        seg = o.select(
            F.col("o_orderkey"),
            F.expr(X_M.format(k="o_orderkey")).alias("x1"),
            F.expr(Z_M.format(k="o_orderkey")).alias("z1"),
            F.expr(X_M.format(k="o_orderkey * 3 + 1")).alias("x2"),
            F.expr(Z_M.format(k="o_orderkey * 3 + 1")).alias("z2"),
        )
        t = F.col("i").cast("double") / F.lit(4).cast("double")
        return seg.select(
            "o_orderkey",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("i"),
            "x1", "z1", "x2", "z2",
        ).select(
            "o_orderkey",
            F.col("i").cast("int").alias("i"),
            F.floor((F.col("x1") + (F.col("x2") - F.col("x1")) * t) * 1e6 + 0.5).cast("bigint").alias("px_u6"),
            F.floor((F.col("z1") + (F.col("z2") - F.col("z1")) * t) * 1e6 + 0.5).cast("bigint").alias("pz_u6"),
        )

    q["polyline_interp"] = polyline_interp

    # --- 2.7 string codecs: element-id (n1/w2/r3) + SRTM tile filename
    def codec_strings(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        etype = F.element_at(
            F.array(F.lit("n"), F.lit("w"), F.lit("r")),
            (F.col("o_orderkey") % 3 + 1).cast("int"),
        )
        eid = F.concat(etype, F.col("o_orderkey").cast("string"))
        lat = F.expr(LAT.format(k="o_orderkey"))
        lon = F.expr(LON.format(k="o_orderkey"))
        srtm = F.format_string(
            "N%02dE%03d.hgt", F.floor(lat).cast("int"), F.floor(lon).cast("int")
        )
        return o.select(
            F.col("o_orderkey"),
            eid.alias("eid_str"),
            F.regexp_extract(eid, r"^([nwr])(\d+)$", 1).alias("parsed_type"),
            F.regexp_extract(eid, r"^([nwr])(\d+)$", 2).cast("bigint").alias("parsed_id"),
            srtm.alias("srtm_name"),
        )

    q["codec_strings"] = codec_strings

    # --- P15: LOD-range filter (MeshStore.FilterLod / LODRange.contains)
    def lod_filter(spark, sf_dir):
        from osm2world_spark.functions.lod import filter_lod

        c = _t(spark, sf_dir, "customer")
        lmin = (F.col("c_custkey") % 4).cast("int")
        lmax = F.least(F.lit(4), lmin + (F.col("c_custkey") % 3).cast("int"))
        d = c.select("c_custkey", lmin.alias("lod_min"), lmax.alias("lod_max"))
        return filter_lod(d, target=2)

    q["lod_filter"] = lod_filter

    # --- A6: conversion-log head/tail truncation (O2WConverterImpl:478-489)
    def log_truncate(spark, sf_dir):
        from osm2world_spark.operators.logops import truncate_log

        e = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
        return truncate_log(e, ["ts", "event_id"], max_entries=100).select(
            "event_id", "event_type", "part"
        )

    q["log_truncate"] = log_truncate

    # --- S7/J1: broadcast dimension join (customer -> nation -> region)
    def dim_join_agg(spark, sf_dir):
        c = _t(spark, sf_dir, "customer")
        n = _t(spark, sf_dir, "nation")
        r = _t(spark, sf_dir, "region")
        return (
            c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("r_name")
            .agg(
                F.count("*").alias("n_cust"),
                F.sum(F.floor(F.col("c_acctbal") * 100.0 + 0.5).cast("bigint")).alias("sum_acct_cents"),
            )
        )

    q["dim_join_agg"] = dim_join_agg

    # --- J11: nearest-surface attachment join (min 3D distance)
    def nearest_attach_q(spark, sf_dir):
        from osm2world_spark.operators.attach import nearest_attach

        connectors = _planar(_t(spark, sf_dir, "customer"), "c_custkey").select(
            F.col("key").alias("c_id"), "x", F.lit(0.0).alias("y"), "z"
        )
        surfaces = _planar(_t(spark, sf_dir, "supplier"), "s_suppkey").select(
            F.col("key").alias("s_id"), "x", (F.col("key") % 50).cast("double").alias("y"), "z"
        )
        out = nearest_attach(connectors, surfaces, radius=500.0)
        return out.select(
            "c_id",
            "s_id",
            F.floor(F.col("dist_xz") * 1e6 + 0.5).cast("bigint").alias("dxz_u6"),
            F.floor(F.col("dist_3d") * 1e6 + 0.5).cast("bigint").alias("d3d_u6"),
        )

    q["nearest_attach"] = nearest_attach_q

    # --- P16: huge-area clip (shrinkHugeAreas) over the real SH kernel
    def huge_clip(spark, sf_dir):
        from osm2world_spark.operators.clip import shrink_huge_areas

        c = _planar(_t(spark, sf_dir, "customer"), "c_custkey")
        h = F.when(F.col("key") % 97 == 0, F.lit(20000.0)).otherwise(F.lit(40.0))
        nodes = c.select(
            F.col("key").cast("string").alias("doc_id"),
            F.lit(0).alias("span_idx"),
            F.lit("node").alias("element_type"),
            F.array(F.array(F.col("x"), F.col("z"))).alias("geom"),
            F.col("x").alias("minx"), F.col("z").alias("minz"),
            F.col("x").alias("maxx"), F.col("z").alias("maxz"),
        )
        areas = c.select(
            F.concat(F.lit("a"), F.col("key")).alias("doc_id"),
            F.lit(1).alias("span_idx"),
            F.lit("area").alias("element_type"),
            F.array(
                F.array(
                    F.col("x") - h, F.col("z") - h,
                    F.col("x") + h, F.col("z") - h,
                    F.col("x") + h, F.col("z") + h,
                    F.col("x") - h, F.col("z") + h,
                    F.col("x") - h, F.col("z") - h,
                )
            ).alias("geom"),
            (F.col("x") - h).alias("minx"), (F.col("z") - h).alias("minz"),
            (F.col("x") + h).alias("maxx"), (F.col("z") + h).alias("maxz"),
        )
        out = shrink_huge_areas(nodes.unionByName(areas))
        return out.where(F.col("element_type") == "area").select(
            F.col("doc_id"),
            F.col("clipped"),
            F.floor(F.col("minx") * 1000.0 + 0.5).cast("bigint").alias("minx_mm"),
            F.floor(F.col("minz") * 1000.0 + 0.5).cast("bigint").alias("minz_mm"),
            F.floor(F.col("maxx") * 1000.0 + 0.5).cast("bigint").alias("maxx_mm"),
            F.floor(F.col("maxz") * 1000.0 + 0.5).cast("bigint").alias("maxz_mm"),
        )

    q["huge_clip"] = huge_clip

    # --- EmptyTerrainBuilder: 30m patch grid, pure Column generator
    def terrain_patches(spark, sf_dir):
        from osm2world_spark.operators.terrain import empty_terrain_patches

        b = _planar(_t(spark, sf_dir, "supplier"), "s_suppkey").agg(
            F.min("x"), F.min("z"), F.max("x"), F.max("z")
        ).first()
        patches = empty_terrain_patches(spark, b[0], b[1], b[2], b[3])
        xs = F.filter(
            F.transform(F.col("ring"), lambda v, i: F.struct(v.alias("v"), i.alias("i"))),
            lambda s: s["i"] % 2 == 0,
        )
        zs = F.filter(
            F.transform(F.col("ring"), lambda v, i: F.struct(v.alias("v"), i.alias("i"))),
            lambda s: s["i"] % 2 == 1,
        )
        vmin = lambda arr: F.array_min(F.transform(arr, lambda s: s["v"]))
        vmax = lambda arr: F.array_max(F.transform(arr, lambda s: s["v"]))
        return patches.select(
            "patch_x",
            "patch_z",
            (F.size("ring") / 2).cast("int").alias("n_pts"),
            F.floor(vmin(xs) * 1000.0 + 0.5).cast("bigint").alias("minx_mm"),
            F.floor(vmin(zs) * 1000.0 + 0.5).cast("bigint").alias("minz_mm"),
            F.floor(vmax(xs) * 1000.0 + 0.5).cast("bigint").alias("maxx_mm"),
            F.floor(vmax(zs) * 1000.0 + 0.5).cast("bigint").alias("maxz_mm"),
        )

    q["terrain_patches"] = terrain_patches

    # --- P6: tag ruleset predicates over a synthesized map<string,string>
    def tag_rules(spark, sf_dir):
        from osm2world_spark.functions.tags import (
            is_area_tagged,
            is_land_tagged,
            is_sea_tagged,
        )

        c = _t(spark, sf_dir, "customer")
        keys = ["building", "highway", "natural", "leisure", "route"]
        vals = ["yes", "water", "pitch", "ferry"]
        k1 = F.element_at(F.array(*[F.lit(k) for k in keys]), (F.col("c_custkey") % 5 + 1).cast("int"))
        v1 = F.element_at(F.array(*[F.lit(v) for v in vals]), (F.col("c_custkey") % 4 + 1).cast("int"))
        tags = F.when(
            F.col("c_custkey") % 11 == 0,
            F.map_from_arrays(F.array(k1, F.lit("area")), F.array(v1, F.lit("no"))),
        ).otherwise(F.map_from_arrays(F.array(k1), F.array(v1)))
        d = c.select("c_custkey", tags.alias("tags"))
        return d.select(
            "c_custkey",
            is_area_tagged(F.col("tags")).alias("is_area"),
            is_land_tagged(F.col("tags")).alias("is_land"),
            is_sea_tagged(F.col("tags")).alias("is_sea"),
        )

    q["tag_rules"] = tag_rules

    # --- J13: polygon boolean ops (CAG) over the triangle-decomposition
    # kernel; rectangles so the oracle has a closed form
    def poly_boolean(spark, sf_dir):
        from osm2world_spark.operators.boolean import polygon_boolean

        c = _planar(_t(spark, sf_dir, "customer"), "c_custkey")
        hax = (40 + F.col("key") % 20).cast("double")
        haz = (30 + F.col("key") % 25).cast("double")
        dx = ((F.col("key") * 13 % 120) - 60).cast("double")
        dz = ((F.col("key") * 7 % 100) - 50).cast("double")

        def rect(cx, cz, hx, hz):
            return F.array(
                F.array(
                    cx - hx, cz - hz, cx + hx, cz - hz, cx + hx, cz + hz,
                    cx - hx, cz + hz, cx - hx, cz - hz,
                )
            )

        pairs = c.select(
            F.col("key").cast("string").alias("pair_id"),
            rect(F.col("x"), F.col("z"), hax, haz).alias("a_geom"),
            rect(F.col("x") + dx, F.col("z") + dz, F.lit(35.0), F.lit(45.0)).alias("b_geom"),
        )
        out = polygon_boolean(pairs)
        return out.select(
            "pair_id",
            F.floor(F.col("area_a") * 1e6 + 0.5).cast("bigint").alias("area_a_u6"),
            F.floor(F.col("area_b") * 1e6 + 0.5).cast("bigint").alias("area_b_u6"),
            F.floor(F.col("area_intersection") * 1e6 + 0.5).cast("bigint").alias("inter_u6"),
            F.floor(F.col("area_a_minus_b") * 1e6 + 0.5).cast("bigint").alias("a_minus_b_u6"),
        )

    q["poly_boolean"] = poly_boolean

    # --- dedup: embedding-cosine near-duplicates (exact baseline)
    def embedding_near_dups_q(spark, sf_dir):
        from osm2world_spark.operators.similarity import embedding_near_dups

        e = _t(spark, sf_dir, "embeddings")
        return embedding_near_dups(e, threshold=0.4, exact=True)

    q["embedding_near_dups"] = embedding_near_dups_q

    # ----------------- rows-only checks (non-SQL-expressible operators)

    def spatial_overlaps(spark, sf_dir):
        from osm2world_spark.sources.documents import extract_elements
        from osm2world_spark.operators.spatial_join import spatial_self_join

        # Full distributed self-join; the driver projection drops the
        # `positions` payload (pinned separately by the golden-parquet
        # pytests) so the typed pair set itself is oracle-checkable: the
        # fixture geometry is points / single segments / axis-aligned
        # rectangles, every kernel predicate of which (eps-guarded
        # crossing, half-open even-odd raycast, vertex-rule containment)
        # reduces to closed-form SQL.
        docs = _geo_docs_from_driver_documents(spark, sf_dir)
        ov = spatial_self_join(extract_elements(docs))
        return ov.select("a_id", "a_type", "b_id", "b_type", "overlap_kind")

    q["spatial_overlaps"] = spatial_overlaps

    def cell_ids(spark, sf_dir):
        from osm2world_spark.operators.tiling import assign_tiles
        from osm2world_spark.sources.documents import extract_elements

        docs = _geo_docs_from_driver_documents(spark, sf_dir)
        return assign_tiles(extract_elements(docs), with_cells=True)

    q["cell_ids"] = cell_ids

    def tileset_index(spark, sf_dir):
        from osm2world_spark.operators.tiling import assign_tiles
        from osm2world_spark.plans.tileset import tileset_index as tsi
        from osm2world_spark.sources.documents import extract_elements

        # S8 tileset sink's index view: z14 content tiles rolled up to
        # their z12 roots with tight union bounds (TilesetOutput.java:38-120)
        docs = _geo_docs_from_driver_documents(spark, sf_dir)
        return tsi(assign_tiles(extract_elements(docs), with_cells=False))

    q["tileset_index"] = tileset_index

    def minhash_near_dups(spark, sf_dir):
        from osm2world_spark.operators.dedup import minhash_near_dups as mnd

        # portable=True: the md5-prefix hash family, so DuckDB rebuilds the
        # exact signatures, bands, candidate pairs, and Jaccard verify.
        # (Production default stays on the native xxhash64 family.)
        d = _t(spark, sf_dir, "documents")
        return mnd(d, k=32, bands=8, threshold=0.2, portable=True)

    q["minhash_near_dups"] = minhash_near_dups

    def dedup_clusters(spark, sf_dir):
        from osm2world_spark.operators.dedup import dedup_clusters as dc

        # same portable hash family + parameters as minhash_near_dups, so
        # the oracle's recursive closure runs over the identical pair list
        d = _t(spark, sf_dir, "documents")
        return dc(d, k=32, bands=8, threshold=0.2, portable=True)

    q["dedup_clusters"] = dedup_clusters

    def decontaminate(spark, sf_dir):
        from osm2world_spark.operators.dedup import decontaminate as dec

        # probe corpus = the deterministic doc_id % 50 benchmark slice;
        # flag_only returns the full flagged rows — project the verdict
        # columns for the oracle
        d = _t(spark, sf_dir, "documents")
        probes = d.where(F.col("doc_id") % 50 == 0)
        return dec(d, probes, flag_only=True).select("doc_id", "is_contaminated")

    q["decontaminate"] = decontaminate

    def sample_split(spark, sf_dir):
        from osm2world_spark.operators.packing import sample_split as ss

        return ss(_t(spark, sf_dir, "documents"), val_frac=0.1, test_frac=0.05)

    q["sample_split"] = sample_split

    def repetition_stats(spark, sf_dir):
        from osm2world_spark.operators.text import repetition_stats as rs

        return rs(_t(spark, sf_dir, "documents"))

    q["repetition_stats"] = repetition_stats

    def tfidf_terms(spark, sf_dir):
        from osm2world_spark.operators.text import tfidf_top_terms

        return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)

    q["tfidf_terms"] = tfidf_terms

    def stratified_sample(spark, sf_dir):
        from osm2world_spark.operators.packing import stratified_sample as strat

        out = strat(
            _t(spark, sf_dir, "events"),
            {"click": 0.5, "view": 0.1, "error": 1.0},
        )
        return out.select("event_id", "user_id", "event_type")

    q["stratified_sample"] = stratified_sample

    def events_quantiles(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        return e.groupBy("event_type").agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
            F.count("*").alias("n"),
        )

    q["events_quantiles"] = events_quantiles

    # fixed-width value histogram per event type: floor-division binning
    # (identical IEEE arithmetic in any engine; aggregation pushes down
    # map-side, the distributed-histogram shape)
    def events_histogram(spark, sf_dir):
        e = _t(spark, sf_dir, "events")
        bucket = F.least(
            F.floor(F.col("value") / 2.5).cast("int"), F.lit(9)
        )
        return (
            e.groupBy("event_type", F.greatest(bucket, F.lit(0)).alias("bucket"))
            .agg(F.count("*").alias("n"))
        )

    q["events_histogram"] = events_histogram

    def pack_sequences(spark, sf_dir):
        from osm2world_spark.operators.packing import pack_sequences as ps

        return ps(_t(spark, sf_dir, "documents"), budget_tokens=256, n_buckets=8)

    q["pack_sequences"] = pack_sequences

    def lsh_cosine_topk(spark, sf_dir):
        from osm2world_spark.operators.similarity import lsh_cosine_topk as lct

        e = _t(spark, sf_dir, "embeddings")
        dim = len(e.select("embedding").first()[0])
        return lct(e.where(F.col("vec_id") < 20), e, dim=dim, k=5)

    q["lsh_cosine_topk"] = lsh_cosine_topk

    def media_features(spark, sf_dir):
        from osm2world_spark.operators.multimodal import extract_features, media_table

        # The full Arrow-batch decode path runs (media_table ->
        # extract_features mapInPandas); the driver projection re-quantizes
        # the float32 features back to their source bytes
        # (floor(v*255 + 0.5) inverts the stub's byte/255 encode exactly)
        # so the oracle is integer-exact, and joins the typed metadata
        # back on for a full-surface check.
        docs = _geo_docs_from_driver_documents(spark, sf_dir)
        med = media_table(docs)
        feats = extract_features(med)
        fb = F.concat_ws(
            ",", F.transform("feature", lambda v: F.floor(v * 255.0 + 0.5).cast("int"))
        )
        return feats.join(
            med.select("doc_id", "span_idx", "media_type", "width", "height"),
            ["doc_id", "span_idx"],
        ).select(
            "doc_id", "span_idx", "media_ref", "media_type", "width", "height",
            fb.alias("feature_bytes"),
        )

    q["media_features"] = media_features

    def knn_elevation(spark, sf_dir):
        from osm2world_spark.operators.knn import interpolate_29nn

        queries_df = _planar(_t(spark, sf_dir, "customer"), "c_custkey").select(
            F.col("key").alias("q_id"), "x", "z"
        )
        sites = _planar(_t(spark, sf_dir, "orders"), "o_orderkey").select(
            F.col("key").alias("s_id"), "x", "z", (F.col("x") / 10.0 + F.col("z") / 20.0).alias("y")
        )
        return interpolate_29nn(queries_df, sites).select("q_id", F.round("ele", 6).alias("ele_r"))

    q["knn_elevation"] = knn_elevation

    def triangulate_areas(spark, sf_dir):
        from osm2world_spark.operators.triangulate import triangulate
        from osm2world_spark.sources.documents import extract_elements

        docs = _geo_docs_from_driver_documents(spark, sf_dir)
        tris = triangulate(extract_elements(docs))
        a2 = (F.col("bx") - F.col("ax")) * (F.col("cz") - F.col("az")) - (
            F.col("cx") - F.col("ax")
        ) * (F.col("bz") - F.col("az"))
        return tris.groupBy("eid").agg(
            F.count("*").alias("n_tris"),
            F.floor(F.sum(a2) / 2.0 * 1e6 + 0.5).cast("bigint").alias("area_u6"),
        )

    q["triangulate_areas"] = triangulate_areas

    def assemble_rings(spark, sf_dir):
        from osm2world_spark.operators.rings import assemble_multipolygons

        # synthetic relations: per rel, an outer square split into two
        # fragments + a closed hole; built from pure Column math
        r = spark.range(200).select(F.col("id").alias("rel"))
        cx = (F.col("rel") * 137 % 1000).cast("double")
        cz = (F.col("rel") * 59 % 1000).cast("double")
        frag1 = F.array(cx - 10, cz - 10, cx + 10, cz - 10, cx + 10, cz + 10)
        frag2 = F.array(cx + 10, cz + 10, cx - 10, cz + 10, cx - 10, cz - 10)
        hole = F.array(cx - 2, cz - 2, cx + 2, cz - 2, cx + 2, cz + 2, cx - 2, cz + 2, cx - 2, cz - 2)
        ways = r.select(
            F.col("rel").cast("string").alias("rel_id"),
            F.posexplode(F.array(frag1, frag2, hole)).alias("way_idx", "coords"),
        )
        return _canon_safe(assemble_multipolygons(ways))

    q["assemble_rings"] = assemble_rings

    def lsq_elevation(spark, sf_dir):
        from osm2world_spark.operators.knn import lsq_interpolate

        queries_df = _planar(_t(spark, sf_dir, "customer"), "c_custkey").select(
            F.col("key").alias("q_id"), "x", "z"
        )
        sites = _planar(_t(spark, sf_dir, "orders"), "o_orderkey").where(
            F.col("key") % 17 == 0
        ).select(
            F.col("key").alias("s_id"), "x", "z",
            (F.col("x") / 100.0 + F.col("z") / 200.0).alias("y"),
        )
        # Finite rows only: queries with every 29-NN site beyond the 120 m
        # falloff yield NaN (Java 0/0) on both engines but carry no signal;
        # the oracle mirrors the same min(dist) < 120 cut. The sites' y is
        # an exact plane (x/100 + z/200), so the full quadratic-fit
        # pipeline must reproduce it — the standard linear-precision
        # oracle for scattered-data interpolators (measured |dev| <=
        # 2.8e-14 at sf0.01; the numeric fit itself is pinned by
        # tests/test_lsq.py against brute numpy).
        out = lsq_interpolate(queries_df, sites).select(
            "q_id", F.round("ele", 6).alias("ele_r")
        )
        return out.where(~F.isnan("ele_r"))

    q["lsq_elevation"] = lsq_elevation

    def natural_elevation(spark, sf_dir):
        # J9: Sibson natural-neighbor interpolation (NaturalNeighbor-
        # Interpolator.java:19-57) — per-group Bowyer-Watson Delaunay +
        # stolen-area weights; rows-only (no closed-form SQL oracle; the
        # pytest oracle is a brute Voronoi grid, tests/test_natural.py)
        from osm2world_spark.operators.natural import natural_neighbor_interpolate

        queries_df = _planar(_t(spark, sf_dir, "customer"), "c_custkey").where(
            F.col("key") % 11 == 0
        ).select(F.col("key").cast("string").alias("q_id"), "x", "z")
        sites = _planar(_t(spark, sf_dir, "orders"), "o_orderkey").where(
            F.col("key") % 17 == 0
        ).select(
            F.col("key").alias("s_id"), "x", "z",
            (F.col("x") / 100.0 + F.col("z") / 200.0).alias("y"),
        )
        out = natural_neighbor_interpolate(queries_df, sites)
        return out.select("q_id", F.round("ele", 6).alias("ele_r"))

    q["natural_elevation"] = natural_elevation

    def natural_linear(spark, sf_dir):
        # J9 hash evidence via the Sibson LINEAR-PRECISION property
        # (natural-neighbor interpolation reproduces any affine field
        # exactly — Sibson 1981): sites on a 21x21 grid carry
        # y = 3 + x/127 + z/255; every interior query must interpolate to
        # the same affine value, which IS the closed-form SQL oracle.
        # Runs the DISTRIBUTED path (cell_size=250, halo=1 — Sibson
        # radius ~2 grid spacings = 100 < 250, so partitioning is exact);
        # queries stay in [200, 800)^2, ≥200 from every group bbox edge,
        # so the y=0 frame corners are never natural neighbors.
        from osm2world_spark.operators.natural import natural_neighbor_interpolate

        g = spark.range(21 * 21)
        sites = g.select(
            F.col("id").alias("s_id"),
            ((F.col("id") % 21) * 50.0).alias("x"),
            ((F.col("id") / 21).cast("bigint") * 50.0).alias("z"),
        ).withColumn("y", F.lit(3.0) + F.col("x") / 127.0 + F.col("z") / 255.0)
        queries_df = (
            _t(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % 7 == 0)
            .select(
                F.col("c_custkey").cast("string").alias("q_id"),
                (200.0 + (F.col("c_custkey") * 37 % 6000) / 10.0).alias("x"),
                (200.0 + (F.col("c_custkey") * 53 % 6000) / 10.0).alias("z"),
            )
        )
        out = natural_neighbor_interpolate(queries_df, sites, cell_size=250.0, halo=1)
        return out.select(
            "q_id", F.floor(F.col("ele") * 1000000.0 + 0.5).cast("bigint").alias("ele_u6")
        )

    q["natural_linear"] = natural_linear

    def tri_strip_fan(spark, sf_dir):
        # GeometryUtil strip/fan assembly (GeometryUtil.java:98-186):
        # generic-V semantics exercised over vertex-id arrays of varying
        # length (3..8), incl. the odd-triangle flip and flat-shading
        # normals; pure Catalyst projections
        from osm2world_spark.functions.meshes import (
            triangle_normal_list_from_strip_or_fan,
            triangle_vertex_list_from_fan,
            triangle_vertex_list_from_strip,
            triangles_from_vertex_list,
        )

        o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
        vs = F.transform(
            F.sequence(F.lit(0), (F.col("k") % 6 + 2).cast("int")),
            lambda i: F.col("k") * 100 + i,
        )
        d = o.select("k", vs.alias("vs"))
        strip = triangle_vertex_list_from_strip(F.col("vs"))
        return d.select(
            F.col("k").alias("o_orderkey"),
            strip.alias("strip"),
            triangle_vertex_list_from_fan(F.col("vs")).alias("fan"),
            triangle_normal_list_from_strip_or_fan(F.col("vs")).alias("normals"),
            triangles_from_vertex_list(strip).alias("tris"),
        )

    q["tri_strip_fan"] = tri_strip_fan

    def bpe_merge_round(spark, sf_dir):
        # one BPE training round (Sennrich 2016, operators/bpe.py) fully
        # in-plan: word-frequency table -> adjacent-pair weights -> the
        # deterministic argmax pair (weight DESC, pair ASC) broadcast to
        # every word -> greedy left-to-right merge fold. Hash-checks the
        # complete round against a DuckDB list_reduce rebuild; the
        # multi-round trainer iterates exactly this with one 1-row
        # collect per round (pytest-pinned against a replica).
        from osm2world_spark.operators.bpe import (
            adjacent_pair_weights,
            apply_merge,
            best_pair,
            initial_symbols,
            word_counts,
        )

        d = _t(spark, sf_dir, "documents")
        words = word_counts(d).select(
            "word", "count", initial_symbols(F.col("word")).alias("symbols")
        )
        top = best_pair(adjacent_pair_weights(words)).select(
            F.col("a").alias("m_a"), F.col("b").alias("m_b")
        )
        applied = words.crossJoin(F.broadcast(top)).select(
            "word",
            "count",
            "m_a",
            "m_b",
            apply_merge(F.col("symbols"), F.col("m_a"), F.col("m_b")).alias("s2"),
        )
        return applied.select(
            "word",
            "count",
            "m_a",
            "m_b",
            F.array_join("s2", "|").alias("symbols_str"),
            F.size("s2").alias("n_symbols"),
        )

    q["bpe_merge_round"] = bpe_merge_round

    def bpe_batched_round(spark, sf_dir):
        # one BATCHED BPE round (operators/bpe.bpe_train_batched — the
        # n_merges/k-jobs trainer): distributed pair weights -> bounded
        # top-16 candidate collect -> greedy conflict-free batch of 4
        # (select_batch: skip any pair whose symbols or merged string
        # collide with an earlier selection). The oracle re-runs the
        # greedy as a DuckDB recursive CTE over the same candidate SQL.
        from osm2world_spark.operators.bpe import (
            adjacent_pair_weights,
            initial_symbols,
            select_batch,
            word_counts,
        )

        d = _t(spark, sf_dir, "documents")
        words = word_counts(d).select(
            "word", "count", initial_symbols(F.col("word")).alias("symbols")
        )
        top = (
            adjacent_pair_weights(words)
            .orderBy(F.col("weight").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(16)
            .collect()
        )
        batch = select_batch([(r["a"], r["b"], r["weight"]) for r in top], 4)
        wmap = {(r["a"], r["b"]): r["weight"] for r in top}
        rows = [
            (i + 1, a, b, int(wmap[(a, b)])) for i, (a, b) in enumerate(batch)
        ]
        return spark.createDataFrame(
            rows, "rank int, m_a string, m_b string, weight bigint"
        )

    q["bpe_batched_round"] = bpe_batched_round

    def weighted_sample(spark, sf_dir):
        # Efraimidis-Spirakis weighted sampling without replacement
        # (A-ES 2006): top-5 per source by ln(u)/w, u = md5 unit hash —
        # deterministic, engine-independent membership
        from osm2world_spark.operators.packing import weighted_sample_topk

        d = _t(spark, sf_dir, "documents")
        return weighted_sample_topk(d, 5, "n_chars", group_col="source")

    q["weighted_sample"] = weighted_sample

    def mesh_flat_normals(spark, sf_dir):
        # NormalCalculationUtil flat strip/fan normals
        # (NormalCalculationUtil.java:117-147) over deterministic 3D
        # strips; both engines execute the identical IEEE sequence
        # (sub, mul, sqrt, div are all correctly rounded), micro-snapped
        from osm2world_spark.functions.normals import (
            fan_flat_normals,
            strip_flat_normals,
        )

        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 0)
        n_v = (F.col("o_orderkey") % 5 + 3).cast("int")
        vs = F.transform(
            F.sequence(F.lit(0), n_v - 1),
            lambda i: F.struct(
                (i * 1.0).alias("x"),
                (((F.col("o_orderkey") * 7 + i * 11) % 17) / 3.0).alias("y"),
                ((i % 2) * 1.0).alias("z"),
            ),
        )
        d = o.select(F.col("o_orderkey").alias("k"), vs.alias("vs"))

        def u6(c):
            return F.floor(c * 1000000.0 + 0.5).cast("bigint")

        def pack(col):
            return F.flatten(
                F.transform(col, lambda s: F.array(u6(s["x"]), u6(s["y"]), u6(s["z"])))
            )

        return d.select(
            F.col("k").alias("o_orderkey"),
            pack(strip_flat_normals(F.col("vs"))).alias("strip_n_u6"),
            pack(fan_flat_normals(F.col("vs"))).alias("fan_n_u6"),
        )

    q["mesh_flat_normals"] = mesh_flat_normals

    def smooth_normals(spark, sf_dir):
        # smooth vertex normals (NormalCalculationUtil.java:40-49) as a
        # relational plan over a shared-vertex quad grid: adjacent quads
        # share corners, so ridge vertices average the distinct face
        # normals (the HashMultimap SET semantics), coplanar duplicates
        # collapse, sums fold in sorted order (order-independent)
        from osm2world_spark.operators.normals import smooth_vertex_normals

        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 29 == 0)
        xi = (F.col("o_orderkey") % 50).cast("bigint")
        zi = ((F.col("o_orderkey") / 50).cast("bigint") % 50).cast("bigint")

        def h(ix, iz):
            return (((ix * 7 + iz * 13) % 19) / 3.0).cast("double")

        def pt(ix, iz):
            return F.struct(
                ix.cast("double").alias("x"), h(ix, iz).alias("y"),
                iz.cast("double").alias("z"),
            )

        p00, p10 = pt(xi, zi), pt(xi + 1, zi)
        p01, p11 = pt(xi, zi + 1), pt(xi + 1, zi + 1)
        tris = o.select(
            F.lit("m").alias("mesh_id"),
            F.posexplode(
                F.array(F.array(p00, p10, p01), F.array(p10, p11, p01))
            ).alias("half", "verts"),
            (F.col("o_orderkey") * 2).alias("k2"),
        ).select(
            "mesh_id", (F.col("k2") + F.col("half")).cast("int").alias("tri_idx"), "verts"
        )
        out = smooth_vertex_normals(tris)

        def u6(c):
            return F.floor(c * 1000000.0 + 0.5).cast("bigint")

        return out.select(
            u6(F.col("vertex")["x"]).alias("vx_u6"),
            u6(F.col("vertex")["y"]).alias("vy_u6"),
            u6(F.col("vertex")["z"]).alias("vz_u6"),
            u6(F.col("normal")["x"]).alias("nx_u6"),
            u6(F.col("normal")["y"]).alias("ny_u6"),
            u6(F.col("normal")["z"]).alias("nz_u6"),
        )

    q["smooth_normals"] = smooth_normals

    def line_ops(spark, sf_dir):
        # line/segment scalar primitives (GeometryUtil.java:189-359):
        # orientation, betweenness, point-line and point-segment
        # distance, perpendicular foot, and the epsilon-guarded segment
        # intersection — one projection, every formula the reference's
        from osm2world_spark.functions import lines as L

        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
        k = F.col("o_orderkey")
        px, pz = (k % 17).cast("double"), (k % 13).cast("double")
        a1x, a1z = (k % 5).cast("double"), (k % 9).cast("double")
        a2x, a2z = (k % 11 + 1).cast("double"), (k % 3 + 10).cast("double")
        b1x, b1z = (k % 6 + 8).cast("double"), (k % 4).cast("double")
        b2x, b2z = (k % 8).cast("double"), (k % 10 + 3).cast("double")

        def u6(c):
            return F.floor(c * 1000000.0 + 0.5).cast("bigint")

        inter = L.true_segment_intersection(a1x, a1z, a2x, a2z, b1x, b1z, b2x, b2z)
        return o.select(
            k.alias("o_orderkey"),
            L.is_right_of(px, pz, a1x, a1z, a2x, a2z).alias("right_of"),
            L.is_between(px, pz, a1x, a1z, a2x, a2z).alias("between"),
            u6(L.distance_from_line(px, pz, a1x, a1z, a2x, a2z)).alias("d_line_u6"),
            u6(L.distance_from_line_segment(px, pz, a1x, a1z, a2x, a2z)).alias("d_seg_u6"),
            u6(L.project_perpendicular(px, pz, a1x, a1z, a2x, a2z)["x"]).alias("proj_x_u6"),
            u6(inter["x"]).alias("ix_u6"),
            u6(inter["z"]).alias("iz_u6"),
        )

    q["line_ops"] = line_ops

    def semdedup_q(spark, sf_dir):
        # SemDeDup (Abbas et al. 2023): 1-round deterministic k-means
        # clustering + within-cluster cosine keep-first pruning; the
        # pair work is cluster-bounded, never corpus-quadratic
        from osm2world_spark.operators.similarity import semdedup

        e = _t(spark, sf_dir, "embeddings")
        return semdedup(e, k=8, iters=1, threshold=0.4)

    q["semdedup"] = semdedup_q

    def shape_outlines(spark, sf_dir):
        # CircleXZ / CircularSectorXZ outline generation (CircleXZ.java:
        # 45-65, CircularSectorXZ.java:28-56) with the Angle re-
        # normalization chain replicated exactly; micro-snapped coords
        from osm2world_spark.functions.shapes import (
            circle_vertices,
            sector_area,
            sector_vertices,
        )

        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
        k = F.col("o_orderkey")
        cx, cz = (k % 20).cast("double"), (k % 15).cast("double")
        r = (k % 7 + 1).cast("double")
        s, e = (k % 10).cast("double") * 0.7, (k % 9).cast("double") * 0.9
        n = (k % 5 + 4).cast("int")

        def pack(col):
            return F.flatten(
                F.transform(
                    col,
                    lambda p: F.array(
                        F.floor(p["x"] * 1000000.0 + 0.5).cast("bigint"),
                        F.floor(p["z"] * 1000000.0 + 0.5).cast("bigint"),
                    ),
                )
            )

        return o.select(
            k.alias("o_orderkey"),
            pack(circle_vertices(cx, cz, r, n)).alias("circle_u6"),
            pack(sector_vertices(cx, cz, r, s, e, n)).alias("sector_u6"),
            F.floor(sector_area(r, s, e) * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("area_u6"),
        )

    q["shape_outlines"] = shape_outlines

    def dsir_score(spark, sf_dir):
        # DSIR importance scoring (Xie et al. 2023): hashed-unigram
        # log-likelihood ratio of every raw doc against a target slice
        # (docs with doc_id % 5 == 0); two 64-row distributions
        # broadcast-join the per-doc bucket counts
        from osm2world_spark.operators.dsir import dsir_scores

        d = _t(spark, sf_dir, "documents")
        target = d.where(F.col("doc_id") % 5 == 0)
        out = dsir_scores(d, target, n_buckets=64)
        return out.select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("score") * 1000000.0 + 0.5).cast("bigint").alias("score_u6"),
        )

    q["dsir_score"] = dsir_score

    def coastline_water(spark, sf_dir):
        from osm2world_spark.operators.rings import coastline_water_areas

        g = spark.range(150).select(F.col("id").alias("g"))
        cz = (F.col("g") * 37 % 800 + 100).cast("double")
        ix, iz = (F.col("g") * 53 % 600 + 200).cast("double"), (F.col("g") * 29 % 600 + 200).cast("double")
        crossing = F.array(F.lit(-50.0), cz, F.lit(500.0), cz + 30.0, F.lit(1050.0), cz)
        island = F.array(
            ix, iz, ix + 40.0, iz, ix + 40.0, iz + 40.0, ix, iz + 40.0, ix, iz
        )
        ways = g.select(
            F.col("g").cast("string").alias("group_id"),
            F.posexplode(F.array(crossing, island)).alias("way_idx", "coords"),
            F.lit(0.0).alias("minx"), F.lit(0.0).alias("minz"),
            F.lit(1000.0).alias("maxx"), F.lit(1000.0).alias("maxz"),
        ).select("group_id", "way_idx", "coords", "minx", "minz", "maxx", "maxz")
        out = coastline_water_areas(ways)
        return out.select("rel_id", "area_idx", "status", "n_holes")

    q["coastline_water"] = coastline_water

    def ivf_ann(spark, sf_dir):
        from osm2world_spark.operators.similarity import ivf_topk

        e = _t(spark, sf_dir, "embeddings")
        return ivf_topk(e.where(F.col("vec_id") < 20), e, k=5, n_cells=16, n_probe=4)

    q["ivf_ann"] = ivf_ann

    def near_dups_lsh(spark, sf_dir):
        from osm2world_spark.operators.similarity import embedding_near_dups

        e = _t(spark, sf_dir, "embeddings")
        dim = len(e.select("embedding").first()[0])
        return embedding_near_dups(e, threshold=0.4, dim=dim)

    q["near_dups_lsh"] = near_dups_lsh

    # --- elevation post-pass: SimpleEleConstraintEnforcer closed form
    # (SimpleEleConstraintEnforcer.java:147-183 via EleConnector.connectsTo
    # :81-85). Connectors synthesized from lineitem: quantized positions
    # give ~30 connectors per exact (x, z), whole-number elevations keep
    # every window average order-independent (exact double sums).
    def ele_constraints(spark, sf_dir):
        from osm2world_spark.operators.elevation import enforce_simple

        li = _t(spark, sf_dir, "lineitem")
        conns = li.select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
            .cast("string")
            .alias("conn_id"),
            ((F.col("l_orderkey") * 7) % 50).cast("double").alias("x"),
            ((F.col("l_partkey") * 11) % 40).cast("double").alias("z"),
            F.when(
                F.col("l_linenumber") % 3 == 0,
                F.concat(F.lit("w"), (F.col("l_suppkey") % 5).cast("string")),
            ).alias("ref"),
            F.when(F.col("l_linenumber") % 5 == 0, F.lit("ABOVE"))
            .when(F.col("l_linenumber") % 5 == 1, F.lit("BELOW"))
            .otherwise(F.lit("ON"))
            .alias("ground_state"),
            F.when(
                F.col("l_linenumber") % 7 != 0, F.col("l_quantity").cast("double")
            ).alias("ele"),
        )
        out = enforce_simple(conns)
        return out.select(
            "conn_id", "ground_state", F.round("ele", 6).alias("ele")
        )

    q["ele_constraints"] = ele_constraints

    # --- EleCalculator config dispatch (O2WConfig.java:373-378): the two
    # tag calculators over synthesized node/owner tag maps, incl. the OSM
    # decimal parse (ValueParseUtil.java:87-134) on good, signed, garbage
    # and empty strings. Fractions are <=3 digits so round(6) absorbs any
    # pow() ULP skew between engines.
    def ele_calculator(spark, sf_dir):
        from osm2world_spark.operators.elevation import calculate_elevations

        o = _t(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        ele_str = (
            F.when(k % 6 == 0, (k % 500).cast("string"))
            .when(
                k % 6 == 1,
                F.concat((k % 100).cast("string"), F.lit("."), (k % 999).cast("string")),
            )
            .when(
                k % 6 == 2,
                F.concat(F.lit("-"), (k % 80).cast("string"), F.lit("."), (k % 99).cast("string")),
            )
            .when(k % 6 == 3, F.lit("high"))
            .when(k % 6 == 4, F.lit(""))
        )
        conns = o.select(
            k.cast("string").alias("conn_id"),
            (k % 30).cast("double").alias("x"),
            (k % 17).cast("double").alias("z"),
            F.when(k % 6 < 5, F.lit("n")).alias("ref"),
            F.lit("ON").alias("ground_state"),
            (k % 90).cast("double").alias("ele"),
            F.when(k % 6 < 5, F.create_map(F.lit("ele"), ele_str)).alias("ref_tags"),
            F.when(k % 4 == 0, F.create_map(F.lit("bridge"), F.lit("yes")))
            .when(k % 4 == 1, F.create_map(F.lit("bridge"), F.lit("no")))
            .when(k % 4 == 2, F.create_map(F.lit("tunnel"), F.lit("culvert")))
            .otherwise(F.create_map().cast("map<string,string>"))
            .alias("owner_tags"),
        )
        tag = calculate_elevations(conns, "EleTagEleCalculator").select(
            "conn_id", F.lit("ele_tag").alias("calc"), F.round("ele", 6).alias("ele")
        )
        bt = calculate_elevations(conns, "BridgeTunnelEleCalculator").select(
            "conn_id", F.lit("bridge_tunnel").alias("calc"), F.round("ele", 6).alias("ele")
        )
        return tag.unionByName(bt)

    q["ele_calculator"] = ele_calculator

    # --- REAL media decode path: deterministic gradient PNGs are encoded
    # AND decoded with the stdlib-zlib codec (functions/png.py) inside
    # the Arrow-batched kernel; block sums are recovered exactly from the
    # float32 features (sum <= 4080, error << 0.5), so the oracle is
    # closed-form integer arithmetic over the pixel grid.
    def media_decode(spark, sf_dir):
        # BOTH real image codecs through the one magic-byte dispatch path:
        # PNG gradient fixtures (lossless roundtrip) and baseline JPEG
        # constant-block fixtures (exactly-decodable despite the lossy
        # format: all-ones quant + DC-only blocks)
        from osm2world_spark.operators.multimodal import (
            extract_features,
            synthetic_jpeg_media,
            synthetic_png_media,
        )

        o = _t(spark, sf_dir, "orders")
        png = synthetic_png_media(o.where(F.col("o_orderkey") % 50 == 0), "o_orderkey", size=16)
        jpg = synthetic_jpeg_media(o.where(F.col("o_orderkey") % 50 == 7), "o_orderkey", blocks=2)
        feats = extract_features(png.unionByName(jpg), real_codecs=True)
        return feats.select(
            "doc_id", F.posexplode("feature").alias("cell", "f")
        ).select(
            "doc_id",
            F.col("cell").cast("int").alias("cell"),
            F.round(F.col("f") * 4080).cast("bigint").alias("lum_sum"),
        )

    q["media_decode"] = media_decode

    def jpeg_progressive(spark, sf_dir):
        # PROGRESSIVE (SOF2) JPEG through the same magic-byte dispatch
        # path: multi-scan streams (interleaved DC first + refinement,
        # banded AC first scans with EOB runs, AC correction-bit
        # refinement — T.81 G.2) over constant 8x8 blocks, which decode
        # EXACTLY, so the oracle is the same closed pixel form as the
        # baseline fixture. Byte-level progressive==baseline equivalence
        # on arbitrary images is pinned by tests/test_jpeg.py.
        from osm2world_spark.operators.multimodal import (
            extract_features,
            synthetic_jpeg_media,
        )

        o = _t(spark, sf_dir, "orders")
        jpg = synthetic_jpeg_media(
            o.where(F.col("o_orderkey") % 50 == 21), "o_orderkey",
            blocks=2, progressive=True,
        )
        feats = extract_features(jpg, real_codecs=True)
        return feats.select(
            "doc_id", F.posexplode("feature").alias("cell", "f")
        ).select(
            "doc_id",
            F.col("cell").cast("int").alias("cell"),
            F.round(F.col("f") * 4080).cast("bigint").alias("lum_sum"),
        )

    q["jpeg_progressive"] = jpeg_progressive

    # --- road-network fixtures: zigzag/straight chains synthesized from
    # orders (node identity = exact position, like MapNode). Chain c has
    # up to 6 segments; even chains zigzag (bisector-branch connector
    # cuts), odd chains are straight (equal-direction rightNormal branch).
    def _network_segs(spark, sf_dir):
        o = _t(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        base = (
            o.select(
                (k % 200).alias("c"), F.expr("o_orderkey div 200 % 6").alias("i")
            )
            .distinct()
        )
        c, i = F.col("c"), F.col("i")
        zig = (c % 2 == 0).cast("int")
        return base.select(
            F.concat(F.lit("c"), c, F.lit("_"), i).alias("seg_id"),
            (c * 100 + i * 10).cast("double").alias("x1"),
            ((c * 37) % 500 + (i % 2) * 7 * zig).cast("double").alias("z1"),
            (c * 100 + (i + 1) * 10).cast("double").alias("x2"),
            ((c * 37) % 500 + ((i + 1) % 2) * 7 * zig).cast("double").alias("z2"),
            (2 + (c + i) % 3).cast("double").alias("width"),
        )

    # NetworkCalculator per-node dispatch classes (junction/connector/end)
    def network_degrees(spark, sf_dir):
        from osm2world_spark.operators.network import node_degrees

        segs = _network_segs(spark, sf_dir)
        return node_degrees(segs).select(
            "node", F.col("degree").cast("int").alias("degree"), "kind"
        )

    q["network_degrees"] = network_degrees

    # graph-shaped join: connected components of the positional node graph
    def network_components(spark, sf_dir):
        from osm2world_spark.operators.network import connected_components

        segs = _network_segs(spark, sf_dir)
        return connected_components(segs, max_rounds=20)

    q["network_components"] = network_components

    # connector bisector cut geometry (pure Column algebra path)
    def network_connector_cuts(spark, sf_dir):
        from osm2world_spark.operators.network import connector_cuts

        segs = _network_segs(spark, sf_dir)
        cuts = connector_cuts(segs)
        return cuts.select(
            "node",
            "seg_id",
            "side",
            *[F.round(c, 6).alias(c) for c in ("left_x", "left_z", "right_x", "right_z", "cut_x", "cut_z")],
        )

    q["network_connector_cuts"] = network_connector_cuts

    # BFS hop distances from the network's end nodes (degree 1) — the
    # Pregel-shaped frontier iteration over the positional node graph
    def network_hops(spark, sf_dir):
        from osm2world_spark.operators.network import (
            node_degrees,
            segment_hop_distances,
        )

        segs = _network_segs(spark, sf_dir)
        seeds = node_degrees(segs).where(F.col("kind") == "end").select("node")
        return segment_hop_distances(segs, seeds, max_hops=8)

    q["network_hops"] = network_hops

    # weighted shortest-path distances (Bellman-Ford frontier relaxation,
    # edge weight = segment metric length), seeded from the end nodes
    def network_distances(spark, sf_dir):
        from osm2world_spark.operators.network import (
            node_degrees,
            segment_weighted_distances,
        )

        segs = _network_segs(spark, sf_dir)
        seeds = node_degrees(segs).where(F.col("kind") == "end").select("node")
        out = segment_weighted_distances(segs, seeds, max_rounds=NET_MAX_ROUNDS)
        return out.select("node", F.round(F.col("dist"), 6).alias("dist"))

    q["network_distances"] = network_distances

    # integer fixed-point PageRank over the same positional node graph
    # (3 iterations; exact bigint arithmetic, so the oracle replays the
    # recurrence bit-for-bit in chained CTEs)
    def pagerank_ranks(spark, sf_dir):
        from osm2world_spark.operators.network import segment_pagerank

        segs = _network_segs(spark, sf_dir)
        return segment_pagerank(segs, iters=3)

    q["pagerank_ranks"] = pagerank_ranks

    # small-file compaction planner (plans/compaction.py): next-fit bin
    # assignment over a synthesized file listing; keep-vs-rewrite rules
    def compaction_plan(spark, sf_dir):
        from osm2world_spark.plans.compaction import plan_compaction

        o = _t(spark, sf_dir, "orders")
        files = o.select(
            (F.col("o_orderkey") % 5).cast("string").alias("part"),
            F.concat(F.lit("f"), F.col("o_orderkey").cast("string")).alias("file_path"),
            ((F.col("o_orderkey") * 131) % 300 + 1).cast("bigint").alias("size_bytes"),
        )
        return plan_compaction(files, target_bytes=256, partition_cols=("part",))

    q["compaction_plan"] = compaction_plan

    # degree-oriented triangle counting over a deterministic multiplier
    # graph (u -> m*u mod 97 for m in {2,3,6}: 2*3=6 closes triangles)
    def triangle_count(spark, sf_dir):
        from osm2world_spark.operators.network import triangle_counts

        o = _t(spark, sf_dir, "orders")
        edges = (
            o.select(
                (F.col("o_orderkey") % 97).alias("src"),
                F.explode(F.array(F.lit(2), F.lit(3), F.lit(6))).alias("m"),
            )
            .select("src", ((F.col("src") * F.col("m")) % 97).alias("dst"))
        )
        return triangle_counts(edges)

    q["triangle_count"] = triangle_count

    # geohash cell codec (functions/cells.py): encode at precision 6 +
    # decoded cell center (exact integer bit ops + IEEE-identical center
    # arithmetic, so the oracle replays both)
    def geohash_cells(spark, sf_dir):
        from osm2world_spark.functions.cells import geohash_decode, geohash_encode

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        out = pts.select(
            "key", geohash_encode(F.col("lat"), F.col("lon"), 6).alias("gh")
        )
        d = geohash_decode(F.col("gh"), 6)
        return out.select(
            "key", "gh", d["lat"].alias("c_lat"), d["lon"].alias("c_lon")
        )

    q["geohash_cells"] = geohash_cells

    # raster finite-difference gradients (operators/rasterops.py): two
    # adjacency-guarded windows over an integer synthetic grid with
    # no-data holes; exact bigint evidence columns
    def raster_gradients_q(spark, sf_dir):
        from osm2world_spark.operators.rasterops import raster_gradients

        n = 200
        grid = spark.range(n * n).select(
            F.lit(13).alias("cell_lon"),
            F.lit(48).alias("cell_lat"),
            (F.col("id") % n).cast("int").alias("px"),
            F.floor(F.col("id") / n).cast("int").alias("py"),
        )
        elev = F.when(
            (F.col("px") * 31 + F.col("py") * 37) % 499 == 0, F.lit(-32768)
        ).otherwise((F.col("px") * 7919 + F.col("py") * 104729) % 1000)
        return raster_gradients(grid.withColumn("elev", elev.cast("int")))

    q["raster_gradients"] = raster_gradients_q

    # great-circle distances between the order-keyed and custkey-keyed
    # synthetic points (functions/projection.haversine_m)
    def haversine_pairs(spark, sf_dir):
        from osm2world_spark.functions.projection import haversine_m

        o = _t(spark, sf_dir, "orders")
        d = haversine_m(
            F.expr(LAT.format(k="o_orderkey")),
            F.expr(LON.format(k="o_orderkey")),
            F.expr(LAT.format(k="o_custkey")),
            F.expr(LON.format(k="o_custkey")),
        )
        return o.select(
            F.col("o_orderkey").alias("key"), F.round(d, 6).alias("dist_m")
        )

    q["haversine_pairs"] = haversine_pairs

    # real SRTM .hgt binary codec (S6 completion): two 1201x1201 tiles are
    # ENCODED to real big-endian row-flipped hgt bytes (one plain, one
    # zipped — both payload paths), then DECODED by the production kernel;
    # the oracle recomputes the deterministic grid formula directly, so any
    # codec error (endianness, row flip, offset, zip path) breaks the match
    def srtm_decode(spark, sf_dir):
        import numpy as np
        import pandas as pd

        from osm2world_spark.sources.raster import BLANK_VALUE, PIXELS
        from osm2world_spark.sources.srtm import decode_hgt_tiles, encode_hgt, hgt_filename

        cells = spark.createDataFrame(
            [(13, 48, False), (14, 48, True)], "cell_lon int, cell_lat int, zipped boolean"
        )

        def make_files(batches):
            yy, xx = np.mgrid[0:PIXELS, 0:PIXELS]
            for pdf in batches:
                names, payloads = [], []
                for lon, lat, zipped in zip(pdf["cell_lon"], pdf["cell_lat"], pdf["zipped"]):
                    vals = ((xx * 7 + yy * 13 + int(lon) * 1000 + int(lat) * 17) % 4000) - 500
                    grid = np.where(
                        (xx * 31 + yy * 37) % 499 == 0, BLANK_VALUE, vals
                    ).astype(np.int16)
                    names.append(hgt_filename(int(lon), int(lat), zipped=bool(zipped)))
                    payloads.append(encode_hgt(grid, zipped=bool(zipped)))
                yield pd.DataFrame({"file_name": names, "payload": payloads})

        files = cells.mapInPandas(make_files, schema="file_name string, payload binary")
        return decode_hgt_tiles(files).where("px % 97 = 0 AND py % 89 = 0")

    q["srtm_decode"] = srtm_decode

    def mbtiles_tiles(spark, sf_dir):
        # S2: distributed MBTiles sqlite scan (MbtilesReader.java:54-76
        # fetch semantics, TMS y-flip TileNumber.java:88-90) over the
        # committed deterministic fixture pyramid: per-zoom row-range
        # splits fan out via mapInPandas, each task range-scans the
        # (zoom_level, tile_row) index read-only. The oracle re-derives
        # every row arithmetically from the generator formula — it
        # never opens sqlite.
        from osm2world_spark.sources.mbtiles import mbtiles_tiles as scan

        path = "/root/repo/tests/fixtures/fixture.mbtiles"
        return scan(spark, path, rows_per_split=8).select(
            "zoom", "tile_x", "tile_y", "tms_row", "n_bytes",
            F.md5(F.col("tile_data")).alias("blob_md5"),
        )

    q["mbtiles_tiles"] = mbtiles_tiles

    def mbtiles_metadata(spark, sf_dir):
        # S2: the MBTiles metadata name/value table (spec table; the
        # reference reads it through mbtiles4j in
        # MapMetadataMbtilesUtil.java) — driver-side read, tiny by spec.
        from osm2world_spark.sources.mbtiles import mbtiles_metadata as meta

        return meta(spark, "/root/repo/tests/fixtures/fixture.mbtiles")

    q["mbtiles_metadata"] = mbtiles_metadata

    def osm_pbf_elements(spark, sf_dir):
        # OSM PBF file decode (public PBF format; the reference's
        # OSMFileReader/PbfIterator path, OSMStreamReader.java:88-89):
        # header-only framing walk driver-side, per-blob decode in
        # executors. Fixture elements are pure functions of their index
        # (tools/make_osmpbf_fixture.py), so the oracle re-derives every
        # row from generate_series arithmetic — it never parses pbf.
        from osm2world_spark.sources.osmpbf import read_osm_pbf

        els = read_osm_pbf(
            spark, "/root/repo/tests/fixtures/fixture.osm.pbf"
        )
        return els.select(
            "element_type",
            F.col("id").cast("bigint").alias("id"),
            F.round(F.col("lat") * 1e7).cast("bigint").alias("lat_u7"),
            F.round(F.col("lon") * 1e7).cast("bigint").alias("lon_u7"),
            F.size(F.map_keys("tags")).alias("n_tags"),
            F.coalesce(F.size("refs"), F.lit(-1)).alias("n_refs"),
            F.coalesce(
                F.aggregate("refs", F.lit(0).cast("bigint"), lambda a, x: a + x),
                F.lit(0).cast("bigint"),
            ).alias("refs_sum"),
            F.coalesce(F.concat_ws("|", "member_roles"), F.lit("")).alias("roles"),
        )

    q["osm_pbf_elements"] = osm_pbf_elements

    def osm_xml_elements(spark, sf_dir):
        # OSM XML source (OsmXmlIterator parity, OSMStreamReader.java:
        # 90-91) over the GZIP fixture with the JOSM action="delete"
        # workaround on: same logical elements as fixture.osm.pbf (plus
        # two delete stubs that must vanish), so the oracle is the same
        # generate_series arithmetic — pure XML coords make lat exact.
        from osm2world_spark.sources.osmxml import read_osm_xml

        els = read_osm_xml(
            spark, ["/root/repo/tests/fixtures/fixture.osm.gz"],
            josm_workaround=True,
        )
        return els.select(
            "element_type",
            F.col("id").cast("bigint").alias("id"),
            F.round(F.col("lat") * 1e7).cast("bigint").alias("lat_u7"),
            F.round(F.col("lon") * 1e7).cast("bigint").alias("lon_u7"),
            F.size(F.map_keys("tags")).alias("n_tags"),
            F.coalesce(F.size("refs"), F.lit(-1)).alias("n_refs"),
            F.coalesce(
                F.aggregate("refs", F.lit(0).cast("bigint"), lambda a, x: a + x),
                F.lit(0).cast("bigint"),
            ).alias("refs_sum"),
            F.coalesce(F.concat_ws("|", "member_roles"), F.lit("")).alias("roles"),
        )

    q["osm_xml_elements"] = osm_xml_elements

    def pbf_way_geometry(spark, sf_dir):
        # the reference's FULL read pipeline (file -> node store -> way
        # geometry, OSMToMapDataConverter semantics): pbf elements ->
        # posexplode(refs) -> shuffle join against the corpus-sized node
        # table -> ordered collect per way. Oracle: the fixture's way j
        # references nodes 100+j..100+j+2 on the generator formulas.
        from osm2world_spark.sources.osmpbf import (
            assemble_way_geometries,
            read_osm_pbf,
        )

        els = read_osm_pbf(
            spark, "/root/repo/tests/fixtures/fixture.osm.pbf"
        )
        ways = assemble_way_geometries(els)
        return ways.select(
            F.col("way_id").cast("bigint").alias("way_id"),
            F.col("n_pts").cast("int").alias("n_pts"),
            "n_missing",
            F.round(F.element_at("lats", 1) * 1e7).cast("bigint").alias("lat0_u7"),
            F.aggregate(
                F.transform("lats", lambda v: F.round(v * 1e7).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("lat_sum_u7"),
            F.aggregate(
                F.transform("lons", lambda v: F.round(v * 1e7).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("lon_sum_u7"),
        )

    q["pbf_way_geometry"] = pbf_way_geometry

    def pbf_tile_assign(spark, sf_dir):
        # CAPSTONE: the reference's complete ingest-to-tiles path in ONE
        # plan — MBTiles sqlite (TMS flip) -> pbf tile blobs -> decoded
        # nodes -> z14 web-mercator tile assignment (TileNumber.java:
        # 122-126) -> per-tile counts. The oracle re-derives node coords
        # from the fixture formulas and runs the same slippy closed form
        # in DuckDB.
        from osm2world_spark.functions.tiles import tile_at
        from osm2world_spark.sources.mbtiles import mbtiles_tiles as scan
        from osm2world_spark.sources.osmpbf import decode_pbf_blobs

        tiles = scan(spark, "/root/repo/tests/fixtures/pbf_tiles.mbtiles")
        els = decode_pbf_blobs(tiles, keys=("zoom", "tile_x", "tile_y"))
        nodes = els.where(F.col("element_type") == "node")
        t = tile_at(14, F.col("lat"), F.col("lon"))
        return (
            nodes.select(
                F.col("tile_x").alias("src_x"),
                F.col("tile_y").alias("src_y"),
                t["x"].alias("assign_x"),
                t["y"].alias("assign_y"),
                "id",
            )
            .groupBy("src_x", "src_y", "assign_x", "assign_y")
            .agg(
                F.count("*").alias("n_nodes"),
                F.sum("id").alias("id_sum"),
            )
        )

    q["pbf_tile_assign"] = pbf_tile_assign

    def mbtiles_pbf_decode(spark, sf_dir):
        # MbtilesReader.getData end to end (MbtilesReader.java:54-76):
        # sqlite tile blobs -> pbf elements with tile keys carried
        # through one mapInPandas — the full reference read path.
        from osm2world_spark.sources.mbtiles import mbtiles_tiles as scan
        from osm2world_spark.sources.osmpbf import decode_pbf_blobs

        tiles = scan(spark, "/root/repo/tests/fixtures/pbf_tiles.mbtiles")
        els = decode_pbf_blobs(tiles, keys=("zoom", "tile_x", "tile_y"))
        return els.select(
            "zoom", "tile_x", "tile_y", "element_type",
            F.col("id").cast("bigint").alias("id"),
            F.round(F.col("lat") * 1e7).cast("bigint").alias("lat_u7"),
            F.coalesce(F.size("refs"), F.lit(-1)).alias("n_refs"),
        )

    q["mbtiles_pbf_decode"] = mbtiles_pbf_decode

    # ------------------------------------------------------- S8 serializers
    # Deterministic scene derivations for the 3D-model sinks. The OBJ
    # scene puts 3 faces per element on a shared integer grid so the
    # first-seen vertex dedup is genuinely exercised (adjacent cells
    # share ground corners; face C reuses face A's vertices entirely),
    # and covers all four f-token forms: A = v/t, B = v/t/n, C = bare v.
    def _obj_faces(spark, sf_dir):
        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 37 == 0)
        k = F.col("o_orderkey")
        d = lambda c: c.cast("double")  # noqa: E731
        x0 = d(F.floor(k / 4) % 6)
        z0 = d(F.floor(k / 24) % 6)
        h = d((k * 7) % 5) * 0.25 + 0.5
        x1, z1, xm, hm = x0 + 1.0, z0 + 1.0, x0 + 0.5, h + 1.25
        nx, ny, nz = d(k % 3) * 0.5, F.lit(1.0), d(k % 5) * 0.25
        zero = F.lit(0.0)

        def P(x, y, z):
            return F.struct(x.alias("x"), y.alias("y"), z.alias("z"))

        def TC(u, v):
            return F.struct(
                F.lit(float(u)).alias("u"), F.lit(float(v)).alias("v")
            )

        null_n = F.lit(None).cast(
            "array<struct<x:double,y:double,z:double>>"
        )
        null_t = F.lit(None).cast("array<struct<u:double,v:double>>")
        gname = F.when(k % 2 == 0, F.lit("Building")).otherwise(F.lit("Road"))
        common = [
            F.concat(F.lit("t"), (k % 4).cast("string")).alias("tile"),
            gname.alias("group_name"),
            F.concat(gname, F.lit(" "), k.cast("string")).alias("object_name"),
            F.concat(F.lit("MAT_"), (k % 3).cast("string")).alias("material"),
            (30 + (k % 3) * 40).cast("int").alias("r"),
            (50 + (k % 3) * 30).cast("int").alias("g"),
            (70 + (k % 3) * 20).cast("int").alias("b"),
        ]
        face_a = o.select(
            *common, (k * 3).alias("face_order"),
            F.array(P(x0, zero, z0), P(x1, zero, z0), P(x1, h, z1),
                    P(x0, h, z1)).alias("vertices"),
            null_n.alias("normals"),
            F.array(TC(0, 0), TC(1, 0), TC(1, 1), TC(0, 1)).alias("texcoords"),
        )
        n3 = F.array(P(nx, ny, nz), P(nx, ny, nz), P(nx, ny, nz))
        face_b = o.select(
            *common, (k * 3 + 1).alias("face_order"),
            F.array(P(x0, zero, z0), P(x1, h, z1), P(xm, hm, z0)).alias(
                "vertices"),
            n3.alias("normals"),
            F.array(TC(0, 0), TC(1, 1), TC(0.5, 1)).alias("texcoords"),
        )
        face_c = o.select(
            *common, (k * 3 + 2).alias("face_order"),
            F.array(P(x1, zero, z0), P(x1, h, z1), P(x0, h, z1)).alias(
                "vertices"),
            null_n.alias("normals"), null_t.alias("texcoords"),
        )
        return face_a.unionByName(face_b).unionByName(face_c)

    def obj_export(spark, sf_dir):
        # S8 OBJ+MTL sink (ObjOutput.java): first-seen v/vn/vt index
        # maps as groupBy+row_number, change-triggered g/o/usemtl as lag
        # windows, per-tile file assembly as one ordered array_join —
        # the whole serializer is Catalyst Columns, oracle-checked
        # byte-for-byte against a DuckDB rebuild of the same plan.
        from osm2world_spark.sinks.obj import obj_per_tile

        return obj_per_tile(_obj_faces(spark, sf_dir))

    q["obj_export"] = obj_export

    # Mesh derivation shared by the POV and glTF sinks: per element a
    # fan of 1..3 unit triangles in the y=h plane whose orientation
    # alternates by parity, so flat normals exercise both (0,1,0) and
    # (0,-1,0) and the glTF min/max have a closed form the oracle can
    # state independently.
    def _mesh_rows(spark, sf_dir, prefix):
        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 23 == 0)
        k = F.col("o_orderkey")
        d = lambda c: c.cast("double")  # noqa: E731
        ntris = (k % 3 + 1).cast("int")
        cx = d(F.floor(k / 4) % 10)
        cz = d(F.floor(k / 40) % 10)
        h = d((k * 3) % 7) * 0.25

        def P(x, z):
            return F.struct(x.alias("x"), h.alias("y"), z.alias("z"))

        def tri(t):
            return F.when(
                t % 2 == 0,
                F.array(P(cx + t, cz), P(cx + t + 1, cz), P(cx + t, cz + 1)),
            ).otherwise(
                F.array(P(cx + t, cz), P(cx + t, cz + 1), P(cx + t + 1, cz))
            )

        return o.select(
            F.concat(F.lit(prefix), (k % 4).cast("string")).alias("tile"),
            k.alias("mesh_order"),
            F.concat(F.lit("MAT_"), (k % 3).cast("string")).alias("material"),
            (30 + (k % 3) * 40).cast("int").alias("r"),
            (50 + (k % 3) * 30).cast("int").alias("g"),
            (70 + (k % 3) * 20).cast("int").alias("b"),
            F.transform(F.sequence(F.lit(0), ntris - 1), tri).alias(
                "triangles"),
        )

    def pov_export(spark, sf_dir):
        # S8 POV-Ray sink (POVRayOutput.java:290-341): mesh blocks of
        # "  triangle { <a>, <b>, <c>}" lines, named-texture close,
        # per-tile ordered assembly — pure Columns end to end.
        from osm2world_spark.sinks.povray import pov_per_tile

        return pov_per_tile(_mesh_rows(spark, sf_dir, "p").drop("r", "g", "b"))

    q["pov_export"] = pov_export

    def gltf_json(spark, sf_dir):
        # S8 glTF sink (GltfOutput.java): the complete glTF 2.0 JSON —
        # scene graph, non-indexed TRIANGLES primitives, float32
        # accessor min/max, bufferViews and sidecar-.bin buffers — as
        # one relational plan; the float32 payload twin (gltf_buffers)
        # and the GLB container are pinned byte-level in pytest.
        from osm2world_spark.sinks.gltf import gltf_json_per_tile

        return gltf_json_per_tile(_mesh_rows(spark, sf_dir, "g"))

    q["gltf_json"] = gltf_json

    def _fpbf_rows(spark, sf_dir):
        m = _mesh_rows(spark, sf_dir, "f")
        k = F.col("mesh_order")
        return m.select(
            "*",
            F.concat(F.lit("w"), k.cast("string")).alias("osm_id"),
            F.when(k % 2 == 0, F.lit("Building"))
            .otherwise(F.lit("Road")).alias("type_name"),
        )

    def fpbf_blocks_q(spark, sf_dir):
        # S8 frontend-PBF sink, block half (FrontendPbfOutput.java
        # :761-800): the tile's shared dedup blocks — Vector3dBlock as
        # packed mm sint64s in first-seen insertion order, StringBlock
        # with its "" seed (:262), MaterialBlock color triples — all as
        # one relational plan. The wire bytes are pytest-round-tripped
        # through the independent proto reader in sources/osmpbf.py.
        from osm2world_spark.sinks.frontend_pbf import fpbf_blocks

        return fpbf_blocks(_fpbf_rows(spark, sf_dir))

    q["fpbf_blocks"] = fpbf_blocks_q

    def fpbf_objects_q(spark, sf_dir):
        # S8 frontend-PBF sink, object half (buildTriangleGeometry
        # :616-652): per WorldObject, the triangle corners as 0-based
        # INDEX references into the tile's vector block, plus the
        # string/material block references.
        from osm2world_spark.sinks.frontend_pbf import fpbf_objects

        return fpbf_objects(_fpbf_rows(spark, sf_dir))

    q["fpbf_objects"] = fpbf_objects_q

    def _rect_scene_meshes(spark, sf_dir):
        # The shared rect scene of render_pixels AND tile_pyramid (their
        # oracles restate the same formulas): axis-aligned integer
        # rectangles from customer keys, two CCW triangles each, four
        # tiles, unique draw order, closed-form colors.
        c = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("bigint").alias("k"))
        d = lambda col: col.cast("double")  # noqa: E731
        x0 = d((F.col("k") * 13) % 160)
        z0 = d((F.col("k") * 29) % 160)
        x1 = x0 + d(8 + (F.col("k") % 5) * 6)
        z1 = z0 + d(8 + (F.col("k") % 7) * 4)

        def P(x, z):
            return F.struct(x.alias("x"), F.lit(0.0).alias("y"), z.alias("z"))

        return c.select(
            (F.col("k") % 4).cast("string").alias("tile"),
            F.col("k").alias("mesh_order"),
            (F.col("k") % 256).cast("int").alias("r"),
            ((F.col("k") * 7) % 256).cast("int").alias("g"),
            ((F.col("k") * 13) % 256).cast("int").alias("b"),
            F.array(
                F.array(P(x0, z0), P(x1, z0), P(x1, z1)),
                F.array(P(x0, z0), P(x1, z1), P(x0, z1)),
            ).alias("triangles"),
        )

    def render_pixels(spark, sf_dir):
        # S8 PNG render sink (ImageExporter.java, opengl module): the
        # orthographic top-down rasterizer over per-tile meshes. The
        # rect scene's closed-triangle coverage reduces EXACTLY to
        # interval tests, so the oracle re-derives every pixel: winner
        # = max mesh_order among covering rects, background (0,0,0).
        # All coordinates are small integers and the viewport/raster
        # ratio is integral (4), so every comparison is exact IEEE
        # double on both engines. The PNG byte layer over this pixel
        # table is pinned byte-level in tests/test_image.py.
        from osm2world_spark.sinks.image import rasterize_tiles

        return rasterize_tiles(
            _rect_scene_meshes(spark, sf_dir), 48, 48,
            viewport=(0.0, 0.0, 192.0, 192.0))

    q["render_pixels"] = render_pixels

    def classify_docs(spark, sf_dir):
        # fastText-style hashed linear classifier INFERENCE (the
        # model-based quality-filter pass, CCNet/DCLM/FineWeb-Edu):
        # explode tokens -> md5 bucket -> broadcast weight join -> one
        # groupBy(doc) -> argmax. Weights/biases are closed-form
        # integers over 64 buckets x 3 classes so the oracle rebuilds
        # the entire model and every exact-bigint score.
        from osm2world_spark.operators.classify import hashed_linear_scores

        wv = spark.range(64).select(
            F.col("id").alias("bucket"),
            F.array(
                *[
                    ((F.col("id") * 2654435761 + c * 40503) % 2001 - 1000)
                    .cast("bigint")
                    for c in range(3)
                ]
            ).alias("ws"),
        )
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        scored = hashed_linear_scores(
            docs, wv, [-25, 12, -1], 64, key="md5")
        return scored.select(
            "doc_id",
            "n_tokens",
            F.element_at("scores", 1).alias("s0"),
            F.element_at("scores", 2).alias("s1"),
            F.element_at("scores", 3).alias("s2"),
            "label",
        )

    q["classify_docs"] = classify_docs

    def normalized_dedup(spark, sf_dir):
        # CCNet-style normalized-key exact dedup (Wenzek 2020): two
        # synthesized variants per document — accented-prefix original
        # vs uppercased/digit-equivalent/extra-whitespace copy — must
        # collapse to one group under the normalization pipeline
        # (accents -> lower -> digit fold -> whitespace collapse). The
        # oracle replays the exact same Column pipeline in SQL.
        from osm2world_spark.operators.normalize import normalized_dup_groups

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        t = F.col("text")
        v1 = d.select(
            F.concat(F.lit("a"), F.col("doc_id").cast("string")).alias("vid"),
            F.concat(F.lit("héllo "), t).alias("text"),
        )
        v2 = d.select(
            F.concat(F.lit("b"), F.col("doc_id").cast("string")).alias("vid"),
            F.concat(
                F.lit("HÉLLO "),
                F.upper(F.regexp_replace(t, " ", "   ")),
                F.lit("  "),
            ).alias("text"),
        )
        groups = normalized_dup_groups(v1.unionAll(v2), id_col="vid")
        return groups.select(
            "norm_md5",
            "n_docs",
            F.concat_ws(",", "doc_ids").alias("doc_ids_str"),
            "survivor",
        )

    q["normalized_dedup"] = normalized_dedup

    def shard_corpus_q(spark, sf_dir):
        # Global deterministic shuffle + shard assignment (the training
        # data-loader layout): shard and within-shard position are pure
        # functions of the id via the portable md5 family — the oracle
        # replays hash, pmod, and the rank window exactly.
        from osm2world_spark.operators.packing import shard_corpus

        d = _t(spark, sf_dir, "documents").select("doc_id")
        return shard_corpus(d, 8, key="md5")

    q["shard_corpus"] = shard_corpus_q

    def video_frames(spark, sf_dir):
        # Video decode + frame sampling (functions/avi.py): real
        # RIFF/AVI payloads with closed-form gradient DIB frames are
        # decoded and every-2nd-frame-sampled; the per-frame channel
        # sums AND coordinate-weighted sums (which pin the bottom-up
        # row flip, BGR order and row padding) are exact integers the
        # oracle re-derives arithmetically.
        from osm2world_spark.operators.multimodal import (
            synthetic_avi_media,
            video_frame_evidence,
        )

        keys = _t(spark, sf_dir, "documents").select("doc_id")
        return video_frame_evidence(
            synthetic_avi_media(keys, "doc_id"), every=2)

    q["video_frames"] = video_frames

    def image_resize(spark, sf_dir):
        # Exact box-downsample resize (operators/multimodal.py): decode
        # the gradient PNG fixtures, reduce 16x16 -> 4x4 by integer
        # block sums / floor means; every output pixel's sum and value
        # re-derived arithmetically by the oracle.
        from osm2world_spark.operators.multimodal import (
            resized_pixel_evidence,
            synthetic_png_media,
        )

        keys = _t(spark, sf_dir, "documents").select("doc_id")
        return resized_pixel_evidence(
            synthetic_png_media(keys, "doc_id", size=16), factor=4)

    q["image_resize"] = image_resize

    def audio_resample(spark, sf_dir):
        # Integer-decimation audio resample: each output sample is the
        # floor mean of 8 consecutive PCM samples of the closed-form WAV
        # fixtures; sums and floor means re-derived by the oracle
        # (floor through float on both sides — negative sums floor
        # toward -inf identically).
        from osm2world_spark.operators.multimodal import (
            resampled_audio_evidence,
            synthetic_wav_media,
        )

        keys = _t(spark, sf_dir, "documents").select("doc_id")
        return resampled_audio_evidence(
            synthetic_wav_media(keys, "doc_id"), factor=8)

    q["audio_resample"] = audio_resample

    def osm_change_parse(spark, sf_dir):
        # osmChange (.osc) diff source (sources/osmxml.py): the
        # minutely-diff format OSM deployments consume — create/modify/
        # delete blocks parsed to action-tagged element rows (the input
        # of TilePipeline.invalidate). Payloads synthesized from orders
        # as XML strings; every parsed field re-derived by the oracle.
        from osm2world_spark.sources.osmxml import decode_osm_change

        o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
        k = F.col("o_orderkey")
        xml = F.concat(
            F.lit('<osmChange version="0.6"><create>'),
            F.format_string('<node id="%d" lat="', k),
            (k % 170 - 85).cast("string"),
            F.lit('" lon="'),
            (k % 360 - 180).cast("string"),
            F.lit('"><tag k="amenity" v="cafe"/></node></create><modify>'),
            F.format_string(
                '<way id="%d"><nd ref="%d"/><nd ref="%d"/><nd ref="%d"/></way>',
                k + 1, k, k * 2, k * 3,
            ),
            F.lit('</modify><delete><node id="'),
            (k + 2).cast("string"),
            F.lit('"/></delete></osmChange>'),
        )
        ch = decode_osm_change(o.select(xml.alias("xml")))
        return ch.select(
            "action",
            "element_type",
            F.col("id").cast("bigint").alias("id"),
            F.coalesce(
                F.round(F.col("lat") * 1e7).cast("bigint"), F.lit(-1)
            ).alias("lat_u7"),
            F.coalesce(
                F.round(F.col("lon") * 1e7).cast("bigint"), F.lit(-1)
            ).alias("lon_u7"),
            F.size(F.map_keys("tags")).alias("n_tags"),
            F.coalesce(F.size("refs"), F.lit(-1)).alias("n_refs"),
            F.coalesce(
                F.aggregate("refs", F.lit(0).cast("bigint"), lambda a, x: a + x),
                F.lit(0).cast("bigint"),
            ).alias("refs_sum"),
        )

    q["osm_change_parse"] = osm_change_parse

    def mojibake_fix(spark, sf_dir):
        # UTF-8-as-Latin-1 mojibake repair (operators/normalize.py):
        # documents get a mojibake prefix (the latin-1 mis-decode of
        # 'héllo wörld çafé '); the bounded replace chain must restore
        # it exactly — the oracle replays the identical chain.
        from osm2world_spark.operators.normalize import fix_mojibake

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        broken_prefix = "héllo wörld çafé ".encode("utf-8").decode("latin-1")
        corrupted = F.concat(F.lit(broken_prefix), F.col("text"))
        fixed = fix_mojibake(corrupted)
        return d.select(
            "doc_id",
            F.md5(corrupted).alias("broken_md5"),
            F.md5(fixed).alias("fixed_md5"),
            (F.length(corrupted) - F.length(fixed)).cast("int").alias(
                "n_repaired"),
        )

    q["mojibake_fix"] = mojibake_fix

    def tile_pyramid(spark, sf_dir):
        # Raster tile-pyramid roll-up (sinks/image.py::pyramid_pixels):
        # the four rendered child tiles of the render_pixels scene
        # compose into their zoom-0 parent as ONE relational hash
        # aggregation — parent pixel = floor mean of its 2x2 child
        # block. The oracle replays the full render arithmetic AND the
        # mosaic/downsample mapping.
        from osm2world_spark.sinks.image import (
            pyramid_pixels,
            rasterize_tiles,
        )

        pix = rasterize_tiles(
            _rect_scene_meshes(spark, sf_dir), 48, 48,
            viewport=(0.0, 0.0, 192.0, 192.0))
        children = pix.select(
            F.lit(1).alias("zoom"),
            (F.col("tile").cast("int") % 2).alias("tile_x"),
            F.floor(F.col("tile").cast("int") / 2).cast("int").alias(
                "tile_y"),
            "px", "py", "r", "g", "b",
        )
        return pyramid_pixels(children, 48, 48)

    q["tile_pyramid"] = tile_pyramid

    def url_dedup(spark, sf_dir):
        # Canonical-URL dedup (operators/web.py::canonical_url): two
        # synthesized variants per document — mixed case, default :80
        # port, trailing slash, reordered query params — must
        # canonicalize to one URL; the oracle states the canonical form
        # closed-form per doc.
        from osm2world_spark.operators.web import url_dup_groups

        d = _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("bigint").alias("k"))
        k = F.col("k")
        ua = d.select(
            F.concat(F.lit("a"), k.cast("string")).alias("doc_id"),
            F.format_string(
                "http://Example%d.com:80/p%d/?b=2&a=1", k % 50, k
            ).alias("url"),
        )
        ub = d.select(
            F.concat(F.lit("b"), k.cast("string")).alias("doc_id"),
            F.format_string(
                "HTTP://example%d.COM/p%d?a=1&b=2#frag", k % 50, k
            ).alias("url"),
        )
        g = url_dup_groups(ua.unionAll(ub))
        return g.select(
            "canon_url", "n_docs",
            F.concat_ws(",", "doc_ids").alias("doc_ids_str"), "survivor",
        )

    q["url_dedup"] = url_dedup

    def render_strips(spark, sf_dir):
        # Multi-pass distributed render (ImageExporter.java:145-147
        # semantics): the SAME scene as render_pixels rendered as 4
        # independent strip tasks per tile, global-formula pixel
        # centers — the pixel table must be row-identical to the
        # single-pass render, so it shares render_pixels' oracle.
        from osm2world_spark.sinks.image import rasterize_strips

        return rasterize_strips(
            _rect_scene_meshes(spark, sf_dir), 48, 48,
            viewport=(0.0, 0.0, 192.0, 192.0), n_strips=4)

    q["render_strips"] = render_strips

    # CAG piece GEOMETRY (J13 completion): subtract a rectangle that
    # strictly overlaps each base rectangle's lower-left corner — the face
    # decomposition must return exactly the L-shaped hexagon, whose six
    # canonically-ordered vertices the oracle states in closed form
    def cag_pieces(spark, sf_dir):
        from osm2world_spark.operators.cag import cag_pieces as cp

        c = _planar(_t(spark, sf_dir, "customer"), "c_custkey")
        hax = (40 + F.col("key") % 20).cast("double")
        haz = (30 + F.col("key") % 25).cast("double")
        ax0, az0 = F.col("x") - hax, F.col("z") - haz
        ax1, az1 = F.col("x") + hax, F.col("z") + haz
        bx1 = ax0 + (10 + F.col("key") % 25).cast("double")
        bz1 = az0 + (8 + F.col("key") % 20).cast("double")
        bx0, bz0 = ax0 - 50.0, az0 - 60.0
        pairs = c.select(
            F.col("key").cast("string").alias("pair_id"),
            F.array(F.array(ax0, az0, ax1, az0, ax1, az1, ax0, az1, ax0, az0)).alias("a_geom"),
            F.array(F.array(bx0, bz0, bx1, bz0, bx1, bz1, bx0, bz1, bx0, bz0)).alias("b_geom"),
        )
        out = cp(pairs, op="subtract", snap=1e-3)
        vtx = F.transform(
            F.sequence(F.lit(0), (F.size("outer") / 2 - 1).cast("int")),
            lambda i: F.struct(
                i.alias("vtx"),
                F.floor(F.col("outer")[i * 2] * 1000.0 + 0.5).cast("bigint").alias("x_mm"),
                F.floor(F.col("outer")[i * 2 + 1] * 1000.0 + 0.5).cast("bigint").alias("z_mm"),
            ),
        )
        return out.select(
            "pair_id", "piece_idx", "n_holes", F.explode(vtx).alias("v")
        ).select("pair_id", "piece_idx", "n_holes", "v.vtx", "v.x_mm", "v.z_mm")

    q["cag_pieces"] = cag_pieces

    # J13 buffer: mitre-join polygon buffer (JTSBufferUtil.bufferPolygon)
    # over irregular convex hexagons sampled from an ellipse — the convex
    # positive-distance result is a single ring whose vertex multiset is
    # {offset-edge start, offset-edge end, mitre point} per input vertex,
    # each a closed form the oracle recomputes with the identical op tree
    def poly_buffer(spark, sf_dir):
        from osm2world_spark.operators.buffer import buffer_polygons

        c = (
            _t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("k"))
            .where(F.col("k") % 3 == 0)
        )
        theta = "(2 * pi() * CAST({j} AS DOUBLE) / CAST(6 AS DOUBLE) + CAST(k % 97 AS DOUBLE) / CAST(97 AS DOUBLE) * 2 * pi())"
        vx = f"({X_M.format(k='k')} + CAST(20 + k % 17 AS DOUBLE) * cos({theta}))"
        vz = f"({Z_M.format(k='k')} + CAST(22 + (k * 3) % 12 AS DOUBLE) * sin({theta}))"
        ring = F.expr(
            "flatten(transform(sequence(0, 6), jj -> array("
            + vx.format(j="jj % 6")
            + ", "
            + vz.format(j="jj % 6")
            + ")))"
        )
        polys = c.select(
            F.col("k").cast("string").alias("poly_id"),
            F.array(ring).alias("geom"),
            (F.lit(3).cast("double") + (F.col("k") % 5).cast("double")).alias("distance"),
        )
        out = buffer_polygons(polys)
        vtx = F.transform(
            F.sequence(F.lit(0), (F.size("outer") / 2 - 1).cast("int")),
            lambda i: F.struct(
                F.floor(F.col("outer")[i * 2] * 1e6 + 0.5).cast("bigint").alias("x_u6"),
                F.floor(F.col("outer")[i * 2 + 1] * 1e6 + 0.5).cast("bigint").alias("z_u6"),
            ),
        )
        return out.select(
            F.col("poly_id").cast("bigint").alias("k"),
            F.col("piece_idx").cast("int").alias("piece_idx"),
            F.col("n_holes").cast("int").alias("n_holes"),
            F.explode(vtx).alias("v"),
        ).select("k", "piece_idx", "n_holes", "v.x_u6", "v.z_u6")

    q["poly_buffer"] = poly_buffer

    # GeometryUtil.equallyDistributePointsAlong: equally spaced points on
    # a 4-vertex polyline, both placement modes, pure Column plan
    def distribute_points(spark, sf_dir):
        from osm2world_spark.functions.polyline import distribute_points_along

        o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
        vx = X_M.format(k="k * 4 + jj")
        vz = Z_M.format(k="k * 4 + jj")
        geom = F.expr(
            f"flatten(transform(sequence(0, 3), jj -> array({vx}, {vz})))"
        )
        pts = distribute_points_along(
            geom,
            F.expr("CAST(1000 + (k % 10) * 300 AS DOUBLE)"),
            F.col("k") % 2 == 0,
        )
        return o.select("k", F.explode(pts).alias("p")).select(
            "k",
            F.col("p.i").alias("i"),
            F.floor(F.col("p.px") * 1e6 + 0.5).cast("bigint").alias("px_u6"),
            F.floor(F.col("p.pz") * 1e6 + 0.5).cast("bigint").alias("pz_u6"),
        )

    q["distribute_points"] = distribute_points

    # exact substring dedup (Lee et al. 2022): maximal duplicated token
    # spans per document; exact gram keys so DuckDB rebuilds the index
    def dup_spans(spark, sf_dir):
        from osm2world_spark.operators.dedup import duplicated_spans

        d = _t(spark, sf_dir, "documents")
        return duplicated_spans(d, k=4, min_count=2, gram_key="exact")

    q["dup_spans"] = dup_spans

    # Z-order clustering key: the bit interleave the stage writer sorts by
    # (locality for tile-range scans), verified bit-for-bit in SQL
    def morton_order(spark, sf_dir):
        from osm2world_spark.functions import tiles as T

        pts = _points(_t(spark, sf_dir, "orders"), "o_orderkey")
        tx = T.tile_x_at(F.col("lon"), 14)
        ty = T.tile_y_at(F.col("lat"), 14)
        return pts.select(
            F.col("key").alias("o_orderkey"),
            tx.alias("tile_x"),
            ty.alias("tile_y"),
            T.morton_key(tx, ty).alias("morton"),
        )

    q["morton_order"] = morton_order

    # distributePointsOn (TreeModule forest placement): seeded scatter
    # over rect-with-hole polygons; hash rand mode so DuckDB rebuilds the
    # exact candidate stream (the java.util.Random production mode is
    # pinned bit-exact against a JDK-generated golden in pytest)
    def scatter_points(spark, sf_dir):
        from osm2world_spark.operators.scatter import scatter_points_on

        c = (
            _t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("k"))
            .where(F.col("k") % 10 == 0)
        )
        x0 = F.expr(X_M.format(k="k"))
        z0 = F.expr(Z_M.format(k="k"))
        w = F.expr("CAST(110 + k % 60 AS DOUBLE)")
        h = F.expr("CAST(95 + (k * 3) % 70 AS DOUBLE)")
        hx0 = x0 + F.expr("CAST(23.7 AS DOUBLE) + CAST(k % 10 AS DOUBLE)")
        hz0 = z0 + F.expr("CAST(19.3 AS DOUBLE) + CAST((k * 7) % 12 AS DOUBLE)")
        hx1 = hx0 + F.lit(31.9).cast("double")
        hz1 = hz0 + F.lit(27.4).cast("double")
        x1, z1 = x0 + w, z0 + h
        outer = F.array(x0, z0, x1, z0, x1, z1, x0, z1, x0, z0)
        hole = F.array(hx0, hz0, hx1, hz0, hx1, hz1, hx0, hz1, hx0, hz0)
        polys = c.select(
            F.col("k").cast("string").alias("poly_id"),
            F.array(outer, hole).alias("geom"),
            F.col("k").alias("seed"),
        )
        out = scatter_points_on(polys, density=0.04, seed_col="seed", rand_mode="hash")
        return out.select(
            F.col("poly_id").cast("bigint").alias("k"),
            "box_x",
            "box_z",
            "cand",
            F.floor(F.col("px") * 1e6 + 0.5).cast("bigint").alias("px_u6"),
            F.floor(F.col("pz") * 1e6 + 0.5).cast("bigint").alias("pz_u6"),
        )

    q["scatter_points"] = scatter_points

    # GeometryUtil.interpolateOnTriangle: barycentric read at a probe
    # point, with the reference's partial outside-guard (weight > 1 ->
    # no value; negative-weight extrapolation passes through, faithfully)
    def tri_interpolate(spark, sf_dir):
        from osm2world_spark.functions.polyline import interpolate_on_triangle

        s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
        t1x, t1z = F.expr(X_M.format(k="k")), F.expr(Z_M.format(k="k"))
        t2x, t2z = F.expr(X_M.format(k="k * 3 + 1")), F.expr(Z_M.format(k="k * 3 + 1"))
        t3x, t3z = F.expr(X_M.format(k="k * 7 + 2")), F.expr(Z_M.format(k="k * 7 + 2"))
        a = F.expr("CAST(k % 10 AS DOUBLE) / CAST(8 AS DOUBLE)")
        b = F.expr("CAST(k % 7 AS DOUBLE) / CAST(6 AS DOUBLE)")
        px = t3x + (t1x - t3x) * a + (t2x - t3x) * b
        pz = t3z + (t1z - t3z) * a + (t2z - t3z) * b
        val = interpolate_on_triangle(
            px, pz, t1x, t1z, t2x, t2z, t3x, t3z,
            F.expr("CAST(k % 100 AS DOUBLE)"),
            F.expr("CAST((k * 3) % 100 AS DOUBLE)"),
            F.expr("CAST((k * 7) % 100 AS DOUBLE)"),
        )
        return s.select(
            "k", F.floor(val * 1e6 + 0.5).cast("bigint").alias("val_u6")
        )

    q["tri_interpolate"] = tri_interpolate

    # GeometryUtil.insertIntoPolygon: closest-segment vertex insertion
    # with corner snap; emits the resulting closed ring as rows
    def insert_vertex(spark, sf_dir):
        from osm2world_spark.functions.polyline import insert_into_polygon

        c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
        x0 = F.expr(X_M.format(k="k"))
        z0 = F.expr(Z_M.format(k="k"))
        x1 = x0 + F.expr("CAST(60 + k % 40 AS DOUBLE)")
        z1 = z0 + F.expr("CAST(50 + (k * 3) % 30 AS DOUBLE)")
        ring = F.array(x0, z0, x1, z0, x1, z1, x0, z1, x0, z0)
        px = x0 + F.expr("CAST((k * 13) % 140 AS DOUBLE)") - F.lit(20.0)
        pz = z0 + F.expr("CAST((k * 29) % 110 AS DOUBLE)") - F.lit(15.0)
        out = insert_into_polygon(ring, px, pz, F.lit(6.0))
        pairs = F.transform(
            F.sequence(F.lit(0), (F.size(out) / 2 - 1).cast("int")),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.floor(F.element_at(out, (i * 2 + 1).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("x_u6"),
                F.floor(F.element_at(out, (i * 2 + 2).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("z_u6"),
            ),
        )
        return c.select("k", F.explode(pairs).alias("p")).select(
            "k", "p.idx", "p.x_u6", "p.z_u6"
        )

    q["insert_vertex"] = insert_vertex

    # corpus bigram LM familiarity (perplexity proxy): integer evidence
    # columns only — the float mean_logp is pytest-covered (log summation
    # order is not cross-engine deterministic)
    def ngram_lm(spark, sf_dir):
        from osm2world_spark.operators.text import ngram_lm_score

        d = _t(spark, sf_dir, "documents")
        return ngram_lm_score(d, n=2).select("doc_id", "n_ngrams", "sum_freq", "vocab")

    q["ngram_lm"] = ngram_lm

    # S4 Overpass/OSM-JSON source: synthesize real OSM-JSON response
    # documents from orders (nodes + ways, to_json), parse them back
    # through the Catalyst-native from_json reader, and emit the element
    # table — any schema/dialect error breaks the match. The HTTP fetch
    # itself is the out-of-scope part (no network in the sandbox).
    def _osm_json_elements(spark, sf_dir):
        from osm2world_spark.sources.overpass import parse_osm_json

        o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
        lat = F.expr(LAT.format(k="k"))
        lon = F.expr(LON.format(k="k"))
        nodes = o.select(
            (F.col("k") / 200).cast("bigint").alias("response_id"),
            F.struct(
                F.lit("node").alias("type"),
                F.col("k").cast("bigint").alias("id"),
                lat.alias("lat"),
                lon.alias("lon"),
                F.create_map(F.lit("name"), F.concat(F.lit("n"), F.col("k"))).alias("tags"),
                F.lit(None).cast("array<bigint>").alias("nodes"),
                F.lit(None).cast(
                    "array<struct<type:string,ref:bigint,role:string>>"
                ).alias("members"),
            ).alias("e"),
        )
        ways = (
            o.groupBy((F.col("k") / 8).cast("bigint").alias("way_id"))
            .agg(F.sort_array(F.collect_list(F.col("k").cast("bigint"))).alias("node_ids"))
            .select(
                (F.col("way_id") * 8 / 200).cast("bigint").alias("response_id"),
                F.struct(
                    F.lit("way").alias("type"),
                    F.col("way_id").alias("id"),
                    F.lit(None).cast("double").alias("lat"),
                    F.lit(None).cast("double").alias("lon"),
                    F.create_map(F.lit("highway"), F.lit("residential")).alias("tags"),
                    F.col("node_ids").alias("nodes"),
                    F.lit(None).cast(
                        "array<struct<type:string,ref:bigint,role:string>>"
                    ).alias("members"),
                ).alias("e"),
            )
        )
        responses = (
            nodes.unionByName(ways)
            .groupBy("response_id")
            .agg(
                F.to_json(
                    F.struct(
                        F.lit("0.6").alias("version"),
                        F.lit("spark").alias("generator"),
                        F.collect_list("e").alias("elements"),
                    )
                ).alias("json")
            )
        )
        return parse_osm_json(responses)

    def osm_json_parse(spark, sf_dir):
        els = _osm_json_elements(spark, sf_dir)
        return els.select(
            "response_id",
            "elem_type",
            "elem_id",
            F.floor(F.col("lat") * 1e7 + 0.5).cast("bigint").alias("lat_u7"),
            F.floor(F.col("lon") * 1e7 + 0.5).cast("bigint").alias("lon_u7"),
            F.size("tags").alias("n_tags"),
            F.coalesce(F.size("node_ids"), F.lit(-1)).alias("n_node_refs"),
        )

    q["osm_json_parse"] = osm_json_parse

    # way node-ref resolution: posexplode + join + ordered collect
    def osm_way_geometry(spark, sf_dir):
        from osm2world_spark.sources.overpass import assemble_way_geometries

        els = _osm_json_elements(spark, sf_dir)
        ways = assemble_way_geometries(els)
        return ways.select(
            F.col("way_id"),
            F.col("n_pts").cast("bigint").alias("n_pts"),
            F.col("n_missing"),
            F.floor(F.element_at("lats", 1) * 1e7 + 0.5).cast("bigint").alias("lat0_u7"),
            F.floor(F.element_at("lons", 1) * 1e7 + 0.5).cast("bigint").alias("lon0_u7"),
            F.floor(F.element_at("lats", -1) * 1e7 + 0.5).cast("bigint").alias("lat1_u7"),
            F.floor(F.element_at("lons", -1) * 1e7 + 0.5).cast("bigint").alias("lon1_u7"),
        )

    q["osm_way_geometry"] = osm_way_geometry

    # real RIFF/WAVE PCM audio decode: integer-exact windowed evidence
    # (abs-sum + sign-change count per eighth) recomputed in SQL
    def audio_decode(spark, sf_dir):
        from osm2world_spark.operators.multimodal import (
            extract_features,
            synthetic_wav_media,
        )

        keys = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 21)
        media = synthetic_wav_media(keys, "o_orderkey", n_samples=1024)
        feats = extract_features(media, real_codecs=True)
        return feats.select("doc_id", F.posexplode("feature").alias("i", "f")).select(
            "doc_id",
            F.col("i").cast("int").alias("i"),
            F.col("f").cast("bigint").alias("v"),
        )

    q["audio_decode"] = audio_decode

    # PII/URL scrub: deterministic emails/URLs injected per doc, masked by
    # the Column regexp pass; md5 of the scrubbed text is the value hash
    def pii_scrub(spark, sf_dir):
        from osm2world_spark.operators.text import pii_scrub as ps

        d = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact: user"), F.col("doc_id"), F.lit("@example.com"),
                F.when(F.col("doc_id") % 3 == 0,
                       F.concat(F.lit(" http://ex.com/p/"), F.col("doc_id"))
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        out = ps(d)
        return out.select("doc_id", "n_urls", "n_emails", F.md5("scrubbed").alias("scrub_md5"))

    q["pii_scrub"] = pii_scrub

    # IVF with the deterministic first_k codebook: the whole inverted
    # index (centroids, cell assignment, probes, rerank) is SQL-rebuildable
    # so the driver hash-verifies the IVF plumbing end to end (the kmeans
    # codebook variant stays rows-only — iterative training is not SQL)
    def ivf_ann_fixed(spark, sf_dir):
        from osm2world_spark.operators.similarity import ivf_topk

        e = _t(spark, sf_dir, "embeddings")
        return ivf_topk(
            e.where(F.col("vec_id") < 20), e, k=5, n_cells=16, n_probe=4,
            codebook="first_k",
        )

    q["ivf_ann_fixed"] = ivf_ann_fixed

    # winnowing fingerprint near-dups (MOSS algorithm): portable md5
    # k-gram hashes so DuckDB rebuilds identical fingerprints/windows
    def winnow_dups(spark, sf_dir):
        from osm2world_spark.operators.dedup import winnow_near_dups

        d = _t(spark, sf_dir, "documents")
        return winnow_near_dups(d, k=8, w=8, min_shared=12, portable=True)

    q["winnow_dups"] = winnow_dups

    # count-min sketch: build the 4x256 sketch over the corpus tokens and
    # point-estimate every distinct token; exact counts joined alongside
    # so the over-count-only invariant is data the oracle also checks
    def count_min(spark, sf_dir):
        from osm2world_spark.operators.sketches import (
            count_min_estimate,
            count_min_sketch,
        )

        d = _t(spark, sf_dir, "documents")
        toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok")).where(
            F.col("tok") != ""
        )
        sketch = count_min_sketch(toks, "tok", depth=4, width=256)
        exact = toks.groupBy(F.col("tok").alias("key")).agg(F.count("*").alias("exact"))
        est = count_min_estimate(sketch, exact.select("key"), "key", depth=4, width=256)
        return est.join(exact, "key").select(
            "key", F.col("est").cast("bigint").alias("est"),
            F.col("exact").cast("bigint").alias("exact"),
        )

    q["count_min"] = count_min

    # HyperLogLog registers over doc ids: pure-integer rank construction
    # (bit length via base-2 conv), so the register table is engine-exact
    def hll_sketch(spark, sf_dir):
        from osm2world_spark.operators.sketches import hll_registers

        d = _t(spark, sf_dir, "documents")
        return hll_registers(d.select(F.col("doc_id").cast("string").alias("v")), "v", p=12)

    q["hll_sketch"] = hll_sketch

    # context-window chunking with overlap: offsets exact, chunk text
    # verified by md5
    def chunk_docs(spark, sf_dir):
        from osm2world_spark.operators.packing import chunk_documents

        d = _t(spark, sf_dir, "documents")
        out = chunk_documents(d, chunk_tokens=32, overlap=8)
        return out.select(
            "doc_id", "chunk_idx", "tok_start", "tok_end",
            F.md5("chunk").alias("chunk_md5"),
        )

    q["chunk_docs"] = chunk_docs

    # product-quantization ANN (asymmetric distance over deterministic
    # first_k sub-codebooks): codes + ADC ranking fully SQL-rebuildable
    def pq_ann(spark, sf_dir):
        from osm2world_spark.operators.similarity import pq_topk

        e = _t(spark, sf_dir, "embeddings")
        return pq_topk(e.where(F.col("vec_id") < 20), e, k=5, m=8, k_sub=16)

    q["pq_ann"] = pq_ann

    # distributed Lloyd's k-means, one full iteration from the first_k
    # init — the round is SQL-expressible so the assignment after re-
    # averaging is hash-verified (multi-iteration runs are pytest-covered)
    def kmeans_1iter(spark, sf_dir):
        from osm2world_spark.operators.similarity import kmeans_assign

        e = _t(spark, sf_dir, "embeddings")
        return kmeans_assign(e, k=8, iters=1)

    q["kmeans_1iter"] = kmeans_1iter

    # SimplePolygonXZ.getSimplifiedPolygon: two-tolerance vertex drop with
    # the 10% area retry, over rectangles with four perturbed edge
    # midpoints (one exactly collinear) so every branch toggles with k
    def simplify_ring(spark, sf_dir):
        from osm2world_spark.functions.polyline import simplified_polygon

        c = (
            _t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("k"))
            .where(F.col("k") % 2 == 0)
        )
        open_ring = F.expr(
            "flatten(transform(sequence(0, 7), j -> array("
            + _SR_XS + ", " + _SR_ZS + ")))"
        )
        ring = F.concat(open_ring, F.slice(open_ring, 1, 2))
        out = simplified_polygon(ring)
        pairs = F.transform(
            F.sequence(F.lit(0), (F.size(out) / 2 - 1).cast("int")),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.floor(F.element_at(out, (i * 2 + 1).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("x_u6"),
                F.floor(F.element_at(out, (i * 2 + 2).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("z_u6"),
            ),
        )
        return c.select("k", F.explode(pairs).alias("p")).select(
            "k", "p.idx", "p.x_u6", "p.z_u6"
        )

    q["simplify_ring"] = simplify_ring

    # SimplePolygonXZ.convexHull (Sklansky chains in F.aggregate) over
    # radial star polygons, both rotation senses; the oracle rebuilds the
    # hull with a gift-wrapping recursive CTE (equal on star-shaped =
    # weakly-externally-visible input, where Sklansky is exact)
    def convex_hull(spark, sf_dir):
        from osm2world_spark.functions.polyline import convex_hull_ring

        s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
        open_ring = F.expr(
            f"flatten(transform(sequence(0, {_CH_M} - 1), j -> array("
            + _CH_X + ", " + _CH_Z + ")))"
        )
        ring = F.concat(open_ring, F.slice(open_ring, 1, 2))
        out = convex_hull_ring(ring)
        pairs = F.transform(
            F.sequence(F.lit(0), (F.size(out) / 2 - 1).cast("int")),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.floor(F.element_at(out, (i * 2 + 1).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("x_u6"),
                F.floor(F.element_at(out, (i * 2 + 2).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("z_u6"),
            ),
        )
        return s.select("k", F.explode(pairs).alias("p")).select(
            "k", "p.idx", "p.x_u6", "p.z_u6"
        )

    q["convex_hull"] = convex_hull

    # CCNet/RefinedWeb paragraph-level dedup: synthesize 3-paragraph docs
    # where the middle paragraph is shared across every doc_id % 7 class,
    # dedup with global first-occurrence-wins, hash the surviving text
    def para_dedup(spark, sf_dir):
        from osm2world_spark.operators.dedup import paragraph_dedup

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        docs = d.select(
            "doc_id",
            F.concat(
                F.substring("text", 1, 50),
                F.lit("\n\n"),
                F.concat(
                    F.lit("shared para "), (F.col("doc_id") % 7).cast("string")
                ),
                F.lit("\n\n"),
                F.substring("text", 11, 60),
            ).alias("text"),
        )
        out = paragraph_dedup(docs, key="text")
        return out.select(
            "doc_id",
            "n_paragraphs",
            "n_kept",
            F.md5("text_dedup").alias("dedup_md5"),
        )

    q["para_dedup"] = para_dedup

    # RefinedWeb-style per-domain cap over synthesized provenance URLs:
    # keep the 10 largest docs per registered domain, deterministic
    # (n_chars DESC, doc_id) tie-break
    def domain_cap_docs(spark, sf_dir):
        from osm2world_spark.operators.web import domain_cap

        d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
        url = F.concat(
            F.lit("https://"),
            F.element_at(
                F.lit(["www", "cdn", "blog", "api", "m"]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
            F.lit(".site"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        )
        out = domain_cap(
            d.withColumn("url", url), max_per_domain=10, order_col="n_chars"
        )
        return out.select(
            "doc_id", "host", "domain",
            F.col("rank_in_domain").cast("int").alias("rank_in_domain"),
            "kept",
        )

    q["domain_cap"] = domain_cap_docs

    # Gopher / MassiveWeb document-quality rules (Rae et al. 2021 table
    # A1) over line-structured synthesis: %5 docs get a bullet opener,
    # %7 docs get '#' symbols, %3 docs end on an ellipsis line — every
    # rule fires on a deterministic slice, all ratios exact micro-units
    def gopher_rules(spark, sf_dir):
        from osm2world_spark.operators.quality import gopher_quality

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        g = F.concat(
            F.when(F.col("doc_id") % 5 == 0, F.lit("- bulleted opener for doc.\n")).otherwise(F.lit("")),
            F.substring("text", 1, 160),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" ## #")).otherwise(F.lit("")),
            F.lit("\n"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("the closing line trails off..."))
            .otherwise(F.lit("the final line of this document stands here.")),
        )
        return gopher_quality(d.select("doc_id", g.alias("text")), min_words=20)

    q["gopher_rules"] = gopher_rules

    # end-to-end curation composition (plans/curation.py): quality ->
    # exact dedup -> split -> pack in ONE two-exchange plan. Synthesis:
    # %5 docs get a too-short text (quality drop), the rest collapse
    # into 91 duplicate classes keyed by (doc_id%7, doc_id%13) so the
    # first-kept-occurrence-wins dedup, the canonical-only split gate,
    # and the zero-contribution packing all fire on real group structure
    def curate_docs(spark, sf_dir):
        from osm2world_spark.plans.curation import curate

        d = _t(spark, sf_dir, "documents").select("doc_id")
        body = F.concat(
            F.lit(
                "the steady data rows that have to be of and with all these words here "
            ),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(" "),
            F.repeat(F.lit("extra word here "), (F.col("doc_id") % 13).cast("int")),
            F.lit("end."),
        )
        g = F.when(F.col("doc_id") % 5 == 0, F.lit("tiny.")).otherwise(body)
        return curate(
            d.select("doc_id", g.alias("text")),
            min_words=10,
            budget_tokens=128,
            n_buckets=8,
        )

    q["curate"] = curate_docs

    # BM25 ranked retrieval (operators/retrieval.py) in the rational-idf
    # oracle mode: fixed 3-query set over the corpus vocabulary, top-5
    # docs per query with integer micro-unit scores
    def bm25_query(spark, sf_dir):
        from osm2world_spark.operators.retrieval import bm25_topk

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        qs = spark.createDataFrame(
            [(0, "spark join window"), (1, "table scan filter"), (2, "hash agg merge")],
            "query_id int, query_text string",
        )
        return bm25_topk(d, qs, k=5, idf="rational")

    q["bm25_topk"] = bm25_query

    # blocklist hygiene pass: shuffle-free projection, ratio mode
    def blocklist_query(spark, sf_dir):
        from osm2world_spark.operators.retrieval import blocklist_filter

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        return blocklist_filter(d, ["slow", "big"], max_block_ratio=0.05)

    q["blocklist"] = blocklist_query

    # C4 cleaning pass (Raffel et al. 2020 §2.2): terminal-punctuation /
    # min-words / javascript line rules + '{' / lorem-ipsum / thin-doc
    # document rules, over 4-line synthesized docs
    def c4_clean(spark, sf_dir):
        from osm2world_spark.operators.quality import c4_line_filter

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        l3 = (
            F.when(F.col("doc_id") % 4 == 0, F.lit("this line asks a question?"))
            .when(F.col("doc_id") % 4 == 1, F.lit("enable javascript to proceed."))
            .when(F.col("doc_id") % 4 == 2, F.lit("short one."))
            .otherwise(F.lit("a solid third sentence ends well."))
        )
        l4 = F.when(F.col("doc_id") % 11 == 0, F.lit("bad brace { appears here.")).otherwise(
            F.lit("the last line finishes cleanly.")
        )
        c = F.concat(
            F.lit("the opening line has a period.\n"),
            F.substring("text", 1, 100 + (F.col("doc_id") % 40).cast("int")),
            F.lit("\n"), l3, F.lit("\n"), l4,
        )
        out = c4_line_filter(d.select("doc_id", c.alias("text")))
        return out.select(
            "doc_id", "n_lines", "n_kept_lines", "keep_doc",
            F.md5("text_clean").alias("clean_md5"),
        )

    q["c4_clean"] = c4_clean

    # corpus-level boilerplate line removal (CCNet/RefinedWeb line
    # dedup): lines in > 2 distinct docs are stripped from every doc;
    # %4 boiler lines (~125 docs each) vanish, %300 'rare' lines (1-2
    # docs) survive — one count-distinct agg + broadcast anti join
    def line_dedup(spark, sf_dir):
        from osm2world_spark.operators.quality import boilerplate_line_dedup

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        t = F.concat(
            F.substring("text", 1, 30), F.lit(" unique head.\n"),
            F.lit("shared boiler line "), (F.col("doc_id") % 4).cast("string"), F.lit(".\n"),
            F.lit("rare shared "), (F.col("doc_id") % 300).cast("string"), F.lit(".\n"),
            F.substring("text", 5, 35), F.lit(" unique tail."),
        )
        out = boilerplate_line_dedup(d.select("doc_id", t.alias("text")), max_docs=2)
        return out.select(
            "doc_id", "n_lines", "n_kept_lines", F.md5("text_dedup").alias("dedup_md5")
        )

    q["line_dedup"] = line_dedup

    # Bloom-filter decontamination probe: benchmark = every 37th doc's
    # distinct tokens -> 4096-bit/k=3 filter -> the corpus side runs the
    # membership test as a pure map-side expression inside a lambda (zero
    # shuffles, no join on the 100-TB side); false positives are
    # deterministic data both engines reproduce
    def bloom_decon(spark, sf_dir):
        from osm2world_spark.operators.sketches import (
            bloom_build,
            bloom_predicate,
        )

        d = _t(spark, sf_dir, "documents")
        bench = (
            d.where(F.col("doc_id") % 37 == 0)
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != "")
            .distinct()
        )
        pred = bloom_predicate(
            bloom_build(bench, "tok", n_bits=1 << 12, k=3),
            n_bits=1 << 12,
            k=3,
        )
        toks = F.array_distinct(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        )
        return d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.filter(toks, lambda t: pred(t))).alias("n_hits"),
        ).withColumn("flagged", F.col("n_hits") > 0)

    q["bloom_decon"] = bloom_decon

    # multimodal near-dup pairs: 18x16 synthetic grayscale images (25
    # base patterns, single-pixel bumps varying per doc) -> exact-integer
    # dHash -> banded Hamming LSH; with max_hamming=3 the 4-band
    # pigeonhole makes the output the EXACT hamming<=3 pair set, which
    # the oracle rebuilds by brute force over all pairs
    def dhash_dups(spark, sf_dir):
        from osm2world_spark.operators.phash import (
            dhash_from_pixels,
            dhash_near_dups,
        )

        d = _t(spark, sf_dir, "documents").select("doc_id")
        W, H = 18, 16
        did = F.col("doc_id")
        px = F.transform(
            F.sequence(F.lit(0), F.lit(W * H - 1)),
            lambda i: (
                ((i * 37 + (did % 25) * 101) % 251)
                + F.when(
                    i == (did * 7) % (W * H),
                    (F.floor(did / 25).cast("bigint") % 5) * 15,
                ).otherwise(F.lit(0).cast("bigint"))
            ).cast("int"),
        )
        hdf = d.select(
            "doc_id", dhash_from_pixels(px, W, H).alias("dh")
        ).select("doc_id", "dh.hi", "dh.lo")
        return dhash_near_dups(hdf, max_hamming=3)

    q["dhash_dups"] = dhash_dups

    # content-defined chunking over the corpus: md5-portable boundary
    # rule so the oracle replays every boundary decision exactly
    def cdc_chunk_docs(spark, sf_dir):
        from osm2world_spark.operators.packing import cdc_chunks

        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        out = cdc_chunks(d, k=3, mask_bits=4, key="md5")
        return out.select(
            "doc_id", "chunk_idx", "tok_start", "n_tokens",
            F.md5("chunk_text").alias("chunk_md5"),
        )

    q["cdc_chunks"] = cdc_chunk_docs

    # GeometryUtil.roughlyContains over rect pairs sweeping the 1%
    # tolerance: k%4 classes = contained / <1% sliver out / half out /
    # disjoint; micro-rounded fraction bridges the triangulation-vs-
    # closed-form fp trees (error ~1e-12, boundary margin >= 1e-7)
    def roughly_contains_rects(spark, sf_dir):
        from osm2world_spark.operators.boolean import roughly_contains

        c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
        x0, z0 = F.expr(X_M.format(k="k")), F.expr(Z_M.format(k="k"))
        W = F.expr("CAST(100 + k % 20 AS DOUBLE)")
        H = F.expr("CAST(80 + (k * 3) % 20 AS DOUBLE)")
        w2 = F.expr("CAST(30 + k % 10 AS DOUBLE)")
        h2 = F.expr("CAST(25 + k % 7 AS DOUBLE)")
        s = F.expr("CAST(0.2 AS DOUBLE) + CAST(0.25 AS DOUBLE) * CAST(k % 3 AS DOUBLE)")
        cls = F.expr("k % 4")
        bx0 = (
            F.when(cls == 0, x0 + 5.0)
            .when(cls == 1, x0 + W - w2 + s)
            .when(cls == 2, x0 + W - w2 / 2.0)
            .otherwise(x0 + W + 50.0)
        )
        bz0 = z0 + F.lit(5.0)
        a_geom = F.array(
            F.array(x0, z0, x0 + W, z0, x0 + W, z0 + H, x0, z0 + H, x0, z0)
        )
        b_geom = F.array(
            F.array(
                bx0, bz0, bx0 + w2, bz0, bx0 + w2, bz0 + h2,
                bx0, bz0 + h2, bx0, bz0,
            )
        )
        pairs = c.select(
            F.col("k").cast("string").alias("pair_id"),
            a_geom.alias("a_geom"),
            b_geom.alias("b_geom"),
        )
        out = roughly_contains(pairs)
        return out.select(
            F.col("pair_id").cast("bigint").alias("k"),
            "contains",
            "roughly_contains",
            F.floor(F.col("outside_frac") * 1e6 + 0.5)
            .cast("bigint")
            .alias("out_u6"),
        )

    q["roughly_contains"] = roughly_contains_rects

    # token-budgeted mixture: per-source budgets derived from the source
    # id; kept = greedy prefix in md5-hash order within the budget
    def token_mix(spark, sf_dir):
        from osm2world_spark.operators.packing import token_budget_mix

        d = _t(spark, sf_dir, "documents")
        budget = (
            F.lit(2000)
            + (F.substring("source", 4, 10).cast("int") % 5) * F.lit(1500)
        )
        out = token_budget_mix(d, budget=budget)
        return out.select(
            "doc_id", "source", "n_tokens",
            F.col("mix_rank").cast("int").alias("mix_rank"),
            "cum_tokens", "kept",
        )

    q["token_mix"] = token_mix

    # UniMax budget allocation (Chung 2023): per-(lang, source) token
    # counts -> ascending waterfill with a 2-epoch cap against a 20k
    # budget; the whole sequential cascade closes into one sorted
    # window pass with exact-integer arithmetic (operators/packing.py)
    def unimax_alloc(spark, sf_dir):
        from osm2world_spark.operators.packing import unimax_allocation
        from osm2world_spark.operators.text import token_count

        counts = (
            _t(spark, sf_dir, "documents")
            .groupBy("lang", "source")
            .agg(F.sum(token_count(F.col("text"))).alias("n_tokens"))
        )
        return unimax_allocation(
            counts, total_budget=20000, epoch_cap=2,
            source_cols=("lang", "source"),
        )

    q["unimax_alloc"] = unimax_alloc

    # distributed Gram matrix over the embeddings table, quantized mode:
    # integer partial sums are order-independent, so the d^2 cells are
    # exactly reproducible under any partitioning and the oracle
    # recomputes them bit-for-bit
    def gram_embed(spark, sf_dir):
        from osm2world_spark.operators.similarity import gram_matrix

        e = _t(spark, sf_dir, "embeddings")
        return gram_matrix(e, "embedding", quantize_bits=10).select(
            "i", "j", F.col("val").alias("gval")
        )

    q["gram_embed"] = gram_embed

    # GeometryUtil.interpolateOn + PolylineShapeXZ.pointAtOffset over
    # 4-point polylines; ratio sweeps 0..1 (incl. the fp-fallback at 1),
    # offset overshoots for k%7 large (fallback branch)
    def polyline_walk(spark, sf_dir):
        from osm2world_spark.functions.polyline import (
            interpolate_on,
            point_at_offset,
        )

        o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
        pts = []
        for m in ("k", "k * 3 + 1", "k * 7 + 2", "k * 5 + 3"):
            pts += [F.expr(X_M.format(k=m)), F.expr(Z_M.format(k=m))]
        g = F.array(*pts)
        ratio = (F.col("k") % 10).cast("double") / F.lit(9.0)
        off = (F.col("k") % 7).cast("double") * F.lit(25.0)
        ip = interpolate_on(g, ratio)
        op = point_at_offset(g, off)
        return o.select(
            "k",
            F.floor(ip["px"] * 1e6 + 0.5).cast("bigint").alias("ix_u6"),
            F.floor(ip["pz"] * 1e6 + 0.5).cast("bigint").alias("iz_u6"),
            F.floor(op["px"] * 1e6 + 0.5).cast("bigint").alias("ox_u6"),
            F.floor(op["pz"] * 1e6 + 0.5).cast("bigint").alias("oz_u6"),
        )

    q["polyline_walk"] = polyline_walk

    # interpolateEleOfPolyline over 5-point polylines whose 4th vertex
    # revisits the 2nd — exercising offsetOf's indexOf-first-occurrence
    # path (verified collision-free for all key multipliers to 20k)
    def polyline_ele(spark, sf_dir):
        from osm2world_spark.functions.polyline import (
            interpolate_ele_of_polyline,
        )

        s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
        pts = []
        for m in ("k", "k * 3 + 1", "k * 7 + 2", "k * 3 + 1", "k * 5 + 3"):
            pts += [F.expr(X_M.format(k=m)), F.expr(Z_M.format(k=m))]
        g = F.array(*pts)
        ele = interpolate_ele_of_polyline(
            g,
            (F.col("k") % 50).cast("double"),
            ((F.col("k") * 3) % 70).cast("double"),
        )
        pairs = F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: F.struct(
                i.cast("int").alias("idx"),
                F.floor(F.element_at(ele, (i + 1).cast("int")) * 1e6 + 0.5)
                .cast("bigint")
                .alias("ele_u6"),
            ),
        )
        return s.select("k", F.explode(pairs).alias("p")).select(
            "k", "p.idx", "p.ele_u6"
        )

    q["polyline_ele"] = polyline_ele

    # batch twin of the streaming windowed HLL (stream==batch agreement
    # is pytest-pinned; the registers themselves hash-verify here):
    # per-hour distinct-user sketch registers over the events table
    def hll_hourly(spark, sf_dir):
        from osm2world_spark.streaming.ingest import stream_hll_windowed

        e = _t(spark, sf_dir, "events")
        return stream_hll_windowed(e, value_col="user_id", p=10)

    q["hll_hourly"] = hll_hourly

    # --- §2.7: OSM tag-value parsers (ValueParseUtil.java:42-388) —
    # speed/measure/weight/incline/angle over a deterministic raw-string
    # mix exercising every branch (unitless POSITIVE, km/h, mph, m, km,
    # feet-inches with float32 unit constants, signed %, compass rose,
    # garbage); the real regex parsers run engine-side, the oracle
    # re-derives each value arithmetically from the generator params
    def parse_values(spark, sf_dir):
        from osm2world_spark.functions import values as V
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        a = (F.col("doc_id") * 37 % 97).cast("int")
        b = (F.col("doc_id") % 7).cast("int")
        kind = (F.col("doc_id") % 10).cast("int")
        rose = F.array(*[F.lit(n) for n, _ in V._COMPASS])
        a_s, b_s = a.cast("string"), b.cast("string")
        raw = (
            F.when(kind == 0, a_s)
            .when(kind == 1, F.concat(F.lit("-"), a_s, F.lit("."), b_s))
            .when(kind == 2, F.concat(a_s, F.lit(" km/h")))
            .when(kind == 3, F.concat(a_s, F.lit(" mph")))
            .when(kind == 4, F.concat(a_s, F.lit("."), b_s, F.lit(" m")))
            .when(kind == 5, F.concat(a_s, F.lit(" km")))
            .when(kind == 6, F.concat(a_s, F.lit("'"), b_s, F.lit('"')))
            .when(
                kind == 7,
                F.concat(
                    F.when(b % 2 == 0, F.lit("-")).otherwise(F.lit("")),
                    a_s, F.lit("."), b_s, F.lit(" %"),
                ),
            )
            .when(kind == 8, F.element_at(rose, (F.col("doc_id") % 16).cast("int") + 1))
            .otherwise(F.concat(F.lit("v"), a_s))
        )
        d = d.select("doc_id", raw.alias("raw"))
        r = F.col("raw")
        return d.select(
            "doc_id",
            "raw",
            micro(V.parse_speed(r)).alias("speed_kmh_u"),
            micro(V.parse_measure(r)).alias("measure_m_u"),
            micro(V.parse_weight(r)).alias("weight_t_u"),
            micro(V.parse_incline(r)).alias("incline_pct_u"),
            micro(V.parse_angle(r)).alias("angle_deg_u"),
        )

    q["parse_values"] = parse_values

    def perceptron_step(spark, sf_dir):
        # Distributed batch-perceptron TRAINING epoch over the same
        # closed-form 64x3 hashed model as classify_docs: labels are
        # length(text) % 3, lr=1, md5 hash family. Output packs the
        # full updated weight table (buckets 0..63), the bias update
        # as bucket=-1, and (n_scored, n_wrong, 0) as bucket=-2, so
        # the oracle re-derives the entire epoch in exact bigints.
        from osm2world_spark.operators.classify import perceptron_epoch

        wv = spark.range(64).select(
            F.col("id").alias("bucket"),
            F.array(
                *[
                    ((F.col("id") * 2654435761 + c * 40503) % 2001 - 1000)
                    .cast("bigint")
                    for c in range(3)
                ]
            ).alias("ws"),
        )
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        labels = docs.select(
            "doc_id", (F.length("text") % 3).cast("int").alias("y")
        )
        nw, stats = perceptron_epoch(
            docs, labels, wv, [-25, 12, -1], 64, lr=1, key="md5"
        )
        unpack = lambda df: df.select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.element_at("ws", 1).cast("bigint").alias("w0"),
            F.element_at("ws", 2).cast("bigint").alias("w1"),
            F.element_at("ws", 3).cast("bigint").alias("w2"),
        )
        extra = stats.select(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.element_at("db", 1).cast("bigint").alias("w0"),
            F.element_at("db", 2).cast("bigint").alias("w1"),
            F.element_at("db", 3).cast("bigint").alias("w2"),
        ).unionAll(
            stats.select(
                F.lit(-2).cast("bigint").alias("bucket"),
                F.col("n_scored").cast("bigint").alias("w0"),
                F.col("n_wrong").cast("bigint").alias("w1"),
                F.lit(0).cast("bigint").alias("w2"),
            )
        )
        return unpack(nw).unionAll(extra)

    q["perceptron_step"] = perceptron_step

    def backoff_lm(spark, sf_dir):
        # Stupid-backoff bigram LM (Brants 2007 §4) trained and applied
        # in-plan with the paper's count cutoff (min_count=2): exact
        # integer evidence only — hit/backoff counts and the frequency
        # masses of both branches; the float logscore stays under the
        # pytest oracle, mirroring ngram_lm's evidence/score split.
        from osm2world_spark.operators.text import stupid_backoff_score

        d = _t(spark, sf_dir, "documents")
        return stupid_backoff_score(d, min_count=2).select(
            "doc_id", "n_bigrams", "n_hits", "n_backoffs",
            "sum_hit_num", "sum_hit_den", "sum_backoff_num",
        )

    q["backoff_lm"] = backoff_lm

    def ccnet_buckets(spark, sf_dir):
        # CCNet head/middle/tail corpus split (Wenzek 2020 §4.4): the
        # corpus bigram-LM familiarity statistic (sum_freq/n_ngrams,
        # an exact-rational double) compared against FIXED calibration
        # cutoffs — a shuffle-free projection, never a global ntile.
        from osm2world_spark.operators.quality import perplexity_buckets
        from osm2world_spark.operators.text import ngram_lm_score

        scored = ngram_lm_score(_t(spark, sf_dir, "documents"), n=2)
        return perplexity_buckets(scored, (31.5, 30.0)).select(
            "doc_id", "sum_freq", "n_ngrams", "familiarity", "bucket"
        )

    q["ccnet_buckets"] = ccnet_buckets

    def dedup_span_removal(spark, sf_dir):
        # The Lee 2022 ExactSubstr DELIVERABLE: the cleaned corpus.
        # Same k=4/min_count=2 span semantics as dup_spans (its oracle
        # CTE chain is the prefix of this one), then token surgery —
        # covered positions anti-joined away, text reassembled in
        # order. Row count preserved (untouched docs included).
        from osm2world_spark.operators.dedup import remove_dup_spans

        d = _t(spark, sf_dir, "documents")
        return remove_dup_spans(d, k=4, min_count=2, gram_key="exact")

    q["dedup_span_removal"] = dedup_span_removal

    def incremental_dedup(spark, sf_dir):
        # Streaming-ingest dedup: a synthesized NEW batch scanned
        # against the OLD corpus's persisted minhash index (portable
        # md5 family, k=8, 4 bands of 2). Per old doc_id d the batch
        # holds one of: an exact clone (d%3==0), a one-token-appended
        # near-dup (d%3==1), or a fully novel doc (d%3==2, an insert —
        # absent from the output by contract).
        from osm2world_spark.operators.dedup import (
            incremental_near_dups,
            lsh_index,
        )

        old = _t(spark, sf_dir, "documents").select("doc_id", "text")
        key = F.col("doc_id").cast("bigint")
        new = old.select(
            F.concat(F.lit("n"), F.col("doc_id")).alias("doc_id"),
            F.when(key % 3 == 0, F.col("text"))
            .when(key % 3 == 1, F.concat(F.col("text"), F.lit(" zz"), F.col("doc_id")))
            .otherwise(
                F.concat(
                    F.lit("novel"), F.col("doc_id"),
                    F.lit(" entirely fresh content "), F.col("doc_id"),
                )
            )
            .alias("text"),
        )
        idx = lsh_index(old, k=8, n=3, portable=True)
        return incremental_near_dups(
            new, idx, bands=4, min_matches=4, k=8, n=3, portable=True
        )

    q["incremental_dedup"] = incremental_dedup

    def hillshade_raster(spark, sf_dir):
        # Analytical hillshade over the raster_gradients synthetic DEM
        # (NW light, 45 deg altitude, 90 m pixels). The zenith/azimuth
        # trig constants are computed once in Python and shared with
        # the oracle literally; per-pixel trig rounds to u3 fixed
        # point, the established float-hash discipline.
        from osm2world_spark.operators.rasterops import (
            hillshade,
            raster_gradients,
        )

        n = 200
        grid = spark.range(n * n).select(
            F.lit(13).alias("cell_lon"),
            F.lit(48).alias("cell_lat"),
            (F.col("id") % n).cast("int").alias("px"),
            F.floor(F.col("id") / n).cast("int").alias("py"),
        )
        elev = F.when(
            (F.col("px") * 31 + F.col("py") * 37) % 499 == 0, F.lit(-32768)
        ).otherwise((F.col("px") * 7919 + F.col("py") * 104729) % 1000)
        shaded = hillshade(raster_gradients(grid.withColumn("elev", elev.cast("int"))))
        return shaded.select(
            "cell_lon", "cell_lat", "px", "py", "dzdx2", "dzdy2",
            F.floor(F.col("shade") * 1000.0 + 0.5).cast("bigint").alias("shade_u3"),
        )

    q["hillshade_raster"] = hillshade_raster

    # marching-squares terrain contours (operators/contours.py): the
    # isoline pass over a paraboloid DEM with sparse no-data holes.
    # Corner assembly is the two-window raster_gradients pattern; the
    # 16-case segment table + saddle center rule evaluate as Column
    # arithmetic; endpoints are exact integer rationals (edge code +
    # t_num/t_den) so the oracle replays them bit-for-bit. The oracle's
    # CASE chain is GENERATED from the same Python table
    # (segments_case_codes) the Column builder uses.
    def contour_lines(spark, sf_dir):
        from osm2world_spark.operators.contours import contour_segments

        n = 160
        grid = spark.range(n * n).select(
            F.lit(13).alias("cell_lon"),
            F.lit(48).alias("cell_lat"),
            (F.col("id") % n).cast("int").alias("px"),
            F.floor(F.col("id") / n).cast("int").alias("py"),
        )
        r2 = (F.col("px") - 80) * (F.col("px") - 80) + (F.col("py") - 80) * (
            F.col("py") - 80
        )
        elev = F.when(
            (F.col("px") * 31 + F.col("py") * 37) % 997 == 0, F.lit(-32768)
        ).otherwise(F.floor(r2 / 25.0).cast("int"))
        return contour_segments(
            grid.withColumn("elev", elev.cast("int")), interval=40
        )

    q["contour_lines"] = contour_lines

    # stitched contour topology: marching-squares segments -> endpoint
    # nodes keyed by global grid-edge identity -> pointer-doubled
    # connected components -> one row per isoline with ring/chain
    # topology (closed ring: V == E, zero open ends; boundary/no-data
    # chain: exactly 2).  Smaller paraboloid (64^2, interval 25) so the
    # recursive-CTE oracle's transitive closure stays tiny; levels 25
    # (closed interior ring) and 50/75 (clipped at the grid border ->
    # open chains) exercise both shapes, the no-data holes a third.
    def contour_topology(spark, sf_dir):
        from osm2world_spark.operators.contours import (
            contour_segments,
            stitch_contours,
        )

        n, c = 64, 32
        grid = spark.range(n * n).select(
            F.lit(13).alias("cell_lon"),
            F.lit(48).alias("cell_lat"),
            (F.col("id") % n).cast("int").alias("px"),
            F.floor(F.col("id") / n).cast("int").alias("py"),
        )
        r2 = (F.col("px") - c) * (F.col("px") - c) + (F.col("py") - c) * (
            F.col("py") - c
        )
        elev = F.when(
            (F.col("px") * 31 + F.col("py") * 37) % 997 == 0, F.lit(-32768)
        ).otherwise(F.floor(r2 / 25.0).cast("int"))
        segs = contour_segments(
            grid.withColumn("elev", elev.cast("int")), interval=25
        )
        return stitch_contours(segs, interval=25)

    q["contour_topology"] = contour_topology

    # seam-crossing stitch: the SAME paraboloid cut into a 2x2 grid of
    # 40-pixel raster cells (the tile seams run straight through every
    # ring), contoured per cell after a halo exchange and stitched with
    # GLOBAL node identity.  Cells sit at (-180,-90) so the global
    # pixel formula (cell_lon+180)*40+px reduces to the plain grid
    # coordinate — making the oracle the single-80-grid topology replay
    # verbatim.  Hash equality against it proves the distributed
    # halo+stitch is indistinguishable from having had the whole raster
    # in one piece, which is the planet-scale correctness contract.
    def contour_stitch_seam(spark, sf_dir):
        from osm2world_spark.operators.contours import (
            contour_segments,
            halo_raster,
            stitch_contours,
        )

        n, c = 40, 40
        g = spark.range(4 * n * n).select(
            (F.col("id") % (2 * n)).cast("int").alias("gx"),
            F.floor(F.col("id") / (2 * n)).cast("int").alias("gy"),
        )
        r2 = (F.col("gx") - c) * (F.col("gx") - c) + (F.col("gy") - c) * (
            F.col("gy") - c
        )
        elev = F.when(
            (F.col("gx") * 31 + F.col("gy") * 37) % 997 == 0, F.lit(-32768)
        ).otherwise(F.floor(r2 / 25.0).cast("int"))
        cells = g.select(
            (F.lit(-180) + F.floor(F.col("gx") / n)).cast("int").alias("cell_lon"),
            (F.lit(-90) + F.floor(F.col("gy") / n)).cast("int").alias("cell_lat"),
            (F.col("gx") % n).cast("int").alias("px"),
            (F.col("gy") % n).cast("int").alias("py"),
            elev.cast("int").alias("elev"),
        )
        segs = contour_segments(halo_raster(cells, n), interval=25)
        return stitch_contours(segs, interval=25, cell_pixels=n)

    q["contour_stitch_seam"] = contour_stitch_seam

    # WARC ingest (sources/warc.py): the committed ISO-28500 fixture's
    # records — framing walk, header parse, HTTP payload slice — with
    # payload identity as md5.  Every field is a pure function of the
    # record index (tools/make_warc_fixture.py), so the oracle
    # re-derives all of it with string arithmetic, never parsing WARC.
    def warc_records(spark, sf_dir):
        from osm2world_spark.sources.warc import read_warc

        df = read_warc(spark, "/root/repo/tests/fixtures/fixture.warc")
        return df.select(
            "record_id",
            "warc_type",
            "target_uri",
            "warc_date",
            "http_status",
            "http_content_type",
            "payload_len",
            F.md5(F.col("payload")).alias("payload_md5"),
        )

    q["warc_records"] = warc_records

    # ordered contour polylines (operators/contours.py order_contours):
    # Wyllie pointer-jumping list ranking over the directed segment
    # graph — seq = traversal order from the canonical head.  The
    # oracle re-derives the SAME canonical traversal with a linear
    # recursive-CTE walk (fine at oracle scale; the Spark side is the
    # O(log L) form that survives planet-scale lines).
    def contour_vertices(spark, sf_dir):
        from osm2world_spark.operators.contours import (
            contour_segments,
            order_contours,
        )

        n, c = 48, 24
        grid = spark.range(n * n).select(
            F.lit(13).alias("cell_lon"),
            F.lit(48).alias("cell_lat"),
            (F.col("id") % n).cast("int").alias("px"),
            F.floor(F.col("id") / n).cast("int").alias("py"),
        )
        r2 = (F.col("px") - c) * (F.col("px") - c) + (F.col("py") - c) * (
            F.col("py") - c
        )
        elev = F.when(
            (F.col("px") * 31 + F.col("py") * 37) % 997 == 0, F.lit(-32768)
        ).otherwise(F.floor(r2 / 25.0).cast("int"))
        segs = contour_segments(
            grid.withColumn("elev", elev.cast("int")), interval=15
        )
        return order_contours(segs, interval=15)

    q["contour_vertices"] = contour_vertices

    # HTML -> text extraction (operators/html.py): documents wrapped in
    # deterministic markup (title, block structure, script junk,
    # comments, both entity kinds, two link quote styles), extracted by
    # the codegen regexp chain.  The oracle replays the IDENTICAL chain
    # in DuckDB, generated from the module's own _DROP_TAGS /
    # _BLOCK_TAGS / _NAMED_ENTITIES constants — the two engines share
    # one source of truth for every pattern.  &#65; stays literal by
    # default (numeric decode is the separate Arrow pass, pytest-pinned).
    def html_extract(spark, sf_dir):
        from osm2world_spark.operators.html import (
            extract_links,
            extract_text,
            extract_title,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        html = F.concat(
            F.lit("<html><head><title>D"),
            F.col("doc_id").cast("string"),
            F.lit(" &amp; T</title></head><body><p>"),
            F.col("text"),
            F.lit(
                "</p><!-- c --><script>var x=1;</script>"
                "<DIV>mid &lt;x&gt;</div><ul><li>one</li><li>two</li></ul>"
                "<a href='/d/"
            ),
            F.col("doc_id").cast("string"),
            F.lit("'>l1</a><a href=\"/e/"),
            F.col("doc_id").cast("string"),
            F.lit("\">l2</a>&#65;</body></html>"),
        )
        return docs.select("doc_id", html.alias("h")).select(
            "doc_id",
            extract_title(F.col("h")).alias("title"),
            extract_text(F.col("h")).alias("text"),
            extract_links(F.col("h")).alias("links"),
        )

    q["html_extract"] = html_extract

    def jl_projection(spark, sf_dir):
        # Achlioptas +-1 JL projection 64 -> 16 over u6 fixed-point
        # inputs: every output component is an exact bigint dot
        # product; the md5-derived sign matrix regenerates identically
        # in the oracle. Flattened to (vec_id, j, y).
        from osm2world_spark.operators.similarity import jl_project

        emb = _t(spark, sf_dir, "embeddings")
        return jl_project(emb, 16, 64)

    q["jl_projection"] = jl_projection

    def embed_quantize(spark, sf_dir):
        # Symmetric int8 scalar quantization (FAISS QT_8bit_direct
        # shape): per-vector max-abs scale on the u6 grid, exact
        # rational round-half-up through one IEEE division. Flattened
        # to (vec_id, scale_u6, i, q).
        from osm2world_spark.operators.similarity import quantize_embeddings

        emb = _t(spark, sf_dir, "embeddings")
        return quantize_embeddings(emb)

    q["embed_quantize"] = embed_quantize

    def geodesy_ops(spark, sf_dir):
        # Pre-projection geodesy over the synthetic order points:
        # forward azimuth (compass degrees), great-circle triangle
        # perimeter (haversine fold), and Chamberlain-Duquette
        # spherical ring area — the oracle restates each formula
        # symbol for symbol (same d2r literal, same fold order).
        from osm2world_spark.functions.projection import (
            geodesic_length_m,
            geodesic_ring_area_m2,
            initial_bearing_deg,
        )

        o = _t(spark, sf_dir, "orders")
        la = lambda k: F.expr(LAT.format(k=k))
        lo = lambda k: F.expr(LON.format(k=k))
        lats = F.array(
            la("o_orderkey"), la("o_orderkey * 3 + 1"),
            la("o_orderkey * 7 + 2"), la("o_orderkey"),
        )
        lons = F.array(
            lo("o_orderkey"), lo("o_orderkey * 3 + 1"),
            lo("o_orderkey * 7 + 2"), lo("o_orderkey"),
        )
        return o.select(
            F.col("o_orderkey").alias("key"),
            F.round(
                initial_bearing_deg(
                    la("o_orderkey"), lo("o_orderkey"),
                    la("o_custkey"), lo("o_custkey"),
                ), 6,
            ).alias("bearing_deg"),
            F.round(geodesic_length_m(lats, lons), 6).alias("perimeter_m"),
            F.round(geodesic_ring_area_m2(lats, lons), 3).alias("area_m2"),
        )

    q["geodesy_ops"] = geodesy_ops

    def curate_model_gate(spark, sf_dir):
        # The model-gated curation capstone (plans/curation.py::
        # curate_model): Gopher rules + hashed-classifier gate
        # (closed-form 64x3 model, biases chosen so the gate splits
        # the duplicate classes ~half/half) + bigram-LM bucket gate
        # (cutoffs 1400/300 put the 'tiny.' class in tail and spread
        # the rest over head/middle) -> dedup -> split -> pack. Same
        # synthesized corpus as `curate`, so the two audit trails are
        # directly comparable.
        from osm2world_spark.plans.curation import curate_model

        d = _t(spark, sf_dir, "documents").select("doc_id")
        body = F.concat(
            F.lit(
                "the steady data rows that have to be of and with all these words here "
            ),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(" "),
            F.repeat(F.lit("extra word here "), (F.col("doc_id") % 13).cast("int")),
            F.lit("end."),
        )
        g = F.when(F.col("doc_id") % 5 == 0, F.lit("tiny.")).otherwise(body)
        wv = spark.range(64).select(
            F.col("id").alias("bucket"),
            F.array(
                *[
                    ((F.col("id") * 2654435761 + c * 40503) % 2001 - 1000)
                    .cast("bigint")
                    for c in range(3)
                ]
            ).alias("ws"),
        )
        return curate_model(
            d.select("doc_id", g.alias("text")),
            wv,
            [0, 197, -100000],
            64,
            keep_label=1,
            lm_cutoffs=(1400.0, 300.0),
            min_words=10,
            budget_tokens=128,
            n_buckets=8,
            key="md5",
        )

    q["curate_model_gate"] = curate_model_gate

    # Simple-3D-Buildings attribute derivation (operators/buildings.py;
    # BuildingDefaults.java:30-124 + BuildingPart.java:91-100 +
    # LevelAndHeightData.java:108-222): a deterministic tag corpus over
    # 15 building types x 8 roof-shape slots x 11 tagging variants, run
    # through the full defaults / levels / roof-height / height /
    # min_height chain.  Zero-exchange Column projection — at 100 TB
    # this rides any element scan for free.
    def building_heights(spark, sf_dir):
        from osm2world_spark.operators.buildings import level_and_height
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        bt = F.element_at(
            F.array(*[F.lit(t) for t in _BH_TYPES]), (i % 15).cast("int") + 1
        )
        shi = (i % 8).cast("int")
        shape_tag = F.when(
            shi >= 1, F.element_at(F.array(*[F.lit(s) for s in _BH_SHAPES]), shi)
        )
        k = (i % 11).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        m = F.create_map(
            F.lit("building"), bt,
            F.lit("roof:shape"), shape_tag,
            F.lit("building:levels"),
            F.when(k == 1, s(i % 7)).when(
                k == 2, F.concat(s(i % 5), F.lit(".5"))
            ),
            F.lit("height"),
            F.when(k == 3, s(i % 40 + 2))
            .when(k == 4, F.concat(s(i % 30 + 4), F.lit(" m")))
            .when(k == 8, F.lit("bogus"))
            .when(k == 10, s(i % 60 + 20)),
            F.lit("roof:height"), F.when(k == 4, s(i % 6)),
            F.lit("building:height"), F.when(k == 5, s(i % 25 + 3)),
            F.lit("building:min_level"), F.when(k == 5, s(i % 4)),
            F.lit("roof:levels"), F.when(k == 6, s(i % 3)),
            F.lit("building:levels:underground"), F.when(k == 7, s(i % 3)),
            F.lit("min_height"),
            F.when(k == 7, F.concat(s(i % 5), F.lit(".5"))),
            F.lit("est_height"), F.when(k == 8, s(i % 12 + 1)),
            F.lit("parking"), F.when(k == 9, F.lit("multi-storey")),
            F.lit("man_made"), F.when(k == 10, F.lit("chimney")),
        )
        d = d.select(
            "doc_id",
            F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"),
            (F.lit(10.0) + (i % 9).cast("double")).alias("diameter"),
        )
        out = level_and_height(d, diameter_col="diameter")
        return out.select(
            "doc_id",
            "btype",
            "roof_shape",
            "building_levels",
            "roof_levels",
            "min_level_wu",
            micro(F.col("height")).alias("height_u"),
            micro(F.col("roof_height")).alias("roof_height_u"),
            micro(F.col("height_without_roof")).alias("hwr_u"),
            micro(F.col("min_height")).alias("min_height_u"),
        )

    q["building_heights"] = building_heights

    # RoadModule lane-layout + width derivation (operators/roads.py;
    # RoadModule.java:823-1302): 16 highway types x 12 tagging variants
    # through the full per-lane / divider / special-lane / width chain,
    # including the reference's float32 width accumulation.  Zero
    # exchanges — a projection on the scan.
    def road_widths(spark, sf_dir):
        from osm2world_spark.operators.roads import road_lanes_and_width
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        hw = F.element_at(
            F.array(*[F.lit(h) for h in _RW_HIGHWAYS]), (i % 16).cast("int") + 1
        )
        k = (i % 12).cast("int")
        a3, a5, a9, a2 = (i % 3).cast("int"), (i % 5).cast("int"), (i % 9).cast("int"), (i % 2).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        n_pl = a3 + 1
        pl_w = F.concat_ws(
            "|",
            F.slice(
                F.array(*[s((i + j) % 4 + 3) for j in range(3)]), 1, n_pl
            ),
        )
        lr3 = F.element_at(F.array(F.lit("left"), F.lit("right"), F.lit("both")), a3 + 1)
        m = F.create_map(
            F.lit("highway"), hw,
            F.lit("lanes"),
            F.when(k == 1, s(a5 + 1)).when(k == 5, s(a3 + 1)).when(k == 8, F.lit("4")),
            F.lit("width"), F.when(k == 2, F.concat(s(a9 + 3), F.lit(".5"))),
            F.lit("sidewalk"),
            F.when(k == 3, lr3).when(k == 11, F.lit("both")),
            F.lit("cycleway"), F.when(k == 4, F.lit("lane")),
            F.lit("oneway"), F.when(k == 5, F.lit("yes")),
            F.lit("lanes:forward"), F.when(k.isin(6, 10), s(a3 + 1)),
            F.lit("lanes:backward"),
            F.when(k == 6, s(a3)).when(k == 10, F.lit("1")),
            F.lit("surface"),
            F.when(
                k == 7,
                F.element_at(
                    F.array(F.lit("gravel"), F.lit("asphalt"), F.lit("sand")), a3 + 1
                ),
            ),
            F.lit("divider"),
            F.when(
                k == 8,
                F.element_at(
                    F.array(F.lit("dashed_line"), F.lit("solid_line"), F.lit("no")),
                    a3 + 1,
                ),
            ),
            F.lit("bus_bay"), F.when(k == 9, lr3),
            F.lit("width:lanes:forward"), F.when(k == 10, pl_w),
            F.lit("width:lanes:backward"), F.when(k == 10, F.lit("3.5")),
            F.lit("sidewalk:left:width"), F.when(k == 11, F.lit("2.5")),
            F.lit("sidewalk:both:kerb"),
            F.when((k == 11) & (a2 == 0), F.lit("no")).when(k == 11, F.lit("lowered")),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = road_lanes_and_width(d)
        return out.select(
            "doc_id",
            F.col("tags")["highway"].alias("highway"),
            "oneway",
            "unmarked_lanes",
            "n_lanes_forward",
            "n_lanes_backward",
            "n_lanes",
            "centre_divider",
            micro(F.col("width")).alias("width_u"),
        )

    q["road_widths"] = road_widths

    # BarrierModule dispatch + dimension defaulting
    # (operators/barriers.py; BarrierModule.java:64-98,142-148): 16
    # barrier values x 6 fence types x 4 override variants.
    def barrier_dims(spark, sf_dir):
        from osm2world_spark.operators.barriers import barrier_dimensions
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        bval = F.element_at(
            F.array(*[F.lit(v) for v in _BAR_VALUES]), (i % 16).cast("int") + 1
        )
        ft = F.when(
            bval == "fence",
            F.element_at(F.array(*[F.lit(v) for v in _BAR_FENCE_TYPES]),
                         (i % 6).cast("int") + 1),
        )
        k = (i % 4).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        m = F.create_map(
            F.lit("barrier"), bval,
            F.lit("fence_type"), ft,
            F.lit("height"),
            F.when(k == 1, s(i % 7 + 1)).when(k == 3, F.lit("junk")),
            F.lit("width"), F.when(k == 2, F.concat(F.lit("0."), s(i % 9 + 1))),
            F.lit("est_height"), F.when(k == 3, s(i % 5 + 1)),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = barrier_dimensions(d)
        return out.select(
            "doc_id",
            F.col("tags")["barrier"].alias("barrier"),
            "barrier_kind",
            micro(F.col("barrier_height")).alias("height_u"),
            micro(F.col("barrier_width")).alias("width_u"),
        )

    q["barrier_dims"] = barrier_dims

    # RailwayModule track geometry (operators/railways.py;
    # RailwayModule.java:51-179) incl. the float32 gauge division.
    def rail_geometry(spark, sf_dir):
        from osm2world_spark.operators.railways import rail_geometry as _rg
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        rv = F.element_at(
            F.array(*[F.lit(v) for v in _RAIL_VALUES]), (i % 7).cast("int") + 1
        )
        k = (i % 3).cast("int")
        # element_at is 1-based and ANSI-strict on 0 — clamp the index;
        # the i%5==0 row never reads it (the when-guard below)
        tv = F.element_at(
            F.array(F.lit("yes"), F.lit("no"), F.lit("building_passage"),
                    F.lit("culvert")),
            F.greatest((i % 5).cast("int"), F.lit(1)),
        )
        m = F.create_map(
            F.lit("railway"), rv,
            F.lit("gauge"),
            F.when(k == 1, (F.lit(600) + (i % 1400)).cast("int").cast("string"))
            .when(k == 2, F.lit("broad")),
            F.lit("tunnel"), F.when((i % 5) >= 1, tv),
            F.lit("bridge"),
            F.when(i % 11 == 0, F.lit("yes")).when(i % 11 == 1, F.lit("no")),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = _rg(d)
        return out.select(
            "doc_id",
            F.col("tags")["railway"].alias("railway"),
            micro(F.col("gauge_m")).alias("gauge_u"),
            micro(F.col("rail_dist")).alias("rail_dist_u"),
            micro(F.col("sleeper_width")).alias("sleeper_w_u"),
            micro(F.col("ground_width")).alias("ground_w_u"),
            # int, not boolean: a NULL boolean round-trips differently
            # through pandas on the two engines (None vs NaN)
            F.col("own_ground").cast("int").alias("own_ground_i"),
            "ground_state",
        )

    q["rail_geometry"] = rail_geometry

    # PowerModule cable-run derivation (operators/power.py;
    # PowerModule.java:66-99,399-490): synthetic chained power lines
    # (4-segment groups sharing tower nodes) through the tower-config
    # aggregate + the normal/high-voltage run tables.  Node-keyed
    # exchanges only; the node-attribute side is bounded by the nodes
    # power lines actually touch (sparse at planet scale).
    def power_cables(spark, sf_dir):
        from osm2world_spark.operators.power import power_cable_runs
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        g, j = F.floor(i / 4), (i % 4).cast("int")
        c6, v5 = (i % 6).cast("int"), (i % 5).cast("int")
        cables = F.element_at(
            F.array(F.lit("2"), F.lit("3"), F.lit("5"), F.lit("8"), F.lit("12"),
                    F.lit(None).cast("string")),
            c6 + 1,
        )
        voltage = F.element_at(
            F.array(F.lit(None).cast("string"), F.lit("15000"), F.lit("60000"),
                    F.lit("220000"), F.lit("high")),
            v5 + 1,
        )
        m = F.create_map(
            F.lit("power"),
            F.when(j == 3, F.lit("minor_line")).otherwise(F.lit("line")),
            F.lit("cables"), cables,
            F.lit("voltage"), voltage,
        )
        segs = d.select(
            i.alias("seg_id"),
            (g * 10 + j).cast("long").alias("start_node"),
            (g * 10 + j + 1).cast("long").alias("end_node"),
            F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"),
        )
        nid = F.col("node_id")
        nodes = (
            segs.select(F.explode(F.array("start_node", "end_node")).alias("node_id"))
            .distinct()
            .select(
                "node_id",
                F.map_filter(
                    F.create_map(
                        F.lit("height"),
                        F.when(nid % 7 == 0, (F.lit(8) + nid % 25).cast("string")),
                    ),
                    lambda _k, v: v.isNotNull(),
                ).alias("tags"),
            )
        )
        out = power_cable_runs(segs, nodes)
        return out.select(
            "seg_id",
            "is_high_i",
            "n_runs",
            "run_idx",
            micro(F.col("right")).alias("right_u"),
            micro(F.col("y_start")).alias("y_start_u"),
            micro(F.col("y_end")).alias("y_end_u"),
        )

    q["power_cables"] = power_cables

    # TreeModule dimension chain (operators/trees.py;
    # TreeModule.java:130-185) incl. the millimetre special default
    # unit on the diameter tag.  Zero exchanges.
    def tree_dims(spark, sf_dir):
        from osm2world_spark.operators.trees import tree_dimensions
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        k = (i % 8).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        m = F.create_map(
            F.lit("height"),
            F.when(k == 1, s(i % 30 + 3)).when(k == 2, F.lit("junk")).when(
                k == 7, s(i % 30 + 3)
            ),
            F.lit("est_height"), F.when(k == 2, s(i % 12 + 4)),
            F.lit("diameter_crown"),
            F.when(k == 3, s(i % 9 + 2)).when(k == 7, s(i % 9 + 2)),
            F.lit("diameter"),
            F.when(k == 4, s(i % 500 + 100)).when(
                k == 5, F.concat(F.lit("0."), s(i % 9 + 1), F.lit(" m"))
            ),
            F.lit("circumference"), F.when(k == 6, s(i % 4 + 1)),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = tree_dimensions(d)
        return out.select(
            "doc_id",
            micro(F.col("tree_height")).alias("height_u"),
            micro(F.col("crown_diameter")).alias("crown_u"),
            micro(F.col("trunk_diameter")).alias("trunk_u"),
        )

    q["tree_dims"] = tree_dims

    # WaterModule waterway width table (operators/waterways.py;
    # WaterModule.java:44-125).  Zero exchanges.
    def waterway_widths(spark, sf_dir):
        from osm2world_spark.operators.waterways import waterway_width
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        wv = F.element_at(
            F.array(F.lit("river"), F.lit("stream"), F.lit("canal"),
                    F.lit("ditch"), F.lit("drain"), F.lit("weir"), F.lit("dam")),
            (i % 7).cast("int") + 1,
        )
        k = (i % 3).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        m = F.create_map(
            F.lit("waterway"), wv,
            F.lit("width"),
            F.when(k == 1, s(i % 9 + 1)).when(k == 2, F.lit("junk")),
            F.lit("est_width"), F.when(k == 2, s(i % 6 + 1)),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = waterway_width(d)
        return out.select(
            "doc_id",
            F.col("tags")["waterway"].alias("waterway"),
            "waterway_kind",
            micro(F.col("waterway_width")).alias("width_u"),
        )

    q["waterway_widths"] = waterway_widths

    # Cross-module structural predicates (operators/structures.py;
    # BridgeModule.java:53-56, TunnelModule.java:45-49,
    # CliffModule.java:85, BicycleParkingModule.java:103-110).
    def structure_flags(spark, sf_dir):
        from osm2world_spark.operators.structures import structure_flags as _sf
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        bridge = F.element_at(
            F.array(F.lit(None).cast("string"), F.lit("yes"), F.lit("no"),
                    F.lit("viaduct")), (i % 4).cast("int") + 1)
        tunnel = F.element_at(
            F.array(F.lit(None).cast("string"), F.lit("yes"), F.lit("no"),
                    F.lit("building_passage"), F.lit("culvert")),
            (i % 5).cast("int") + 1)
        m = F.create_map(
            F.lit("bridge"), bridge,
            F.lit("tunnel"), tunnel,
            F.lit("natural"),
            F.when(i % 3 == 0, F.lit("cliff")).when(i % 3 == 1, F.lit("tree")),
            F.lit("height"), F.when(i % 6 == 0, s(i % 12 + 2)),
            F.lit("amenity"),
            F.when(i % 2 == 0, F.lit("bicycle_parking")),
            F.lit("capacity"),
            F.when(i % 7 == 1, s(i % 40)).when(i % 7 == 2, F.lit("many")),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        out = _sf(d)
        return out.select(
            "doc_id",
            F.col("is_bridge").cast("int").alias("is_bridge_i"),
            F.col("is_tunnel").cast("int").alias("is_tunnel_i"),
            micro(F.col("cliff_height")).alias("cliff_height_u"),
            "bicycle_stands",
        )

    q["structure_flags"] = structure_flags

    # TrafficSignIdentifier decomposition (operators/trafficsigns.py;
    # traffic_sign/TrafficSignIdentifier.java): one explode, codegen
    # string Columns for country/bracket/sub-type/config keys.
    def traffic_signs(spark, sf_dir):
        from osm2world_spark.operators.trafficsigns import parse_traffic_signs

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        k = (i % 8).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        v = (
            F.when(k == 0, F.lit("city_limit"))
            .when(k == 1, F.concat(F.lit("DE:274-"), s(i % 90 + 10)))
            .when(k == 2, F.concat(F.lit("DE:265["), s(i % 5), F.lit("."),
                                   s(i % 9), F.lit("]")))
            .when(k == 3, F.concat(F.lit("GB:"), s(i % 900 + 100),
                                   F.lit(";GB:"), s(i % 900 + 101)))
            .when(k == 4, F.lit("stop,give_way"))
            .when(k == 5, F.concat(F.lit("DE:"), s(i % 300), F.lit(";")))
            .when(k == 6, F.lit(""))
            .otherwise(F.concat(F.lit("DE:1000-"), s(i % 30 + 10), F.lit("A")))
        )
        d = d.select("doc_id", v.alias("v"))
        return parse_traffic_signs(d, "v").select(
            "doc_id", "sign_idx", "country", "sign", "bracket_text",
            "sub_type", "config_key", "config_key_no_sub",
        )

    q["traffic_signs"] = traffic_signs

    # AerowayModule widths (operators/aeroways.py;
    # AerowayModule.java:212,:235).
    def aeroway_widths(spark, sf_dir):
        from osm2world_spark.operators.aeroways import aeroway_width
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        k = (i % 3).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        av = F.element_at(
            F.array(F.lit("runway"), F.lit("taxiway"), F.lit("apron"),
                    F.lit("helipad")), (i % 4).cast("int") + 1)
        m = F.create_map(
            F.lit("aeroway"), av,
            F.lit("width"),
            F.when(k == 1, s(i % 50 + 10)).when(k == 2, F.lit("junk")),
            F.lit("est_width"), F.when(k == 2, s(i % 30 + 5)),
        )
        d = d.select("doc_id", F.map_filter(m, lambda _k, v: v.isNotNull()).alias("tags"))
        return aeroway_width(d).select(
            "doc_id",
            F.col("tags")["aeroway"].alias("aeroway"),
            "aeroway_kind",
            micro(F.col("aeroway_width")).alias("width_u"),
        )

    q["aeroway_widths"] = aeroway_widths

    # StreetFurnitureModule multi-match dispatch + dims
    # (operators/furniture.py; StreetFurnitureModule.java:76-154 and
    # the per-class dimension parses).  22 single-kind templates x 3
    # override variants; multi-match order is pytest-pinned.
    def furniture(spark, sf_dir):
        from osm2world_spark.operators.furniture import furniture_attributes
        from osm2world_spark.operators.text import micro

        d = _t(spark, sf_dir, "documents").select("doc_id")
        i = F.col("doc_id")
        k = (i % 22).cast("int")
        j = (i % 3).cast("int")
        s = lambda c: c.cast("int").cast("string")  # noqa: E731
        kv = [
            ("playground", F.when(k == 0, F.lit("swing"))),
            ("capacity", F.when(k == 0, s(i % 8))),
            ("man_made",
             F.when(k == 1, F.lit("pole")).when(k == 2, F.lit("flagpole"))
             .when(k == 9, F.lit("cross"))),
            ("advertising",
             F.when(k == 3, F.lit("column")).when(k == 4, F.lit("billboard"))),
            ("amenity",
             F.when(k == 5, F.lit("bench")).when(k == 6, F.lit("table"))
             .when(k == 11, F.lit("clock")).when(k == 12, F.lit("waste_basket"))
             .when(k == 13, F.lit("grit_bin"))
             .when(k.isin(14, 15, 16), F.lit("post_box"))
             .when(k == 17, F.lit("telephone"))
             .when(k == 18, F.lit("vending_machine"))),
            ("seats", F.when(k == 5, s(i % 6))),
            ("highway",
             F.when(k == 7, F.lit("bus_stop")).when(k == 19, F.lit("street_lamp"))),
            ("public_transport", F.when(k == 8, F.lit("platform"))),
            ("bus", F.when(k == 8, F.lit("yes"))),
            ("summit:cross", F.when(k == 10, F.lit("yes"))),
            ("support", F.when(k == 11, F.lit("wall"))),
            ("brand",
             F.when(k == 14, F.lit("Deutsche Post")).when(k == 17, F.lit("Telekom"))),
            ("operator",
             F.when(k == 15, F.lit("Royal Mail")).when(k == 16, F.lit("ACME"))),
            ("vending", F.when(k == 18, F.lit("condoms"))),
            ("emergency", F.when(k == 20, F.lit("fire_hydrant"))),
            ("fire_hydrant:type", F.when(k == 20, F.lit("pillar"))),
            ("height", F.when(j == 1, s(i % 12 + 2))),
            ("width", F.when(j == 2, s(i % 5 + 1))),
        ]
        pairs = []
        for key, val in kv:
            pairs += [F.lit(key), val]
        d = d.select(
            "doc_id",
            F.map_filter(F.create_map(*pairs), lambda _k, v: v.isNotNull()).alias("tags"),
        )
        out = furniture_attributes(d)
        return out.select(
            "doc_id",
            "kind",
            micro(F.col("furniture_height")).alias("height_u"),
            micro(F.col("furniture_width")).alias("width_u"),
        )

    q["furniture"] = furniture

    return _driver_window_order(q)


# building_heights generator vocabulary, shared verbatim by the Spark
# query and the DuckDB oracle (index = doc_id % len)
_BH_TYPES = [
    "yes", "house", "greenhouse", "garage", "garages", "carport", "hut",
    "shed", "cabin", "roof", "church", "hangar", "industrial",
    "apartments", "chimney",
]
_BH_SHAPES = [
    "flat", "gabled", "hipped", "dome", "skillion", "onion", "pyramidal",
]

# road_widths generator vocabulary (index = doc_id % 16)
_RW_HIGHWAYS = [
    "motorway", "motorway_link", "trunk", "primary", "secondary", "tertiary",
    "residential", "living_street", "service", "track", "path", "footway",
    "cycleway", "pedestrian", "unclassified", "steps",
]

# barrier_dims / rail_geometry generator vocabularies
_BAR_VALUES = [
    "wall", "city_wall", "hedge", "fence", "fence", "fence", "fence",
    "cable_barrier", "handrail", "guard_rail", "jersey_barrier", "fence",
    "bollard", "chain", "ditch", "kerb",
]
_BAR_FENCE_TYPES = [
    "railing", "balustrade", "chain_link", "metal", "trellis_work", "wood",
]
_RAIL_VALUES = [
    "rail", "light_rail", "tram", "subway", "disused", "platform", "abandoned",
]

# The driver's correctness gate checks the FIRST 50 queries in dict
# insertion order. Union driver-green coverage across r1-r4 is 97/134:
# 34 SQL-checkable queries have only ever been verified by the local
# comparator (tools/check_oracles.py, same algorithm, self-reported).
# Round 5's window is exactly that rotation batch (VERDICT r4 "Next
# round" #1): the 34 never-driver-checked queries, natural_elevation
# (rows-only in r2/r4 — now carrying a golden-parquet oracle so the slot
# earns a hash row), the new round-5 queries (MBTiles source,
# progressive JPEG), and the remaining slots re-confirm the oldest
# (round-1) green rows on flagship-path queries. Everything rotated out
# has a driver-green row on record AND stays covered by the local gate.
_WINDOW_FIRST = [
    # -- the 34 SQL-checkable queries that have never had a driver row --
    "events_sliding", "event_correlation", "tri_strip_fan",
    "bpe_merge_round", "weighted_sample", "mesh_flat_normals",
    "smooth_normals", "line_ops", "semdedup", "shape_outlines",
    "dsir_score", "pagerank_ranks", "compaction_plan", "triangle_count",
    "geohash_cells", "raster_gradients", "haversine_pairs", "chunk_docs",
    "domain_cap", "gopher_rules", "curate", "bm25_topk", "blocklist",
    "c4_clean", "line_dedup", "dhash_dups", "cdc_chunks",
    "roughly_contains", "token_mix", "gram_embed", "polyline_walk",
    "polyline_ele", "hll_hourly", "parse_values",
    # -- golden-parquet oracles land this round (were rows-only) --
    "natural_elevation", "cell_ids",
    # -- round-5 additions --
    "mbtiles_tiles", "mbtiles_metadata", "jpeg_progressive",
    "bpe_batched_round", "osm_pbf_elements", "mbtiles_pbf_decode",
    # -- S8 serializer sinks (OBJ+MTL / POV-Ray / glTF / frontend-PBF),
    #    new this round: byte/index-level hash checks of the serialized
    #    model files. These displace the flagship re-confirmations —
    #    never-checked coverage outranks re-confirmation (VERDICT r3/r4);
    #    spatial_overlaps and minhash_near_dups hold r1+r3 green rows. --
    "obj_export", "pov_export", "gltf_json", "fpbf_blocks", "fpbf_objects",
    "pbf_way_geometry", "pbf_tile_assign",
    "osm_xml_elements",
]


def _driver_window_order(q: dict) -> dict:
    out = {}
    for name in _WINDOW_FIRST:
        if name in q:
            out[name] = q[name]
    for name in q:
        if name not in out:
            out[name] = q[name]
    return out


# ---------------------------------------------------------------- oracle

def _pip_sql(pid: int, ring) -> str:
    """Unrolled even-odd crossing test (SimplePolygonShapeXZ.java:74-93) for
    a fixed polygon; x=lon, z=lat."""
    terms = []
    for i in range(len(ring) - 1):
        zi, xi = ring[i]
        zj, xj = ring[i + 1]
        terms.append(
            f"(CASE WHEN (({zi} > lat) != ({zj} > lat)) AND "
            f"(lon < ({xj} - {xi}) * (lat - {zi}) / ({zj} - {zi}) + {xi}) THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def oracle_sql() -> dict[str, str]:
    lat_o = LAT.format(k="o_orderkey")
    lon_o = LON.format(k="o_orderkey")
    lat_c = LAT.format(k="c_custkey")
    lon_c = LON.format(k="c_custkey")
    lat_s = LAT.format(k="s_suppkey")
    lon_s = LON.format(k="s_suppkey")

    tx = TX14.format(lon="lon")
    ty = TY14.format(lat="lat")

    sql: dict[str, str] = {}

    sql["tile_points_z14"] = f"""
        SELECT {tx} AS tile_x, {ty} AS tile_y, count(*) AS n_points
        FROM (SELECT {lat_o} AS lat, {lon_o} AS lon FROM orders)
        GROUP BY 1, 2
    """

    # bounded_view: predicate literals come from the same tile_bounds()
    # call the Spark query uses (repr round-trips doubles exactly)
    from osm2world_spark.sources.views import tile_bounds as _tb

    _b = _tb(*BOUNDED_VIEW_TILE)
    sql["bounded_view"] = f"""
        SELECT {tx} AS tile_x, {ty} AS tile_y,
               count(*) AS n_points, CAST(sum(key) AS BIGINT) AS sum_key
        FROM (SELECT c_custkey AS key, {lat_c} AS lat, {lon_c} AS lon FROM customer)
        WHERE lat >= {_b[0]!r} AND lat < {_b[2]!r}
          AND lon >= {_b[1]!r} AND lon < {_b[3]!r}
        GROUP BY 1, 2
    """

    sql["tile_ancestor_z12"] = f"""
        SELECT cast(floor((lon + 180.0) / 360.0 * 4096) as int) AS tile_x,
               cast(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 4096) as int) AS tile_y,
               count(*) AS n_points
        FROM (SELECT {lat_o} AS lat, {lon_o} AS lon FROM orders)
        GROUP BY 1, 2
    """

    sql["tile_cover_z14"] = f"""
        WITH pts AS (
          SELECT c_custkey, {lat_c} AS lat, {lon_c} AS lon,
                 {DLAT.format(k="c_custkey")} AS dlat,
                 {DLON.format(k="c_custkey")} AS dlon
          FROM customer
        ), rng AS (
          SELECT c_custkey,
                 {TX14.format(lon="(lon - dlon)")} AS x0,
                 {TX14.format(lon="(lon + dlon)")} AS x1,
                 {TY14.format(lat="(lat + dlat)")} AS y0,
                 {TY14.format(lat="(lat - dlat)")} AS y1
          FROM pts
        )
        SELECT c_custkey, cast(t.tile_x as int) AS tile_x, cast(u.tile_y as int) AS tile_y
        FROM rng
        CROSS JOIN unnest(generate_series(x0, x1)) AS t(tile_x)
        CROSS JOIN unnest(generate_series(y0, y1)) AS u(tile_y)
    """

    sql["tile_codec"] = f"""
        SELECT o_orderkey,
               '14/' || tile_x || '/' || tile_y AS tile_str,
               cast(16384 - 1 - tile_y as int) AS tms_y
        FROM (
          SELECT o_orderkey, {tx} AS tile_x, {ty} AS tile_y
          FROM (SELECT o_orderkey, {lat_o} AS lat, {lon_o} AS lon FROM orders)
        )
    """

    sql["tile_bounds"] = f"""
        SELECT tile_x, tile_y,
               round(degrees(atan((exp(pi() - 2*pi()*(tile_y+1)/16384.0) - exp(-(pi() - 2*pi()*(tile_y+1)/16384.0)))/2)), 9) AS minlat,
               round(tile_x / 16384.0 * 360.0 - 180.0, 9) AS minlon,
               round(degrees(atan((exp(pi() - 2*pi()*tile_y/16384.0) - exp(-(pi() - 2*pi()*tile_y/16384.0)))/2)), 9) AS maxlat,
               round((tile_x + 1) / 16384.0 * 360.0 - 180.0, 9) AS maxlon
        FROM (
          SELECT DISTINCT {tx} AS tile_x, {ty} AS tile_y
          FROM (SELECT {lat_c} AS lat, {lon_c} AS lon FROM customer)
        )
    """

    pip_parts = [
        f"SELECT c_custkey, {pid} AS poly_id FROM pts WHERE {_pip_sql(pid, ring)}"
        for pid, ring in PIP_POLYGONS.items()
    ]
    sql["pip_membership"] = (
        f"WITH pts AS (SELECT c_custkey, {lat_c} AS lat, {lon_c} AS lon FROM customer)\n"
        + "\nUNION ALL\n".join(pip_parts)
    )

    sql["knn9"] = f"""
        WITH q AS (SELECT c_custkey AS q_id, {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z FROM customer),
             s AS (SELECT s_suppkey AS s_id, {X_M.format(k="s_suppkey")} AS x, {Z_M.format(k="s_suppkey")} AS z FROM supplier)
        SELECT q_id, cast(row_number() OVER w AS int) AS rank, s_id,
               round(sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)), 6) AS dist_r
        FROM q CROSS JOIN s
        WINDOW w AS (PARTITION BY q_id ORDER BY sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)), s_id)
        QUALIFY row_number() OVER w <= 9
    """

    # J10-adjacent: 29-NN linear-falloff interpolation — brute kNN via a
    # window over the customer x orders cross join (22.5M pairs at sf0.01,
    # well inside DuckDB's envelope). Mirrors knn_join's (dist, s_id) tie
    # order and interpolate_29nn's max(0, 1 - d/120) weighting; Java 0/0
    # NaN mirrored via coalesce('nan').
    sql["knn_elevation"] = f"""
        WITH q AS (SELECT c_custkey AS q_id, {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z FROM customer),
             s AS (SELECT o_orderkey AS s_id, x, z, x / CAST(10 AS DOUBLE) + z / CAST(20 AS DOUBLE) AS y
                   FROM (SELECT o_orderkey, {X_M.format(k="o_orderkey")} AS x, {Z_M.format(k="o_orderkey")} AS z FROM orders))
        SELECT q_id,
               round(coalesce(
                 sum(greatest(CAST(0 AS DOUBLE), 1.0 - dist / 120.0) * y)
                   / nullif(sum(greatest(CAST(0 AS DOUBLE), 1.0 - dist / 120.0)), CAST(0 AS DOUBLE)),
                 CAST('nan' AS DOUBLE)), 6) AS ele_r
        FROM (
          SELECT q.q_id, s.y,
                 sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)) AS dist,
                 row_number() OVER (PARTITION BY q.q_id
                   ORDER BY sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)), s.s_id) AS rn
          FROM q CROSS JOIN s
        )
        WHERE rn <= 29
        GROUP BY q_id
    """

    # J8/J10: LeastSquares pipeline under the linear-precision property —
    # sites carry an exact plane y = x/100 + z/200, so the quadratic LSQ
    # fit + 29-NN weighted blend must return the plane value wherever any
    # of the 29 nearest sites is inside the 120 m falloff (and NaN
    # elsewhere — those rows are cut on both sides).
    sql["lsq_elevation"] = f"""
        WITH q AS (SELECT c_custkey AS q_id, {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z FROM customer),
             s AS (SELECT o_orderkey AS s_id, {X_M.format(k="o_orderkey")} AS x, {Z_M.format(k="o_orderkey")} AS z
                   FROM orders WHERE o_orderkey % 17 = 0)
        SELECT q_id, round(qx / CAST(100 AS DOUBLE) + qz / CAST(200 AS DOUBLE), 6) AS ele_r
        FROM (
          SELECT q_id, qx, qz, dist,
                 row_number() OVER (PARTITION BY q_id ORDER BY dist, s_id) AS rn
          FROM (
            SELECT q.q_id, q.x AS qx, q.z AS qz, s.s_id,
                   sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)) AS dist
            FROM q CROSS JOIN s
          )
        )
        WHERE rn <= 29
        GROUP BY q_id, qx, qz
        HAVING min(dist) < 120.0
    """

    sql["idw300"] = f"""
        WITH q AS (SELECT c_custkey AS q_id, {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z FROM customer),
             s AS (SELECT {X_M.format(k="s_suppkey")} AS x, {Z_M.format(k="s_suppkey")} AS z, s_acctbal AS y FROM supplier)
        SELECT q_id, round(sum(y * pow(d, -2.0)) / sum(pow(d, -2.0)), 6) AS ele_r
        FROM (
          SELECT q_id, sqrt((q.x - s.x)*(q.x - s.x) + (q.z - s.z)*(q.z - s.z)) AS d, y
          FROM q CROSS JOIN s
        )
        WHERE d < 300.0
        GROUP BY q_id
    """

    sql["raster_zonal"] = f"""
        WITH grid AS (
          SELECT cast(i % 300 as int) AS px, cast(i // 300 as int) AS py,
                 ((i % 300) * 7919 + (i // 300) * 104729) % 1000 AS elev
          FROM unnest(generate_series(0, 89999)) AS t(i)
        )
        SELECT {TX14.format(lon=RLON)} AS tile_x,
               {TY14.format(lat=RLAT)} AS tile_y,
               count(*) AS n_px, cast(sum(elev) as bigint) AS sum_elev
        FROM grid GROUP BY 1, 2
    """

    seg = (
        f"SELECT o_orderkey AS key, o_orderkey % 97 AS bucket, "
        f"{X_M.format(k='o_orderkey')} AS x1, {Z_M.format(k='o_orderkey')} AS z1, "
        f"{X_M.format(k='o_orderkey * 3 + 1')} AS x2, {Z_M.format(k='o_orderkey * 3 + 1')} AS z2 FROM orders"
    )
    sql["ww_intersections"] = f"""
        WITH seg AS ({seg})
        SELECT a.key AS a_key, b.key AS b_key,
               cast(floor((a.x1 + ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) * (a.x2 - a.x1)) * 1000.0 + 0.5) as bigint) AS ix_mm,
               cast(floor((a.z1 + ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) * (a.z2 - a.z1)) * 1000.0 + 0.5) as bigint) AS iz_mm
        FROM seg a JOIN seg b ON a.bucket = b.bucket AND a.key < b.key
        WHERE abs((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) > 0.0001
          AND ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) BETWEEN 0 AND 1
          AND ((b.z1 - a.z1)*(a.x2 - a.x1) - (b.x1 - a.x1)*(a.z2 - a.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) BETWEEN 0 AND 1
    """

    sx1 = "((o_orderkey * 2654435761) % 100000) / CAST(100 AS DOUBLE)"
    sz1 = "((o_orderkey * 40503) % 100000) / CAST(100 AS DOUBLE)"
    sweep_seg = (
        f"SELECT key, x1, z1, x2, z2, "
        f"least(x1, x2) AS minx, greatest(x1, x2) AS maxx, "
        f"least(z1, z2) AS minz, greatest(z1, z2) AS maxz FROM ("
        f"SELECT o_orderkey AS key, "
        f"{sx1} AS x1, {sz1} AS z1, "
        f"{sx1} + ((o_orderkey * 7) % 200 - 100) / CAST(10 AS DOUBLE) AS x2, "
        f"{sz1} + ((o_orderkey * 11) % 200 - 100) / CAST(10 AS DOUBLE) AS z2 FROM orders)"
    )
    # lossless oracle: all pairs whose x AND z intervals overlap (the broad
    # phase is a filter, not a blocking key — no crossing can be missed).
    # bbox columns precomputed in the CTE: plain column inequalities keep
    # DuckDB on its IEJoin path (least/greatest inside ON hit an internal
    # flat-vector assertion in duckdb 1.x).
    sql["sweep_intersections"] = f"""
        WITH seg AS ({sweep_seg})
        SELECT cast(a.key as varchar) AS a_key, cast(b.key as varchar) AS b_key,
               cast(floor((a.x1 + ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) * (a.x2 - a.x1)) * 1000.0 + 0.5) as bigint) AS ix_mm,
               cast(floor((a.z1 + ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) * (a.z2 - a.z1)) * 1000.0 + 0.5) as bigint) AS iz_mm
        FROM seg a JOIN seg b
          ON a.key < b.key
         AND a.minx <= b.maxx AND b.minx <= a.maxx
         AND a.minz <= b.maxz AND b.minz <= a.maxz
        WHERE abs((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) > 0.0001
          AND ((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) BETWEEN 0 AND 1
          AND ((b.z1 - a.z1)*(a.x2 - a.x1) - (b.x1 - a.x1)*(a.z2 - a.z1)) / ((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1)) BETWEEN 0 AND 1
    """

    sql["extent_agg"] = f"""
        SELECT c_nationkey, min(lat) AS minlat, max(lat) AS maxlat,
               min(lon) AS minlon, max(lon) AS maxlon, count(*) AS n
        FROM (SELECT c_nationkey, {lat_c} AS lat, {lon_c} AS lon FROM customer)
        GROUP BY c_nationkey
    """

    sql["topk_orders"] = """
        SELECT o_orderpriority, cast(row_number() OVER w AS int) AS rnk, o_orderkey, o_totalprice
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        QUALIFY row_number() OVER w <= 5
    """

    sql["anti_join_tiles"] = f"""
        WITH cust AS (
          SELECT DISTINCT {tx} AS tile_x, {ty} AS tile_y
          FROM (SELECT {lat_c} AS lat, {lon_c} AS lon FROM customer)
        ), supp AS (
          SELECT DISTINCT {tx} AS tile_x, {ty} AS tile_y
          FROM (SELECT {lat_s} AS lat, {lon_s} AS lon FROM supplier)
        )
        SELECT * FROM cust
        WHERE NOT EXISTS (SELECT 1 FROM supp WHERE supp.tile_x = cust.tile_x AND supp.tile_y = cust.tile_y)
    """

    sql["stats_cube"] = """
        SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
               count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars
        FROM documents GROUP BY CUBE (lang, source)
    """

    sql["dedup_exact"] = """
        SELECT md5(text) AS fp_md5, count(*) AS n_docs,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id::VARCHAR) AS doc_ids_str
        FROM documents GROUP BY md5(text) HAVING count(*) > 1
    """

    ntok = "(length(text) - length(replace(text, ' ', '')) + 1)"
    sql["token_stats"] = f"""
        SELECT doc_id, cast({ntok} as int) AS n_tokens, cast(length(text) as int) AS n_chars,
               cast(floor(cast(length(text) - ({ntok} - 1) as double) / {ntok} * 1000000.0 + 0.5) as bigint) AS avg_token_len_u6
        FROM documents
    """

    stop = " + ".join(
        f"cast((length(text) - length(replace(text, ' {w} ', ''))) / {len(w) + 2} as int)"
        for w in ("the", "and", "of", "a")
    )
    sql["quality_score"] = f"""
        SELECT doc_id, n_tokens,
               cast(floor(stop_ratio * 1000000.0 + 0.5) as bigint) AS stopword_ratio_u6,
               cast(floor(mean_len * 1000000.0 + 0.5) as bigint) AS mean_token_len_u6,
               cast(floor((least(CAST(1.0 AS DOUBLE), n_tokens / CAST(64 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
                     + least(CAST(1.0 AS DOUBLE), stop_ratio * CAST(5.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
                     + (CASE WHEN mean_len >= 3.0 AND mean_len <= 8.0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)) * 1000000.0 + 0.5) as bigint) AS quality_u6
        FROM (
          SELECT doc_id, cast({ntok} as int) AS n_tokens,
                 cast(({stop}) as double) / {ntok} AS stop_ratio,
                 cast(length(text) - ({ntok} - 1) as double) / {ntok} AS mean_len
          FROM documents
        )
    """

    markers = {
        "en": (" the ", " and "),
        "es": (" el ", " la "),
        "de": (" der ", " und "),
        "fr": (" le ", " et "),
    }
    cnt = {
        lang: " + ".join(
            f"cast((length(t) - length(replace(t, '{m}', ''))) / {len(m)} as int)" for m in ms
        )
        for lang, ms in markers.items()
    }
    sql["lang_id"] = f"""
        SELECT doc_id,
               CASE WHEN best = 0 THEN 'unknown'
                    WHEN c_en = best THEN 'en'
                    WHEN c_es = best THEN 'es'
                    WHEN c_de = best THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM (
          SELECT doc_id, c_en, c_es, c_de, c_fr, greatest(c_en, c_es, c_de, c_fr) AS best
          FROM (
            SELECT doc_id, {cnt['en']} AS c_en, {cnt['es']} AS c_es,
                   {cnt['de']} AS c_de, {cnt['fr']} AS c_fr
            FROM (SELECT doc_id, ' ' || text || ' ' AS t FROM documents)
          )
        )
    """

    sql["fingerprint"] = """
        SELECT doc_id, md5(text) AS fp_md5,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp60
        FROM documents
    """

    shingle_list = (
        "CASE WHEN len(string_split(text, ' ')) - 2 >= 1 THEN "
        "list_transform(range(len(string_split(text, ' ')) - 2), "
        "i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]) "
        "ELSE [text] END"
    )
    sql["ngram_jaccard"] = f"""
        WITH sh0 AS (
          SELECT DISTINCT doc_id, source AS grp, unnest({shingle_list}) AS shingle
          FROM documents
        ), keep AS (
          -- mirror of the engine's default max_df = 0.2 skew cap
          SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle)
          WHERE df <= greatest(1, cast(floor(CAST(0.2 AS DOUBLE) * (SELECT count(*) FROM documents)) as bigint))
        ), sh AS (
          SELECT sh0.* FROM sh0 JOIN keep USING (shingle)
        ), sizes AS (
          SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        ), common AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.grp = b.grp AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT a_id, b_id, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
               cast(floor(n_common / cast(sa.n_sh + sb.n_sh - n_common as double) * 1000000.0 + 0.5) as bigint) AS jaccard_u6
        FROM common
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE n_common / cast(sa.n_sh + sb.n_sh - n_common as double) >= CAST(0.05 AS DOUBLE)
    """

    # Multimodal plumbing: media_table's synthesized metadata (md5-hash
    # driven type/width/height) + the stub decoder's byte/255 features,
    # re-quantized to source bytes in the driver projection.
    sql["media_features"] = """
        WITH m AS (
          SELECT 'doc_' || lpad(doc_id::VARCHAR, 12, '0') AS doc_id,
                 CAST(2 AS INT) AS span_idx,
                 'media://' || md5(text) AS media_ref,
                 ('0x' || substr(md5('media://' || md5(text)), 1, 8))::BIGINT AS h
          FROM documents
        )
        SELECT doc_id, span_idx, media_ref,
               ['image', 'audio', 'video'][CAST((h % 3) + 1 AS INT)] AS media_type,
               CAST(h % 1024 + 64 AS INT) AS width,
               CAST((h // 7) % 1024 + 64 AS INT) AS height,
               array_to_string(
                 list_transform(range(16), i -> ascii(substr(media_ref, CAST(i + 1 AS INT), 1))),
                 ',') AS feature_bytes
        FROM m
    """

    # MinHash-LSH with the portable md5-prefix hash family: DuckDB rebuilds
    # the identical 32-value signatures, 8 band buckets, candidate pairs,
    # and exact-Jaccard verify. (max_bucket=4096 needs no mirror: 500 docs
    # at sf0.01 cannot exceed the cap.)
    minh = ", ".join(
        f"min(('0x' || substr(md5('{s}|' || shingle), 1, 15))::BIGINT) AS h{s}"
        for s in range(32)
    )
    sig_list = "list_value(" + ", ".join(f"h{s}" for s in range(32)) + ")"
    mh_pairs_ctes = f"""sh AS (
          SELECT DISTINCT doc_id, unnest({shingle_list}) AS shingle FROM documents
        ), sigs AS (
          SELECT doc_id, {minh} FROM sh GROUP BY doc_id
        ), banded AS (
          SELECT doc_id, band,
                 array_to_string(list_slice(sig, band*4+1, band*4+4), ',') AS bucket
          FROM (SELECT doc_id, {sig_list} AS sig FROM sigs),
               unnest(generate_series(0, 7)) AS bb(band)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ), sizes AS (
          SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        ), common AS (
          SELECT c.a_id, c.b_id, count(*) AS n_common
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.a_id
          JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
          GROUP BY 1, 2
        ), mh_pairs AS (
          SELECT a_id, b_id,
                 round(n_common / cast(sa.n_sh + sb.n_sh - n_common as double), 6) AS jaccard
          FROM common
          JOIN sizes sa ON sa.doc_id = a_id
          JOIN sizes sb ON sb.doc_id = b_id
          WHERE round(n_common / cast(sa.n_sh + sb.n_sh - n_common as double), 6) >= CAST(0.2 AS DOUBLE)
        )"""
    sql["minhash_near_dups"] = f"""
        WITH {mh_pairs_ctes}
        SELECT a_id, b_id, jaccard FROM mh_pairs
    """

    # Decontamination: a doc is contaminated iff it shares ANY word
    # 3-gram with the probe slice (docs shorter than n tokens shingle to
    # their whole text, mirrored by the shared fragment).
    sql["decontaminate"] = f"""
        WITH probe_sh AS (
          SELECT DISTINCT unnest({shingle_list}) AS shingle
          FROM documents WHERE doc_id % 50 = 0
        ), doc_sh AS (
          SELECT DISTINCT doc_id, unnest({shingle_list}) AS shingle FROM documents
        ), hits AS (
          SELECT DISTINCT doc_id FROM doc_sh JOIN probe_sh USING (shingle)
        )
        SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    """

    # Gopher-style repetition filters over word bigrams.
    sql["repetition_stats"] = """
        WITH bg AS (
          SELECT doc_id, unnest(
            CASE WHEN len(string_split(text, ' ')) - 1 >= 1 THEN
              list_transform(range(len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])
            ELSE [text] END) AS b
          FROM documents
        ), counts AS (
          SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2
        )
        SELECT doc_id,
               cast(floor(max(n) / cast(sum(n) as double) * 1000000.0 + 0.5) as bigint) AS top_bigram_frac_u6,
               cast(floor(count(*) / cast(sum(n) as double) * 1000000.0 + 0.5) as bigint) AS distinct_bigram_frac_u6,
               cast(max(n) as bigint) AS top_bigram_n
        FROM counts GROUP BY doc_id
    """

    # Deterministic split + sequence packing: md5-prefix hash arithmetic
    # and one window per hash bucket — both bit-exact across engines.
    _u32 = "(('0x' || substr(md5({c}::VARCHAR), 1, 8))::BIGINT)"
    sql["tfidf_terms"] = """
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM terms WHERE term <> '' GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY 1
        ), n AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   CAST(floor(CAST(tf.tf AS DOUBLE) * (n.n_docs + 1.0)
                              / (CAST(dfreq.df_t AS DOUBLE) + 1.0)
                              * 1000000.0 + 0.5) AS BIGINT) AS score_u6
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ), ranked AS (
            SELECT doc_id, term, score_u6,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_u6 DESC, term ASC) AS INT) AS rk
            FROM scored
        )
        SELECT doc_id, term, score_u6, rk FROM ranked WHERE rk <= 3
    """

    sql["events_quantiles"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.75), 6) AS p75,
               count(*) AS n
        FROM events GROUP BY event_type
    """

    sql["sample_split"] = f"""
        SELECT doc_id,
               CASE WHEN {_u32.format(c="doc_id")} / 4294967296.0 < 0.1 THEN 'val'
                    WHEN {_u32.format(c="doc_id")} / 4294967296.0 < 0.15 THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    """
    sql["stratified_sample"] = f"""
        SELECT event_id, user_id, event_type
        FROM events
        WHERE {_u32.format(c="event_id")} / 4294967296.0 <
              CASE event_type WHEN 'click' THEN 0.5
                              WHEN 'view' THEN 0.1
                              WHEN 'error' THEN 1.0
                              ELSE 0.0 END
    """

    sql["pack_sequences"] = f"""
        WITH sized AS (
          SELECT doc_id,
                 cast({_u32.format(c="doc_id")} % 8 as int) AS bucket,
                 cast({ntok} as bigint) AS n_tokens
          FROM documents
        )
        SELECT doc_id, bucket,
               cast(floor((sum(n_tokens) OVER w - n_tokens) / 256.0) as bigint) AS bin_id,
               n_tokens
        FROM sized
        WINDOW w AS (PARTITION BY bucket ORDER BY n_tokens DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """

    # Near-dup clusters: the same verified pair list closed transitively
    # (recursive CTE — tractable at sf0.01's pair count), labeled by the
    # min reachable doc id, singletons labeling themselves; mirrors the
    # engine's min-label-propagation components over the pair edges.
    sql["dedup_clusters"] = f"""
        WITH RECURSIVE {mh_pairs_ctes}, edges AS (
          SELECT a_id AS s, b_id AS d FROM mh_pairs
          UNION
          SELECT b_id, a_id FROM mh_pairs
        ), reach(s, d) AS (
          SELECT s, d FROM edges
          UNION
          SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        )
        SELECT doc.doc_id,
               least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) AS cluster_id,
               least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) = doc.doc_id AS is_canonical
        FROM documents doc LEFT JOIN reach r ON r.s = doc.doc_id
        GROUP BY doc.doc_id
    """

    sql["simhash"] = """
        WITH toks AS (
          SELECT doc_id, ('0x' || substr(md5('0|' || tok), 1, 15))::BIGINT AS h
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        ), votes AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h & cast(pow(2, bit) as bigint)) != 0 THEN 1 ELSE -1 END) AS v
          FROM toks CROSS JOIN unnest(generate_series(0, 59)) AS b(bit)
          GROUP BY doc_id, bit
        )
        SELECT doc_id, cast(sum(CASE WHEN v > 0 THEN cast(pow(2, bit) as bigint) ELSE 0 END) as bigint) AS simhash
        FROM votes GROUP BY doc_id
    """

    dot = "list_sum(list_transform(range(len(q.embedding)), i -> q.embedding[i+1]::DOUBLE * c.embedding[i+1]::DOUBLE))"
    nrm = "sqrt(list_sum(list_transform(range(len({v}.embedding)), i -> {v}.embedding[i+1]::DOUBLE * {v}.embedding[i+1]::DOUBLE)))"
    sql["cosine_topk"] = f"""
        SELECT q_id, cast(row_number() OVER w AS int) AS rank, n_id, cos_sim
        FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 round({dot} / ({nrm.format(v='q')} * {nrm.format(v='c')}), 6) AS cos_sim
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
        )
        WINDOW w AS (PARTITION BY q_id ORDER BY cos_sim DESC, n_id)
        QUALIFY row_number() OVER w <= 5
    """

    # kmeans_1iter: one Lloyd round in SQL — first_k init, squared-L2
    # argmin assignment (lowest cluster on ties), per-dim means, empty
    # clusters keep their init centroid, reassign
    _l2 = (
        "list_sum(list_transform(range(64), i -> "
        "(({a}.v[i+1]) - ({b}.c[i+1])) * (({a}.v[i+1]) - ({b}.c[i+1]))))"
    )
    _km_cte = f"""
        v AS (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
        ), cent0 AS (
          SELECT cast(row_number() OVER (ORDER BY vec_id) - 1 AS int) AS cluster, v AS c
          FROM v ORDER BY vec_id LIMIT 8
        ), a1 AS (
          SELECT vec_id, cluster FROM (
            SELECT a.vec_id, c.cluster,
                   row_number() OVER (
                     PARTITION BY a.vec_id
                     ORDER BY {_l2.format(a="a", b="c")} ASC, c.cluster ASC
                   ) AS rnk
            FROM v a CROSS JOIN cent0 c
          ) WHERE rnk = 1
        ), sums AS (
          SELECT a1.cluster, i.i AS d, sum(v.v[i.i + 1]) AS s, count(*) AS n
          FROM a1 JOIN v USING (vec_id)
          CROSS JOIN unnest(range(64)) AS i(i)
          GROUP BY 1, 2
        ), cent1 AS (
          SELECT cluster, array_agg(s / n ORDER BY d) AS c FROM sums GROUP BY cluster
        ), centf AS (
          SELECT c0.cluster, coalesce(c1.c, c0.c) AS c
          FROM cent0 c0 LEFT JOIN cent1 c1 USING (cluster)
        ), asg AS (
          SELECT vec_id, cluster FROM (
            SELECT a.vec_id, c.cluster,
                   row_number() OVER (
                     PARTITION BY a.vec_id
                     ORDER BY {_l2.format(a="a", b="c")} ASC, c.cluster ASC
                   ) AS rnk
            FROM v a CROSS JOIN centf c
          ) WHERE rnk = 1
        )"""
    sql["kmeans_1iter"] = f"WITH {_km_cte} SELECT vec_id, cluster FROM asg"

    # semdedup: the same 1-round assignment, then within-cluster pairs
    # with cosine >= threshold remove every non-minimal id (keep-first)
    _cosab = (
        f"round({dot.replace('q.embedding', 'a.embedding').replace('c.embedding', 'b.embedding')}"
        f" / ({nrm.format(v='a')} * {nrm.format(v='b')}), 6)"
    )
    sql["semdedup"] = f"""
        WITH {_km_cte}, cl AS (
          SELECT e.vec_id, asg.cluster, e.embedding
          FROM embeddings e JOIN asg USING (vec_id)
        ), dups AS (
          SELECT DISTINCT b.vec_id
          FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE {_cosab} >= CAST(0.4 AS DOUBLE)
        )
        SELECT cl.vec_id, cl.cluster, d.vec_id IS NULL AS keep
        FROM cl LEFT JOIN dups d ON cl.vec_id = d.vec_id
    """

    # pq_ann: rebuild the PQ index in SQL — per-subspace argmin codes over
    # the 16 lowest-id sub-codebooks, then asymmetric distance per (q, n)
    _subd = (
        "list_sum(list_transform(range(8), t -> "
        "(({a}.embedding[{j}*8 + t + 1]::DOUBLE) - ({b}.embedding[{j}*8 + t + 1]::DOUBLE)) "
        "* (({a}.embedding[{j}*8 + t + 1]::DOUBLE) - ({b}.embedding[{j}*8 + t + 1]::DOUBLE))))"
    )
    sql["pq_ann"] = f"""
        WITH cent AS (
          SELECT embedding, cast(row_number() OVER (ORDER BY vec_id) - 1 AS int) AS c_idx
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), dists AS (
          SELECT e.vec_id AS n_id, jj.j, c.c_idx,
                 {_subd.format(a="e", b="c", j="jj.j")} AS d
          FROM embeddings e
          CROSS JOIN cent c
          CROSS JOIN unnest(generate_series(0, 7)) AS jj(j)
        ), codes AS (
          SELECT n_id, j, c_idx FROM (
            SELECT n_id, j, c_idx,
                   row_number() OVER (PARTITION BY n_id, j ORDER BY d ASC, c_idx ASC) AS rnk
            FROM dists
          ) WHERE rnk = 1
        ), adc AS (
          SELECT q.vec_id AS q_id, cd.n_id, sum({_subd.format(a="q", b="c", j="cd.j")}) AS adc
          FROM embeddings q
          JOIN codes cd ON cd.n_id != q.vec_id
          JOIN cent c ON c.c_idx = cd.c_idx
          WHERE q.vec_id < 20
          GROUP BY 1, 2
        )
        SELECT q_id, cast(row_number() OVER w AS int) AS rank, n_id,
               cast(floor(adc * 1000000.0 + 0.5) as bigint) AS adc_u6
        FROM adc
        WINDOW w AS (PARTITION BY q_id ORDER BY adc ASC, n_id ASC)
        QUALIFY row_number() OVER w <= 5
    """

    # chunk_docs: chunking offsets and md5 of each chunk recomputed from
    # the token list (stride = 32 - 8 = 24; final chunk clipped at n)
    sql["chunk_docs"] = """
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS n
          FROM documents
        ), c AS (
          SELECT doc_id, toks, n,
                 CAST(1 + ceil(greatest(n - 32, 0) / 24.0) AS INT) AS n_chunks
          FROM d
        )
        SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
               CAST(ci * 24 AS INT) AS tok_start,
               CAST(least(ci * 24 + 32, n) AS INT) AS tok_end,
               md5(array_to_string(list_slice(toks, ci * 24 + 1, ci * 24 + 32), ' ')) AS chunk_md5
        FROM c, unnest(range(n_chunks)) AS t(ci)
    """

    # count_min / hll_sketch: replicate the salted-md5 hash family and
    # the integer sketch constructions directly
    _cm_h = "('0x' || substr(md5({salt} || '|' || {v}), 1, 15))::BIGINT"
    sql["count_min"] = f"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ), t AS (SELECT tok FROM toks WHERE tok != ''),
        cells AS (
          SELECT r, ({_cm_h.format(salt="r", v="tok")}) % 256 AS bucket, count(*) AS cnt
          FROM t, unnest(generate_series(0, 3)) AS s(r)
          GROUP BY 1, 2
        ), exact AS (
          SELECT tok AS key, count(*) AS exact FROM t GROUP BY tok
        ), probes AS (
          SELECT key, r, ({_cm_h.format(salt="r", v="key")}) % 256 AS bucket
          FROM exact, unnest(generate_series(0, 3)) AS s(r)
        )
        SELECT p.key,
               CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est,
               CAST(any_value(e.exact) AS BIGINT) AS exact
        FROM probes p
        LEFT JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        JOIN exact e ON e.key = p.key
        GROUP BY p.key
    """
    sql["hll_sketch"] = """
        WITH h AS (
          SELECT ('0x' || substr(md5('hll|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
          FROM documents
        ), rr AS (
          SELECT CAST(hv % 4096 AS INT) AS idx,
                 CAST(CASE WHEN hv // 4096 > 0
                      THEN 49 - length(bin(hv // 4096))
                      ELSE 49 END AS INT) AS rank
          FROM h
        )
        SELECT idx, max(rank) AS r FROM rr GROUP BY idx
    """

    # hll_hourly: the hour window of F.window("3600 seconds") is
    # epoch-aligned, i.e. date_trunc('hour'); same register arithmetic
    # as hll_sketch at p=10 (rest_bits 50)
    sql["hll_hourly"] = """
        WITH h AS (
          SELECT date_trunc('hour', ts) AS window_start,
                 ('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
          FROM events
        ), rr AS (
          SELECT window_start, CAST(hv % 1024 AS INT) AS idx,
                 CAST(CASE WHEN hv // 1024 > 0
                      THEN 51 - length(bin(hv // 1024))
                      ELSE 51 END AS INT) AS rank
          FROM h
        )
        SELECT window_start, idx, max(rank) AS r FROM rr GROUP BY 1, 2
    """

    # winnow_dups: rebuild the winnowing fingerprints in SQL — md5-prefix
    # k-gram hashes, per-window min with rightmost tie-break, distinct
    # (doc, fp), 0.2-df cap, fp-keyed pair join
    sql["winnow_dups"] = """
        WITH d AS (
          SELECT doc_id, text, greatest(len(text) - 7, 0) AS n_grams
          FROM documents
        ), h AS (
          SELECT doc_id, n_grams,
                 list_transform(range(n_grams),
                   i -> ('0x' || substr(md5(substring(text, i + 1, 8)), 1, 15))::BIGINT) AS hashes
          FROM d WHERE n_grams >= 8
        ), wins AS (
          SELECT doc_id, j,
                 list_min(list_slice(hashes, j + 1, j + 8)) AS fp
          FROM h, unnest(range(n_grams - 7)) AS t(j)
        ), fps AS (
          SELECT DISTINCT doc_id, fp FROM wins
        ), capped AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fps
          ) WHERE df <= greatest(1, cast(floor(0.2 * (SELECT count(*) FROM documents)) as bigint))
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 12
    """

    # ivf_ann_fixed: rebuild the deterministic IVF index in SQL —
    # centroids = 16 lowest-id embeddings, each vector assigned to its
    # max-cosine centroid (ties -> lower centroid index, matching the
    # stable argsort), queries probe their 4 nearest cells, exact rerank
    _csim = (
        "list_sum(list_transform(range(len(e.embedding)), i -> e.embedding[i+1]::DOUBLE * c.embedding[i+1]::DOUBLE))"
        " / (sqrt(list_sum(list_transform(range(len(e.embedding)), i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)))"
        " * sqrt(list_sum(list_transform(range(len(c.embedding)), i -> c.embedding[i+1]::DOUBLE * c.embedding[i+1]::DOUBLE))))"
    )
    sql["ivf_ann_fixed"] = f"""
        WITH cent AS (
          SELECT vec_id, embedding,
                 cast(row_number() OVER (ORDER BY vec_id) - 1 AS int) AS c_idx
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), corpus_cells AS (
          SELECT n_id, cell FROM (
            SELECT e.vec_id AS n_id, c.c_idx AS cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_csim} DESC, c.c_idx ASC
                   ) AS rnk
            FROM embeddings e CROSS JOIN cent c
          ) WHERE rnk = 1
        ), probes AS (
          SELECT q_id, cell FROM (
            SELECT e.vec_id AS q_id, c.c_idx AS cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_csim} DESC, c.c_idx ASC
                   ) AS rnk
            FROM embeddings e CROSS JOIN cent c
            WHERE e.vec_id < 20
          ) WHERE rnk <= 4
        )
        SELECT q_id, cast(row_number() OVER w AS int) AS rank, n_id, cos_sim
        FROM (
          SELECT p.q_id, cc.n_id,
                 round({dot.replace('q.embedding', 'q.embedding').replace('c.embedding', 'n.embedding')}
                       / ({nrm.format(v='q')} * {nrm.format(v='n')}), 6) AS cos_sim
          FROM probes p
          JOIN corpus_cells cc ON cc.cell = p.cell AND cc.n_id != p.q_id
          JOIN embeddings q ON q.vec_id = p.q_id
          JOIN embeddings n ON n.vec_id = cc.n_id
        )
        WINDOW w AS (PARTITION BY q_id ORDER BY cos_sim DESC, n_id)
        QUALIFY row_number() OVER w <= 5
    """

    # Sign-LSH approximate top-k: the hyperplanes are pure-Python
    # deterministic literals (splitmix hash of (seed, plane, dim)), so the
    # oracle embeds the IDENTICAL doubles and rebuilds buckets, 1-bit
    # multi-probe, candidates, and the exact rerank. dim=64 is fixed by
    # the driver's embeddings tables (all sf).
    from osm2world_spark.operators.similarity import _hyperplane as _hp

    def _bucket_term(p: int) -> str:
        comps = _hp(64, p, 42)
        dotp = " + ".join(
            f"(embedding[{d + 1}]::DOUBLE * CAST({comps[d]!r} AS DOUBLE))"
            for d in range(64)
        )
        return f"(CASE WHEN ({dotp}) >= 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"

    _bucket_expr = " + ".join(_bucket_term(p) for p in range(12))
    _flips = ", ".join(str(f) for f in [0] + [1 << p for p in range(12)])
    _nrm2 = "sqrt(list_sum(list_transform(range(len({v}.embedding)), i -> {v}.embedding[i+1]::DOUBLE * {v}.embedding[i+1]::DOUBLE)))"
    _dot2 = "list_sum(list_transform(range(len(qe.embedding)), i -> qe.embedding[i+1]::DOUBLE * ce.embedding[i+1]::DOUBLE))"
    sql["lsh_cosine_topk"] = f"""
        WITH b AS (
          SELECT vec_id, {_bucket_expr} AS bucket FROM embeddings
        ), qp AS (
          SELECT b.vec_id AS q_id, xor(b.bucket, CAST(f.flip AS BIGINT)) AS bucket
          FROM b, unnest([{_flips}]) AS f(flip)
          WHERE b.vec_id < 20
        ), cand AS (
          SELECT DISTINCT qp.q_id, c.vec_id AS n_id
          FROM qp JOIN b c ON qp.bucket = c.bucket
          WHERE qp.q_id != c.vec_id
        ), scored AS (
          SELECT cand.q_id, cand.n_id,
                 round({_dot2} / ({_nrm2.format(v='qe')} * {_nrm2.format(v='ce')}), 6) AS cos_sim
          FROM cand
          JOIN embeddings qe ON qe.vec_id = cand.q_id
          JOIN embeddings ce ON ce.vec_id = cand.n_id
        )
        SELECT q_id, cast(row_number() OVER w AS int) AS rank, n_id, cos_sim
        FROM scored
        WINDOW w AS (PARTITION BY q_id ORDER BY cos_sim DESC, n_id)
        QUALIFY row_number() OVER w <= 5
    """

    # Ring assembly over the synthetic relations (outer square split into
    # two fragments + a closed hole): the stitch order, CCW/CW
    # normalization, and to_json coordinate formatting are deterministic,
    # so the oracle constructs the exact geom JSON strings from rel
    # arithmetic (all coordinates are whole numbers -> 'N.0').
    def _ring_json(offs: list[tuple[int, int]]) -> str:
        parts = []
        for dx, dz in offs:
            parts.append(f"CAST(cx + ({dx}) AS INT)::VARCHAR || '.0'")
            parts.append(f"CAST(cz + ({dz}) AS INT)::VARCHAR || '.0'")
        return " || ',' || ".join(parts)

    _outer_j = _ring_json([(10, 10), (-10, 10), (-10, -10), (10, -10), (10, 10)])
    _hole_j = _ring_json([(-2, -2), (-2, 2), (2, 2), (2, -2), (-2, -2)])
    sql["assemble_rings"] = f"""
        WITH r AS (
          SELECT i AS rel, (i * 137) % 1000 AS cx, (i * 59) % 1000 AS cz
          FROM unnest(generate_series(0, 199)) AS t(i)
        )
        SELECT rel::VARCHAR AS rel_id, CAST(0 AS INT) AS area_idx,
               'ok' AS status, CAST(1 AS INT) AS n_holes,
               '[[' || {_outer_j} || '],[' || {_hole_j} || ']]' AS geom
        FROM r
    """

    # Coastline water assembly: the tile-crossing coastline stitches with
    # the clockwise bbox walk into ONE water ring holding everything below
    # the tent-shaped coast; the island square is a hole of it iff all
    # four corners pass the even-odd raycast against that ring. Every
    # arithmetic step mirrors the kernel's op tree (entry/exit nodes via
    # _seg_intersection, xint via contains_points_multi) so boundary ties
    # resolve identically.
    def _cw_inside(px: str, pz: str) -> str:
        e1 = (
            f"(CASE WHEN ((zin > {pz}) <> (apex > {pz})) "
            f"AND ({px} < ((500.0 - 0.0) * (({pz}) - zin) / (apex - zin) + 0.0)) THEN 1 ELSE 0 END)"
        )
        e2 = (
            f"(CASE WHEN ((apex > {pz}) <> (zout > {pz})) "
            f"AND ({px} < ((1000.0 - 500.0) * (({pz}) - apex) / (zout - apex) + 500.0)) THEN 1 ELSE 0 END)"
        )
        e3 = f"(CASE WHEN ((zout > {pz}) AND NOT (0.0 > {pz})) AND ({px} < 1000.0) THEN 1 ELSE 0 END)"
        return f"(({e1} + {e2} + {e3}) % 2 = 1)"

    _corners = " AND ".join(
        _cw_inside(px, pz)
        for px in ("ix", "(ix + 40.0)")
        for pz in ("iz", "(iz + 40.0)")
    )
    sql["coastline_water"] = f"""
        WITH g AS (
          SELECT i AS gid,
                 CAST((i * 37) % 800 + 100 AS DOUBLE) AS cz,
                 CAST((i * 53) % 600 + 200 AS DOUBLE) AS ix,
                 CAST((i * 29) % 600 + 200 AS DOUBLE) AS iz
          FROM unnest(generate_series(0, 149)) AS t(i)
        ), w AS (
          SELECT gid, ix, iz,
                 ((cz * 550.0 - (-50.0 * 30.0)) / 550000.0) * 1000.0 AS zin,
                 1000.0 + (((cz + 30.0 - 1000.0) * 550.0 - (-500.0 * -30.0)) / -550000.0) * -1000.0 AS zout,
                 cz + 30.0 AS apex
          FROM g
        ), c AS (
          SELECT gid, ({_corners}) AS contained FROM w
        )
        SELECT gid::VARCHAR AS rel_id, CAST(0 AS INT) AS area_idx, 'ok' AS status,
               CAST(CASE WHEN contained THEN 1 ELSE 0 END AS INT) AS n_holes
        FROM c
        UNION ALL
        SELECT gid::VARCHAR, CAST(1 AS INT), 'ok', CAST(0 AS INT) FROM c WHERE NOT contained
    """

    # Embedding near-dup pairs on the sign-LSH path: same inlined
    # hyperplane buckets; probed side a, plain side b, a_id < b_id,
    # distinct, exact cosine >= 0.4 after round(6).
    sql["near_dups_lsh"] = f"""
        WITH b AS (
          SELECT vec_id, {_bucket_expr} AS bucket FROM embeddings
        ), probed AS (
          SELECT b.vec_id, xor(b.bucket, CAST(f.flip AS BIGINT)) AS bucket
          FROM b, unnest([{_flips}]) AS f(flip)
        ), cand AS (
          SELECT DISTINCT probed.vec_id AS a_id, c.vec_id AS b_id
          FROM probed JOIN b c ON probed.bucket = c.bucket
          WHERE probed.vec_id < c.vec_id
        ), scored AS (
          SELECT cand.a_id, cand.b_id,
                 round({_dot2.replace('qe', 'ae').replace('ce', 'be')}
                       / ({_nrm2.format(v='ae')} * {_nrm2.format(v='be')}), 6) AS cos_sim
          FROM cand
          JOIN embeddings ae ON ae.vec_id = cand.a_id
          JOIN embeddings be ON be.vec_id = cand.b_id
        )
        SELECT a_id, b_id, cos_sim FROM scored WHERE cos_sim >= CAST(0.4 AS DOUBLE)
    """

    # MetricMapProjection constants for Origin(48.56687, 13.45127)
    # (DEFAULT_ORIGIN): repr round-trips to the identical double
    S_ = "CAST(26519461.53981074 AS DOUBLE)"
    OX_ = "CAST(14250620.873868175 AS DOUBLE)"
    OY_ = "CAST(17363668.058513626 AS DOUBLE)"
    TWO_PI = "CAST(6.283185307179586 AS DOUBLE)"
    PI_ = "CAST(3.141592653589793 AS DOUBLE)"
    sql["mercator_xz"] = f"""
        WITH pts AS (SELECT o_orderkey, {lat_o} AS lat, {lon_o} AS lon FROM orders),
        proj AS (
          SELECT o_orderkey,
                 floor(((lon + 180.0) / 360.0 * {S_} - {OX_}) * 1000.0 + 0.5) / 1000.0 AS x,
                 floor(((ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat)))) / (4.0 * {PI_}) + 0.5) * {S_} - {OY_}) * 1000.0 + 0.5) / 1000.0 AS z
          FROM pts
        )
        SELECT o_orderkey,
               cast(floor(x * 1000.0 + 0.5) as bigint) AS x_mm,
               cast(floor(z * 1000.0 + 0.5) as bigint) AS z_mm,
               cast(floor((360.0 * atan(exp(((z + {OY_}) / {S_} - 0.5) * {TWO_PI})) / {PI_} - 90.0) * 1000000000.0 + 0.5) as bigint) AS lat_n9,
               cast(floor((360.0 * ((x + {OX_}) / {S_} - 0.5)) * 1000000000.0 + 0.5) as bigint) AS lon_n9
        FROM proj
    """

    # J2: the typed-overlap spatial self-join over the synthesized
    # interleaved documents. The fixture geometry is closed-form: nodes
    # (m=0), single two-point segments (m=1), axis-aligned rectangles
    # (m=2, +-0.0006 lat x +-0.0009 lon), all format_number(.,7)-quantized
    # then metric-projected with mm snap. Kernel semantics mirrored:
    # - WW: |denom| > 1e-4 parametric crossing, t,s in [0,1] inclusive
    #   (GeometryUtil.getLineSegmentIntersection), eids k-ascending.
    # - NA/containment raycast is half-open on rectangles: bottom edge
    #   (z == z1) counts inside, top edge does not; exact x-boundary hits
    #   are arithmetically impossible for this fixture (lon deltas are
    #   non-integer grid steps).
    # - WA: INTERSECT on any true segment x rect-edge crossing (endpoint
    #   touches included), else CONTAIN when both endpoints are inside.
    # - AA: strict-x / inclusive-z bbox overlap candidates; CONTAIN via
    #   the vertex rule (all corners inside under the half-open raycast),
    #   emitted (contained, container); else INTERSECT.
    _g_lat = LAT.format(k="doc_id")
    _g_lon = LON.format(k="doc_id")
    _g_lat2 = LAT.format(k="doc_id * 7 + 3")
    _g_lon2 = LON.format(k="doc_id * 7 + 3")
    PXE = f"floor(((({{lon}}) + 180.0) / 360.0 * {S_} - {OX_}) * 1000.0 + 0.5) / 1000.0"
    PZE = (
        f"floor(((ln((1.0 + sin(radians({{lat}}))) / (1.0 - sin(radians({{lat}})))) "
        f"/ (4.0 * {PI_}) + 0.5) * {S_} - {OY_}) * 1000.0 + 0.5) / 1000.0"
    )
    _den = "((a.z2 - a.z1)*(b.x2 - b.x1) - (a.x2 - a.x1)*(b.z2 - b.z1))"
    _tnum = "((b.z1 - a.z1)*(b.x2 - b.x1) - (b.x1 - a.x1)*(b.z2 - b.z1))"
    _snum = "((b.z1 - a.z1)*(a.x2 - a.x1) - (b.x1 - a.x1)*(a.z2 - a.z1))"
    _eden = "((s.z2 - s.z1)*(e.ex2 - e.ex1) - (s.x2 - s.x1)*(e.ez2 - e.ez1))"
    _etnum = "((e.ez1 - s.z1)*(e.ex2 - e.ex1) - (e.ex1 - s.x1)*(e.ez2 - e.ez1))"
    _esnum = "((e.ez1 - s.z1)*(s.x2 - s.x1) - (e.ex1 - s.x1)*(s.z2 - s.z1))"
    sql["spatial_overlaps"] = f"""
        WITH geo AS (
          SELECT doc_id AS k, doc_id % 3 AS m,
                 'doc_' || lpad(doc_id::VARCHAR, 12, '0') || '#1' AS eid,
                 round({_g_lat}, 7) AS lat, round({_g_lon}, 7) AS lon,
                 round({_g_lat2}, 7) AS lat2, round({_g_lon2}, 7) AS lon2,
                 round(({_g_lat}) - CAST(0.0006 AS DOUBLE), 7) AS lat_lo,
                 round(({_g_lat}) + CAST(0.0006 AS DOUBLE), 7) AS lat_hi,
                 round(({_g_lon}) - CAST(0.0009 AS DOUBLE), 7) AS lon_lo,
                 round(({_g_lon}) + CAST(0.0009 AS DOUBLE), 7) AS lon_hi
          FROM documents
        ), nodes AS (
          SELECT k, eid, {PXE.format(lon="lon")} AS x, {PZE.format(lat="lat")} AS z
          FROM geo WHERE m = 0
        ), segs AS (
          SELECT k, eid || '#0' AS eid,
                 {PXE.format(lon="lon")} AS x1, {PZE.format(lat="lat")} AS z1,
                 {PXE.format(lon="lon2")} AS x2, {PZE.format(lat="lat2")} AS z2
          FROM geo WHERE m = 1
        ), rects AS (
          SELECT k, eid,
                 {PXE.format(lon="lon_lo")} AS x1, {PXE.format(lon="lon_hi")} AS x2,
                 {PZE.format(lat="lat_lo")} AS z1, {PZE.format(lat="lat_hi")} AS z2
          FROM geo WHERE m = 2
        ), redges AS (
          SELECT eid, x1 AS ex1, z1 AS ez1, x2 AS ex2, z1 AS ez2 FROM rects
          UNION ALL SELECT eid, x2, z1, x2, z2 FROM rects
          UNION ALL SELECT eid, x2, z2, x1, z2 FROM rects
          UNION ALL SELECT eid, x1, z2, x1, z1 FROM rects
        ), wa_int AS (
          SELECT DISTINCT s.eid AS s_eid, e.eid AS r_eid
          FROM segs s JOIN redges e ON abs({_eden}) > 0.0001
          WHERE {_etnum} / {_eden} BETWEEN 0 AND 1
            AND {_esnum} / {_eden} BETWEEN 0 AND 1
        ), aa0 AS (
          SELECT a.eid AS ae, b.eid AS be,
                 (b.x1 > a.x1 AND b.x2 < a.x2 AND b.z1 >= a.z1 AND b.z2 < a.z2) AS b_in_a,
                 (a.x1 > b.x1 AND a.x2 < b.x2 AND a.z1 >= b.z1 AND a.z2 < b.z2) AS a_in_b
          FROM rects a JOIN rects b ON a.k < b.k
           AND a.x1 < b.x2 AND b.x1 < a.x2 AND a.z1 <= b.z2 AND b.z1 <= a.z2
        )
        SELECT a.eid AS a_id, 'segment' AS a_type, b.eid AS b_id,
               'segment' AS b_type, 'INTERSECT' AS overlap_kind
        FROM segs a JOIN segs b ON a.k < b.k
        WHERE abs({_den}) > 0.0001
          AND {_tnum} / {_den} BETWEEN 0 AND 1
          AND {_snum} / {_den} BETWEEN 0 AND 1
        UNION ALL
        SELECT n.eid, 'node', r.eid, 'area', 'CONTAIN'
        FROM nodes n JOIN rects r
          ON n.x > r.x1 AND n.x < r.x2 AND n.z >= r.z1 AND n.z < r.z2
        UNION ALL
        SELECT s_eid, 'segment', r_eid, 'area', 'INTERSECT' FROM wa_int
        UNION ALL
        SELECT s.eid, 'segment', r.eid, 'area', 'CONTAIN'
        FROM segs s JOIN rects r
          ON s.x1 > r.x1 AND s.x1 < r.x2 AND s.z1 >= r.z1 AND s.z1 < r.z2
         AND s.x2 > r.x1 AND s.x2 < r.x2 AND s.z2 >= r.z1 AND s.z2 < r.z2
        WHERE NOT EXISTS (
          SELECT 1 FROM wa_int wi WHERE wi.s_eid = s.eid AND wi.r_eid = r.eid
        )
        UNION ALL
        SELECT CASE WHEN b_in_a THEN be WHEN a_in_b THEN ae ELSE ae END, 'area',
               CASE WHEN b_in_a THEN ae WHEN a_in_b THEN be ELSE be END, 'area',
               CASE WHEN b_in_a OR a_in_b THEN 'CONTAIN' ELSE 'INTERSECT' END
        FROM aa0
    """

    # S8 tileset index: per-doc element lat/lon bboxes -> z14 tile cover ->
    # per-child counts -> z12 roll-up with tight union bounds (slippy
    # inverse-tile math, same formulas as the tile_bounds oracle).
    _ts_lat = "degrees(atan((exp(pi() - 2*pi()*({y})/16384.0) - exp(-(pi() - 2*pi()*({y})/16384.0)))/2))"
    sql["tileset_index"] = f"""
        WITH geo AS (
          SELECT doc_id AS k, doc_id % 3 AS m,
                 round({_g_lat}, 7) AS lat, round({_g_lon}, 7) AS lon,
                 round({_g_lat2}, 7) AS lat2, round({_g_lon2}, 7) AS lon2,
                 round(({_g_lat}) - CAST(0.0006 AS DOUBLE), 7) AS lat_lo,
                 round(({_g_lat}) + CAST(0.0006 AS DOUBLE), 7) AS lat_hi,
                 round(({_g_lon}) - CAST(0.0009 AS DOUBLE), 7) AS lon_lo,
                 round(({_g_lon}) + CAST(0.0009 AS DOUBLE), 7) AS lon_hi
          FROM documents
        ), boxes AS (
          SELECT k,
                 CASE m WHEN 0 THEN lat WHEN 1 THEN least(lat, lat2) ELSE lat_lo END AS minlat,
                 CASE m WHEN 0 THEN lat WHEN 1 THEN greatest(lat, lat2) ELSE lat_hi END AS maxlat,
                 CASE m WHEN 0 THEN lon WHEN 1 THEN least(lon, lon2) ELSE lon_lo END AS minlon,
                 CASE m WHEN 0 THEN lon WHEN 1 THEN greatest(lon, lon2) ELSE lon_hi END AS maxlon
          FROM geo
        ), cover AS (
          SELECT k, cast(t.x as int) AS x, cast(u.y as int) AS y
          FROM (
            SELECT k,
                   {TX14.format(lon="minlon")} AS x0, {TX14.format(lon="maxlon")} AS x1,
                   {TY14.format(lat="maxlat")} AS y0, {TY14.format(lat="minlat")} AS y1
            FROM boxes
          )
          CROSS JOIN unnest(generate_series(x0, x1)) AS t(x)
          CROSS JOIN unnest(generate_series(y0, y1)) AS u(y)
        ), child AS (
          SELECT x, y, count(*) AS n_elements FROM cover GROUP BY 1, 2
        )
        SELECT CAST(12 AS INT) AS zoom,
               cast(floor(x / 4.0) as int) AS tile_x,
               cast(floor(y / 4.0) as int) AS tile_y,
               count(*) AS n_children,
               CAST(sum(n_elements) AS BIGINT) AS n_elements,
               round(min({_ts_lat.format(y="y + 1")}), 9) AS minlat,
               round(min(x / 16384.0 * 360.0 - 180.0), 9) AS minlon,
               round(max({_ts_lat.format(y="y")}), 9) AS maxlat,
               round(max((x + 1) / 16384.0 * 360.0 - 180.0), 9) AS maxlon,
               '12/' || cast(floor(x / 4.0) as int) || '/' || cast(floor(y / 4.0) as int) || '/tileset.json' AS content_uri
        FROM child
        GROUP BY 2, 3
    """

    # Triangulation over the rectangle fixtures, verified through its
    # invariants: ear-clipping a simple n-gon yields n-2 triangles (Euler),
    # and the signed cross-product sum equals the shoelace area — for an
    # axis-aligned CCW rectangle, exactly width x height.
    sql["triangulate_areas"] = f"""
        WITH geo AS (
          SELECT doc_id AS k,
                 'doc_' || lpad(doc_id::VARCHAR, 12, '0') || '#1' AS eid,
                 round(({_g_lat}) - CAST(0.0006 AS DOUBLE), 7) AS lat_lo,
                 round(({_g_lat}) + CAST(0.0006 AS DOUBLE), 7) AS lat_hi,
                 round(({_g_lon}) - CAST(0.0009 AS DOUBLE), 7) AS lon_lo,
                 round(({_g_lon}) + CAST(0.0009 AS DOUBLE), 7) AS lon_hi
          FROM documents WHERE doc_id % 3 = 2
        )
        SELECT eid, CAST(2 AS BIGINT) AS n_tris,
               cast(floor(({PXE.format(lon="lon_hi")} - {PXE.format(lon="lon_lo")})
                        * ({PZE.format(lat="lat_hi")} - {PZE.format(lat="lat_lo")})
                        * 1000000.0 + 0.5) as bigint) AS area_u6
        FROM geo
    """

    sql["centroid_area"] = """
        SELECT c_custkey,
               cast(24 * s * s as bigint) AS area_x2,
               'CCW' AS winding,
               cast(floor(((5 * s) / CAST(3 AS DOUBLE) + tx) * 1000000.0 + 0.5) as bigint) AS cx_u6,
               cast(floor(((5 * s) / CAST(3 AS DOUBLE) + tz) * 1000000.0 + 0.5) as bigint) AS cz_u6
        FROM (
          SELECT c_custkey, 1 + c_custkey % 7 AS s,
                 (c_custkey * 31) % 1000 AS tx, (c_custkey * 17) % 1000 AS tz
          FROM customer
        )
    """

    sql["polyline_interp"] = f"""
        WITH seg AS (
          SELECT o_orderkey,
                 {X_M.format(k='o_orderkey')} AS x1, {Z_M.format(k='o_orderkey')} AS z1,
                 {X_M.format(k='o_orderkey * 3 + 1')} AS x2, {Z_M.format(k='o_orderkey * 3 + 1')} AS z2
          FROM orders
        )
        SELECT o_orderkey, cast(i as int) AS i,
               cast(floor((x1 + (x2 - x1) * (cast(i as double) / CAST(4 AS DOUBLE))) * 1000000.0 + 0.5) as bigint) AS px_u6,
               cast(floor((z1 + (z2 - z1) * (cast(i as double) / CAST(4 AS DOUBLE))) * 1000000.0 + 0.5) as bigint) AS pz_u6
        FROM seg CROSS JOIN unnest(generate_series(0, 4)) AS t(i)
    """

    sql["codec_strings"] = f"""
        SELECT o_orderkey,
               eid_str,
               regexp_extract(eid_str, '^([nwr])([0-9]+)$', 1) AS parsed_type,
               cast(regexp_extract(eid_str, '^([nwr])([0-9]+)$', 2) as bigint) AS parsed_id,
               printf('N%02dE%03d.hgt', cast(floor(lat) as int), cast(floor(lon) as int)) AS srtm_name
        FROM (
          SELECT o_orderkey,
                 (CASE o_orderkey % 3 WHEN 0 THEN 'n' WHEN 1 THEN 'w' ELSE 'r' END) || o_orderkey AS eid_str,
                 {lat_o} AS lat, {lon_o} AS lon
          FROM orders
        )
    """

    sql["lod_filter"] = """
        SELECT c_custkey, lod_min, lod_max
        FROM (
          SELECT c_custkey,
                 cast(c_custkey % 4 as int) AS lod_min,
                 cast(least(4, c_custkey % 4 + c_custkey % 3) as int) AS lod_max
          FROM customer
        )
        WHERE lod_min <= 2 AND 2 <= lod_max
    """

    sql["log_truncate"] = """
        WITH ranked AS (
          SELECT event_id, event_type,
                 row_number() OVER (ORDER BY ts ASC, event_id ASC) AS rn,
                 row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn_rev
          FROM events
        )
        SELECT event_id, event_type,
               CASE WHEN rn <= 50 THEN 'head' ELSE 'tail' END AS part
        FROM ranked WHERE rn <= 50 OR rn_rev <= 50
    """

    sql["dim_join_agg"] = """
        SELECT r_name, count(*) AS n_cust,
               cast(sum(cast(floor(c_acctbal * 100.0 + 0.5) as bigint)) as bigint) AS sum_acct_cents
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """

    sql["nearest_attach"] = f"""
        WITH c AS (SELECT c_custkey AS c_id, {X_M.format(k="c_custkey")} AS x, CAST(0.0 AS DOUBLE) AS y, {Z_M.format(k="c_custkey")} AS z FROM customer),
             s AS (SELECT s_suppkey AS s_id, {X_M.format(k="s_suppkey")} AS x, CAST(s_suppkey % 50 AS DOUBLE) AS y, {Z_M.format(k="s_suppkey")} AS z FROM supplier)
        SELECT c_id, s_id,
               cast(floor(dxz * 1000000.0 + 0.5) as bigint) AS dxz_u6,
               cast(floor(d3d * 1000000.0 + 0.5) as bigint) AS d3d_u6
        FROM (
          SELECT c.c_id, s.s_id,
                 sqrt((s.x - c.x)*(s.x - c.x) + (s.z - c.z)*(s.z - c.z)) AS dxz,
                 sqrt((s.x - c.x)*(s.x - c.x) + (s.y - c.y)*(s.y - c.y) + (s.z - c.z)*(s.z - c.z)) AS d3d
          FROM c CROSS JOIN s
        )
        WHERE dxz <= 500.0
        QUALIFY row_number() OVER (PARTITION BY c_id ORDER BY d3d, s_id) = 1
    """

    sql["huge_clip"] = f"""
        WITH c AS (
          SELECT c_custkey AS key, {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z,
                 CASE WHEN c_custkey % 97 = 0 THEN CAST(20000.0 AS DOUBLE) ELSE CAST(40.0 AS DOUBLE) END AS h
          FROM customer
        ), b AS (
          SELECT min(x) AS bminx, min(z) AS bminz, max(x) AS bmaxx, max(z) AS bmaxz FROM c
        )
        SELECT 'a' || key AS doc_id, clipped,
               cast(floor((CASE WHEN clipped THEN greatest(bminx - 1.0, x - h) ELSE x - h END) * 1000.0 + 0.5) as bigint) AS minx_mm,
               cast(floor((CASE WHEN clipped THEN greatest(bminz - 1.0, z - h) ELSE z - h END) * 1000.0 + 0.5) as bigint) AS minz_mm,
               cast(floor((CASE WHEN clipped THEN least(bmaxx + 1.0, x + h) ELSE x + h END) * 1000.0 + 0.5) as bigint) AS maxx_mm,
               cast(floor((CASE WHEN clipped THEN least(bmaxz + 1.0, z + h) ELSE z + h END) * 1000.0 + 0.5) as bigint) AS maxz_mm
        FROM (
          SELECT key, x, z, h, bminx, bminz, bmaxx, bmaxz,
                 ((x + h) - (x - h)) * ((z + h) - (z - h)) > 5.0 * ((bmaxx - bminx) * (bmaxz - bminz)) AS clipped
          FROM c CROSS JOIN b
        )
    """

    sql["terrain_patches"] = f"""
        WITH b AS (
          SELECT min(x) AS bminx, min(z) AS bminz, max(x) AS bmaxx, max(z) AS bmaxz
          FROM (SELECT {X_M.format(k="s_suppkey")} AS x, {Z_M.format(k="s_suppkey")} AS z FROM supplier)
        ), g AS (
          SELECT cast(ceil((bminx - 30.0 + 0.01) / 30.0) as int) AS start_x,
                 cast(ceil((bminz - 30.0 + 0.01) / 30.0) as int) AS start_z,
                 cast(floor((bmaxx + 30.0 - 0.01) / 30.0) as int) AS end_x,
                 cast(floor((bmaxz + 30.0 - 0.01) / 30.0) as int) AS end_z
          FROM b
        ), s AS (
          SELECT start_x, start_z, end_x - start_x + 1 AS size_x, end_z - start_z + 1 AS size_z FROM g
        ), p AS (
          SELECT start_x, start_z, size_x, size_z,
                 cast(px as int) AS patch_x, cast(pz as int) AS patch_z
          FROM s
          CROSS JOIN unnest(generate_series(0, (size_x + 8) // 10 - 1)) AS tx(px)
          CROSS JOIN unnest(generate_series(0, (size_z + 8) // 10 - 1)) AS tz(pz)
        )
        SELECT patch_x, patch_z,
               cast(2 * (least(patch_x * 10 + 11, size_x) - patch_x * 10)
                  + 2 * (least(patch_z * 10 + 11, size_z) - patch_z * 10) - 3 as int) AS n_pts,
               cast(floor((start_x + patch_x * 10) * 30.0 * 1000.0 + 0.5) as bigint) AS minx_mm,
               cast(floor((start_z + patch_z * 10) * 30.0 * 1000.0 + 0.5) as bigint) AS minz_mm,
               cast(floor((start_x + least(patch_x * 10 + 11, size_x) - 1) * 30.0 * 1000.0 + 0.5) as bigint) AS maxx_mm,
               cast(floor((start_z + least(patch_z * 10 + 11, size_z) - 1) * 30.0 * 1000.0 + 0.5) as bigint) AS maxz_mm
        FROM p
    """

    sql["tag_rules"] = """
        SELECT c_custkey,
               ((k1 IN ('building', 'leisure') OR (k1 = 'natural' AND v1 = 'water'))
                AND NOT (c_custkey % 11 = 0)) AS is_area,
               (k1 = 'natural' AND v1 = 'water') AS is_land,
               (k1 = 'route' AND v1 = 'ferry') AS is_sea
        FROM (
          SELECT c_custkey,
                 (CASE c_custkey % 5 WHEN 0 THEN 'building' WHEN 1 THEN 'highway'
                       WHEN 2 THEN 'natural' WHEN 3 THEN 'leisure' ELSE 'route' END) AS k1,
                 (CASE c_custkey % 4 WHEN 0 THEN 'yes' WHEN 1 THEN 'water'
                       WHEN 2 THEN 'pitch' ELSE 'ferry' END) AS v1
          FROM customer
        )
    """

    sql["poly_boolean"] = f"""
        WITH p AS (
          SELECT c_custkey,
                 {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z,
                 CAST(40 + c_custkey % 20 AS DOUBLE) AS hax,
                 CAST(30 + c_custkey % 25 AS DOUBLE) AS haz,
                 CAST((c_custkey * 13 % 120) - 60 AS DOUBLE) AS dx,
                 CAST((c_custkey * 7 % 100) - 50 AS DOUBLE) AS dz
          FROM customer
        ), r AS (
          SELECT c_custkey, hax, haz,
                 x - hax AS ax0, z - haz AS az0, x + hax AS ax1, z + haz AS az1,
                 (x + dx) - 35.0 AS bx0, (z + dz) - 45.0 AS bz0,
                 (x + dx) + 35.0 AS bx1, (z + dz) + 45.0 AS bz1
          FROM p
        )
        SELECT cast(c_custkey as varchar) AS pair_id,
               cast(floor((2*hax) * (2*haz) * 1000000.0 + 0.5) as bigint) AS area_a_u6,
               cast(floor(70.0 * 90.0 * 1000000.0 + 0.5) as bigint) AS area_b_u6,
               cast(floor(inter * 1000000.0 + 0.5) as bigint) AS inter_u6,
               cast(floor(((2*hax) * (2*haz) - inter) * 1000000.0 + 0.5) as bigint) AS a_minus_b_u6
        FROM (
          SELECT c_custkey, hax, haz,
                 greatest(0.0, least(ax1, bx1) - greatest(ax0, bx0))
                 * greatest(0.0, least(az1, bz1) - greatest(az0, bz0)) AS inter
          FROM r
        )
    """

    sql["embedding_near_dups"] = f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({dot.replace('q.embedding', 'a.embedding').replace('c.embedding', 'b.embedding')}
                     / ({nrm.format(v='a')} * {nrm.format(v='b')}), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({dot.replace('q.embedding', 'a.embedding').replace('c.embedding', 'b.embedding')}
                    / ({nrm.format(v='a')} * {nrm.format(v='b')}), 6) >= CAST(0.4 AS DOUBLE)
    """

    sql["span_roundtrip"] = "SELECT doc_id, text AS rebuilt FROM documents"

    sql["events_hourly"] = """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """

    sql["event_correlation"] = """
        SELECT l.user_id,
               l.event_id AS l_event_id, l.ts AS l_ts,
               r.event_id AS r_event_id, r.ts AS r_ts,
               epoch(l.ts) - epoch(r.ts) AS lag_seconds
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 1800 SECOND
        WHERE l.event_type = 'click' AND r.event_type = 'view'
    """

    # events_sliding: with duration = 2 x slide each event is in exactly
    # two epoch-aligned windows — its own 30-min bucket and the previous
    sql["events_sliding"] = """
        SELECT event_type,
               ws AS w_start,
               ws + INTERVAL 60 MINUTE AS w_end,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM (
          SELECT event_type, value,
                 time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS ws
          FROM events, unnest([0, 1]) AS t(k)
        )
        GROUP BY 1, 2
    """

    sql["events_histogram"] = """
        SELECT event_type,
               greatest(least(CAST(floor(value / 2.5) AS INT), 9), 0) AS bucket,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """

    sql["sessionize_events"] = """
        WITH marks AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(epoch(ts)) OVER w IS NULL
                         OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM marks
        )
        SELECT user_id, session_id, count(*) AS n_events,
               round(max(epoch(ts)) - min(epoch(ts)), 6) AS span_sec,
               round(sum(value), 6) AS sum_value
        FROM sess GROUP BY 1, 2
    """

    sql["session_windows"] = """
        WITH marks AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(epoch(ts)) OVER w IS NULL
                         OR epoch(ts) - lag(epoch(ts)) OVER w >= 1800.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM marks
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 1800 SECOND AS session_end,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM sess GROUP BY user_id, sid
    """

    sql["interval_events"] = """
        SELECT l.event_id, r.event_id AS r_event_id,
               round(epoch(l.ts) - epoch(r.ts), 6) AS dt_sec
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
        JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') r
          ON l.user_id = r.user_id
         AND abs(epoch(l.ts) - epoch(r.ts)) <= 600.0
    """

    sql["asof_events"] = """
        SELECT l.event_id, l.user_id, round(r.err_value, 6) AS err_value_asof
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS err_value
                        FROM events WHERE event_type = 'error'
                        GROUP BY 1, 2) r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """

    sql["collect_sorted"] = """
        SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
        FROM events GROUP BY user_id
    """

    # SimpleEleConstraintEnforcer closed form: ref cliques with an ON
    # member merge into the per-position ON pool; stiff sets (size >= 2)
    # take the null-skipping average (0.0 when all null); ABOVE/BELOW
    # offsets apply to every non-null elevation. Elevations are whole
    # numbers, so window sums are exact regardless of accumulation order.
    sql["ele_constraints"] = """
        WITH c AS (
          SELECT CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS conn_id,
                 CAST((l_orderkey * 7) % 50 AS DOUBLE) AS x,
                 CAST((l_partkey * 11) % 40 AS DOUBLE) AS z,
                 CASE WHEN l_linenumber % 3 = 0
                      THEN 'w' || CAST(l_suppkey % 5 AS VARCHAR) END AS ref,
                 CASE l_linenumber % 5 WHEN 0 THEN 'ABOVE' WHEN 1 THEN 'BELOW'
                      ELSE 'ON' END AS ground_state,
                 CASE WHEN l_linenumber % 7 != 0
                      THEN CAST(l_quantity AS DOUBLE) END AS ele
          FROM lineitem
        ), r AS (
          SELECT *, max(CASE WHEN ground_state = 'ON' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY x, z, ref) AS has_on
          FROM c
        ), k AS (
          SELECT *, CASE WHEN ref IS NOT NULL AND has_on = 1 THEN 'P'
                         WHEN ref IS NOT NULL THEN 'R:' || ref
                         WHEN ground_state = 'ON' THEN 'P'
                         ELSE 'S:' || conn_id END AS comp
          FROM r
        ), w AS (
          SELECT conn_id, ground_state, ele,
                 count(*) OVER (PARTITION BY x, z, comp) AS n,
                 count(ele) OVER (PARTITION BY x, z, comp) AS n_ele,
                 avg(ele) OVER (PARTITION BY x, z, comp) AS avg_ele
          FROM k
        )
        SELECT conn_id, ground_state,
               round(CASE WHEN n >= 2
                          THEN CASE WHEN n_ele > 0 THEN avg_ele ELSE 0.0 END
                          ELSE ele END
                     + CASE ground_state WHEN 'ABOVE' THEN 5.0
                            WHEN 'BELOW' THEN -5.0 ELSE 0.0 END, 6) AS ele
        FROM w
    """

    # EleCalculator dispatch: node-tag OSM-decimal parse (int path, else
    # ^(-?\d+)\.(\d+)$ with int-parsed groups) wins over owner bridge/
    # tunnel offsets; terrain elevation is the final fallback.
    _dec_before = r"try_cast(regexp_extract(es, '^(-?\d+)\.(\d+)$', 1) AS INTEGER)"
    _dec_after_s = r"regexp_extract(es, '^(-?\d+)\.(\d+)$', 2)"
    _parse = f"""
        COALESCE(
          CASE WHEN regexp_matches(es, '^[+-]?\\d+$')
               THEN CAST(try_cast(es AS INTEGER) AS DOUBLE) END,
          CASE WHEN regexp_matches(es, '^-?\\d+\\.\\d+$')
                AND {_dec_before} IS NOT NULL
                AND try_cast({_dec_after_s} AS INTEGER) IS NOT NULL
               THEN (CASE WHEN es LIKE '-%' THEN -1.0 ELSE 1.0 END)
                    * (CAST(abs({_dec_before}) AS DOUBLE)
                       + CAST(try_cast({_dec_after_s} AS INTEGER) AS DOUBLE)
                         * power(10.0, -length({_dec_after_s})))
          END)
    """
    sql["ele_calculator"] = f"""
        WITH c AS (
          SELECT CAST(o_orderkey AS VARCHAR) AS conn_id,
                 CASE o_orderkey % 6
                      WHEN 0 THEN CAST(o_orderkey % 500 AS VARCHAR)
                      WHEN 1 THEN CAST(o_orderkey % 100 AS VARCHAR) || '.'
                                  || CAST(o_orderkey % 999 AS VARCHAR)
                      WHEN 2 THEN '-' || CAST(o_orderkey % 80 AS VARCHAR) || '.'
                                  || CAST(o_orderkey % 99 AS VARCHAR)
                      WHEN 3 THEN 'high'
                      WHEN 4 THEN '' END AS es,
                 (o_orderkey % 6) < 5 AS has_node,
                 o_orderkey % 4 AS om,
                 CAST(o_orderkey % 90 AS DOUBLE) AS terrain
          FROM orders
        ), p AS (
          SELECT conn_id, has_node, om, terrain,
                 CASE WHEN has_node THEN {_parse} END AS node_ele,
                 CASE WHEN om = 0 THEN terrain + 0.1
                      WHEN om = 2 THEN terrain + 0.0 END AS bt_owner
          FROM c
        )
        SELECT conn_id, 'ele_tag' AS calc,
               round(COALESCE(node_ele, terrain), 6) AS ele
        FROM p
        UNION ALL
        SELECT conn_id, 'bridge_tunnel' AS calc,
               round(COALESCE(bt_owner, terrain), 6) AS ele
        FROM p
    """

    # Real PNG decode: pixel (y, x) of key k's gradient image is
    # (y*16 + x + k) % 256; feature cell (i, j) = mean over the 4x4 block
    # / 255. The Spark side recovers the exact integer block sum from the
    # float32 feature, so both sides reduce to this closed form.
    sql["media_decode"] = """
        WITH png_px AS (
          SELECT o_orderkey AS k, (y // 4) * 4 + (x // 4) AS cell,
                 (y * 16 + x + o_orderkey) % 256 AS v
          FROM orders,
               unnest(generate_series(0, 15)) AS ty(y),
               unnest(generate_series(0, 15)) AS tx(x)
          WHERE o_orderkey % 50 = 0
        ), jpg_px AS (
          -- constant 8x8 blocks: pixel value = ((y//8)*2 + (x//8) + 7k) % 256
          SELECT o_orderkey AS k, (y // 4) * 4 + (x // 4) AS cell,
                 ((y // 8) * 2 + (x // 8) + o_orderkey * 7) % 256 AS v
          FROM orders,
               unnest(generate_series(0, 15)) AS ty(y),
               unnest(generate_series(0, 15)) AS tx(x)
          WHERE o_orderkey % 50 = 7
        ), px AS (
          SELECT * FROM png_px UNION ALL SELECT * FROM jpg_px
        )
        SELECT CAST(k AS VARCHAR) AS doc_id, CAST(cell AS INT) AS cell,
               CAST(sum(v) AS BIGINT) AS lum_sum
        FROM px GROUP BY 1, 2
    """

    # jpeg_progressive: progressive streams of the same constant-block
    # pixels decode exactly, so the closed form matches media_decode's
    # jpg branch (different key residue)
    sql["jpeg_progressive"] = """
        SELECT CAST(o_orderkey AS VARCHAR) AS doc_id,
               CAST((y // 4) * 4 + (x // 4) AS INT) AS cell,
               CAST(sum(((y // 8) * 2 + (x // 8) + o_orderkey * 7) % 256)
                    AS BIGINT) AS lum_sum
        FROM orders,
             unnest(generate_series(0, 15)) AS ty(y),
             unnest(generate_series(0, 15)) AS tx(x)
        WHERE o_orderkey % 50 = 21
        GROUP BY 1, 2
    """

    # Road-network fixture shared by the three network queries: zigzag /
    # straight chains, positional node identity (exact-double string key,
    # whole-number coordinates so both engines print 'N.0').
    _net_segs = """
        base AS (
          SELECT DISTINCT o_orderkey % 200 AS c, (o_orderkey // 200) % 6 AS i
          FROM orders
        ), segs AS (
          SELECT 'c' || CAST(c AS VARCHAR) || '_' || CAST(i AS VARCHAR) AS seg_id,
                 CAST(c * 100 + i * 10 AS DOUBLE) AS x1,
                 CAST((c * 37) % 500
                      + (i % 2) * 7 * (CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) AS z1,
                 CAST(c * 100 + (i + 1) * 10 AS DOUBLE) AS x2,
                 CAST((c * 37) % 500
                      + ((i + 1) % 2) * 7 * (CASE WHEN c % 2 = 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) AS z2,
                 CAST(2 + (c + i) % 3 AS DOUBLE) AS width
          FROM base
        ), eps AS (
          SELECT seg_id, width, inbound,
                 CASE WHEN inbound THEN x2 ELSE x1 END AS nx,
                 CASE WHEN inbound THEN z2 ELSE z1 END AS nz,
                 CASE WHEN inbound THEN x1 ELSE x2 END - CASE WHEN inbound THEN x2 ELSE x1 END AS dx,
                 CASE WHEN inbound THEN z1 ELSE z2 END - CASE WHEN inbound THEN z2 ELSE z1 END AS dz
          FROM segs, unnest([false, true]) AS t(inbound)
        ), eps2 AS (
          SELECT seg_id, width, inbound, nx, nz,
                 CAST(nx AS VARCHAR) || ',' || CAST(nz AS VARCHAR) AS node,
                 dx / sqrt(dx * dx + dz * dz) AS ax,
                 dz / sqrt(dx * dx + dz * dz) AS az,
                 CASE WHEN dx = 0 AND dz = 0 THEN 0.0
                      WHEN dx / sqrt(dx * dx + dz * dz) >= 0
                      THEN acos(dz / sqrt(dx * dx + dz * dz))
                      ELSE 2 * pi() - acos(dz / sqrt(dx * dx + dz * dz)) END AS angle
          FROM eps
        )
    """

    sql["network_degrees"] = f"""
        WITH {_net_segs}
        SELECT node, CAST(count(*) AS INT) AS degree,
               CASE WHEN count(*) >= 3 THEN 'junction'
                    WHEN count(*) = 2 THEN 'connector'
                    ELSE 'end' END AS kind
        FROM eps2 GROUP BY node
    """

    # connected components: min reachable node key (transitive closure is
    # tiny — components are <= 7-node chains in this fixture)
    sql["network_components"] = f"""
        WITH RECURSIVE {_net_segs}, nodes AS (
          SELECT DISTINCT node FROM eps2
        ), edges AS (
          SELECT a.node AS src, b.node AS dst
          FROM eps2 a JOIN eps2 b USING (seg_id)
          WHERE a.node != b.node
        ), reach AS (
          SELECT node, node AS lbl FROM nodes
          UNION
          SELECT e.src AS node, r.lbl FROM reach r JOIN edges e ON e.dst = r.node
        )
        SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """

    # pagerank_ranks: the exact integer recurrence replayed as chained
    # CTEs (one per iteration); every op is bigint // so the match is
    # bit-for-bit, accumulation order irrelevant
    _pr_iter = """
        m{i} AS (
          SELECT e.dst AS node,
                 CAST(sum((85 * r.rank_u6) // (100 * o.outdeg)) AS BIGINT) AS im
          FROM edges e JOIN od o USING (src) JOIN r{p} r ON r.node = e.src
          GROUP BY e.dst
        ), r{i} AS (
          SELECT n2.node,
                 ((15 * 1000000) // (100 * st.n)) + coalesce(m{i}.im, 0) AS rank_u6
          FROM nodes n2 CROSS JOIN st LEFT JOIN m{i} ON m{i}.node = n2.node
        )"""
    sql["pagerank_ranks"] = f"""
        WITH {_net_segs}, edges AS (
          SELECT DISTINCT a.node AS src, b.node AS dst
          FROM eps2 a JOIN eps2 b USING (seg_id)
          WHERE a.node != b.node
        ), nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ), st AS (
          SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
        ), od AS (
          SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
        ), r0 AS (
          SELECT node, (1000000 // st.n) AS rank_u6 FROM nodes CROSS JOIN st
        ), {_pr_iter.format(i=1, p=0)}, {_pr_iter.format(i=2, p=1)}, {_pr_iter.format(i=3, p=2)}
        SELECT node, CAST(rank_u6 AS BIGINT) AS rank_u6 FROM r3
    """

    sql["network_hops"] = f"""
        WITH RECURSIVE {_net_segs}, edges AS (
          SELECT a.node AS src, b.node AS dst
          FROM eps2 a JOIN eps2 b USING (seg_id)
          WHERE a.node != b.node
        ), deg AS (
          SELECT node, count(*) AS d FROM eps2 GROUP BY node
        ), seeds AS (
          SELECT node FROM deg WHERE d = 1
        ), r AS (
          SELECT node, 0 AS hops FROM seeds
          UNION
          SELECT e.dst AS node, r.hops + 1 AS hops
          FROM r JOIN edges e ON e.src = r.node WHERE r.hops < 8
        )
        SELECT node, CAST(min(hops) AS INT) AS hops FROM r GROUP BY node
    """

    sql["network_distances"] = f"""
        WITH RECURSIVE {_net_segs}, seg_w AS (
          SELECT seg_id, sqrt((x2 - x1) * (x2 - x1) + (z2 - z1) * (z2 - z1)) AS w
          FROM segs
        ), edges AS (
          SELECT a.node AS src, b.node AS dst, w
          FROM eps2 a JOIN eps2 b USING (seg_id) JOIN seg_w USING (seg_id)
          WHERE a.node != b.node
        ), deg AS (
          SELECT node, count(*) AS d FROM eps2 GROUP BY node
        ), seeds AS (
          SELECT node FROM deg WHERE d = 1
        ), r AS (
          SELECT node, CAST(0.0 AS DOUBLE) AS dist, 0 AS hops FROM seeds
          UNION ALL
          SELECT e.dst AS node, r.dist + e.w AS dist, r.hops + 1 AS hops
          FROM r JOIN edges e ON e.src = r.node WHERE r.hops < {NET_MAX_ROUNDS}
        )
        SELECT node, round(min(dist), 6) AS dist FROM r GROUP BY node
    """

    # connector bisector cuts: the exact Column algebra of
    # operators/network.connector_cuts mirrored term by term
    # pii_scrub: recompute injection + masking in DuckDB (RE2 and Java
    # regex agree on the explicit-character-class patterns)
    sql["pii_scrub"] = """
        WITH d AS (
          SELECT doc_id,
                 text || ' contact: user' || doc_id || '@example.com'
                      || CASE WHEN doc_id % 3 = 0
                              THEN ' http://ex.com/p/' || doc_id ELSE '' END AS text
          FROM documents
        ), u AS (
          SELECT doc_id,
                 len(string_split_regex(text, 'https?://[^ \t\n]+')) - 1 AS n_urls,
                 regexp_replace(text, 'https?://[^ \t\n]+', '<URL>', 'g') AS t1
          FROM d
        )
        SELECT doc_id, CAST(n_urls AS INT) AS n_urls,
               CAST(len(string_split_regex(t1, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+')) - 1 AS INT) AS n_emails,
               md5(regexp_replace(t1, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g')) AS scrub_md5
        FROM u
    """

    # audio_decode: windowed evidence of the decoded PCM samples — window
    # w covers samples [floor(1024*w/8), floor(1024*(w+1)/8)); feature
    # index 2w = sum |s|, 2w+1 = sign changes (s >= 0 transitions)
    sql["audio_decode"] = """
        WITH ks AS (
          SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 50 = 21
        ), s AS (
          SELECT k, i,
                 ((i * (k % 31 + 3) + k) % 2048) - 1024 AS v,
                 (i * 8) // 1024 AS w
          FROM ks, unnest(generate_series(0, 1023)) AS t(i)
        ), marked AS (
          SELECT k, w, i, v,
                 CASE WHEN lag(v) OVER (PARTITION BY k, w ORDER BY i) IS NULL
                      THEN 0
                      WHEN (v >= 0) != (lag(v) OVER (PARTITION BY k, w ORDER BY i) >= 0)
                      THEN 1 ELSE 0 END AS sc
          FROM s
        ), agg AS (
          SELECT k, w, sum(abs(v)) AS abs_sum, sum(sc) AS n_sc
          FROM marked GROUP BY k, w
        )
        SELECT CAST(k AS VARCHAR) AS doc_id, CAST(w * 2 AS INT) AS i,
               CAST(abs_sum AS BIGINT) AS v
        FROM agg
        UNION ALL
        SELECT CAST(k AS VARCHAR) AS doc_id, CAST(w * 2 + 1 AS INT) AS i,
               CAST(n_sc AS BIGINT) AS v
        FROM agg
    """

    # osm_json_parse / osm_way_geometry: the synthesized OSM-JSON responses
    # recomputed directly from orders — parse/dialect errors break the match
    _lat_k = LAT.format(k="k")
    _lon_k = LON.format(k="k")
    sql["osm_json_parse"] = f"""
        WITH ks AS (SELECT o_orderkey AS k FROM orders),
        nodes AS (
          SELECT CAST(k // 200 AS BIGINT) AS response_id,
                 'node' AS elem_type, CAST(k AS BIGINT) AS elem_id,
                 cast(floor(({_lat_k}) * 10000000.0 + 0.5) as bigint) AS lat_u7,
                 cast(floor(({_lon_k}) * 10000000.0 + 0.5) as bigint) AS lon_u7,
                 1 AS n_tags, -1 AS n_node_refs
          FROM ks
        ), ways AS (
          SELECT CAST((k // 8) * 8 // 200 AS BIGINT) AS response_id,
                 'way' AS elem_type, CAST(k // 8 AS BIGINT) AS elem_id,
                 CAST(NULL AS BIGINT) AS lat_u7, CAST(NULL AS BIGINT) AS lon_u7,
                 1 AS n_tags, CAST(count(*) AS INT) AS n_node_refs
          FROM ks GROUP BY 1, 2, 3
        )
        SELECT * FROM nodes UNION ALL SELECT * FROM ways
    """
    sql["osm_way_geometry"] = f"""
        WITH w AS (
          SELECT CAST(o_orderkey // 8 AS BIGINT) AS way_id, o_orderkey AS k FROM orders
        ), ends AS (
          SELECT way_id, count(*) AS n_pts, min(k) AS k0, max(k) AS k1
          FROM w GROUP BY way_id
        )
        SELECT way_id, CAST(n_pts AS BIGINT) AS n_pts, CAST(0 AS INT) AS n_missing,
               cast(floor(({LAT.format(k="k0")}) * 10000000.0 + 0.5) as bigint) AS lat0_u7,
               cast(floor(({LON.format(k="k0")}) * 10000000.0 + 0.5) as bigint) AS lon0_u7,
               cast(floor(({LAT.format(k="k1")}) * 10000000.0 + 0.5) as bigint) AS lat1_u7,
               cast(floor(({LON.format(k="k1")}) * 10000000.0 + 0.5) as bigint) AS lon1_u7
        FROM ends
    """

    # ngram_lm: corpus bigram counts joined back per doc — exact integer
    # evidence (gram count, summed corpus frequency, vocabulary size)
    bigram_list = (
        "CASE WHEN len(string_split(text, ' ')) - 1 >= 1 THEN "
        "list_transform(range(len(string_split(text, ' ')) - 1), "
        "i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]) "
        "ELSE [text] END"
    )
    sql["ngram_lm"] = f"""
        WITH grams AS (
          SELECT doc_id, unnest({bigram_list}) AS gram FROM documents
        ), counts AS (
          SELECT gram, count(*) AS freq FROM grams GROUP BY gram
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(sum(c.freq) AS BIGINT) AS sum_freq,
               CAST((SELECT count(*) FROM counts) AS BIGINT) AS vocab
        FROM grams g JOIN counts c USING (gram)
        GROUP BY g.doc_id
    """

    # cag_pieces: the A-minus-B face decomposition of a rectangle whose
    # lower-left corner is strictly covered by B is a single L-shaped
    # hexagon; canonical order starts at the lexicographic min vertex
    # (ax0, bz1) and runs CCW
    sql["cag_pieces"] = f"""
        WITH p AS (
          SELECT c_custkey AS k,
                 {X_M.format(k="c_custkey")} AS x, {Z_M.format(k="c_custkey")} AS z,
                 CAST(40 + c_custkey % 20 AS DOUBLE) AS hax,
                 CAST(30 + c_custkey % 25 AS DOUBLE) AS haz
          FROM customer
        ), r AS (
          SELECT k,
                 x - hax AS ax0, z - haz AS az0, x + hax AS ax1, z + haz AS az1,
                 (x - hax) + CAST(10 + k % 25 AS DOUBLE) AS bx1,
                 (z - haz) + CAST(8 + k % 20 AS DOUBLE) AS bz1
          FROM p
        ), v AS (SELECT unnest(generate_series(0, 5)) AS vtx)
        SELECT cast(k as varchar) AS pair_id,
               0 AS piece_idx, 0 AS n_holes, cast(vtx as int) AS vtx,
               cast(floor(1000.0 * (CASE vtx
                    WHEN 0 THEN ax0 WHEN 1 THEN bx1 WHEN 2 THEN bx1
                    WHEN 3 THEN ax1 WHEN 4 THEN ax1 ELSE ax0 END) + 0.5) as bigint) AS x_mm,
               cast(floor(1000.0 * (CASE vtx
                    WHEN 0 THEN bz1 WHEN 1 THEN bz1 WHEN 2 THEN az0
                    WHEN 3 THEN az0 WHEN 4 THEN az1 ELSE az1 END) + 0.5) as bigint) AS z_mm
        FROM r CROSS JOIN v
    """

    # dup_spans: corpus k-gram frequencies -> duplicated positions ->
    # lag/island merge, the same relational plan re-run in DuckDB
    sql["dup_spans"] = """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), g AS (
          SELECT doc_id, unnest(range(len(t) - 3)) AS pos, t
          FROM toks WHERE len(t) - 3 >= 1
        ), g2 AS (
          SELECT doc_id, pos,
                 array_to_string(list_slice(t, pos + 1, pos + 4), ' ') AS gk
          FROM g
        ), d AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY gk) AS cnt FROM g2
          ) WHERE cnt >= 2
        ), isl AS (
          SELECT doc_id, pos,
                 sum(CASE WHEN prev IS NULL OR pos > prev + 4 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM d
          )
        ), sp AS (
          SELECT doc_id, island, min(pos) AS tok_start,
                 max(pos) + 4 AS tok_end, count(*) AS n_grams
          FROM isl GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tok_start) - 1 AS INT) AS span_idx,
               CAST(tok_start AS INT) AS tok_start,
               CAST(tok_end AS INT) AS tok_end,
               CAST(n_grams AS BIGINT) AS n_grams
        FROM sp
    """

    # tri_interpolate: barycentric weights with the engine's op tree
    # (multiply by a reciprocal computed once, NULL on degenerate), the
    # reference's weight>1 guard only
    sql["tri_interpolate"] = f"""
        WITH s AS (
          SELECT s_suppkey AS k,
                 {X_M.format(k="s_suppkey")} AS t1x, {Z_M.format(k="s_suppkey")} AS t1z,
                 {X_M.format(k="s_suppkey * 3 + 1")} AS t2x, {Z_M.format(k="s_suppkey * 3 + 1")} AS t2z,
                 {X_M.format(k="s_suppkey * 7 + 2")} AS t3x, {Z_M.format(k="s_suppkey * 7 + 2")} AS t3z,
                 CAST(s_suppkey % 10 AS DOUBLE) / CAST(8 AS DOUBLE) AS a,
                 CAST(s_suppkey % 7 AS DOUBLE) / CAST(6 AS DOUBLE) AS b,
                 CAST(s_suppkey % 100 AS DOUBLE) AS v1,
                 CAST((s_suppkey * 3) % 100 AS DOUBLE) AS v2,
                 CAST((s_suppkey * 7) % 100 AS DOUBLE) AS v3
          FROM supplier
        ), pr AS (
          SELECT *, t3x + (t1x - t3x) * a + (t2x - t3x) * b AS px,
                    t3z + (t1z - t3z) * a + (t2z - t3z) * b AS pz
          FROM s
        ), den AS (
          SELECT *, CAST(1.0 AS DOUBLE) / NULLIF((t2z - t3z) * (t1x - t3x)
                     + (t3x - t2x) * (t1z - t3z), 0) AS dinv
          FROM pr
        ), w AS (
          SELECT *, ((t2z - t3z) * (px - t3x) + (t3x - t2x) * (pz - t3z)) * dinv AS w1,
                    ((t3z - t1z) * (px - t3x) + (t1x - t3x) * (pz - t3z)) * dinv AS w2
          FROM den
        )
        SELECT k,
               cast(floor((CASE WHEN w1 <= CAST(1.0 AS DOUBLE) AND w2 <= CAST(1.0 AS DOUBLE)
                    THEN w1 * v1 + w2 * v2 + (CAST(1.0 AS DOUBLE) - w1 - w2) * v3
                    END) * 1000000.0 + 0.5) as bigint) AS val_u6
        FROM w
    """

    # insert_vertex: the closest-segment (first-minimum) insertion with
    # corner snap, rebuilt over the 4 rectangle edges
    def _iv_d(ax, az, bx, bz):
        t = (
            f"LEAST(GREATEST(((px - {ax}) * ({bx} - {ax}) + (pz - {az}) * ({bz} - {az}))"
            f" / (({bx} - {ax}) * ({bx} - {ax}) + ({bz} - {az}) * ({bz} - {az})),"
            f" CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))"
        )
        return (
            f"sqrt((px - ({ax} + {t} * ({bx} - {ax}))) * (px - ({ax} + {t} * ({bx} - {ax})))"
            f" + (pz - ({az} + {t} * ({bz} - {az}))) * (pz - ({az} + {t} * ({bz} - {az}))))"
        )

    sql["insert_vertex"] = f"""
        WITH p0 AS (
          SELECT c_custkey AS k,
                 {X_M.format(k="c_custkey")} AS x0, {Z_M.format(k="c_custkey")} AS z0
          FROM customer
        ), r AS (
          SELECT k, x0, z0,
                 x0 + CAST(60 + k % 40 AS DOUBLE) AS x1,
                 z0 + CAST(50 + (k * 3) % 30 AS DOUBLE) AS z1,
                 x0 + CAST((k * 13) % 140 AS DOUBLE) - CAST(20.0 AS DOUBLE) AS px,
                 z0 + CAST((k * 29) % 110 AS DOUBLE) - CAST(15.0 AS DOUBLE) AS pz
          FROM p0
        ), d AS (
          SELECT *, {_iv_d("x0", "z0", "x1", "z0")} AS d0,
                    {_iv_d("x1", "z0", "x1", "z1")} AS d1,
                    {_iv_d("x1", "z1", "x0", "z1")} AS d2,
                    {_iv_d("x0", "z1", "x0", "z0")} AS d3
          FROM r
        ), jj AS (
          SELECT *, CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                         WHEN d1 <= d2 AND d1 <= d3 THEN 1
                         WHEN d2 <= d3 THEN 2 ELSE 3 END AS j
          FROM d
        ), sn AS (
          SELECT *, CASE j WHEN 0 THEN x0 WHEN 1 THEN x1 WHEN 2 THEN x1 ELSE x0 END AS vjx,
                    CASE j WHEN 0 THEN z0 WHEN 1 THEN z0 WHEN 2 THEN z1 ELSE z1 END AS vjz,
                    CASE j WHEN 0 THEN x1 WHEN 1 THEN x1 WHEN 2 THEN x0 ELSE x0 END AS wjx,
                    CASE j WHEN 0 THEN z0 WHEN 1 THEN z1 WHEN 2 THEN z1 ELSE z0 END AS wjz
          FROM jj
        ), br AS (
          SELECT *, (sqrt((px - vjx) * (px - vjx) + (pz - vjz) * (pz - vjz)) <= CAST(6.0 AS DOUBLE)
                  OR sqrt((px - wjx) * (px - wjx) + (pz - wjz) * (pz - wjz)) <= CAST(6.0 AS DOUBLE)) AS snapped
          FROM sn
        ), pos AS (SELECT unnest(generate_series(0, 5)) AS idx),
        outp AS (
          SELECT k, idx, snapped, j, px, pz, x0, z0, x1, z1,
                 CASE WHEN snapped OR idx <= j THEN idx ELSE idx - 1 END AS oi
          FROM br CROSS JOIN pos
          WHERE idx < CASE WHEN snapped THEN 5 ELSE 6 END
        )
        SELECT k, CAST(idx AS INT) AS idx,
               cast(floor((CASE WHEN NOT snapped AND idx = j + 1 THEN px
                    ELSE CASE oi WHEN 0 THEN x0 WHEN 1 THEN x1 WHEN 2 THEN x1
                                 WHEN 3 THEN x0 ELSE x0 END END) * 1000000.0 + 0.5) as bigint) AS x_u6,
               cast(floor((CASE WHEN NOT snapped AND idx = j + 1 THEN pz
                    ELSE CASE oi WHEN 0 THEN z0 WHEN 1 THEN z0 WHEN 2 THEN z1
                                 WHEN 3 THEN z1 ELSE z0 END END) * 1000000.0 + 0.5) as bigint) AS z_u6
        FROM outp
    """

    # --- simplify_ring / convex_hull shared SQL generators -------------
    # Shoelace with the ENGINE's accumulation order. functions/polyline.py
    # _ring_signed_area folds ((acc + x_i*z_{i+1}) - x_{i+1}*z_i) left to
    # right; IEEE-754 subtraction is exactly addition of the negation, so
    # a flat list_reduce over [0.0, p_0, -q_0, p_1, -q_1, ...] reproduces
    # the identical rounding sequence. `p` is a 1-based list of 0-based
    # vertex indices describing a CLOSED loop (last element == first).
    def _sa_sql(p):
        xi, zi = f"xs[{p}[i] + 1]", f"zs[{p}[i] + 1]"
        xi1, zi1 = f"xs[{p}[i + 1] + 1]", f"zs[{p}[i + 1] + 1]"
        return (
            "(list_reduce(list_concat([CAST(0.0 AS DOUBLE)], "
            f"flatten(list_transform(generate_series(1, len({p}) - 1), "
            f"i -> [{xi} * {zi1}, -({xi1} * {zi})]))), "
            "(acc, t) -> acc + t) / CAST(2.0 AS DOUBLE))"
        )

    # simplified_polygon stage1 vertex dot: normalize-then-dot, the
    # engine's exact op tree over the n=8 ring (i is a 0-based lambda var)
    def _dot_sql():
        ip, ic, nx = "((i - 1 + 8) % 8 + 1)", "(i + 1)", "((i + 1) % 8 + 1)"
        bx, bz = f"(xs[{ic}] - xs[{ip}])", f"(zs[{ic}] - zs[{ip}])"
        ax, az = f"(xs[{nx}] - xs[{ic}])", f"(zs[{nx}] - zs[{ic}])"
        lb = f"sqrt({bx} * {bx} + {bz} * {bz})"
        la = f"sqrt({ax} * {ax} + {az} * {az})"
        return f"(({bx} / {lb}) * ({ax} / {la}) + ({bz} / {lb}) * ({az} / {la}))"

    def _kept_sql(tol):
        return (
            "list_filter(generate_series(0, 7), i -> NOT "
            f"(abs(dots[i + 1] - CAST(1.0 AS DOUBLE)) < CAST({tol} AS DOUBLE)))"
        )

    # simplify_ring: full replication of getSimplifiedPolygon's control
    # flow. The constructed rectangles-with-outward-bulges make the
    # validity predicate structurally TRUE for every candidate (vertices
    # pairwise distinct, bulges on disjoint outward half-planes so no
    # self-intersection, |area| >> 1e-6), so the oracle replicates the
    # tolerance passes, the no-op/degenerate guard, and the 10% area
    # retry — every branch input (dots, areas) is a bit-identical double
    # because the coordinate expressions are pure +,-,*,/ over exact
    # integers (correctly rounded identically by both engines).
    sql["simplify_ring"] = f"""
        WITH c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0),
        jj AS (SELECT unnest(generate_series(0, 7)) AS j),
        v AS (SELECT k, j, ({_SR_XS}) AS x, ({_SR_ZS}) AS z FROM c CROSS JOIN jj),
        vl AS (SELECT k, list(x ORDER BY j) AS xs, list(z ORDER BY j) AS zs
               FROM v GROUP BY k),
        dt AS (SELECT k, xs, zs,
                 list_transform(generate_series(0, 7), i -> {_dot_sql()}) AS dots
               FROM vl),
        kp AS (SELECT k, xs, zs,
                 {_kept_sql("0.05")} AS k05,
                 {_kept_sql("0.001")} AS k001
               FROM dt),
        rg AS (SELECT k, xs, zs,
                 CASE WHEN len(k05) = 8 OR len(k05) < 3
                      THEN list_concat(generate_series(0, 7), [0])
                      ELSE list_concat(k05, [k05[1]]) END AS p05,
                 CASE WHEN len(k001) = 8 OR len(k001) < 3
                      THEN list_concat(generate_series(0, 7), [0])
                      ELSE list_concat(k001, [k001[1]]) END AS p001,
                 list_concat(generate_series(0, 7), [0]) AS pg
               FROM kp),
        ar AS (SELECT k, xs, zs, p05, p001,
                 abs({_sa_sql("p05")}) AS a05,
                 abs({_sa_sql("pg")}) AS ag
               FROM rg),
        fin AS (SELECT k, xs, zs,
                  CASE WHEN abs(a05 - ag) / ag > CAST(0.1 AS DOUBLE)
                       THEN p001 ELSE p05 END AS pts
                FROM ar),
        pos AS (SELECT unnest(generate_series(0, 8)) AS idx)
        SELECT k, CAST(idx AS INT) AS idx,
               CAST(floor(xs[pts[idx + 1] + 1] * 1000000.0 + 0.5) AS BIGINT) AS x_u6,
               CAST(floor(zs[pts[idx + 1] + 1] * 1000000.0 + 0.5) AS BIGINT) AS z_u6
        FROM fin CROSS JOIN pos WHERE idx < len(pts)
    """

    # convex_hull: the ENGINE's Sklansky pop-while chains replicated with
    # list_reduce (left fold, list accumulator), not an independent hull
    # algorithm — so parity holds branch-for-branch. isRightOf uses the
    # same cross-product op tree; the post-pop stack length is the same
    # max-L-satisfying-the-while-condition formulation. Coordinates are
    # snapped to 1/1024 on BOTH sides (see _CH_X), so cos/sin libm-vs-JVM
    # ulp skew cannot reach any branch input. acc[0] (L = 1 guard) is
    # NULL-safe in DuckDB: TRUE OR NULL = TRUE, matching Spark's
    # short-circuited Or codegen.
    def _rightof_sql(p, l1, l2):
        zp, xp = f"zs[{p} + 1]", f"xs[{p} + 1]"
        z1, x1 = f"zs[{l1} + 1]", f"xs[{l1} + 1]"
        z2, x2 = f"zs[{l2} + 1]", f"xs[{l2} + 1]"
        return (
            f"((({zp} - {z1}) * ({x2} - {x1})"
            f" - ({xp} - {x1}) * ({z2} - {z1})) < CAST(0.0 AS DOUBLE))"
        )

    def _chain_sql(vs):
        keep = (
            "list_max(list_filter(generate_series(1, len(acc)), "
            "L -> L = 1 OR NOT "
            + _rightof_sql("acc[L - 1]", "e[1]", "acc[L]")
            + "))"
        )
        return (
            f"CASE WHEN len({vs}) < 3 THEN {vs} ELSE "
            f"list_reduce(list_concat([list_slice({vs}, 1, 2)], "
            f"list_transform(list_slice({vs}, 3, len({vs})), vv -> [vv])), "
            f"(acc, e) -> list_concat(list_slice(acc, 1, {keep}), [e[1]])) END"
        )

    sql["convex_hull"] = f"""
        WITH s AS (SELECT s_suppkey AS k FROM supplier),
        jj AS (SELECT unnest(generate_series(0, 12)) AS j),
        v AS (SELECT k, j, ({_CH_X}) AS x, ({_CH_Z}) AS z
              FROM s CROSS JOIN jj WHERE j < {_CH_M}),
        vl AS (SELECT k, {_CH_M} AS n,
                 list(x ORDER BY j) AS xs, list(z ORDER BY j) AS zs
               FROM v GROUP BY k),
        sa AS (SELECT *, list_concat(generate_series(0, n - 1), [0]) AS pg FROM vl),
        cwi AS (SELECT k, n, xs, zs,
                  ({_sa_sql("pg")}) < CAST(0.0 AS DOUBLE) AS cw
                FROM sa),
        ci AS (SELECT *,
                 CASE WHEN cw THEN generate_series(0, n - 1)
                      ELSE list_concat([CAST(0 AS BIGINT)],
                                       list_reverse(generate_series(1, n - 1))) END AS cidx
               FROM cwi),
        mm AS (SELECT *, list_transform(cidx, i -> xs[i + 1]) AS cxs FROM ci),
        mi AS (SELECT *,
                 list_position(cxs, list_min(cxs)) - 1 AS min_i,
                 list_position(cxs, list_max(cxs)) - 1 AS max_i
               FROM mm),
        hs AS (SELECT *,
                 list_transform(generate_series(0, (max_i - min_i + n) % n),
                                j2 -> cidx[(min_i + j2) % n + 1]) AS upr,
                 list_transform(generate_series(0, (min_i - max_i + n) % n),
                                j2 -> cidx[(max_i + j2) % n + 1]) AS lwr
               FROM mi),
        ch AS (SELECT k, cw, xs, zs,
                 ({_chain_sql("upr")}) AS hu,
                 ({_chain_sql("lwr")}) AS hl
               FROM hs),
        lp AS (SELECT k, xs, zs,
                 CASE WHEN cw THEN list_concat(hu, list_slice(hl, 2, len(hl)))
                      ELSE list_reverse(list_concat(hu, list_slice(hl, 2, len(hl)))) END AS pts
               FROM ch),
        pos AS (SELECT unnest(generate_series(0, 13)) AS idx)
        SELECT k, CAST(idx AS INT) AS idx,
               CAST(floor(xs[pts[idx + 1] + 1] * 1000000.0 + 0.5) AS BIGINT) AS x_u6,
               CAST(floor(zs[pts[idx + 1] + 1] * 1000000.0 + 0.5) AS BIGINT) AS z_u6
        FROM lp CROSS JOIN pos WHERE idx < len(pts)
    """

    # para_dedup: paragraph split + global first-occurrence-wins rebuilt
    # relationally — nonempty (trimmed) paragraphs rank by (doc_id, idx)
    # within their text partition, empties are always kept; surviving
    # paragraphs reassemble in idx order with the same separator
    sql["para_dedup"] = """
        WITH p AS (
          SELECT doc_id, idx,
                 CASE idx
                   WHEN 0 THEN substr(text, 1, 50)
                   WHEN 1 THEN 'shared para ' || CAST(doc_id % 7 AS VARCHAR)
                   ELSE substr(text, 11, 60) END AS para
          FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS idx)
        ), r AS (
          SELECT doc_id, idx, para,
                 CASE WHEN trim(para) != '' THEN
                   row_number() OVER (PARTITION BY trim(para) ORDER BY doc_id, idx)
                 ELSE 1 END AS rn
          FROM p
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_paragraphs,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
               md5(COALESCE(string_agg(para, e'\\n\\n' ORDER BY idx)
                            FILTER (WHERE rn = 1), '')) AS dedup_md5
        FROM r GROUP BY doc_id
    """

    # domain_cap: registered-domain extraction is closed-form on the
    # synthesized URLs; the cap is the same (n_chars DESC, doc_id) rank
    sql["domain_cap"] = """
        WITH d AS (
          SELECT doc_id, n_chars,
                 CASE doc_id % 5 WHEN 0 THEN 'www' WHEN 1 THEN 'cdn'
                      WHEN 2 THEN 'blog' WHEN 3 THEN 'api' ELSE 'm' END
                   || '.site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS host,
                 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain
          FROM documents
        ), r AS (
          SELECT doc_id, host, domain,
                 CAST(row_number() OVER (PARTITION BY domain
                      ORDER BY n_chars DESC, doc_id) AS INT) AS rank_in_domain
          FROM d
        )
        SELECT doc_id, host, domain, rank_in_domain,
               rank_in_domain <= 10 AS kept
        FROM r
    """

    # gopher_rules: the same synthesis + replace/length arithmetic; list
    # lambdas mirror the Spark higher-order functions one for one
    _gstops = " + ".join(
        f"CAST((length(pad) - length(replace(pad, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    sql["gopher_rules"] = f"""
        WITH built AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 5 = 0 THEN '- bulleted opener for doc.' || chr(10) ELSE '' END)
                 || substr(text, 1, 160)
                 || (CASE WHEN doc_id % 7 = 0 THEN ' ## #' ELSE '' END)
                 || chr(10)
                 || (CASE WHEN doc_id % 3 = 0 THEN 'the closing line trails off...'
                          ELSE 'the final line of this document stands here.' END) AS g
          FROM documents
        ), m AS (
          SELECT doc_id, g,
                 replace(g, chr(10), ' ') AS flat,
                 ' ' || replace(g, chr(10), ' ') || ' ' AS pad,
                 string_split(replace(g, chr(10), ' '), ' ') AS words,
                 string_split(g, chr(10)) AS lines
          FROM built
        ), v AS (
          SELECT doc_id,
                 len(words) AS n_words,
                 CAST(length(g) - (len(words) - 1) AS DOUBLE) / len(words) AS mean_len,
                 CAST((length(g) - length(replace(g, '#', '')))
                      + CAST((length(g) - length(replace(g, '...', ''))) / 3 AS BIGINT) AS DOUBLE)
                   / len(words) AS sym_ratio,
                 CAST(len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* '))) AS DOUBLE)
                   / len(lines) AS bul_ratio,
                 CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE)
                   / len(lines) AS ell_ratio,
                 CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(words) AS alpha_ratio,
                 {_gstops} AS n_stop
          FROM m
        )
        SELECT doc_id,
               CAST(n_words AS INT) AS n_words,
               CAST(floor(mean_len * 1000000.0 + 0.5) AS BIGINT) AS mean_word_len_u6,
               CAST(floor(sym_ratio * 1000000.0 + 0.5) AS BIGINT) AS symbol_ratio_u6,
               CAST(floor(bul_ratio * 1000000.0 + 0.5) AS BIGINT) AS bullet_ratio_u6,
               CAST(floor(ell_ratio * 1000000.0 + 0.5) AS BIGINT) AS ellipsis_ratio_u6,
               CAST(floor(alpha_ratio * 1000000.0 + 0.5) AS BIGINT) AS alpha_ratio_u6,
               n_stop AS n_stop_words,
               (n_words >= 20 AND n_words <= 100000) AS ok_words,
               (mean_len >= 3.0 AND mean_len <= 10.0) AS ok_mean_len,
               (sym_ratio <= 0.1) AS ok_symbols,
               (bul_ratio <= 0.9) AS ok_bullets,
               (ell_ratio <= 0.3) AS ok_ellipsis,
               (alpha_ratio >= 0.8) AS ok_alpha,
               (n_stop >= 2) AS ok_stops,
               ((n_words >= 20 AND n_words <= 100000) AND (mean_len >= 3.0 AND mean_len <= 10.0)
                AND sym_ratio <= 0.1 AND bul_ratio <= 0.9 AND ell_ratio <= 0.3
                AND alpha_ratio >= 0.8 AND n_stop >= 2) AS keep
        FROM v
    """

    # curate: same gopher arithmetic over the curate synthesis, then the
    # three downstream stages exactly as plans/curation.py declares them
    # (min kept id per identical text, canonical-gated split, one pack
    # window with zero contribution for non-train rows)
    sql["curate"] = f"""
        WITH built AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN 'tiny.'
                      ELSE 'the steady data rows that have to be of and with all these words here '
                           || (doc_id % 7)::VARCHAR || ' '
                           || repeat('extra word here ', CAST(doc_id % 13 AS INT))
                           || 'end.' END AS g
          FROM documents
        ), m AS (
          SELECT doc_id, g,
                 ' ' || replace(g, chr(10), ' ') || ' ' AS pad,
                 string_split(replace(g, chr(10), ' '), ' ') AS words,
                 string_split(g, chr(10)) AS lines
          FROM built
        ), v AS (
          SELECT doc_id, g,
                 len(words) AS n_words,
                 CAST(length(g) - (len(words) - 1) AS DOUBLE) / len(words) AS mean_len,
                 CAST((length(g) - length(replace(g, '#', '')))
                      + CAST((length(g) - length(replace(g, '...', ''))) / 3 AS BIGINT) AS DOUBLE)
                   / len(words) AS sym_ratio,
                 CAST(len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* '))) AS DOUBLE)
                   / len(lines) AS bul_ratio,
                 CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE)
                   / len(lines) AS ell_ratio,
                 CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(words) AS alpha_ratio,
                 {_gstops} AS n_stop
          FROM m
        ), kq AS (
          SELECT doc_id, g,
                 ((n_words >= 10 AND n_words <= 100000)
                  AND (mean_len >= 3.0 AND mean_len <= 10.0)
                  AND sym_ratio <= 0.1 AND bul_ratio <= 0.9 AND ell_ratio <= 0.3
                  AND alpha_ratio >= 0.8 AND n_stop >= 2) AS keep_quality
          FROM v
        ), dd AS (
          SELECT doc_id, g, keep_quality,
                 coalesce(keep_quality AND doc_id =
                   min(CASE WHEN keep_quality THEN doc_id END) OVER (PARTITION BY g),
                   false) AS is_canonical
          FROM kq
        ), sp AS (
          SELECT doc_id, g, keep_quality, is_canonical,
                 CASE WHEN is_canonical THEN
                   CASE WHEN {_u32.format(c="doc_id")} / 4294967296.0 < 0.1
                        THEN 'val' ELSE 'train' END
                 END AS split,
                 CAST({_u32.format(c="doc_id")} % 8 AS INT) AS bkt,
                 CAST(length(g) - length(replace(g, ' ', '')) + 1 AS BIGINT) AS ntok
          FROM dd
        ), ctb AS (
          SELECT *, CASE WHEN split = 'train' THEN ntok ELSE 0 END AS contrib
          FROM sp
        )
        SELECT doc_id, keep_quality, is_canonical, split,
               CASE WHEN split = 'train' THEN bkt END AS bucket,
               CASE WHEN split = 'train' THEN
                 CAST(floor((sum(contrib) OVER w - contrib) / 128.0) AS BIGINT)
               END AS bin_id,
               CASE WHEN split = 'train' THEN ntok END AS n_tokens
        FROM ctb
        WINDOW w AS (PARTITION BY bkt ORDER BY contrib DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """

    # haversine_pairs: identical op-order arithmetic; the only libm/JVM
    # exposure is sin/cos/asin/sqrt (same contract as the Mercator
    # log/tan queries, green three rounds)
    sql["haversine_pairs"] = f"""
        WITH p AS (
          SELECT o_orderkey AS key,
                 {LAT.format(k="o_orderkey")} AS lat1, {LON.format(k="o_orderkey")} AS lon1,
                 {LAT.format(k="o_custkey")} AS lat2, {LON.format(k="o_custkey")} AS lon2
          FROM orders
        )
        SELECT key,
               round((2.0 * 6371008.8) * asin(sqrt(least(
                 sin((lat2 * 0.017453292519943295 - lat1 * 0.017453292519943295) / 2)
                 * sin((lat2 * 0.017453292519943295 - lat1 * 0.017453292519943295) / 2)
                 + cos(lat1 * 0.017453292519943295) * cos(lat2 * 0.017453292519943295)
                   * sin((lon2 * 0.017453292519943295 - lon1 * 0.017453292519943295) / 2)
                   * sin((lon2 * 0.017453292519943295 - lon1 * 0.017453292519943295) / 2),
                 1.0))), 6) AS dist_m
        FROM p
    """

    # raster_gradients: the same guarded lag/lead windows in SQL
    sql["raster_gradients"] = """
        WITH g AS (
          SELECT 13 AS cell_lon, 48 AS cell_lat,
                 CAST(i % 200 AS INT) AS px, CAST(i // 200 AS INT) AS py
          FROM range(40000) t(i)
        ), z AS (
          SELECT cell_lon, cell_lat, px, py,
                 CASE WHEN NOT ((px * 31 + py * 37) % 499 = 0)
                      THEN CAST((px * 7919 + py * 104729) % 1000 AS BIGINT) END AS zz
          FROM g
        ), d AS (
          SELECT cell_lon, cell_lat, px, py,
                 (CASE WHEN lead(px) OVER wx = px + 1 THEN lead(zz) OVER wx END
                  - CASE WHEN lag(px) OVER wx = px - 1 THEN lag(zz) OVER wx END) AS dzdx2,
                 (CASE WHEN lead(py) OVER wy = py + 1 THEN lead(zz) OVER wy END
                  - CASE WHEN lag(py) OVER wy = py - 1 THEN lag(zz) OVER wy END) AS dzdy2
          FROM z
          WINDOW wx AS (PARTITION BY cell_lon, cell_lat, py ORDER BY px),
                 wy AS (PARTITION BY cell_lon, cell_lat, px ORDER BY py)
        )
        SELECT cell_lon, cell_lat, px, py, dzdx2, dzdy2,
               dzdx2 * dzdx2 + dzdy2 * dzdy2 AS grad2
        FROM d
    """

    # geohash_cells: the 30-bit lon/lat interleave unrolled (generated
    # here by the same loop structure the Column builder uses)
    from osm2world_spark.functions.cells import GEOHASH32 as _GH32

    def _gh_char(c: int) -> str:
        terms = []
        for j in range(5):
            i = 5 * c + j
            src = "lon_i" if i % 2 == 0 else "lat_i"
            terms.append(f"(({src} >> {15 - 1 - i // 2}) & 1) * {1 << (4 - j)}")
        return f"substr('{_GH32}', CAST({' + '.join(terms)} AS INT) + 1, 1)"

    sql["geohash_cells"] = f"""
        WITH p AS (
          SELECT o_orderkey AS key, {lat_o} AS lat, {lon_o} AS lon FROM orders
        ), ii AS (
          SELECT key,
                 CAST(least(floor(((lon + 180.0) / 360.0) * 32768.0), 32767) AS BIGINT) AS lon_i,
                 CAST(least(floor(((lat + 90.0) / 180.0) * 32768.0), 32767) AS BIGINT) AS lat_i
          FROM p
        )
        SELECT key,
               {" || ".join(_gh_char(c) for c in range(6))} AS gh,
               ((CAST(lat_i AS DOUBLE) + 0.5) * {180.0 / 32768.0!r}) - 90.0 AS c_lat,
               ((CAST(lon_i AS DOUBLE) + 0.5) * {360.0 / 32768.0!r}) - 180.0 AS c_lon
        FROM ii
    """

    # triangle_count: the same degree orientation replayed in SQL
    sql["triangle_count"] = """
        WITH base AS (
          SELECT DISTINCT o_orderkey % 97 AS src FROM orders
        ), edges0 AS (
          SELECT src, (src * m) % 97 AS dst FROM base, unnest([2, 3, 6]) AS t(m)
        ), und AS (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges0 WHERE src != dst
        ), degs AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
          GROUP BY node
        ), ori AS (
          SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.u ELSE e.v END AS src,
                 CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
                      THEN e.v ELSE e.u END AS dst
          FROM und e JOIN degs du ON du.node = e.u JOIN degs dv ON dv.node = e.v
        ), tris AS (
          SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
          JOIN ori e3 ON e3.src = e1.src AND e3.dst = e2.dst
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (SELECT unnest([a, b, c]) AS node FROM tris)
        GROUP BY node
    """

    # compaction_plan: the two next-fit windows replayed verbatim
    sql["compaction_plan"] = """
        WITH f AS (
          SELECT CAST(o_orderkey % 5 AS VARCHAR) AS part,
                 'f' || CAST(o_orderkey AS VARCHAR) AS file_path,
                 CAST((o_orderkey * 131) % 300 + 1 AS BIGINT) AS size_bytes
          FROM orders
        ), b AS (
          SELECT part, file_path, size_bytes,
                 CASE WHEN size_bytes < 256 THEN size_bytes ELSE 0 END AS contrib,
                 sum(CASE WHEN size_bytes < 256 THEN size_bytes ELSE 0 END)
                   OVER (PARTITION BY part ORDER BY size_bytes DESC, file_path
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM f
        ), g AS (
          SELECT part, file_path, size_bytes,
                 CASE WHEN size_bytes < 256
                      THEN CAST(floor((cum - contrib) / 256.0) AS BIGINT) END AS group_id
          FROM b
        )
        SELECT part, file_path, size_bytes, group_id,
               CASE WHEN group_id IS NOT NULL
                    THEN CAST(count(*) OVER wg AS INT) END AS n_in_group,
               CASE WHEN group_id IS NOT NULL
                    THEN CAST(sum(size_bytes) OVER wg AS BIGINT) END AS group_bytes,
               CASE WHEN group_id IS NULL OR (count(*) OVER wg) = 1
                    THEN 'keep' ELSE 'rewrite' END AS action
        FROM g
        WINDOW wg AS (PARTITION BY part, group_id)
    """

    # bm25_topk: the rational-idf BM25 rebuilt relationally — operation
    # order in the contribution expression mirrors the Column tree
    # exactly (each IEEE op identical), and scores are integer sums of
    # per-posting micro snaps, so accumulation order cannot matter
    sql["bm25_topk"] = """
        WITH qs(query_id, query_text) AS (
          VALUES (0, 'spark join window'), (1, 'table scan filter'), (2, 'hash agg merge')
        ), doclen AS (
          SELECT doc_id, text,
                 CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS DOUBLE) AS dl
          FROM documents
        ), postings AS (
          SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, dl, unnest(string_split(text, ' ')) AS term FROM doclen)
          WHERE term != ''
          GROUP BY doc_id, dl, term
        ), qterms AS (
          SELECT DISTINCT query_id, term
          FROM (SELECT query_id, unnest(string_split(query_text, ' ')) AS term FROM qs)
          WHERE term != ''
        ), matched AS (
          SELECT q.query_id, p.doc_id, p.term, p.tf, p.dl
          FROM postings p JOIN qterms q ON p.term = q.term
        ), dfreq AS (
          SELECT term, CAST(count(*) AS DOUBLE) AS df_t
          FROM (SELECT DISTINCT term, doc_id FROM matched)
          GROUP BY term
        ), stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM doclen
        ), scored AS (
          SELECT query_id, doc_id,
                 CAST(count(*) AS INT) AS n_terms_hit,
                 CAST(sum(CAST(floor(
                   (((n_docs - df_t + 0.5) / (df_t + 0.5))
                    * ((tf * 2.2) / (tf + 1.2 * (0.25 + ((0.75 * dl) / avgdl)))))
                   * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_u6
          FROM matched JOIN dfreq USING (term) CROSS JOIN stats
          GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, n_terms_hit, score_u6,
               CAST(rk AS INT) AS rk
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY score_u6 DESC, doc_id) AS rk
              FROM scored)
        WHERE rk <= 5
    """

    # blocklist: list_filter membership, same micro snap
    sql["blocklist"] = """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), c AS (
          SELECT doc_id,
                 len(list_filter(toks, x -> x != '')) AS n_tokens,
                 len(list_filter(toks, x -> list_contains(['big', 'slow'], x))) AS n_blocked
          FROM t
        )
        SELECT doc_id,
               CAST(n_tokens AS INT) AS n_tokens,
               CAST(n_blocked AS INT) AS n_blocked,
               CAST(floor((CAST(n_blocked AS DOUBLE) / n_tokens) * 1000000.0 + 0.5) AS BIGINT)
                 AS block_ratio_u6,
               (n_tokens > 0 AND (CAST(n_blocked AS DOUBLE) / n_tokens) <= 0.05) AS keep
        FROM c
    """

    # c4_clean: same synthesis; the line predicate is one list_filter
    sql["c4_clean"] = """
        WITH built AS (
          SELECT doc_id,
                 'the opening line has a period.' || chr(10)
                 || substr(text, 1, 100 + CAST(doc_id % 40 AS INT)) || chr(10)
                 || (CASE WHEN doc_id % 4 = 0 THEN 'this line asks a question?'
                          WHEN doc_id % 4 = 1 THEN 'enable javascript to proceed.'
                          WHEN doc_id % 4 = 2 THEN 'short one.'
                          ELSE 'a solid third sentence ends well.' END) || chr(10)
                 || (CASE WHEN doc_id % 11 = 0 THEN 'bad brace { appears here.'
                          ELSE 'the last line finishes cleanly.' END) AS c
          FROM documents
        ), m AS (
          SELECT doc_id, c, string_split(c, chr(10)) AS lines,
                 list_filter(string_split(c, chr(10)), l ->
                   (length(l) - length(replace(l, ' ', '')) + 1 >= 3)
                   AND length(l) > 0
                   AND (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?') OR ends_with(l, '"'))
                   AND NOT contains(lower(l), 'javascript')) AS kept
          FROM built
        )
        SELECT doc_id,
               CAST(len(lines) AS INT) AS n_lines,
               CAST(len(kept) AS INT) AS n_kept_lines,
               (NOT contains(lower(c), '{') AND NOT contains(lower(c), 'lorem ipsum')
                AND len(kept) >= 3) AS keep_doc,
               md5(CASE WHEN NOT contains(lower(c), '{') AND NOT contains(lower(c), 'lorem ipsum')
                             AND len(kept) >= 3
                        THEN array_to_string(kept, chr(10)) ELSE '' END) AS clean_md5
        FROM m
    """

    # line_dedup: group the exploded lines by the line TEXT (the engine
    # groups by xxhash64 of it — identical up to 2^-64 collisions),
    # count distinct docs, strip lines over the threshold everywhere
    sql["line_dedup"] = """
        WITH built AS (
          SELECT doc_id,
                 substr(text, 1, 30) || ' unique head.' || chr(10)
                 || 'shared boiler line ' || CAST(doc_id % 4 AS VARCHAR) || '.' || chr(10)
                 || 'rare shared ' || CAST(doc_id % 300 AS VARCHAR) || '.' || chr(10)
                 || substr(text, 5, 35) || ' unique tail.' AS t
          FROM built_src
        ), lines AS (
          SELECT doc_id, unnest(string_split(t, chr(10))) AS line,
                 generate_subscripts(string_split(t, chr(10)), 1) AS pos
          FROM built
        ), counts AS (
          SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
        ), kept AS (
          SELECT l.doc_id, l.pos, l.line
          FROM lines l JOIN counts c USING (line) WHERE c.nd <= 2
        )
        SELECT b.doc_id,
               CAST(4 AS INT) AS n_lines,
               CAST(COALESCE(k.n_kept, 0) AS INT) AS n_kept_lines,
               md5(COALESCE(k.txt, '')) AS dedup_md5
        FROM built b LEFT JOIN (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(line, chr(10) ORDER BY pos) AS txt
          FROM kept GROUP BY doc_id
        ) k USING (doc_id)
    """.replace("built_src", "documents")

    # bloom_decon: rebuild the 4096-bit k=3 filter with the portable
    # md5-prefix hash family, materialize it as one 128-word list, and
    # probe every (doc, distinct token) with the same word/mask arithmetic
    def _bf_pos(j):
        return (
            f"((('0x' || substr(md5('bf{j}|' || tok), 1, 15))::BIGINT) % 4096)"
        )

    def _bf_hit(j):
        p = f"p{j}"
        return (
            f"(a[({p} // 32) + 1] & (CAST(1 AS BIGINT)"
            f" << CAST({p} % 32 AS INT))) != 0"
        )

    sql["bloom_decon"] = f"""
        WITH bt AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id % 37 = 0
          ) WHERE tok != ''
        ), cells AS (
          SELECT CASE j WHEN 0 THEN {_bf_pos(0)} WHEN 1 THEN {_bf_pos(1)}
                        ELSE {_bf_pos(2)} END AS pos
          FROM bt CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j)
        ), words AS (
          SELECT pos // 32 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
          FROM cells GROUP BY 1
        ), arr AS (
          SELECT list(COALESCE(w.bits, 0) ORDER BY g.i) AS a
          FROM (SELECT unnest(generate_series(0, 127)) AS i) g
          LEFT JOIN words w ON w.word = g.i
        ), dt AS (
          SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
          ) WHERE tok != ''
        ), hp AS (
          SELECT doc_id, tok, {_bf_pos(0)} AS p0, {_bf_pos(1)} AS p1,
                 {_bf_pos(2)} AS p2
          FROM dt
        ), hit AS (
          SELECT doc_id,
                 ({_bf_hit(0)}) AND ({_bf_hit(1)}) AND ({_bf_hit(2)}) AS might
          FROM hp CROSS JOIN arr
        )
        SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
               CAST(sum(CASE WHEN might THEN 1 ELSE 0 END) AS INT) AS n_hits,
               sum(CASE WHEN might THEN 1 ELSE 0 END) > 0 AS flagged
        FROM hit GROUP BY doc_id
    """

    # token_mix: same token-count arithmetic, same md5-order window (the
    # engine orders by h / 2^32, an exact power-of-two division, so
    # integer-h order is identical), same greedy prefix rule
    sql["token_mix"] = """
        WITH d AS (
          SELECT doc_id, source,
                 CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
                   AS n_tokens,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
          FROM documents
        ), r AS (
          SELECT doc_id, source, n_tokens,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                      AS INT) AS mix_rank,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          FROM d
        )
        SELECT doc_id, source, n_tokens, mix_rank, cum_tokens,
               cum_tokens <= 2000 + (CAST(substr(source, 4) AS INT) % 5) * 1500
                 AS kept
        FROM r
    """

    # unimax_alloc: the ascending waterfill replayed with the same
    # closed form — capped test multiplied through to exact integers,
    # remainder cascade (R + j) // u for the uncapped tail
    sql["unimax_alloc"] = """
        WITH cnt AS (
          SELECT lang, source,
                 CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                      AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang, source
        ), rk AS (
          SELECT lang, source, n_tokens, n_tokens * 2 AS ce,
                 row_number() OVER w AS src_rank,
                 count(*) OVER () AS n_src,
                 COALESCE(SUM(n_tokens * 2) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS s_prev
          FROM cnt
          WINDOW w AS (ORDER BY n_tokens, lang, source)
        ), fl AS (
          SELECT *, ce * (n_src - src_rank + 1) <= 20000 - s_prev AS capped
          FROM rk
        ), cl AS (
          SELECT *,
                 SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS m,
                 COALESCE(SUM(CASE WHEN capped THEN ce END) OVER (), 0) AS s_m
          FROM fl
        ), al AS (
          SELECT *, CASE WHEN capped THEN ce
                         ELSE (20000 - s_m + (src_rank - m - 1)) // (n_src - m)
                    END AS alloc
          FROM cl
        )
        SELECT lang, source, n_tokens,
               CAST(src_rank AS INT) AS src_rank, capped,
               CAST(alloc AS BIGINT) AS alloc_tokens,
               CAST(CASE WHEN n_tokens > 0
                         THEN (alloc * 1000000) // n_tokens END AS BIGINT)
                 AS epochs_u6
        FROM al
    """

    # gram_embed: exact integer Gram cells — floor(float-as-double * 2^10)
    # quantization is bit-identical in both engines, integer sums are
    # order-independent
    sql["gram_embed"] = """
        WITH q AS (
          SELECT list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
          FROM embeddings
        ), dims AS (SELECT unnest(generate_series(0, 63)) AS d)
        SELECT CAST(a.d AS INT) AS i, CAST(b.d AS INT) AS j,
               CAST(SUM(qv[a.d + 1] * qv[b.d + 1]) AS BIGINT) AS gval
        FROM q CROSS JOIN dims a CROSS JOIN dims b
        GROUP BY 1, 2
    """

    # polyline_walk: the remaining-distance walk unrolled for 4 points;
    # rem_k is the literal sequential subtraction ((r0 - d0) - d1), the
    # same fp sequence as the engine's re-reduction aggregate
    def _pw_point(r0, clamp, cs):
        rems = [r0, f"({r0} - d0)", f"(({r0} - d0) - d1)"]
        dss = ["d0", "d1", "d2"]

        def pt(k):
            t = f"({rems[k]} / {dss[k]})"
            if clamp:
                t = f"greatest(CAST(0.0 AS DOUBLE), {t})"
            return (
                f"({cs[k]} * (CAST(1.0 AS DOUBLE) - {t}) + {cs[k + 1]} * {t})"
            )

        return (
            f"CASE WHEN {rems[0]} <= d0 THEN {pt(0)}"
            f" WHEN {rems[1]} <= d1 THEN {pt(1)}"
            f" WHEN {rems[2]} <= d2 THEN {pt(2)}"
            f" ELSE {cs[3]} END"
        )

    _pw_xs = ["x0", "x1", "x2", "x3"]
    _pw_zs = ["z0", "z1", "z2", "z3"]
    sql["polyline_walk"] = f"""
        WITH p AS (
          SELECT o_orderkey AS k,
                 {X_M.format(k="o_orderkey")} AS x0, {Z_M.format(k="o_orderkey")} AS z0,
                 {X_M.format(k="o_orderkey * 3 + 1")} AS x1, {Z_M.format(k="o_orderkey * 3 + 1")} AS z1,
                 {X_M.format(k="o_orderkey * 7 + 2")} AS x2, {Z_M.format(k="o_orderkey * 7 + 2")} AS z2,
                 {X_M.format(k="o_orderkey * 5 + 3")} AS x3, {Z_M.format(k="o_orderkey * 5 + 3")} AS z3,
                 CAST(o_orderkey % 10 AS DOUBLE) / CAST(9.0 AS DOUBLE) AS rt,
                 CAST(o_orderkey % 7 AS DOUBLE) * CAST(25.0 AS DOUBLE) AS off
          FROM orders
        ), d AS (
          SELECT *, sqrt((x1 - x0) * (x1 - x0) + (z1 - z0) * (z1 - z0)) AS d0,
                    sqrt((x2 - x1) * (x2 - x1) + (z2 - z1) * (z2 - z1)) AS d1,
                    sqrt((x3 - x2) * (x3 - x2) + (z3 - z2) * (z3 - z2)) AS d2
          FROM p
        ), w AS (
          SELECT *, rt * (((CAST(0.0 AS DOUBLE) + d0) + d1) + d2) AS r0 FROM d
        )
        SELECT k,
               CAST(floor(({_pw_point("r0", False, _pw_xs)}) * 1000000.0 + 0.5) AS BIGINT) AS ix_u6,
               CAST(floor(({_pw_point("r0", False, _pw_zs)}) * 1000000.0 + 0.5) AS BIGINT) AS iz_u6,
               CAST(floor(({_pw_point("off", True, _pw_xs)}) * 1000000.0 + 0.5) AS BIGINT) AS ox_u6,
               CAST(floor(({_pw_point("off", True, _pw_zs)}) * 1000000.0 + 0.5) AS BIGINT) AS oz_u6
        FROM w
    """

    # polyline_ele: prefix lengths per the indexOf-first-occurrence rule
    # (vertex 3 revisits vertex 1 -> prefix d0), ratios over the
    # sequential total, lerp with the engine's op tree
    sql["polyline_ele"] = f"""
        WITH p AS (
          SELECT s_suppkey AS k,
                 {X_M.format(k="s_suppkey")} AS x0, {Z_M.format(k="s_suppkey")} AS z0,
                 {X_M.format(k="s_suppkey * 3 + 1")} AS x1, {Z_M.format(k="s_suppkey * 3 + 1")} AS z1,
                 {X_M.format(k="s_suppkey * 7 + 2")} AS x2, {Z_M.format(k="s_suppkey * 7 + 2")} AS z2,
                 {X_M.format(k="s_suppkey * 3 + 1")} AS x3, {Z_M.format(k="s_suppkey * 3 + 1")} AS z3,
                 {X_M.format(k="s_suppkey * 5 + 3")} AS x4, {Z_M.format(k="s_suppkey * 5 + 3")} AS z4,
                 CAST(s_suppkey % 50 AS DOUBLE) AS e1,
                 CAST((s_suppkey * 3) % 70 AS DOUBLE) AS e2
          FROM supplier
        ), d AS (
          SELECT *, sqrt((x1 - x0) * (x1 - x0) + (z1 - z0) * (z1 - z0)) AS d0,
                    sqrt((x2 - x1) * (x2 - x1) + (z2 - z1) * (z2 - z1)) AS d1,
                    sqrt((x3 - x2) * (x3 - x2) + (z3 - z2) * (z3 - z2)) AS d2,
                    sqrt((x4 - x3) * (x4 - x3) + (z4 - z3) * (z4 - z3)) AS d3
          FROM p
        ), t AS (
          SELECT *, (((CAST(0.0 AS DOUBLE) + d0) + d1) + d2) + d3 AS total FROM d
        ), r AS (
          SELECT k, e1, e2, CAST(idx AS INT) AS idx,
                 CASE idx WHEN 0 THEN CAST(0.0 AS DOUBLE)
                          WHEN 1 THEN CAST(0.0 AS DOUBLE) + d0
                          WHEN 2 THEN (CAST(0.0 AS DOUBLE) + d0) + d1
                          WHEN 3 THEN CAST(0.0 AS DOUBLE) + d0
                          ELSE (((CAST(0.0 AS DOUBLE) + d0) + d1) + d2) + d3
                 END / total AS rr
          FROM t CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS idx)
        )
        SELECT k, idx,
               CAST(floor((e1 * (CAST(1.0 AS DOUBLE) - rr) + e2 * rr)
                    * 1000000.0 + 0.5) AS BIGINT) AS ele_u6
        FROM r
    """

    # roughly_contains: the rect-pair classes have closed-form outside
    # fractions; contains is true exactly for the contained class
    sql["roughly_contains"] = f"""
        WITH c AS (
          SELECT c_custkey AS k,
                 CAST(30 + c_custkey % 10 AS DOUBLE) AS w2,
                 CAST(25 + c_custkey % 7 AS DOUBLE) AS h2,
                 CAST(0.2 AS DOUBLE) + CAST(0.25 AS DOUBLE)
                   * CAST(c_custkey % 3 AS DOUBLE) AS s
          FROM customer
        ), f AS (
          SELECT k, k % 4 = 0 AS contains,
                 CASE k % 4
                   WHEN 0 THEN CAST(0.0 AS DOUBLE)
                   WHEN 1 THEN (s * h2) / (w2 * h2)
                   WHEN 2 THEN ((w2 / 2) * h2) / (w2 * h2)
                   ELSE CAST(1.0 AS DOUBLE) END AS frac
          FROM c
        )
        SELECT k, contains,
               contains OR frac < CAST(0.01 AS DOUBLE) AS roughly_contains,
               CAST(floor(frac * 1000000.0 + 0.5) AS BIGINT) AS out_u6
        FROM f
    """

    # cdc_chunks: gram hashes, boundary rule, running boundary count, and
    # ordered reassembly replayed with the portable md5-prefix family;
    # list_slice clamps at the token-list tail exactly like F.slice
    sql["cdc_chunks"] = """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        t AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM d),
        g AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
                     array_to_string(list_slice(toks, i, i + 2), ' ') AS gram
              FROM t),
        b AS (SELECT doc_id, pos, tok,
                     CASE WHEN pos = 0
                          OR (('0x' || substr(md5(gram), 1, 15))::BIGINT) % 16 = 0
                          THEN 1 ELSE 0 END AS bnd
              FROM g),
        c AS (SELECT doc_id, pos, tok,
                     CAST(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS chunk_idx
              FROM b)
        SELECT doc_id, chunk_idx,
               CAST(min(pos) AS INT) AS tok_start,
               CAST(count(*) AS INT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
        FROM c GROUP BY doc_id, chunk_idx
    """

    # dhash_dups: the dHash is pure integer arithmetic (block sums of
    # closed-form pixels, cross-multiplied mean compares, power-of-two
    # packing), so DuckDB rebuilds it bit-for-bit; blocks are exactly 2x2
    # at 18x16 so equal counts reduce the compare to sum > sum. Pairs by
    # brute force — equal to the engine's banded-LSH output because
    # hamming<=3 guarantees a shared 16-bit band (pigeonhole)
    def _dh_half(lo_i, hi_i, sh):
        return (
            "list_reduce(list_concat([CAST(0 AS BIGINT)], "
            f"list_transform(generate_series({lo_i}, {hi_i}), i -> "
            "CASE WHEN cells[i // 8 + 1][i % 8 + 1] > cells[i // 8 + 1][i % 8 + 2] "
            f"THEN CAST(1 AS BIGINT) << CAST(i - {sh} AS INT) "
            "ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x)"
        )

    sql["dhash_dups"] = f"""
        WITH px AS (
          SELECT doc_id, list_transform(generate_series(0, 287), i ->
                   (i * 37 + (doc_id % 25) * 101) % 251
                   + CASE WHEN i = (doc_id * 7) % 288
                          THEN ((doc_id // 25) % 5) * 15 ELSE 0 END) AS p
          FROM documents
        ), cl AS (
          SELECT doc_id, list_transform(generate_series(0, 7), r ->
                   list_transform(generate_series(0, 8), c ->
                     p[(2 * r) * 18 + 2 * c + 1] + p[(2 * r) * 18 + 2 * c + 2]
                     + p[(2 * r + 1) * 18 + 2 * c + 1]
                     + p[(2 * r + 1) * 18 + 2 * c + 2])) AS cells
          FROM px
        ), hs AS (
          SELECT doc_id, {_dh_half(32, 63, 32)} AS hi, {_dh_half(0, 31, 0)} AS lo
          FROM cl
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
        FROM hs a JOIN hs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
    """

    # scatter_points: the md5-candidate scatter recomputed in SQL. The
    # bbox extent and box bounds use the ENGINE's op tree ((x0+w)-x0, not
    # w) so floor() at box-count boundaries can't diverge by an ulp.
    _sc_frac = (
        "(('0x' || substr(md5(k || ':' || box_x || ':' || box_z || ':' || cand || ':{ax}'), 1, 13))::BIGINT"
        " / CAST(4503599627370496 AS DOUBLE))"
    )
    sql["scatter_points"] = f"""
        WITH p AS (
          SELECT c_custkey AS k,
                 {X_M.format(k="c_custkey")} AS x0, {Z_M.format(k="c_custkey")} AS z0,
                 CAST(110 + c_custkey % 60 AS DOUBLE) AS w,
                 CAST(95 + (c_custkey * 3) % 70 AS DOUBLE) AS h
          FROM customer WHERE c_custkey % 10 = 0
        ), r AS (
          SELECT k, x0, z0, x0 + w AS x1, z0 + h AS z1,
                 x0 + CAST(23.7 AS DOUBLE) + CAST(k % 10 AS DOUBLE) AS hx0,
                 z0 + CAST(19.3 AS DOUBLE) + CAST((k * 7) % 12 AS DOUBLE) AS hz0,
                 sqrt(100 / CAST(0.04 AS DOUBLE)) AS bs
          FROM p
        ), r2 AS (
          SELECT *, hx0 + CAST(31.9 AS DOUBLE) AS hx1,
                    hz0 + CAST(27.4 AS DOUBLE) AS hz1
          FROM r
        ), bxs AS (SELECT unnest(generate_series(0, 3)) AS box_x),
        bzs AS (SELECT unnest(generate_series(0, 3)) AS box_z),
        cs AS (SELECT unnest(generate_series(0, 99)) AS cand),
        boxes AS (
          SELECT r2.*, box_x, box_z,
                 x0 + bs * box_x AS bx0, z0 + bs * box_z AS bz0,
                 x0 + bs * (box_x + 1) AS bx1, z0 + bs * (box_z + 1) AS bz1
          FROM r2 CROSS JOIN bxs CROSS JOIN bzs
          WHERE box_x <= CAST(floor((x1 - x0) / bs) AS INT)
            AND box_z <= CAST(floor((z1 - z0) / bs) AS INT)
        ), kept AS (
          SELECT * FROM boxes
          WHERE NOT (bx0 > hx0 AND bx1 < hx1 AND bz0 > hz0 AND bz1 < hz1)
        ), pts AS (
          SELECT k, box_x, box_z, cand,
                 bx0 + bs * {_sc_frac.format(ax="x")} AS px,
                 bz0 + bs * {_sc_frac.format(ax="z")} AS pz,
                 x0, z0, x1, z1, hx0, hx1, hz0, hz1
          FROM kept CROSS JOIN cs
        )
        SELECT k, CAST(box_x AS INT) AS box_x, CAST(box_z AS INT) AS box_z,
               CAST(cand AS INT) AS cand,
               cast(floor(px * 1000000.0 + 0.5) as bigint) AS px_u6,
               cast(floor(pz * 1000000.0 + 0.5) as bigint) AS pz_u6
        FROM pts
        WHERE px > x0 AND px < x1 AND pz > z0 AND pz < z1
          AND NOT (px > hx0 AND px < hx1 AND pz > hz0 AND pz < hz1)
    """

    # morton_order: the Z-order interleave recomputed with DuckDB bit ops
    _morton_terms = " + ".join(
        f"(((tb >> {b}) & 1) << {2 * b}) + (((yb >> {b}) & 1) << {2 * b + 1})"
        for b in range(16)
    )
    sql["morton_order"] = f"""
        WITH t AS (
          SELECT o_orderkey,
                 {TX14.format(lon=lon_o)} AS tile_x,
                 {TY14.format(lat=lat_o)} AS tile_y
          FROM orders
        ), b AS (
          SELECT o_orderkey, tile_x, tile_y,
                 CAST(tile_x AS BIGINT) AS tb, CAST(tile_y AS BIGINT) AS yb
          FROM t
        )
        SELECT o_orderkey, CAST(tile_x AS INT) AS tile_x,
               CAST(tile_y AS INT) AS tile_y,
               CAST({_morton_terms} AS BIGINT) AS morton
        FROM b
    """

    # poly_buffer: convex mitre buffer closed form — per input vertex the
    # result ring contributes the two offset-edge endpoints and the mitre
    # point (intersection of the adjacent offset lines), same op tree as
    # operators/buffer._ring_pieces
    _pb_theta = "(2 * pi() * CAST({j} AS DOUBLE) / CAST(6 AS DOUBLE) + CAST(k % 97 AS DOUBLE) / CAST(97 AS DOUBLE) * 2 * pi())"
    sql["poly_buffer"] = f"""
        WITH p AS (
          SELECT c_custkey AS k,
                 {X_M.format(k="c_custkey")} AS cx, {Z_M.format(k="c_custkey")} AS cz,
                 CAST(20 + c_custkey % 17 AS DOUBLE) AS rx,
                 CAST(22 + (c_custkey * 3) % 12 AS DOUBLE) AS rz,
                 CAST(3 AS DOUBLE) + CAST(c_custkey % 5 AS DOUBLE) AS d
          FROM customer WHERE c_custkey % 3 = 0
        ), jj AS (SELECT unnest(generate_series(0, 5)) AS j),
        v AS (
          SELECT k, j, d,
                 cx + rx * cos({_pb_theta.format(j="j")}) AS vx,
                 cz + rz * sin({_pb_theta.format(j="j")}) AS vz
          FROM p CROSS JOIN jj
        ), e AS (
          SELECT a.k, a.j, a.d, a.vx, a.vz,
                 b.vx AS wx, b.vz AS wz, pv.vx AS px, pv.vz AS pz
          FROM v a
          JOIN v b  ON b.k = a.k AND b.j = (a.j + 1) % 6
          JOIN v pv ON pv.k = a.k AND pv.j = (a.j + 5) % 6
        ), t AS (
          SELECT *, wx - vx AS tjx, wz - vz AS tjz,
                    vx - px AS tpx, vz - pz AS tpz
          FROM e
        ), o AS (
          SELECT *, tjz / sqrt(tjx * tjx + tjz * tjz) AS njx,
                    -(tjx) / sqrt(tjx * tjx + tjz * tjz) AS njz,
                    tpz / sqrt(tpx * tpx + tpz * tpz) AS npx,
                    -(tpx) / sqrt(tpx * tpx + tpz * tpz) AS npz
          FROM t
        ), m AS (
          SELECT *, (((vx + d * njx) - (px + d * npx)) * tjz
                   - ((vz + d * njz) - (pz + d * npz)) * tjx)
                   / (tpx * tjz - tpz * tjx) AS s
          FROM o
        ), pts AS (
          SELECT k, vx + d * njx AS x, vz + d * njz AS z FROM o
          UNION ALL
          SELECT k, vx + d * npx, vz + d * npz FROM o
          UNION ALL
          SELECT k, (px + d * npx) + s * tpx, (pz + d * npz) + s * tpz FROM m
        )
        SELECT k, 0 AS piece_idx, 0 AS n_holes,
               cast(floor(x * 1000000.0 + 0.5) as bigint) AS x_u6,
               cast(floor(z * 1000000.0 + 0.5) as bigint) AS z_u6
        FROM pts
    """

    # distribute_points: the reference's equally-spaced placement loop in
    # closed form — numSegments = round(len/pref), spacing = len/numSeg,
    # target t = start + i*spacing located by strict cumulative-length
    # comparison, linear interpolation within the segment
    _dp_xz = {
        f"{a}{j}": (X_M if a == "x" else Z_M).format(k=f"k * 4 + {j}")
        for a in ("x", "z")
        for j in range(4)
    }
    sql["distribute_points"] = f"""
        WITH p AS (
          SELECT o_orderkey AS k,
                 CAST(1000 + (o_orderkey % 10) * 300 AS DOUBLE) AS pd,
                 (o_orderkey % 2 = 0) AS at_ends
          FROM orders
        ), v AS (
          SELECT k, pd, at_ends,
                 {_dp_xz['x0']} AS x0, {_dp_xz['z0']} AS z0,
                 {_dp_xz['x1']} AS x1, {_dp_xz['z1']} AS z1,
                 {_dp_xz['x2']} AS x2, {_dp_xz['z2']} AS z2,
                 {_dp_xz['x3']} AS x3, {_dp_xz['z3']} AS z3
          FROM p
        ), lenq AS (
          SELECT *, sqrt((x1-x0)*(x1-x0)+(z1-z0)*(z1-z0)) AS l0,
                    sqrt((x2-x1)*(x2-x1)+(z2-z1)*(z2-z1)) AS l1,
                    sqrt((x3-x2)*(x3-x2)+(z3-z2)*(z3-z2)) AS l2
          FROM v
        ), st AS (
          SELECT *, CAST(0.0 AS DOUBLE) + l0 + l1 + l2 AS total,
                    CAST(0.0 AS DOUBLE) + l0 AS c1,
                    CAST(0.0 AS DOUBLE) + l0 + l1 AS c2
          FROM lenq
        ), nsg AS (
          SELECT *, CAST(floor(total / pd + 0.5) AS INT) AS nseg FROM st
        ), pp AS (
          SELECT *, total / CAST(nseg AS DOUBLE) AS sp,
                 nseg + (CASE WHEN at_ends THEN 1 ELSE 0 END) AS np,
                 CASE WHEN at_ends THEN CAST(0.0 AS DOUBLE)
                      ELSE (total / CAST(nseg AS DOUBLE)) / 2.0 END AS st0
          FROM nsg WHERE nseg > 0
        ), ks AS (SELECT unnest(generate_series(0, 63)) AS i),
        pts AS (
          SELECT *, st0 + CAST(i AS DOUBLE) * sp AS t
          FROM pp CROSS JOIN ks WHERE i < np
        ), seg AS (
          SELECT *, LEAST((CASE WHEN c1 < t THEN 1 ELSE 0 END)
                        + (CASE WHEN c2 < t THEN 1 ELSE 0 END)
                        + (CASE WHEN total < t THEN 1 ELSE 0 END), 2) AS j
          FROM pts
        ), r AS (
          SELECT *, CASE j WHEN 0 THEN (t - CAST(0.0 AS DOUBLE)) / (c1 - CAST(0.0 AS DOUBLE))
                           WHEN 1 THEN (t - c1) / (c2 - c1)
                           ELSE (t - c2) / (total - c2) END AS ratio
          FROM seg
        )
        SELECT k, CAST(i AS INT) AS i,
               cast(floor((CASE WHEN at_ends AND i = np - 1 THEN x3
                    ELSE CASE j WHEN 0 THEN x0 + (x1 - x0) * ratio
                                WHEN 1 THEN x1 + (x2 - x1) * ratio
                                ELSE x2 + (x3 - x2) * ratio END
                    END) * 1000000.0 + 0.5) as bigint) AS px_u6,
               cast(floor((CASE WHEN at_ends AND i = np - 1 THEN z3
                    ELSE CASE j WHEN 0 THEN z0 + (z1 - z0) * ratio
                                WHEN 1 THEN z1 + (z2 - z1) * ratio
                                ELSE z2 + (z3 - z2) * ratio END
                    END) * 1000000.0 + 0.5) as bigint) AS pz_u6
        FROM r
    """

    # srtm_decode: the decoded pixel table must equal the grid formula the
    # encoder wrote — recomputed here directly, never through the codec
    # mbtiles_tiles / mbtiles_metadata: expected rows re-derived
    # arithmetically from the deterministic fixture-generator formulas
    # (tools/make_mbtiles_fixture.py) — md5 blobs via hashlib here,
    # never by opening the sqlite file, so the oracle is independent of
    # the reader under test.
    import hashlib as _hl

    from tools.make_mbtiles_fixture import fixture_tiles as _ft
    from tools.make_mbtiles_fixture import tile_blob as _tb_blob

    _mb_rows = ", ".join(
        f"({z}, {x}, {(1 << z) - 1 - r}, {r}, "
        f"{len(_tb_blob(z, x, r))}, '{_hl.md5(_tb_blob(z, x, r)).hexdigest()}')"
        for z, x, r in _ft()
    )
    sql["mbtiles_tiles"] = f"""
        SELECT CAST(c0 AS INT) AS zoom, CAST(c1 AS INT) AS tile_x,
               CAST(c2 AS INT) AS tile_y, CAST(c3 AS INT) AS tms_row,
               CAST(c4 AS BIGINT) AS n_bytes, c5 AS blob_md5
        FROM (VALUES {_mb_rows}) t(c0, c1, c2, c3, c4, c5)
    """

    # osm_pbf_elements / mbtiles_pbf_decode: fixture elements are pure
    # functions of their index / tile address, so the oracles rebuild
    # them from generate_series arithmetic — never parsing pbf.
    # node lat/lon quantize at 1e-7 deg (granularity 100), exact at u7.
    sql["osm_pbf_elements"] = """
        WITH n AS (
          SELECT 'node' AS element_type, CAST(100 + i AS BIGINT) AS id,
                 CAST(round((48.52 + 0.001 * i) * 1e7) AS BIGINT) AS lat_u7,
                 CAST(round((13.37 + 0.002 * i) * 1e7) AS BIGINT) AS lon_u7,
                 CAST(CASE i % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END AS INT) AS n_tags,
                 -1 AS n_refs, CAST(0 AS BIGINT) AS refs_sum, '' AS roles
          FROM unnest(generate_series(0, 39)) t(i)
        ), w AS (
          SELECT 'way', CAST(500 + j AS BIGINT), NULL, NULL, 1,
                 3, CAST(303 + 3 * j AS BIGINT), ''
          FROM unnest(generate_series(0, 9)) t(j)
        ), r AS (
          SELECT 'relation', CAST(900 + k AS BIGINT), NULL, NULL, 1,
                 2, CAST(600 + 2 * k AS BIGINT), 'admin_centre|outer'
          FROM unnest(generate_series(0, 2)) t(k)
        )
        SELECT * FROM n UNION ALL SELECT * FROM w UNION ALL SELECT * FROM r
    """

    # osm_xml_elements: same logical elements as the pbf fixture, same
    # arithmetic oracle (XML carries exact doubles, u7 rounding equal)
    sql["osm_xml_elements"] = sql["osm_pbf_elements"]

    # pbf_tile_assign: the full ingest path — node coords re-derived
    # from tile_nodes() formulas (lat=48+((x+i)%100)/1000 exact at the
    # 1e-7 pbf granularity), slippy z14 assignment in closed form
    sql["pbf_tile_assign"] = f"""
        WITH tiles AS (
          SELECT 8805 + dx AS src_x, 5657 + dy AS src_y
          FROM unnest(generate_series(0, 2)) a(dx),
               unnest(generate_series(0, 1)) b(dy)
        ), nodes AS (
          SELECT src_x, src_y,
                 (src_x * 10000 + src_y) * 10 + i AS id,
                 round((48.0 + ((src_x + i) % 100) * 0.001) * 1e7) * 1e-7 AS lat,
                 round((13.0 + ((src_y + i) % 100) * 0.001) * 1e7) * 1e-7 AS lon
          FROM tiles, unnest(generate_series(0, 2)) t(i)
        )
        SELECT CAST(src_x AS INT) AS src_x, CAST(src_y AS INT) AS src_y,
               {TX14.format(lon="lon")} AS assign_x,
               {TY14.format(lat="lat")} AS assign_y,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(id) AS BIGINT) AS id_sum
        FROM nodes GROUP BY 1, 2, 3, 4
    """

    # pbf_way_geometry: way j (id 500+j) resolves nodes 100+j..100+j+2;
    # node coords follow the generator formulas, u7-exact after the pbf
    # 1e-7 granularity quantization
    sql["pbf_way_geometry"] = """
        SELECT CAST(500 + j AS BIGINT) AS way_id, 3 AS n_pts, 0 AS n_missing,
               CAST(round((48.52 + 0.001 * j) * 1e7) AS BIGINT) AS lat0_u7,
               CAST(round((48.52 + 0.001 * j) * 1e7)
                    + round((48.52 + 0.001 * (j + 1)) * 1e7)
                    + round((48.52 + 0.001 * (j + 2)) * 1e7) AS BIGINT) AS lat_sum_u7,
               CAST(round((13.37 + 0.002 * j) * 1e7)
                    + round((13.37 + 0.002 * (j + 1)) * 1e7)
                    + round((13.37 + 0.002 * (j + 2)) * 1e7) AS BIGINT) AS lon_sum_u7
        FROM unnest(generate_series(0, 9)) t(j)
    """

    sql["mbtiles_pbf_decode"] = """
        WITH tiles AS (
          SELECT 14 AS zoom, 8805 + dx AS tile_x, 5657 + dy AS tile_y
          FROM unnest(generate_series(0, 2)) a(dx),
               unnest(generate_series(0, 1)) b(dy)
        ), base AS (
          SELECT zoom, tile_x, tile_y,
                 (tile_x * 10000 + tile_y) * 10 AS b
          FROM tiles
        ), n AS (
          SELECT zoom, CAST(tile_x AS INT) AS tile_x, CAST(tile_y AS INT) AS tile_y,
                 'node' AS element_type, CAST(b + i AS BIGINT) AS id,
                 CAST(round((48.0 + ((tile_x + i) % 100) * 0.001) * 1e7) AS BIGINT) AS lat_u7,
                 -1 AS n_refs
          FROM base, unnest(generate_series(0, 2)) t(i)
        ), w AS (
          SELECT zoom, CAST(tile_x AS INT), CAST(tile_y AS INT),
                 'way', CAST(b + 9 AS BIGINT), NULL, 3
          FROM base
        )
        SELECT CAST(zoom AS INT) AS zoom, tile_x, tile_y, element_type,
               id, lat_u7, n_refs
        FROM (SELECT * FROM n UNION ALL SELECT * FROM w)
    """

    sql["mbtiles_metadata"] = """
        SELECT * FROM (VALUES
          ('bounds', '13.27,48.48,13.62,48.69'),
          ('format', 'pbf'),
          ('maxzoom', '14'),
          ('minzoom', '12'),
          ('name', 'osm2world_spark fixture'),
          ('type', 'baselayer'),
          ('version', '1')
        ) t(name, value)
    """

    # --- S8 serializers: rebuild the OBJ / POV / glTF text in SQL ------
    # The oracles re-run the sinks' relational plans in DuckDB — same
    # first-seen windows, same lag-triggered state lines, same
    # engine-portable fixed-point formatting (sinks/textfmt.fixed_sql)
    # — so every byte of the serialized files is hash-verified.
    from osm2world_spark.sinks.textfmt import fixed_sql as _fx

    def _amb(c: str) -> str:
        return _fx(f"floor(CAST({c} AS DOUBLE) * 0.5 + 0.5) / 255.0",
                   1_000_000, 6)

    sql["obj_export"] = f"""
        WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 37 = 0),
        b AS (SELECT k,
          't' || CAST(k % 4 AS VARCHAR) AS tile,
          CASE WHEN k % 2 = 0 THEN 'Building' ELSE 'Road' END AS gname,
          'MAT_' || CAST(k % 3 AS VARCHAR) AS mat,
          CAST(30 + (k % 3) * 40 AS INT) AS r,
          CAST(50 + (k % 3) * 30 AS INT) AS g,
          CAST(70 + (k % 3) * 20 AS INT) AS bb,
          CAST((k // 4) % 6 AS DOUBLE) AS x0,
          CAST((k // 24) % 6 AS DOUBLE) AS z0,
          CAST((k * 7) % 5 AS DOUBLE) * 0.25 + 0.5 AS h,
          CAST(k % 3 AS DOUBLE) * 0.5 AS nx,
          CAST(1.0 AS DOUBLE) AS ny,
          CAST(k % 5 AS DOUBLE) * 0.25 AS nz
         FROM ks),
        b2 AS (SELECT *, gname || ' ' || CAST(k AS VARCHAR) AS oname,
          x0 + 1.0 AS x1, z0 + 1.0 AS z1, x0 + 0.5 AS xm, h + 1.25 AS hm
         FROM b),
        faces AS (
          SELECT tile, 3*k AS fo, gname, oname, mat, r, g, bb,
            [struct_pack(x:=x0, y:=CAST(0.0 AS DOUBLE), z:=z0),
             struct_pack(x:=x1, y:=CAST(0.0 AS DOUBLE), z:=z0),
             struct_pack(x:=x1, y:=h, z:=z1),
             struct_pack(x:=x0, y:=h, z:=z1)] AS vertices,
            CAST(NULL AS STRUCT(x DOUBLE, y DOUBLE, z DOUBLE)[]) AS normals,
            [struct_pack(u:=CAST(0.0 AS DOUBLE), v:=CAST(0.0 AS DOUBLE)),
             struct_pack(u:=CAST(1.0 AS DOUBLE), v:=CAST(0.0 AS DOUBLE)),
             struct_pack(u:=CAST(1.0 AS DOUBLE), v:=CAST(1.0 AS DOUBLE)),
             struct_pack(u:=CAST(0.0 AS DOUBLE), v:=CAST(1.0 AS DOUBLE))] AS texcoords
          FROM b2
          UNION ALL
          SELECT tile, 3*k+1, gname, oname, mat, r, g, bb,
            [struct_pack(x:=x0, y:=CAST(0.0 AS DOUBLE), z:=z0),
             struct_pack(x:=x1, y:=h, z:=z1),
             struct_pack(x:=xm, y:=hm, z:=z0)],
            [struct_pack(x:=nx, y:=ny, z:=nz),
             struct_pack(x:=nx, y:=ny, z:=nz),
             struct_pack(x:=nx, y:=ny, z:=nz)],
            [struct_pack(u:=CAST(0.0 AS DOUBLE), v:=CAST(0.0 AS DOUBLE)),
             struct_pack(u:=CAST(1.0 AS DOUBLE), v:=CAST(1.0 AS DOUBLE)),
             struct_pack(u:=CAST(0.5 AS DOUBLE), v:=CAST(1.0 AS DOUBLE))]
          FROM b2
          UNION ALL
          SELECT tile, 3*k+2, gname, oname, mat, r, g, bb,
            [struct_pack(x:=x1, y:=CAST(0.0 AS DOUBLE), z:=z0),
             struct_pack(x:=x1, y:=h, z:=z1),
             struct_pack(x:=x0, y:=h, z:=z1)],
            CAST(NULL AS STRUCT(x DOUBLE, y DOUBLE, z DOUBLE)[]),
            CAST(NULL AS STRUCT(u DOUBLE, v DOUBLE)[])
          FROM b2),
        corners AS (
          SELECT tile, fo, ci, fo*64 + ci AS ok,
            vertices[ci+1].x AS vx, vertices[ci+1].y AS vy,
            vertices[ci+1].z AS vz,
            normals[ci+1].x AS cnx, normals[ci+1].y AS cny,
            normals[ci+1].z AS cnz,
            texcoords[ci+1].u AS tu, texcoords[ci+1].v AS tv
          FROM faces, LATERAL (SELECT unnest(generate_series(0, len(vertices)-1)) AS ci) ii),
        vtab AS (SELECT tile, vx, vy, vz, min(ok) AS fk
                 FROM corners GROUP BY 1, 2, 3, 4),
        vtab2 AS (SELECT *, row_number() OVER (PARTITION BY tile ORDER BY fk) AS vidx FROM vtab),
        ntab AS (SELECT tile, cnx, cny, cnz, min(ok) AS fk
                 FROM corners WHERE cnx IS NOT NULL GROUP BY 1, 2, 3, 4),
        ntab2 AS (SELECT *, row_number() OVER (PARTITION BY tile ORDER BY fk) AS nidx FROM ntab),
        ttab AS (SELECT tile, tu, tv, min(ok) AS fk
                 FROM corners WHERE tu IS NOT NULL GROUP BY 1, 2, 3),
        ttab2 AS (SELECT *, row_number() OVER (PARTITION BY tile ORDER BY fk) AS tidx FROM ttab),
        cidx AS (
          SELECT c.tile, c.fo, c.ci, v.vidx, n.nidx, t.tidx
          FROM corners c
          JOIN vtab2 v ON c.tile = v.tile AND c.vx = v.vx AND c.vy = v.vy AND c.vz = v.vz
          LEFT JOIN ntab2 n ON c.tile = n.tile AND c.cnx = n.cnx AND c.cny = n.cny AND c.cnz = n.cnz
          LEFT JOIN ttab2 t ON c.tile = t.tile AND c.tu = t.tu AND c.tv = t.tv),
        flines AS (
          SELECT tile, fo AS k1, 6 AS k2, CAST(0 AS BIGINT) AS k3,
            'f ' || string_agg(CASE
              WHEN tidx IS NOT NULL AND nidx IS NOT NULL THEN
                CAST(vidx AS VARCHAR) || '/' || CAST(tidx AS VARCHAR) || '/' || CAST(nidx AS VARCHAR)
              WHEN tidx IS NOT NULL THEN CAST(vidx AS VARCHAR) || '/' || CAST(tidx AS VARCHAR)
              WHEN nidx IS NOT NULL THEN CAST(vidx AS VARCHAR) || '//' || CAST(nidx AS VARCHAR)
              ELSE CAST(vidx AS VARCHAR) END, ' ' ORDER BY ci) AS text
          FROM cidx GROUP BY tile, fo),
        vlines AS (SELECT tile, fk // 64 AS k1, 5 AS k2, fk % 64 AS k3,
            'v ' || {_fx('vx')} || ' ' || {_fx('vy')} || ' ' || {_fx('-vz')} AS text
          FROM vtab2),
        nlines AS (SELECT tile, fk // 64 AS k1, 2 AS k2, fk % 64 AS k3,
            'vn ' || {_fx('cnx')} || ' ' || {_fx('cny')} || ' ' || {_fx('-cnz')} AS text
          FROM ntab2),
        tlines AS (SELECT tile, fk // 64 AS k1, 4 AS k2, fk % 64 AS k3,
            'vt ' || {_fx('tu')} || ' ' || {_fx('tv')} AS text
          FROM ttab2),
        marks AS (
          SELECT tile, fo, gname, oname, mat,
            lag(gname) OVER w AS pg, lag(oname) OVER w AS po,
            lag(mat) OVER w AS pm
          FROM faces
          WINDOW w AS (PARTITION BY tile ORDER BY fo)),
        glines AS (SELECT tile, fo AS k1, 0 AS k2, CAST(0 AS BIGINT) AS k3,
            'g ' || gname AS text FROM marks WHERE pg IS NULL OR pg <> gname),
        olines AS (SELECT tile, fo AS k1, 1 AS k2, CAST(0 AS BIGINT) AS k3,
            'o ' || oname AS text FROM marks WHERE po IS NULL OR po <> oname),
        mlines AS (SELECT tile, fo AS k1, 3 AS k2, CAST(0 AS BIGINT) AS k3,
            'usemtl ' || mat || '_0' AS text FROM marks WHERE pm IS NULL OR pm <> mat),
        hlines AS (
          SELECT tile, CAST(-1 AS BIGINT) AS k1, 0 AS k2, CAST(i AS BIGINT) AS k3,
            CASE i
              WHEN 0 THEN '# OBJ export: osm2world_spark S8 sink (ObjOutput.java parity)'
              WHEN 2 THEN 'mtllib ' || tile || '.obj.mtl'
              ELSE '' END AS text
          FROM (SELECT DISTINCT tile FROM faces) tt,
               (SELECT unnest(generate_series(0, 3)) AS i) ii),
        alllines AS (
          SELECT * FROM hlines UNION ALL SELECT * FROM glines
          UNION ALL SELECT * FROM olines UNION ALL SELECT * FROM mlines
          UNION ALL SELECT * FROM nlines UNION ALL SELECT * FROM tlines
          UNION ALL SELECT * FROM vlines UNION ALL SELECT * FROM flines),
        objtab AS (
          SELECT tile, string_agg(text, chr(10) ORDER BY k1, k2, k3, text) AS obj_text
          FROM alllines GROUP BY tile),
        matstab AS (SELECT tile, mat, r, g, bb, min(fo) AS fk
                    FROM faces GROUP BY 1, 2, 3, 4, 5),
        blocks AS (SELECT tile, fk,
            'newmtl ' || mat || '_0' || chr(10) || 'Ns 92.156863' || chr(10) ||
            'Ka ' || {_amb('r')} || ' ' || {_amb('g')} || ' ' || {_amb('bb')} || chr(10) ||
            'Kd ' || {_amb('r')} || ' ' || {_amb('g')} || ' ' || {_amb('bb')} || chr(10) ||
            'Ks 0.000000 0.000000 0.000000' || chr(10) ||
            'Ke 0.000000 0.000000 0.000000' || chr(10) ||
            'Ni 1' || chr(10) || 'illum 2' || chr(10) AS block
          FROM matstab),
        mtltab AS (
          SELECT tile,
            '# MTL export: osm2world_spark S8 sink (ObjOutput.java:400-406)'
            || chr(10) || chr(10) || string_agg(block, chr(10) ORDER BY fk) AS mtl_text
          FROM blocks GROUP BY tile)
        SELECT o.tile, o.obj_text, m.mtl_text
        FROM objtab o JOIN mtltab m USING (tile)
    """

    def _pvec(x: str, y: str, z: str) -> str:
        return ("'<' || " + _fx(x) + " || ', ' || " + _fx(y)
                + " || ', ' || " + _fx(z) + " || '>'")

    _povtri = (
        "'  triangle { ' || CASE WHEN t % 2 = 0 THEN "
        + _pvec("cx + t", "h", "cz") + " || ', ' || "
        + _pvec("cx + t + 1", "h", "cz") + " || ', ' || "
        + _pvec("cx + t", "h", "cz + 1")
        + " ELSE "
        + _pvec("cx + t", "h", "cz") + " || ', ' || "
        + _pvec("cx + t", "h", "cz + 1") + " || ', ' || "
        + _pvec("cx + t + 1", "h", "cz")
        + " END || '}'"
    )

    _mesh_cte = """
        ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 23 = 0),
        m AS (SELECT k, '{prefix}' || CAST(k % 4 AS VARCHAR) AS tile,
          k AS mesh_order,
          'MAT_' || CAST(k % 3 AS VARCHAR) AS mat,
          CAST(30 + (k % 3) * 40 AS INT) AS r,
          CAST(50 + (k % 3) * 30 AS INT) AS g,
          CAST(70 + (k % 3) * 20 AS INT) AS bb,
          CAST(k % 3 + 1 AS INT) AS ntris,
          CAST((k // 4) % 10 AS DOUBLE) AS cx,
          CAST((k // 40) % 10 AS DOUBLE) AS cz,
          CAST((k * 3) % 7 AS DOUBLE) * 0.25 AS h
         FROM ks)"""

    sql["pov_export"] = f"""
        WITH {_mesh_cte.format(prefix="p")},
        blocks AS (SELECT tile, mesh_order,
          'mesh {{' || chr(10) ||
          array_to_string(list_transform(generate_series(0, ntris - 1),
            t -> {_povtri}), chr(10)) ||
          chr(10) || ' uv_mapping  texture {{ texture_' || mat || ' }}}}' AS block
         FROM m)
        SELECT tile,
          '#include "osm2world_definitions.inc"' || chr(10) || chr(10) ||
          string_agg(block, chr(10) ORDER BY mesh_order) AS pov_text
        FROM blocks GROUP BY tile
    """

    def _f6(expr: str) -> str:
        return _fx(expr, 1_000_000, 6)

    sql["gltf_json"] = f"""
        WITH {_mesh_cte.format(prefix="g")},
        m2 AS (SELECT *,
          row_number() OVER (PARTITION BY tile ORDER BY mesh_order) - 1 AS mi,
          3 * ntris AS cnt, CAST(36 * ntris AS BIGINT) AS blen
         FROM m),
        mats AS (SELECT tile, mat, r, g, bb, min(mesh_order) AS fk
                 FROM m GROUP BY 1, 2, 3, 4, 5),
        mats2 AS (SELECT *,
          row_number() OVER (PARTITION BY tile ORDER BY fk) - 1 AS mat_idx
         FROM mats),
        frag AS (SELECT m2.tile, m2.mi, m2.blen,
          '{{"mesh":' || CAST(m2.mi AS VARCHAR) || '}}' AS nodef,
          '{{"primitives":[{{"mode":4,"material":' || CAST(mats2.mat_idx AS VARCHAR)
            || ',"attributes":{{"POSITION":' || CAST(m2.mi * 2 AS VARCHAR)
            || ',"NORMAL":' || CAST(m2.mi * 2 + 1 AS VARCHAR) || '}}}}]}}' AS meshf,
          '{{"componentType":5126,"count":' || CAST(m2.cnt AS VARCHAR)
            || ',"type":"VEC3","bufferView":' || CAST(m2.mi * 2 AS VARCHAR)
            || ',"min":[' || {_f6('m2.cx')} || ',' || {_f6('m2.h')} || ','
            || {_f6('-(m2.cz + 1.0)')} || '],"max":[' || {_f6('m2.cx + m2.ntris')}
            || ',' || {_f6('m2.h')} || ',' || {_f6('-m2.cz')} || ']}}'
          || ',' ||
          '{{"componentType":5126,"count":' || CAST(m2.cnt AS VARCHAR)
            || ',"type":"VEC3","bufferView":' || CAST(m2.mi * 2 + 1 AS VARCHAR)
            || ',"min":[0.000000,'
            || CASE WHEN m2.ntris >= 2 THEN '-1.000000' ELSE '1.000000' END
            || ',0.000000],"max":[0.000000,1.000000,0.000000]}}' AS accf,
          '{{"buffer":' || CAST(m2.mi * 2 AS VARCHAR) || ',"byteLength":'
            || CAST(m2.blen AS VARCHAR) || ',"target":34962}},'
            || '{{"buffer":' || CAST(m2.mi * 2 + 1 AS VARCHAR) || ',"byteLength":'
            || CAST(m2.blen AS VARCHAR) || ',"target":34962}}' AS bvf,
          '{{"byteLength":' || CAST(m2.blen AS VARCHAR) || ',"uri":"' || m2.tile
            || '_' || CAST(m2.mi * 2 AS VARCHAR) || '.bin"}},'
            || '{{"byteLength":' || CAST(m2.blen AS VARCHAR) || ',"uri":"' || m2.tile
            || '_' || CAST(m2.mi * 2 + 1 AS VARCHAR) || '.bin"}}' AS buff
         FROM m2 JOIN mats2 ON m2.tile = mats2.tile AND m2.mat = mats2.mat),
        agg AS (SELECT tile, count(*) AS n,
          string_agg(nodef, ',' ORDER BY mi) AS nodes_json,
          string_agg(meshf, ',' ORDER BY mi) AS meshes_json,
          string_agg(accf, ',' ORDER BY mi) AS acc_json,
          string_agg(bvf, ',' ORDER BY mi) AS bv_json,
          string_agg(buff, ',' ORDER BY mi) AS buf_json
         FROM frag GROUP BY tile),
        mjson AS (SELECT tile, string_agg(
            '{{"name":"' || mat || '","alphaMode":"OPAQUE","doubleSided":false,'
            || '"pbrMetallicRoughness":{{"baseColorFactor":['
            || {_f6('CAST(r AS DOUBLE) / 255.0')} || ','
            || {_f6('CAST(g AS DOUBLE) / 255.0')} || ','
            || {_f6('CAST(bb AS DOUBLE) / 255.0')} || ',1.000000]}}}}',
            ',' ORDER BY fk) AS materials_json
         FROM mats2 GROUP BY tile)
        SELECT agg.tile,
          '{{"asset":{{"version":"2.0","generator":"osm2world_spark S8 sink"}},'
          || '"scene":0,"scenes":[{{"nodes":[0]}}],'
          || '"nodes":[{{"name":"OSM2World scene","children":['
          || array_to_string(list_transform(generate_series(1, CAST(agg.n AS INT)),
               i -> CAST(i AS VARCHAR)), ',')
          || ']}},' || agg.nodes_json
          || '],"meshes":[' || agg.meshes_json
          || '],"accessors":[' || agg.acc_json
          || '],"bufferViews":[' || agg.bv_json
          || '],"buffers":[' || agg.buf_json
          || '],"materials":[' || mjson.materials_json || ']}}' AS gltf_json
        FROM agg JOIN mjson USING (tile)
    """

    # frontend-PBF blocks/objects: rebuild the first-seen dedup blocks
    # and index references with the same window technique; corner
    # coordinates come from the closed-form triangle derivation
    # (t = ci//3, j = ci%3, +1 offsets per the parity-alternating fan)
    _fpbf_corners = """
        corners AS (
          SELECT tile, mesh_order, ci,
            mesh_order * 1048576 + ci AS ok,
            cx + (ci // 3) + CASE WHEN ((ci // 3) % 2 = 0 AND ci % 3 = 1)
                                    OR ((ci // 3) % 2 = 1 AND ci % 3 = 2)
                                  THEN 1.0 ELSE 0.0 END AS vx,
            h AS vy,
            cz + CASE WHEN ((ci // 3) % 2 = 0 AND ci % 3 = 2)
                        OR ((ci // 3) % 2 = 1 AND ci % 3 = 1)
                      THEN 1.0 ELSE 0.0 END AS vz
          FROM m2, LATERAL (SELECT unnest(generate_series(0, 3 * ntris - 1)) AS ci) ii),
        vtab AS (SELECT tile, vx, vy, vz, min(ok) AS fk
                 FROM corners GROUP BY 1, 2, 3, 4),
        vtab2 AS (SELECT *,
          row_number() OVER (PARTITION BY tile ORDER BY fk) - 1 AS vidx
         FROM vtab)"""

    _fpbf_m2 = """
        m2 AS (SELECT *, 'w' || CAST(k AS VARCHAR) AS osm_id,
          CASE WHEN k % 2 = 0 THEN 'Building' ELSE 'Road' END AS type_name
         FROM m)"""

    sql["fpbf_blocks"] = f"""
        WITH {_mesh_cte.format(prefix="f")},
        {_fpbf_m2},
        {_fpbf_corners},
        coords AS (SELECT tile,
            flatten(list([CAST(floor(vx * 1000.0 + 0.5) AS BIGINT),
                          CAST(floor(vy * 1000.0 + 0.5) AS BIGINT),
                          CAST(floor(vz * 1000.0 + 0.5) AS BIGINT)]
                    ORDER BY fk)) AS coords
          FROM vtab2 GROUP BY tile),
        strs AS (SELECT tile,
            [''] || list(type_name ORDER BY fk) AS strings
          FROM (SELECT tile, type_name, min(mesh_order) AS fk
                FROM m2 GROUP BY 1, 2) GROUP BY tile),
        matsb AS (SELECT tile,
            flatten(list([CAST(r AS BIGINT), CAST(g AS BIGINT),
                          CAST(bb AS BIGINT)] ORDER BY fk)) AS mat_rgb
          FROM (SELECT tile, mat, r, g, bb, min(mesh_order) AS fk
                FROM m2 GROUP BY 1, 2, 3, 4, 5) GROUP BY tile)
        SELECT coords.tile, coords.coords, strs.strings, matsb.mat_rgb
        FROM coords JOIN strs USING (tile) JOIN matsb USING (tile)
    """

    sql["fpbf_objects"] = f"""
        WITH {_mesh_cte.format(prefix="f")},
        {_fpbf_m2},
        {_fpbf_corners},
        verts AS (
          SELECT c.tile, c.mesh_order,
            list(CAST(v.vidx AS BIGINT) ORDER BY c.ci) AS vertices
          FROM corners c
          JOIN vtab2 v ON c.tile = v.tile AND c.vx = v.vx
                      AND c.vy = v.vy AND c.vz = v.vz
          GROUP BY c.tile, c.mesh_order),
        stab AS (SELECT tile, type_name,
            CAST(row_number() OVER (PARTITION BY tile ORDER BY fk) AS INT) AS type_idx
          FROM (SELECT tile, type_name, min(mesh_order) AS fk
                FROM m2 GROUP BY 1, 2)),
        mtab AS (SELECT tile, mat,
            CAST(row_number() OVER (PARTITION BY tile ORDER BY fk) - 1 AS INT) AS material_idx
          FROM (SELECT tile, mat, min(mesh_order) AS fk
                FROM m2 GROUP BY 1, 2))
        SELECT m2.tile, m2.mesh_order, m2.osm_id,
               stab.type_idx, mtab.material_idx, verts.vertices
        FROM m2
        JOIN stab ON m2.tile = stab.tile AND m2.type_name = stab.type_name
        JOIN mtab ON m2.tile = mtab.tile AND m2.mat = mtab.mat
        JOIN verts ON m2.tile = verts.tile AND m2.mesh_order = verts.mesh_order
    """

    # PNG render sink: every pixel re-derived from the rect scene —
    # pixel centers cx = 4*px+2, cz = 190-4*py; closed-interval coverage
    # (exactly the two-CCW-triangle test for axis-aligned rects); winner
    # = max c_custkey among covering rects; background (0,0,0).
    sql["render_pixels"] = """
        WITH rect AS (
          SELECT CAST(c_custkey % 4 AS VARCHAR) AS tile, c_custkey AS ord,
                 CAST(c_custkey % 256 AS INT) AS cr,
                 CAST((c_custkey * 7) % 256 AS INT) AS cg,
                 CAST((c_custkey * 13) % 256 AS INT) AS cb,
                 CAST((c_custkey * 13) % 160 AS DOUBLE) AS x0,
                 CAST((c_custkey * 29) % 160 AS DOUBLE) AS z0,
                 CAST((c_custkey * 13) % 160 + 8 + (c_custkey % 5) * 6 AS DOUBLE) AS x1,
                 CAST((c_custkey * 29) % 160 + 8 + (c_custkey % 7) * 4 AS DOUBLE) AS z1
          FROM customer
        ),
        grid AS (
          SELECT t.tile, pxs.px, pys.py,
                 0.0 + (pxs.px + 0.5) * 4.0 AS cx,
                 192.0 - (pys.py + 0.5) * 4.0 AS cz
          FROM (SELECT DISTINCT tile FROM rect) t
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS px) pxs
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS py) pys
        ),
        winner AS (
          SELECT g.tile, g.px, g.py, max(r.ord) AS word
          FROM grid g
          JOIN rect r ON r.tile = g.tile
           AND g.cx >= r.x0 AND g.cx <= r.x1
           AND g.cz >= r.z0 AND g.cz <= r.z1
          GROUP BY 1, 2, 3
        )
        SELECT g.tile, CAST(g.px AS INT) AS px, CAST(g.py AS INT) AS py,
               COALESCE(r.cr, 0) AS r,
               COALESCE(r.cg, 0) AS g,
               COALESCE(r.cb, 0) AS b
        FROM grid g
        LEFT JOIN winner w ON w.tile = g.tile AND w.px = g.px AND w.py = g.py
        LEFT JOIN rect r ON r.tile = g.tile AND r.ord = w.word
    """

    # Hashed linear classifier: the full model (64 buckets x 3 classes,
    # closed-form integer weights) and every score re-derived — token
    # buckets via the portable md5-prefix family, per-class sums exact
    # bigints, argmax with lowest-index tie-break, common-denominator
    # bias form s_c = sum_w + n_tokens * b_c.
    sql["classify_docs"] = """
        WITH wv AS (
          SELECT b,
                 ((b * 2654435761) % 2001) - 1000 AS w0,
                 ((b * 2654435761 + 40503) % 2001) - 1000 AS w1,
                 ((b * 2654435761 + 81006) % 2001) - 1000 AS w2
          FROM (SELECT unnest(generate_series(0, 63)) AS b)
        ),
        tok AS (
          SELECT doc_id,
                 (('0x' || substr(md5(t.tok), 1, 8))::BIGINT) % 64 AS b
          FROM documents, unnest(string_split(text, ' ')) AS t(tok)
          WHERE t.tok != ''
        ),
        s AS (
          SELECT tok.doc_id, count(*) AS n_tokens,
                 CAST(sum(wv.w0) AS BIGINT) AS r0,
                 CAST(sum(wv.w1) AS BIGINT) AS r1,
                 CAST(sum(wv.w2) AS BIGINT) AS r2
          FROM tok JOIN wv ON wv.b = tok.b
          GROUP BY tok.doc_id
        )
        SELECT doc_id, n_tokens,
               CAST(r0 + n_tokens * (-25) AS BIGINT) AS s0,
               CAST(r1 + n_tokens * 12 AS BIGINT) AS s1,
               CAST(r2 + n_tokens * (-1) AS BIGINT) AS s2,
               CAST(CASE
                 WHEN r0 + n_tokens * (-25) >= r1 + n_tokens * 12
                  AND r0 + n_tokens * (-25) >= r2 + n_tokens * (-1) THEN 0
                 WHEN r1 + n_tokens * 12 >= r2 + n_tokens * (-1) THEN 1
                 ELSE 2 END AS INT) AS label
        FROM s
    """

    # Normalized-key dedup: the oracle replays the full normalization
    # pipeline (accent translate -> lower -> digit fold -> whitespace
    # collapse with the 'g' flag -> trim) on both synthesized variants
    # and groups by md5 of the normalized form.
    _acc_src = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
    _acc_dst = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"
    _norm = (
        "trim(regexp_replace(translate(lower(translate({x}, "
        f"'{_acc_src}', '{_acc_dst}')), '123456789', '000000000'), "
        "'[ \\t\\r\\n]+', ' ', 'g'))"
    )
    sql["normalized_dedup"] = f"""
        WITH variants AS (
          SELECT 'a' || doc_id::VARCHAR AS vid,
                 'héllo ' || text AS text
          FROM documents
          UNION ALL
          SELECT 'b' || doc_id::VARCHAR,
                 'HÉLLO ' || upper(replace(text, ' ', '   ')) || '  '
          FROM documents
        ),
        norm AS (
          SELECT vid, md5({_norm.format(x="text")}) AS norm_md5
          FROM variants
        )
        SELECT norm_md5, count(*) AS n_docs,
               array_to_string(list(vid ORDER BY vid), ',') AS doc_ids_str,
               min(vid) AS survivor
        FROM norm GROUP BY norm_md5 HAVING count(*) > 1
    """

    # Video frame evidence: frame f of doc k has channel gradients
    # r(x)=(k+f+x)%256, g(y)=(k*3+f*7+y)%256, b=(k*5+f*11)%256 over a
    # 15x13 raster; sums and coordinate-weighted sums re-derived per
    # sampled frame (0, 2, 4 of 6).
    sql["video_frames"] = """
        WITH fr(frame) AS (VALUES (0), (2), (4)),
        xs AS (SELECT unnest(generate_series(0, 14)) AS x),
        ys AS (SELECT unnest(generate_series(0, 12)) AS y),
        rx AS (
          SELECT d.doc_id AS k, fr.frame,
                 CAST(sum((d.doc_id + fr.frame + xs.x) % 256) AS BIGINT) AS sr,
                 CAST(sum(xs.x * ((d.doc_id + fr.frame + xs.x) % 256)) AS BIGINT) AS wr
          FROM documents d, fr, xs GROUP BY 1, 2
        ),
        gy AS (
          SELECT d.doc_id AS k, fr.frame,
                 CAST(sum((d.doc_id * 3 + fr.frame * 7 + ys.y) % 256) AS BIGINT) AS sg,
                 CAST(sum(ys.y * ((d.doc_id * 3 + fr.frame * 7 + ys.y) % 256)) AS BIGINT) AS wg
          FROM documents d, fr, ys GROUP BY 1, 2
        )
        SELECT rx.k::VARCHAR AS doc_id, CAST(rx.frame AS INT) AS frame,
               CAST(6 AS INT) AS n_frames, CAST(15 AS INT) AS w,
               CAST(13 AS INT) AS h,
               CAST(13 * rx.sr AS BIGINT) AS sum_r,
               CAST(15 * gy.sg AS BIGINT) AS sum_g,
               CAST(15 * 13 * ((rx.k * 5 + rx.frame * 11) % 256) AS BIGINT) AS sum_b,
               CAST(13 * rx.wr AS BIGINT) AS wx_r,
               CAST(15 * gy.wg AS BIGINT) AS wy_g
        FROM rx JOIN gy ON rx.k = gy.k AND rx.frame = gy.frame
    """

    # Image resize: block sums of the 16x16 gradient fixture
    # img[y,x] = (y*16 + x + k) % 256 reduced 4x4 per output pixel.
    sql["image_resize"] = """
        WITH s AS (
          SELECT d.doc_id AS k, ys.y, xs.x,
                 CAST(sum(((4 * ys.y + dys.dy) * 16 + 4 * xs.x + dxs.dx
                           + d.doc_id) % 256) AS BIGINT) AS bsum
          FROM documents d,
               (SELECT unnest(generate_series(0, 3)) AS y) ys,
               (SELECT unnest(generate_series(0, 3)) AS x) xs,
               (SELECT unnest(generate_series(0, 3)) AS dy) dys,
               (SELECT unnest(generate_series(0, 3)) AS dx) dxs
          GROUP BY 1, 2, 3
        )
        SELECT k::VARCHAR AS doc_id, CAST(y AS INT) AS y,
               CAST(x AS INT) AS x, bsum,
               CAST(bsum // 16 AS INT) AS v
        FROM s
    """

    # Audio resample: sample i of doc k is ((i*(k%31+3)+k)%2048)-1024
    # (synthetic_wav_media); 8-sample block sums + floor means.
    sql["audio_resample"] = """
        WITH s AS (
          SELECT d.doc_id AS k, idx.i,
                 CAST(sum((((8 * idx.i + js.j) * (d.doc_id % 31 + 3)
                            + d.doc_id) % 2048) - 1024) AS BIGINT) AS ssum
          FROM documents d,
               (SELECT unnest(generate_series(0, 127)) AS i) idx,
               (SELECT unnest(generate_series(0, 7)) AS j) js
          GROUP BY 1, 2
        )
        SELECT k::VARCHAR AS doc_id, CAST(i AS INT) AS i, ssum,
               CAST(floor(ssum / 8.0) AS INT) AS v
        FROM s
    """

    sql["osm_change_parse"] = """
        WITH base AS (
          SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 11 = 0
        )
        SELECT 'create' AS action, 'node' AS element_type, k AS id,
               CAST((k % 170 - 85) * 10000000 AS BIGINT) AS lat_u7,
               CAST((k % 360 - 180) * 10000000 AS BIGINT) AS lon_u7,
               CAST(1 AS INT) AS n_tags, CAST(-1 AS INT) AS n_refs,
               CAST(0 AS BIGINT) AS refs_sum
        FROM base
        UNION ALL
        SELECT 'modify', 'way', k + 1, -1, -1, 0, 3, CAST(6 * k AS BIGINT)
        FROM base
        UNION ALL
        SELECT 'delete', 'node', k + 2, -1, -1, 0, -1, CAST(0 AS BIGINT)
        FROM base
    """

    # Mojibake repair: the oracle replays the exact replace chain (same
    # pair table, same order) over the same corrupted construction.
    from osm2world_spark.operators.normalize import MOJIBAKE_PAIRS as _MOJI

    _broken_prefix = "héllo wörld çafé ".encode("utf-8").decode("latin-1")
    _fix_expr = f"'{_broken_prefix}' || text"
    for _b, _f in _MOJI:
        _fix_expr = f"replace({_fix_expr}, '{_b}', '{_f}')"
    sql["mojibake_fix"] = f"""
        SELECT doc_id,
               md5('{_broken_prefix}' || text) AS broken_md5,
               md5({_fix_expr}) AS fixed_md5,
               CAST(length('{_broken_prefix}' || text)
                    - length({_fix_expr}) AS INT) AS n_repaired
        FROM documents
    """

    sql["shard_corpus"] = f"""
        WITH h AS (
          SELECT doc_id, {_u32.format(c="doc_id")} AS hv FROM documents
        )
        SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
               CAST(row_number() OVER (
                 PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS BIGINT
               ) AS shard_pos
        FROM h
    """

    # Tile pyramid: the render_pixels oracle composed with the 2x2
    # mosaic/downsample mapping — child tile t is quadrant
    # (t % 2, t // 2); parent pixel = floor mean of its 4 child pixels.
    sql["tile_pyramid"] = """
        WITH rect AS (
          SELECT CAST(c_custkey % 4 AS VARCHAR) AS tile, c_custkey AS ord,
                 CAST(c_custkey % 256 AS INT) AS cr,
                 CAST((c_custkey * 7) % 256 AS INT) AS cg,
                 CAST((c_custkey * 13) % 256 AS INT) AS cb,
                 CAST((c_custkey * 13) % 160 AS DOUBLE) AS x0,
                 CAST((c_custkey * 29) % 160 AS DOUBLE) AS z0,
                 CAST((c_custkey * 13) % 160 + 8 + (c_custkey % 5) * 6 AS DOUBLE) AS x1,
                 CAST((c_custkey * 29) % 160 + 8 + (c_custkey % 7) * 4 AS DOUBLE) AS z1
          FROM customer
        ),
        grid AS (
          SELECT t.tile, pxs.px, pys.py,
                 0.0 + (pxs.px + 0.5) * 4.0 AS cx,
                 192.0 - (pys.py + 0.5) * 4.0 AS cz
          FROM (SELECT DISTINCT tile FROM rect) t
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS px) pxs
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS py) pys
        ),
        winner AS (
          SELECT gr.tile, gr.px, gr.py, max(r.ord) AS word
          FROM grid gr
          JOIN rect r ON r.tile = gr.tile
           AND gr.cx >= r.x0 AND gr.cx <= r.x1
           AND gr.cz >= r.z0 AND gr.cz <= r.z1
          GROUP BY 1, 2, 3
        ),
        child AS (
          SELECT CAST(gr.tile AS INT) AS t, gr.px, gr.py,
                 COALESCE(r.cr, 0) AS cr,
                 COALESCE(r.cg, 0) AS cg,
                 COALESCE(r.cb, 0) AS cb
          FROM grid gr
          LEFT JOIN winner w
            ON w.tile = gr.tile AND w.px = gr.px AND w.py = gr.py
          LEFT JOIN rect r ON r.tile = gr.tile AND r.ord = w.word
        )
        SELECT CAST(0 AS INT) AS zoom, CAST(0 AS INT) AS tile_x,
               CAST(0 AS INT) AS tile_y,
               CAST(((t % 2) * 48 + px) // 2 AS INT) AS px,
               CAST(((t // 2) * 48 + py) // 2 AS INT) AS py,
               CAST(sum(cr) // 4 AS INT) AS r,
               CAST(sum(cg) // 4 AS INT) AS g,
               CAST(sum(cb) // 4 AS INT) AS b,
               CAST(count(*) AS INT) AS n_src
        FROM child
        GROUP BY 1, 2, 3, 4, 5
    """

    # render_strips is the SAME image as render_pixels by contract —
    # the strip decomposition must be invisible in the pixel table
    sql["render_strips"] = sql["render_pixels"]

    sql["url_dedup"] = """
        SELECT 'http://example' || (doc_id % 50)::VARCHAR || '.com/p'
                 || doc_id::VARCHAR || '?a=1&b=2' AS canon_url,
               CAST(2 AS BIGINT) AS n_docs,
               'a' || doc_id::VARCHAR || ',b' || doc_id::VARCHAR AS doc_ids_str,
               'a' || doc_id::VARCHAR AS survivor
        FROM documents
    """

    sql["srtm_decode"] = """
        WITH cells(cell_lon, cell_lat) AS (VALUES (13, 48), (14, 48)),
        pxs AS (SELECT unnest(generate_series(0, 1200, 97)) AS px),
        pys AS (SELECT unnest(generate_series(0, 1200, 89)) AS py)
        SELECT CAST(cell_lon AS INT) AS cell_lon,
               CAST(cell_lat AS INT) AS cell_lat,
               CAST(px AS INT) AS px,
               CAST(py AS INT) AS py,
               CAST(CASE WHEN (px * 31 + py * 37) % 499 = 0 THEN -32768
                    ELSE ((px * 7 + py * 13 + cell_lon * 1000 + cell_lat * 17) % 4000) - 500
                    END AS SMALLINT) AS elev
        FROM cells, pxs, pys
    """

    sql["network_connector_cuts"] = f"""
        WITH {_net_segs}, two AS (
          SELECT *, count(*) OVER (PARTITION BY node) AS deg,
                 row_number() OVER (PARTITION BY node ORDER BY angle, seg_id) AS rnk
          FROM eps2
        ), pair AS (
          SELECT s1.node,
                 s1.seg_id AS seg1, s1.inbound AS in1, s1.ax AS a1x, s1.az AS a1z,
                 s1.width AS w1, s1.nx AS node_x, s1.nz AS node_z,
                 s2.seg_id AS seg2, s2.inbound AS in2, s2.ax AS a2x, s2.az AS a2z,
                 s2.width AS w2
          FROM (SELECT * FROM two WHERE deg = 2 AND rnk = 1) s1
          JOIN (SELECT * FROM two WHERE deg = 2 AND rnk = 2) s2 USING (node)
        ), cutv AS (
          SELECT *,
                 CASE WHEN (-a1x = a2x AND -a1z = a2z) THEN a2z
                      ELSE (a2x - (-a1x)) / sqrt((a2x - (-a1x)) * (a2x - (-a1x))
                                               + (a2z - (-a1z)) * (a2z - (-a1z))) END AS c0x,
                 CASE WHEN (-a1x = a2x AND -a1z = a2z) THEN -a2x
                      ELSE (a2z - (-a1z)) / sqrt((a2x - (-a1x)) * (a2x - (-a1x))
                                               + (a2z - (-a1z)) * (a2z - (-a1z))) END AS c0z
          FROM pair
        ), cut AS (
          SELECT *,
                 CASE WHEN ((-a1z) * c0x - (-a1x) * c0z) <= 0 THEN -c0x ELSE c0x END AS cx,
                 CASE WHEN ((-a1z) * c0x - (-a1x) * c0z) <= 0 THEN -c0z ELSE c0z END AS cz
          FROM cutv
        ), rows_ AS (
          SELECT node, seg1 AS seg_id,
                 CASE WHEN in1 THEN 'end' ELSE 'start' END AS side,
                 cx * (w1 * 0.5) * (CASE WHEN in1 THEN 1.0 ELSE -1.0 END) AS trx,
                 cz * (w1 * 0.5) * (CASE WHEN in1 THEN 1.0 ELSE -1.0 END) AS trz,
                 node_x, node_z, cx, cz
          FROM cut
          UNION ALL
          SELECT node, seg2,
                 CASE WHEN in2 THEN 'end' ELSE 'start' END,
                 cx * (w2 * 0.5) * (CASE WHEN in2 THEN -1.0 ELSE 1.0 END),
                 cz * (w2 * 0.5) * (CASE WHEN in2 THEN -1.0 ELSE 1.0 END),
                 node_x, node_z, cx, cz
          FROM cut
        )
        SELECT node, seg_id, side,
               round(node_x - trx, 6) + 0.0 AS left_x, round(node_z - trz, 6) + 0.0 AS left_z,
               round(node_x + trx, 6) + 0.0 AS right_x, round(node_z + trz, 6) + 0.0 AS right_z,
               round(cx, 6) + 0.0 AS cut_x, round(cz, 6) + 0.0 AS cut_z
        FROM rows_
    """

    # tri_strip_fan: the same index arithmetic as DuckDB list lambdas;
    # range(a, b) is empty for b <= a, matching the guarded Spark form
    sql["tri_strip_fan"] = """
        WITH d AS (
          SELECT o_orderkey AS k,
                 list_transform(range(0, CAST(o_orderkey % 6 + 3 AS BIGINT)),
                                i -> o_orderkey * 100 + i) AS vs
          FROM orders
        ), m AS (
          SELECT k, vs, len(vs) AS n,
                 flatten(list_transform(range(0, len(vs) - 2), t ->
                   CASE WHEN t % 2 = 0
                        THEN [vs[t + 1], vs[t + 2], vs[t + 3]]
                        ELSE [vs[t + 1], vs[t + 3], vs[t + 2]] END)) AS strip
          FROM d
        )
        SELECT k AS o_orderkey,
               strip,
               flatten(list_transform(range(0, n - 2), t ->
                 [vs[1], vs[t + 2], vs[t + 3]])) AS fan,
               flatten(list_transform(range(0, n - 2), t ->
                 [vs[t + 3], vs[t + 3], vs[t + 3]])) AS normals,
               list_transform(range(0, len(strip) // 3), t ->
                 [strip[t * 3 + 1], strip[t * 3 + 2], strip[t * 3 + 3]]) AS tris
        FROM m
    """

    # dsir_score: the same hashed-unigram distributions; Laplace args
    # are identical rationals, ln differs by <= 1 ulp per term
    _dsb = "(('0x' || substr(md5(tok), 1, 15))::BIGINT % 64)"
    sql["dsir_score"] = f"""
        WITH toks AS (
          SELECT doc_id, {_dsb} AS bucket
          FROM (
            SELECT doc_id,
                   unnest(string_split(replace(text, chr(10), ' '), ' ')) AS tok
            FROM documents
          ) WHERE tok != ''
        ), dc AS (
          SELECT doc_id, bucket, count(*) AS c FROM toks GROUP BY doc_id, bucket
        ), spine AS (SELECT unnest(range(0, 64)) AS bucket),
        tgt AS (
          SELECT s.bucket, COALESCE(n, 0) AS n FROM spine s LEFT JOIN (
            SELECT bucket, count(*) AS n FROM toks WHERE doc_id % 5 = 0 GROUP BY bucket
          ) t USING (bucket)
        ), raw AS (
          SELECT s.bucket, COALESCE(n, 0) AS n FROM spine s LEFT JOIN (
            SELECT bucket, count(*) AS n FROM toks GROUP BY bucket
          ) t USING (bucket)
        ), ratio AS (
          SELECT t.bucket,
                 ln((t.n + 1.0) / ((SELECT sum(n) FROM tgt) + 1.0 * 64))
                 - ln((r.n + 1.0) / ((SELECT sum(n) FROM raw) + 1.0 * 64)) AS llr
          FROM tgt t JOIN raw r USING (bucket)
        )
        SELECT dc.doc_id,
               CAST(sum(dc.c) AS BIGINT) AS n_tokens,
               CAST(floor(sum(dc.c * ratio.llr) * 1000000.0 + 0.5) AS BIGINT) AS score_u6
        FROM dc JOIN ratio USING (bucket)
        GROUP BY dc.doc_id
    """

    # shape_outlines: same angle chain; fmod in DuckDB follows the
    # dividend sign like Java %, so fit_to_range is literal
    _fit = "fmod(fmod({a}, 2 * pi()) + 2 * pi(), 2 * pi())"
    _su6 = "CAST(floor(({v}) * 1000000.0 + 0.5) AS BIGINT)"
    _circ_pt = (
        f"[{_su6.format(v='cx + r * sin(-i * (2 * pi() / n))')}, "
        f"{_su6.format(v='cz + r * cos(-i * (2 * pi() / n))')}]"
    )
    _sec_angle = _fit.format(
        a="sa + "
        + _fit.format(
            a=_fit.format(a="(" + _fit.format(a="e") + " - sa)") + " / (n - 1.0) * i"
        )
    )
    _sec_pt = (
        f"[{_su6.format(v=f'cx + sin({_sec_angle}) * r')}, "
        f"{_su6.format(v=f'cz + cos({_sec_angle}) * r')}]"
    )
    sql["shape_outlines"] = f"""
        WITH c AS (
          SELECT o_orderkey AS k,
                 CAST(o_orderkey % 20 AS DOUBLE) AS cx,
                 CAST(o_orderkey % 15 AS DOUBLE) AS cz,
                 CAST(o_orderkey % 7 + 1 AS DOUBLE) AS r,
                 CAST(o_orderkey % 10 AS DOUBLE) * 0.7 AS s,
                 CAST(o_orderkey % 9 AS DOUBLE) * 0.9 AS e,
                 CAST(o_orderkey % 5 + 4 AS INT) AS n
          FROM orders WHERE o_orderkey % 11 = 0
        ), m AS (
          SELECT *, {_fit.format(a="s")} AS sa FROM c
        ), rings AS (
          SELECT k, n, r, s, e,
                 list_transform(range(0, CAST(n AS BIGINT)), i -> {_circ_pt}) AS circ,
                 list_reverse(
                   list_transform(range(0, CAST(n AS BIGINT)), i -> {_sec_pt})
                 ) AS sec
          FROM m
        )
        SELECT k AS o_orderkey,
               flatten(list_concat(circ, [circ[1]])) AS circle_u6,
               flatten(list_concat(sec, [sec[1]])) AS sector_u6,
               {_su6.format(v=f"r * r * pi() * {_fit.format(a='(' + _fit.format(a='e') + ' - ' + _fit.format(a='s') + ')')} / (2 * pi())")} AS area_u6
        FROM rings
    """

    # line_ops: the same coordinate synthesis and formulas; EPSILON is
    # the Java float literal 0.0001f widened (9.999999747378752e-05)
    _leps = "9.999999747378752e-05"
    sql["line_ops"] = f"""
        WITH c AS (
          SELECT o_orderkey AS k,
                 CAST(o_orderkey % 17 AS DOUBLE) AS px, CAST(o_orderkey % 13 AS DOUBLE) AS pz,
                 CAST(o_orderkey % 5 AS DOUBLE) AS a1x, CAST(o_orderkey % 9 AS DOUBLE) AS a1z,
                 CAST(o_orderkey % 11 + 1 AS DOUBLE) AS a2x, CAST(o_orderkey % 3 + 10 AS DOUBLE) AS a2z,
                 CAST(o_orderkey % 6 + 8 AS DOUBLE) AS b1x, CAST(o_orderkey % 4 AS DOUBLE) AS b1z,
                 CAST(o_orderkey % 8 AS DOUBLE) AS b2x, CAST(o_orderkey % 10 + 3 AS DOUBLE) AS b2z
          FROM orders WHERE o_orderkey % 7 = 0
        ), m AS (
          SELECT *,
                 (a2x - a1x) AS vx, (a2z - a1z) AS vz,
                 (b2x - b1x) AS qx, (b2z - b1z) AS qz,
                 (b1x - a1x) AS amcx, (b1z - a1z) AS amcz,
                 (px - a1x) AS tpx, (pz - a1z) AS tpz
          FROM c
        ), m2 AS (
          SELECT *,
                 (vz * qx - vx * qz) AS den0,
                 (tpx * vx + tpz * vz) AS dotv,
                 (vx * vx + vz * vz) AS len2,
                 ((a1z - pz) * vx - (a1x - px) * vz) AS scross,
                 ((px - a1x) * vx + (pz - a1z) * vz) AS rr
          FROM m
        ), m3 AS (
          SELECT *,
                 (amcz * qx - amcx * qz) * (1.0 / den0) AS t,
                 (amcz * vx - amcx * vz) * (1.0 / den0) AS s,
                 (a1x = b1x AND a1z = b1z) OR (a1x = b2x AND a1z = b2z)
                 OR (a2x = b1x AND a2z = b1z) OR (a2x = b2x AND a2z = b2z) AS shared
          FROM m2
        )
        SELECT k AS o_orderkey,
               0 > (pz - a1z) * (a2x - a1x) - (px - a1x) * (a2z - a1z) AS right_of,
               (len2 > tpx * tpx + tpz * tpz)
               AND (len2 > (a2x - px) * (a2x - px) + (a2z - pz) * (a2z - pz)) AS between,
               CAST(floor(sqrt(greatest((tpx * tpx + tpz * tpz) - dotv * dotv / len2, 0.0))
                          * 1000000.0 + 0.5) AS BIGINT) AS d_line_u6,
               CAST(floor(CASE
                 WHEN len2 = 0.0 THEN sqrt(tpx * tpx + tpz * tpz)
                 WHEN rr / len2 <= 0.0 THEN sqrt(tpx * tpx + tpz * tpz)
                 WHEN rr / len2 >= 1.0 THEN sqrt((px - a2x) * (px - a2x) + (pz - a2z) * (pz - a2z))
                 ELSE abs(scross / len2) * sqrt(len2) END * 1000000.0 + 0.5) AS BIGINT) AS d_seg_u6,
               CAST(floor((a1x + (rr / len2) * vx) * 1000000.0 + 0.5) AS BIGINT) AS proj_x_u6,
               CASE WHEN NOT shared AND NOT (den0 <= {_leps} AND den0 >= -{_leps})
                         AND t >= 0 AND t <= 1 AND s >= 0 AND s <= 1
                    THEN CAST(floor((a1x + t * vx) * 1000000.0 + 0.5) AS BIGINT) END AS ix_u6,
               CASE WHEN NOT shared AND NOT (den0 <= {_leps} AND den0 >= -{_leps})
                         AND t >= 0 AND t <= 1 AND s >= 0 AND s <= 1
                    THEN CAST(floor((a1z + t * vz) * 1000000.0 + 0.5) AS BIGINT) END AS iz_u6
        FROM m3
    """

    # mesh_flat_normals: the per-triangle-normal loop row-wise; every
    # op (sub, mul, sqrt, div) is correctly rounded IEEE, so both
    # engines produce identical doubles before the micro snap
    def _v(i):  # vertex component strings for index expression i
        return (
            f"CAST(({i}) AS DOUBLE)",
            f"(((k * 7 + ({i}) * 11) % 17) / 3.0)",
            f"CAST((({i}) % 2) AS DOUBLE)",
        )

    def _cn_sql(ax, ay, az, bx, by, bz):
        cx = f"(({ay}) * ({bz}) - ({az}) * ({by}))"
        cy = f"(({az}) * ({bx}) - ({ax}) * ({bz}))"
        cz = f"(({ax}) * ({by}) - ({ay}) * ({bx}))"
        ln = f"sqrt({cx} * {cx} + {cy} * {cy} + {cz} * {cz})"
        return (f"({cx} / {ln})", f"({cy} / {ln})", f"({cz} / {ln})")

    def _normal_sql(before):
        bx, by, bz = _v(before)
        ax, ay, az = _v("t + 1")
        fx, fy, fz = _v("t + 2")
        tb = (f"({bx} - {ax})", f"({by} - {ay})", f"({bz} - {az})")
        ta = (f"({fx} - {ax})", f"({fy} - {ay})", f"({fz} - {az})")
        fwd = _cn_sql(*tb, *ta)
        rev = _cn_sql(*ta, *tb)
        return fwd, rev

    (_sfx, _sfy, _sfz), (_srx, _sry, _srz) = _normal_sql("t")
    (_ffx, _ffy, _ffz), _ = _normal_sql("0")
    _u6 = "CAST(floor(({e}) * 1000000.0 + 0.5) AS BIGINT)"
    sql["mesh_flat_normals"] = f"""
        WITH o AS (
          SELECT o_orderkey AS k, CAST(o_orderkey % 5 + 3 AS INT) AS nv
          FROM orders WHERE o_orderkey % 13 = 0
        ), rows_ AS (
          SELECT k, nv, j.j, greatest(j.j, 2) - 2 AS t
          FROM o CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
          WHERE j.j < nv
        ), n AS (
          SELECT k, j,
                 [{_u6.format(e=f"CASE WHEN t % 2 = 0 THEN {_sfx} ELSE {_srx} END")},
                  {_u6.format(e=f"CASE WHEN t % 2 = 0 THEN {_sfy} ELSE {_sry} END")},
                  {_u6.format(e=f"CASE WHEN t % 2 = 0 THEN {_sfz} ELSE {_srz} END")}] AS sn,
                 [{_u6.format(e=_ffx)}, {_u6.format(e=_ffy)}, {_u6.format(e=_ffz)}] AS fn
          FROM rows_
        )
        SELECT k AS o_orderkey,
               flatten(list(sn ORDER BY j)) AS strip_n_u6,
               flatten(list(fn ORDER BY j)) AS fan_n_u6
        FROM n GROUP BY k
    """

    # smooth_normals: multimap-as-join — distinct (vertex, normal) with
    # the lowest adjacent tri, sorted-order component folds (seeded 0.0
    # like F.aggregate), arg_min fallback
    def _h(ix, iz):
        return f"((({ix}) * 7 + ({iz}) * 13) % 19) / 3.0"

    def _corner(ix, iz):
        return (f"CAST({ix} AS DOUBLE)", f"({_h(ix, iz)})", f"CAST({iz} AS DOUBLE)")

    _p00, _p10 = _corner("xi", "zi"), _corner("xi + 1", "zi")
    _p01, _p11 = _corner("xi", "zi + 1"), _corner("xi + 1", "zi + 1")

    def _tri_cols(v1, v2, v3):
        return ", ".join(
            f"{c} AS {n}"
            for vec, pre in ((v1, "v1"), (v2, "v2"), (v3, "v3"))
            for c, n in zip(vec, (f"{pre}x", f"{pre}y", f"{pre}z"))
        )

    _nx, _ny, _nz = _cn_sql(
        "(v2x - v1x)", "(v2y - v1y)", "(v2z - v1z)",
        "(v2x - v3x)", "(v2y - v3y)", "(v2z - v3z)",
    )
    _fold = "list_reduce(list_concat([CAST(0.0 AS DOUBLE)], {l}), (a, b) -> a + b)"
    sql["smooth_normals"] = f"""
        WITH o AS (
          SELECT o_orderkey AS k,
                 CAST(o_orderkey % 50 AS BIGINT) AS xi,
                 CAST((o_orderkey // 50) % 50 AS BIGINT) AS zi
          FROM orders WHERE o_orderkey % 29 = 0
        ), t0 AS (
          SELECT k * 2 AS tri_idx, {_tri_cols(_p00, _p10, _p01)} FROM o
          UNION ALL
          SELECT k * 2 + 1 AS tri_idx, {_tri_cols(_p10, _p11, _p01)} FROM o
        ), tn AS (
          SELECT tri_idx, v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z,
                 {_nx} AS nx, {_ny} AS ny, {_nz} AS nz
          FROM t0
        ), corners AS (
          SELECT tri_idx, nx, ny, nz,
                 unnest([v1x, v2x, v3x]) AS cx,
                 unnest([v1y, v2y, v3y]) AS cy,
                 unnest([v1z, v2z, v3z]) AS cz
          FROM tn
        ), adj AS (
          SELECT cx, cy, cz, nx, ny, nz, min(tri_idx) AS first_tri
          FROM corners GROUP BY cx, cy, cz, nx, ny, nz
        ), pv AS (
          SELECT cx, cy, cz,
                 {_fold.format(l="list(nx ORDER BY nx, ny, nz)")} AS sx,
                 {_fold.format(l="list(ny ORDER BY nx, ny, nz)")} AS sy,
                 {_fold.format(l="list(nz ORDER BY nx, ny, nz)")} AS sz,
                 arg_min(nx, first_tri) AS fx,
                 arg_min(ny, first_tri) AS fy,
                 arg_min(nz, first_tri) AS fz
          FROM adj GROUP BY cx, cy, cz
        )
        SELECT {_u6.format(e="cx")} AS vx_u6,
               {_u6.format(e="cy")} AS vy_u6,
               {_u6.format(e="cz")} AS vz_u6,
               {_u6.format(e="CASE WHEN sx*sx + sy*sy + sz*sz > 0.0 THEN sx / sqrt(sx*sx + sy*sy + sz*sz) ELSE fx END")} AS nx_u6,
               {_u6.format(e="CASE WHEN sx*sx + sy*sy + sz*sz > 0.0 THEN sy / sqrt(sx*sx + sy*sy + sz*sz) ELSE fy END")} AS ny_u6,
               {_u6.format(e="CASE WHEN sx*sx + sy*sy + sz*sz > 0.0 THEN sz / sqrt(sx*sx + sy*sy + sz*sz) ELSE fz END")} AS nz_u6
        FROM pv
    """

    # weighted_sample: same A-ES key arithmetic; ln() differs from the
    # JVM by at most 1 ulp, far below the random spacing between keys
    sql["weighted_sample"] = """
        WITH keyed AS (
          SELECT source, doc_id, n_chars,
                 ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0) / n_chars AS k,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                               + 0.5) / 4294967296.0) / n_chars DESC, doc_id
                 ) AS samp_rank
          FROM documents
        )
        SELECT source, doc_id, n_chars, CAST(samp_rank AS INT) AS samp_rank
        FROM keyed WHERE samp_rank <= 5
    """

    # bpe_merge_round: the same round rebuilt relationally — the merge
    # fold is list_reduce over single-element-wrapped symbols (the same
    # left fold as F.aggregate), the argmax the same ORDER BY LIMIT 1
    # bpe_batched_round: same word/pair CTEs as bpe_merge_round, then
    # the greedy conflict-free batch selection as a recursive CTE that
    # walks the top-16 candidates one rank at a time, carrying the
    # used-symbol list (a, b, and the merged string a||b of every
    # selection) — an independent rebuild of operators/bpe.select_batch.
    sql["bpe_batched_round"] = """
        WITH RECURSIVE w AS (
          SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(replace(text, chr(10), ' '), ' ')) AS word
            FROM documents
          ) WHERE word != '' GROUP BY word
        ), s AS (
          SELECT word, cnt,
                 list_transform(range(1, length(word) + 1), i ->
                   CASE WHEN i = length(word)
                        THEN substr(word, CAST(i AS INT), 1) || '</w>'
                        ELSE substr(word, CAST(i AS INT), 1) END) AS syms
          FROM w
        ), p AS (
          SELECT a, b, sum(cnt) AS weight FROM (
            SELECT cnt,
                   unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS a,
                   unnest(list_transform(range(1, len(syms)), i -> syms[i + 1])) AS b
            FROM s
          ) GROUP BY a, b
        ), cand AS (
          SELECT a, b, weight,
                 row_number() OVER (ORDER BY weight DESC, a, b) AS rn
          FROM p ORDER BY weight DESC, a, b LIMIT 16
        ), sel AS (
          SELECT 0 AS rn, CAST(NULL AS VARCHAR) AS m_a,
                 CAST(NULL AS VARCHAR) AS m_b, CAST(NULL AS BIGINT) AS w,
                 0 AS n_taken, CAST([] AS VARCHAR[]) AS used
          UNION ALL
          SELECT c.rn,
                 CASE WHEN (s.n_taken < 4 AND c.weight >= 2
                            AND NOT list_contains(s.used, c.a)
                            AND NOT list_contains(s.used, c.b)
                            AND NOT list_contains(s.used, c.a || c.b))
                      THEN c.a END,
                 CASE WHEN (s.n_taken < 4 AND c.weight >= 2
                            AND NOT list_contains(s.used, c.a)
                            AND NOT list_contains(s.used, c.b)
                            AND NOT list_contains(s.used, c.a || c.b))
                      THEN c.b END,
                 CASE WHEN (s.n_taken < 4 AND c.weight >= 2
                            AND NOT list_contains(s.used, c.a)
                            AND NOT list_contains(s.used, c.b)
                            AND NOT list_contains(s.used, c.a || c.b))
                      THEN c.weight END,
                 s.n_taken + CASE WHEN (s.n_taken < 4 AND c.weight >= 2
                            AND NOT list_contains(s.used, c.a)
                            AND NOT list_contains(s.used, c.b)
                            AND NOT list_contains(s.used, c.a || c.b))
                      THEN 1 ELSE 0 END,
                 CASE WHEN (s.n_taken < 4 AND c.weight >= 2
                            AND NOT list_contains(s.used, c.a)
                            AND NOT list_contains(s.used, c.b)
                            AND NOT list_contains(s.used, c.a || c.b))
                      THEN list_concat(s.used, [c.a, c.b, c.a || c.b])
                      ELSE s.used END
          FROM sel s JOIN cand c ON c.rn = s.rn + 1
        )
        SELECT CAST(row_number() OVER (ORDER BY rn) AS INT) AS rank,
               m_a, m_b, CAST(w AS BIGINT) AS weight
        FROM sel WHERE m_a IS NOT NULL
    """

    sql["bpe_merge_round"] = """
        WITH w AS (
          SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(replace(text, chr(10), ' '), ' ')) AS word
            FROM documents
          ) WHERE word != '' GROUP BY word
        ), s AS (
          SELECT word, cnt,
                 list_transform(range(1, length(word) + 1), i ->
                   CASE WHEN i = length(word)
                        THEN substr(word, CAST(i AS INT), 1) || '</w>'
                        ELSE substr(word, CAST(i AS INT), 1) END) AS syms
          FROM w
        ), p AS (
          SELECT a, b, sum(cnt) AS weight FROM (
            SELECT cnt,
                   unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS a,
                   unnest(list_transform(range(1, len(syms)), i -> syms[i + 1])) AS b
            FROM s
          ) GROUP BY a, b
        ), best AS (
          SELECT a AS m_a, b AS m_b FROM p ORDER BY weight DESC, a, b LIMIT 1
        ), applied AS (
          SELECT word, cnt, m_a, m_b,
                 CASE WHEN len(syms) <= 1 THEN syms ELSE
                   list_reduce(
                     list_concat([[syms[1]]],
                                 list_transform(list_slice(syms, 2, len(syms)), v -> [v])),
                     (acc, e) -> CASE WHEN acc[len(acc)] = m_a AND e[1] = m_b
                                      THEN list_concat(list_slice(acc, 1, len(acc) - 1),
                                                       [m_a || m_b])
                                      ELSE list_concat(acc, [e[1]]) END)
                 END AS s2
          FROM s CROSS JOIN best
        )
        SELECT word, cnt AS count, m_a, m_b,
               array_to_string(s2, '|') AS symbols_str,
               CAST(len(s2) AS INT) AS n_symbols
        FROM applied
    """

    # natural_linear: Sibson natural-neighbor interpolation has LINEAR
    # PRECISION (Sibson 1981) — over sites carrying the affine field
    # y = 3 + x/127 + z/255 every interior query interpolates to the
    # affine value itself, so the oracle is the closed form (the engine
    # earns agreement by actually computing stolen-area Sibson weights
    # over a distributed Bowyer-Watson triangulation)
    # cell_ids: DuckDB has no H3/S2 encoders, so the oracle is the
    # committed golden parquet frozen by tools/make_cell_ids_golden.py,
    # which validates tile ranges + z12<-z14 ancestry + cell-id
    # structure before writing; the encoders themselves are pinned by
    # the public test vectors in tests/test_cells.py and the row-for-row
    # sf_unit golden (tests/test_golden_parquet.py). Frozen at sf0.01,
    # the driver gate's scale.
    sql["cell_ids"] = """
        SELECT doc_id, span_idx, element_type, zoom, tile_x, tile_y,
               h3_r9, s2_l13
        FROM read_parquet('/root/repo/tests/golden/cell_ids/golden.parquet')
    """

    # natural_elevation: J9 Sibson over the sf0.01 clouds. DuckDB cannot
    # express incremental Delaunay, so the oracle is a committed golden
    # parquet frozen by tools/make_natural_golden.py — which validates
    # every sampled row against an INDEPENDENT windowed brute-Voronoi
    # stolen-area oracle (interior rows via Sibson linear precision to
    # 1e-5, edge rows via grid-counted weights); the same validation
    # runs in tests/test_natural_golden.py. The driver's correctness
    # gate runs at sf0.01, the scale the golden is frozen at.
    sql["natural_elevation"] = """
        SELECT q_id, ele_r
        FROM read_parquet('/root/repo/tests/golden/natural_elevation/golden.parquet')
    """

    sql["natural_linear"] = """
        SELECT CAST(c_custkey AS VARCHAR) AS q_id,
               CAST(floor((3.0 + (200.0 + (c_custkey * 37 % 6000) / 10.0) / 127.0
                               + (200.0 + (c_custkey * 53 % 6000) / 10.0) / 255.0)
                          * 1000000.0 + 0.5) AS BIGINT) AS ele_u6
        FROM customer WHERE c_custkey % 7 = 0
    """

    # parse_values: the oracle re-derives every parser output from the
    # generator parameters (kind, a, b) instead of re-running the regex
    # chain — an independent arithmetic derivation of ValueParseUtil
    # semantics. Unit constants are the reference's float32 literals as
    # exact doubles (1.609344f, 0.0254f). micro = floor(x*1e6+0.5).
    sql["parse_values"] = """
        WITH g AS (
          SELECT doc_id,
                 CAST((doc_id * 37) % 97 AS INT) AS a,
                 CAST(doc_id % 7 AS INT) AS b,
                 CAST(doc_id % 10 AS INT) AS kind
          FROM documents
        ), v AS (
          SELECT doc_id, a, b, kind,
                 CAST(a AS DOUBLE) + POWER(10.0, -1) * b AS ab,
                 CASE WHEN b % 2 = 0 THEN -1.0 ELSE 1.0 END AS sgn,
                 list_extract(['N','NNE','NE','ENE','E','ESE','SE','SSE',
                               'S','SSW','SW','WSW','W','WNW','NW','NNW'],
                              CAST(doc_id % 16 AS INT) + 1) AS rose_name,
                 list_extract([0.0,22.5,45.0,67.5,90.0,112.5,135.0,157.5,
                               180.0,202.5,225.0,247.5,270.0,292.5,315.0,337.5],
                              CAST(doc_id % 16 AS INT) + 1) AS rose_deg
          FROM g
        ), o AS (
          SELECT doc_id,
                 CASE kind
                   WHEN 0 THEN CAST(a AS VARCHAR)
                   WHEN 1 THEN '-' || a || '.' || b
                   WHEN 2 THEN a || ' km/h'
                   WHEN 3 THEN a || ' mph'
                   WHEN 4 THEN a || '.' || b || ' m'
                   WHEN 5 THEN a || ' km'
                   WHEN 6 THEN a || '''' || b || '"'
                   WHEN 7 THEN (CASE WHEN b % 2 = 0 THEN '-' ELSE '' END)
                               || a || '.' || b || ' %'
                   WHEN 8 THEN rose_name
                   ELSE 'v' || a
                 END AS raw,
                 CASE WHEN kind = 0 AND a > 0 THEN CAST(a AS DOUBLE)
                      WHEN kind = 2 THEN CAST(a AS DOUBLE)
                      WHEN kind = 3 THEN a * CAST(1.6093440055847168 AS DOUBLE)
                 END AS speed,
                 CASE WHEN kind = 0 AND a > 0 THEN CAST(a AS DOUBLE)
                      WHEN kind = 4 AND ab > 0 THEN ab
                      WHEN kind = 5 AND a > 0 THEN 1000.0 * a
                      WHEN kind = 6 THEN CAST(0.02539999969303608 AS DOUBLE) * (12 * a + b)
                 END AS measure,
                 CASE WHEN kind = 0 AND a > 0 THEN CAST(a AS DOUBLE)
                 END AS weight,
                 CASE WHEN kind = 7 THEN sgn * ab
                 END AS incline,
                 CASE WHEN kind = 0 THEN fmod(CAST(a AS DOUBLE), 360.0)
                      WHEN kind = 1 AND a = 0 AND b = 0 THEN 0.0
                      WHEN kind = 8 THEN rose_deg
                 END AS angle
          FROM v
        )
        SELECT doc_id, raw,
               CAST(FLOOR(speed * 1000000.0 + 0.5) AS BIGINT) AS speed_kmh_u,
               CAST(FLOOR(measure * 1000000.0 + 0.5) AS BIGINT) AS measure_m_u,
               CAST(FLOOR(weight * 1000000.0 + 0.5) AS BIGINT) AS weight_t_u,
               CAST(FLOOR(incline * 1000000.0 + 0.5) AS BIGINT) AS incline_pct_u,
               CAST(FLOOR(angle * 1000000.0 + 0.5) AS BIGINT) AS angle_deg_u
        FROM o
    """

    # perceptron_step: the full batch-perceptron epoch re-derived in
    # exact bigints — same wv model and md5 buckets as classify_docs,
    # labels length(text) % 3, +gold/-pred token-count update over the
    # misclassified set, bias deltas as bucket=-1, counts as bucket=-2.
    sql["perceptron_step"] = """
        WITH wv AS (
          SELECT b,
                 ((b * 2654435761) % 2001) - 1000 AS w0,
                 ((b * 2654435761 + 40503) % 2001) - 1000 AS w1,
                 ((b * 2654435761 + 81006) % 2001) - 1000 AS w2
          FROM (SELECT unnest(generate_series(0, 63)) AS b)
        ),
        tok AS (
          SELECT doc_id,
                 (('0x' || substr(md5(t.tok), 1, 8))::BIGINT) % 64 AS b
          FROM documents, unnest(string_split(text, ' ')) AS t(tok)
          WHERE t.tok != ''
        ),
        s AS (
          SELECT tok.doc_id, count(*) AS n_tokens,
                 sum(wv.w0) AS r0, sum(wv.w1) AS r1, sum(wv.w2) AS r2
          FROM tok JOIN wv ON wv.b = tok.b
          GROUP BY tok.doc_id
        ),
        pred AS (
          SELECT doc_id, n_tokens,
                 CASE
                   WHEN r0 - 25 * n_tokens >= r1 + 12 * n_tokens
                    AND r0 - 25 * n_tokens >= r2 - n_tokens THEN 0
                   WHEN r1 + 12 * n_tokens >= r2 - n_tokens THEN 1
                   ELSE 2 END AS p
          FROM s
        ),
        wrong AS (
          SELECT p.doc_id, p.n_tokens, length(d.text) % 3 AS y, p.p
          FROM pred p JOIN documents d USING (doc_id)
          WHERE p.p != length(d.text) % 3
        ),
        delt AS (
          SELECT tok.b,
                 sum((w.y = 0)::INT - (w.p = 0)::INT) AS d0,
                 sum((w.y = 1)::INT - (w.p = 1)::INT) AS d1,
                 sum((w.y = 2)::INT - (w.p = 2)::INT) AS d2
          FROM tok JOIN wrong w USING (doc_id)
          GROUP BY tok.b
        )
        SELECT CAST(wv.b AS BIGINT) AS bucket,
               CAST(wv.w0 + COALESCE(d.d0, 0) AS BIGINT) AS w0,
               CAST(wv.w1 + COALESCE(d.d1, 0) AS BIGINT) AS w1,
               CAST(wv.w2 + COALESCE(d.d2, 0) AS BIGINT) AS w2
        FROM wv LEFT JOIN delt d ON d.b = wv.b
        UNION ALL
        SELECT -1,
               CAST(COALESCE(sum(n_tokens * ((y = 0)::INT - (p = 0)::INT)), 0) AS BIGINT),
               CAST(COALESCE(sum(n_tokens * ((y = 1)::INT - (p = 1)::INT)), 0) AS BIGINT),
               CAST(COALESCE(sum(n_tokens * ((y = 2)::INT - (p = 2)::INT)), 0) AS BIGINT)
        FROM wrong
        UNION ALL
        SELECT -2, (SELECT count(*) FROM s), (SELECT count(*) FROM wrong), 0
    """

    # backoff_lm: Brants 2007 stupid backoff with min_count=2 pruning —
    # unigram + pruned bigram tables from the corpus itself, per-doc
    # fold of exact integer evidence for both branches.
    sql["backoff_lm"] = """
        WITH toks AS (
          SELECT doc_id, t.tok
          FROM documents, unnest(string_split(text, ' ')) AS t(tok)
          WHERE t.tok != ''
        ),
        uni AS (SELECT tok, count(*) AS uf FROM toks GROUP BY tok),
        grams AS (
          SELECT doc_id,
                 string_split(text, ' ')[i + 1] AS prev,
                 string_split(text, ' ')[i + 2] AS cur
          FROM documents,
               unnest(range(len(string_split(text, ' ')) - 1)) AS r(i)
          WHERE len(string_split(text, ' ')) >= 2
        ),
        bi AS (
          SELECT prev, cur, count(*) AS bf FROM grams
          GROUP BY prev, cur HAVING count(*) >= 2
        ),
        j AS (
          SELECT g.doc_id, b.bf, up.uf AS pf, uc.uf AS cf
          FROM grams g
          LEFT JOIN bi b ON b.prev = g.prev AND b.cur = g.cur
          JOIN uni up ON up.tok = g.prev
          JOIN uni uc ON uc.tok = g.cur
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum((bf IS NOT NULL)::INT) AS BIGINT) AS n_hits,
               CAST(sum((bf IS NULL)::INT) AS BIGINT) AS n_backoffs,
               CAST(COALESCE(sum(CASE WHEN bf IS NOT NULL THEN bf END), 0) AS BIGINT) AS sum_hit_num,
               CAST(COALESCE(sum(CASE WHEN bf IS NOT NULL THEN pf END), 0) AS BIGINT) AS sum_hit_den,
               CAST(COALESCE(sum(CASE WHEN bf IS NULL THEN cf END), 0) AS BIGINT) AS sum_backoff_num
        FROM j GROUP BY doc_id
    """

    # ccnet_buckets: the ngram_lm evidence re-derived, familiarity =
    # sum_freq / n_ngrams (exact-rational IEEE division on both
    # engines), fixed cutoffs 31.5 / 30.0 descending.
    sql["ccnet_buckets"] = f"""
        WITH grams AS (
          SELECT doc_id, unnest({bigram_list}) AS gram FROM documents
        ), counts AS (
          SELECT gram, count(*) AS freq FROM grams GROUP BY gram
        ), perdoc AS (
          SELECT g.doc_id,
                 CAST(sum(c.freq) AS BIGINT) AS sum_freq,
                 CAST(count(*) AS BIGINT) AS n_ngrams
          FROM grams g JOIN counts c USING (gram)
          GROUP BY g.doc_id
        )
        SELECT doc_id, sum_freq, n_ngrams,
               sum_freq * 1.0 / n_ngrams AS familiarity,
               CASE WHEN sum_freq * 1.0 / n_ngrams >= 31.5 THEN 'head'
                    WHEN sum_freq * 1.0 / n_ngrams >= 30.0 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM perdoc
    """

    # dedup_span_removal: the dup_spans CTE chain (k=4, min_count=2)
    # extended with coverage explode -> anti join -> ordered reassembly;
    # untouched docs come back whole via the left join, fully-duplicated
    # docs as ''.
    sql["dedup_span_removal"] = """
        WITH toks0 AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), g AS (
          SELECT doc_id, unnest(range(len(t) - 3)) AS pos, t
          FROM toks0 WHERE len(t) - 3 >= 1
        ), g2 AS (
          SELECT doc_id, pos,
                 array_to_string(list_slice(t, pos + 1, pos + 4), ' ') AS gk
          FROM g
        ), d AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY gk) AS cnt FROM g2
          ) WHERE cnt >= 2
        ), isl AS (
          SELECT doc_id, pos,
                 sum(CASE WHEN prev IS NULL OR pos > prev + 4 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM d
          )
        ), sp AS (
          SELECT doc_id, min(pos) AS tok_start, max(pos) + 4 AS tok_end
          FROM isl GROUP BY doc_id, island
        ), cov AS (
          SELECT DISTINCT doc_id, unnest(range(tok_start, tok_end)) AS pos
          FROM sp
        ), tp AS (
          SELECT doc_id, unnest(range(len(t))) AS pos, t FROM toks0
        ), kept AS (
          SELECT tp.doc_id, tp.pos, tp.t[tp.pos + 1] AS tok
          FROM tp ANTI JOIN cov USING (doc_id, pos)
        ), cl AS (
          SELECT doc_id, count(*) AS n_kept,
                 string_agg(tok, ' ' ORDER BY pos) AS text_clean
          FROM kept GROUP BY doc_id
        )
        SELECT t0.doc_id,
               CAST(len(t0.t) AS BIGINT) AS n_tokens,
               CAST(len(t0.t) - COALESCE(cl.n_kept, 0) AS BIGINT) AS n_removed,
               COALESCE(cl.text_clean, '') AS text_clean
        FROM toks0 t0 LEFT JOIN cl USING (doc_id)
    """

    # incremental_dedup: md5-prefix minhash signatures (k=8) for the old
    # corpus and the synthesized batch, 4 bands of 2, candidate = any
    # equal band slice, verify = agreeing positions, best old match per
    # new doc (ties to the smallest old_id).
    _sh3 = (
        "CASE WHEN len(string_split(text, ' ')) - 2 >= 1 THEN "
        "list_transform(range(len(string_split(text, ' ')) - 2), "
        "i -> string_split(text, ' ')[i+1] || ' ' || "
        "string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]) "
        "ELSE [text] END"
    )
    sql["incremental_dedup"] = f"""
        WITH newdocs AS (
          SELECT 'n' || doc_id AS doc_id,
                 CASE WHEN doc_id::BIGINT % 3 = 0 THEN text
                      WHEN doc_id::BIGINT % 3 = 1 THEN text || ' zz' || doc_id
                      ELSE 'novel' || doc_id ||
                           ' entirely fresh content ' || doc_id
                 END AS text
          FROM documents
        ),
        osh AS (
          SELECT DISTINCT doc_id, unnest({_sh3}) AS shingle FROM documents
        ),
        nsh AS (
          SELECT DISTINCT doc_id, unnest({_sh3}) AS shingle FROM newdocs
        ),
        osig AS (
          SELECT doc_id, s,
                 min(('0x' || substr(md5(s::VARCHAR || '|' || shingle), 1, 15))::BIGINT) AS h
          FROM osh, (SELECT unnest(range(8)) AS s) GROUP BY doc_id, s
        ),
        nsig AS (
          SELECT doc_id, s,
                 min(('0x' || substr(md5(s::VARCHAR || '|' || shingle), 1, 15))::BIGINT) AS h
          FROM nsh, (SELECT unnest(range(8)) AS s) GROUP BY doc_id, s
        ),
        ol AS (SELECT doc_id AS old_id, list(h ORDER BY s) AS sig FROM osig GROUP BY doc_id),
        nl AS (SELECT doc_id AS new_id, list(h ORDER BY s) AS sig FROM nsig GROUP BY doc_id),
        pairs AS (
          SELECT nl.new_id, ol.old_id,
                 (SELECT count(*) FROM (SELECT unnest(range(8)) AS i)
                  WHERE nl.sig[i + 1] = ol.sig[i + 1]) AS n_matches
          FROM nl, ol
          WHERE EXISTS (
            SELECT 1 FROM (SELECT unnest(range(4)) AS b)
            WHERE nl.sig[b * 2 + 1] = ol.sig[b * 2 + 1]
              AND nl.sig[b * 2 + 2] = ol.sig[b * 2 + 2]
          )
        ),
        hits AS (
          SELECT new_id, old_id, n_matches,
                 row_number() OVER (
                   PARTITION BY new_id
                   ORDER BY n_matches DESC, old_id ASC
                 ) AS rn
          FROM pairs WHERE n_matches >= 4
        )
        SELECT new_id, old_id,
               CAST(n_matches AS INT) AS n_matches,
               CAST(n_matches * 1000000 // 8 AS BIGINT) AS est_jaccard_u6
        FROM hits WHERE rn = 1
    """

    # hillshade_raster: the raster_gradients CTE chain + the
    # Zevenbergen-Thorne hillshade formula with the IDENTICAL
    # Python-evaluated illumination constants the operator embeds.
    import math as _math

    _zen = _math.radians(45.0)
    _az = _math.radians(360.0 - 315.0 + 90.0)
    sql["hillshade_raster"] = f"""
        WITH g AS (
          SELECT 13 AS cell_lon, 48 AS cell_lat,
                 CAST(i % 200 AS INT) AS px, CAST(i // 200 AS INT) AS py
          FROM range(40000) t(i)
        ), z AS (
          SELECT cell_lon, cell_lat, px, py,
                 CASE WHEN NOT ((px * 31 + py * 37) % 499 = 0)
                      THEN CAST((px * 7919 + py * 104729) % 1000 AS BIGINT) END AS zz
          FROM g
        ), d AS (
          SELECT cell_lon, cell_lat, px, py,
                 (CASE WHEN lead(px) OVER wx = px + 1 THEN lead(zz) OVER wx END
                  - CASE WHEN lag(px) OVER wx = px - 1 THEN lag(zz) OVER wx END) AS dzdx2,
                 (CASE WHEN lead(py) OVER wy = py + 1 THEN lead(zz) OVER wy END
                  - CASE WHEN lag(py) OVER wy = py - 1 THEN lag(zz) OVER wy END) AS dzdy2
          FROM z
          WINDOW wx AS (PARTITION BY cell_lon, cell_lat, py ORDER BY px),
                 wy AS (PARTITION BY cell_lon, cell_lat, px ORDER BY py)
        ), s AS (
          SELECT *,
                 CAST(dzdx2 AS DOUBLE) / 180.0 AS p,
                 CAST(dzdy2 AS DOUBLE) / 180.0 AS q
          FROM d
        ), sh AS (
          SELECT cell_lon, cell_lat, px, py, dzdx2, dzdy2,
                 255.0 * ({_math.cos(_zen)!r} * cos(atan(sqrt(p * p + q * q)))
                          + {_math.sin(_zen)!r} * sin(atan(sqrt(p * p + q * q)))
                            * cos({_az!r} - atan2(q, -p))) AS shade0
          FROM s
        )
        SELECT cell_lon, cell_lat, px, py, dzdx2, dzdy2,
               CAST(floor(CASE WHEN shade0 IS NOT NULL
                                THEN greatest(0.0, shade0) END * 1000.0 + 0.5)
                    AS BIGINT) AS shade_u3
        FROM sh
    """

    # contour_lines: the two-window corner assembly + the marching-
    # squares segment table GENERATED from the operator's own Python
    # table (segments_case_codes) — the two engines cannot disagree on
    # case topology.  Segments travel as seg*100 + ea*10 + eb integer
    # codes (DuckDB list-of-int unnest), decoded arithmetically.
    from osm2world_spark.operators.contours import (
        segments_case_codes as _ms_codes,
    )

    def _ms_when(kind: str, codes: list[int]) -> str:
        case, _, ctr = kind.partition("/")
        cond = f"ms_case = {case}"
        if ctr == "above":
            cond += " AND ms_center"
        elif ctr == "below":
            cond += " AND NOT ms_center"
        lst = "[" + ", ".join(str(c) for c in codes) + "]"
        return f"WHEN {cond} THEN CAST({lst} AS BIGINT[])"

    _ms_chain = "\n                 ".join(
        _ms_when(kind, codes) for kind, codes in _ms_codes() if codes
    )

    def _contour_cte(n: int, c: int, interval: int) -> str:
        """The g..dec CTE chain of the marching-squares pipeline over
        the paraboloid DEM, parameterized by grid size / center /
        interval — shared by contour_lines and contour_topology."""
        return f"""g AS (
          SELECT 13 AS cell_lon, 48 AS cell_lat,
                 CAST(i % {n} AS INT) AS px, CAST(i // {n} AS INT) AS py
          FROM range({n * n}) t(i)
        ), z AS (
          SELECT cell_lon, cell_lat, px, py,
                 CASE WHEN NOT ((px * 31 + py * 37) % 997 = 0)
                      THEN CAST(CAST(floor(((px - {c}) * (px - {c})
                               + (py - {c}) * (py - {c})) / 25.0) AS INT)
                           AS BIGINT) END AS zz
          FROM g
        ), r AS (
          SELECT cell_lon, cell_lat, px, py, zz AS z00,
                 CASE WHEN lead(px) OVER wx = px + 1
                      THEN lead(zz) OVER wx END AS z10
          FROM z
          WINDOW wx AS (PARTITION BY cell_lon, cell_lat, py ORDER BY px)
        ), c AS (
          SELECT cell_lon, cell_lat, px, py, z00, z10,
                 CASE WHEN lead(py) OVER wy = py + 1
                      THEN lead(z00) OVER wy END AS z01,
                 CASE WHEN lead(py) OVER wy = py + 1
                      THEN lead(z10) OVER wy END AS z11
          FROM r
          WINDOW wy AS (PARTITION BY cell_lon, cell_lat, px ORDER BY py)
        ), cc AS (
          SELECT * FROM c
          WHERE z00 IS NOT NULL AND z10 IS NOT NULL
            AND z01 IS NOT NULL AND z11 IS NOT NULL
        ), lv AS (
          SELECT cell_lon, cell_lat, px, py, z00, z10, z01, z11,
                 {interval} * unnest(range(
                   CAST(floor((least(z00, z10, z01, z11) + {interval - 1})
                        / {float(interval)}) AS BIGINT),
                   CAST(floor((greatest(z00, z10, z01, z11) + {interval - 1})
                        / {float(interval)}) AS BIGINT)
                 )) AS level
          FROM cc
        ), cs AS (
          SELECT *,
                 (CASE WHEN z00 > level THEN 1 ELSE 0 END
                  + CASE WHEN z10 > level THEN 2 ELSE 0 END
                  + CASE WHEN z11 > level THEN 4 ELSE 0 END
                  + CASE WHEN z01 > level THEN 8 ELSE 0 END) AS ms_case,
                 (z00 + z10 + z11 + z01 > 4 * level) AS ms_center
          FROM lv
        ), sg AS (
          SELECT *, unnest(CASE
                 {_ms_chain}
                 ELSE CAST([] AS BIGINT[]) END) AS segcode
          FROM cs
        ), dec AS (
          SELECT *, segcode // 100 AS seg,
                 (segcode // 10) % 10 AS ea, segcode % 10 AS eb
          FROM sg
        )
        SELECT cell_lon, cell_lat, px, py, level,
               CAST(seg AS INT) AS seg,
               CAST(ea AS INT) AS ea,
               level - (CASE WHEN ea = 1 THEN z10 WHEN ea = 2 THEN z01
                             ELSE z00 END) AS ta_num,
               (CASE WHEN ea = 0 THEN z10 - z00 WHEN ea = 1 THEN z11 - z10
                     WHEN ea = 2 THEN z11 - z01 ELSE z01 - z00 END) AS ta_den,
               CAST(eb AS INT) AS eb,
               level - (CASE WHEN eb = 1 THEN z10 WHEN eb = 2 THEN z01
                             ELSE z00 END) AS tb_num,
               (CASE WHEN eb = 0 THEN z10 - z00 WHEN eb = 1 THEN z11 - z10
                     WHEN eb = 2 THEN z11 - z01 ELSE z01 - z00 END) AS tb_den
        FROM dec
    """

    sql["contour_lines"] = "WITH " + _contour_cte(160, 80, 40)

    # contour_topology: the stitched-line pass (operators/contours.py
    # stitch_contours) — endpoint nodes keyed by GLOBAL grid-edge
    # identity, connected components, per-line ring/chain topology.
    # Spark runs pointer-doubled min-label propagation; the oracle
    # replays it as a DuckDB RECURSIVE min-label closure over the SAME
    # node-id packing ((level/I*2+orient)*2^20+ex)*2^20+ey — both are
    # exact integer fixpoints of the same component relation, so they
    # agree bit-for-bit.
    def _topology_sql(cte: str, interval: int) -> str:
        """The stitched-topology tail shared by contour_topology and
        contour_stitch_seam: endpoint nodes -> recursive min-label
        closure -> per-line ring/chain stats.  The seam query's 4-cell
        halo computation is node-for-node identical to the single
        global grid this replays (halo cells anchor nothing twice),
        which is exactly the property the query certifies."""
        return f"""
        WITH RECURSIVE segs AS (
          SELECT * FROM (WITH {cte})
        ), eps AS (
          SELECT px, py, level, seg, 0 AS e_end,
                 ((level // {interval} * 2
                   + CASE WHEN ea IN (1, 3) THEN 1 ELSE 0 END) * 1048576
                  + px + CASE WHEN ea = 1 THEN 1 ELSE 0 END) * 1048576
                 + py + CASE WHEN ea = 2 THEN 1 ELSE 0 END AS node
          FROM segs
          UNION ALL
          SELECT px, py, level, seg, 1 AS e_end,
                 ((level // {interval} * 2
                   + CASE WHEN eb IN (1, 3) THEN 1 ELSE 0 END) * 1048576
                  + px + CASE WHEN eb = 1 THEN 1 ELSE 0 END) * 1048576
                 + py + CASE WHEN eb = 2 THEN 1 ELSE 0 END AS node
          FROM segs
        ), seg_edges AS (
          SELECT a.node AS src, b.node AS dst
          FROM eps a JOIN eps b
            ON a.px = b.px AND a.py = b.py AND a.level = b.level
           AND a.seg = b.seg AND a.e_end = 0 AND b.e_end = 1
        ), bidir AS (
          SELECT src, dst FROM seg_edges
          UNION ALL SELECT dst, src FROM seg_edges
        ), reach(node, label) AS (
          SELECT node, node FROM (SELECT DISTINCT node FROM eps)
          UNION
          SELECT b.dst, r.label FROM reach r JOIN bidir b ON b.src = r.node
        ), labels AS (
          SELECT node, min(label) AS label FROM reach GROUP BY node
        ), deg AS (
          SELECT level, node, count(*) AS deg FROM eps GROUP BY level, node
        )
        SELECT l.label AS line_id,
               min(d.level) AS level,
               CAST(sum(d.deg) / 2 AS BIGINT) AS n_segments,
               count(*) AS n_nodes,
               CAST(sum(CASE WHEN d.deg = 1 THEN 1 ELSE 0 END) AS INT)
                 AS n_open_ends,
               (sum(CASE WHEN d.deg = 1 THEN 1 ELSE 0 END) = 0) AS closed
        FROM deg d JOIN labels l ON l.node = d.node
        GROUP BY l.label
        """

    sql["contour_topology"] = _topology_sql(_contour_cte(64, 32, 25), 25)
    sql["contour_stitch_seam"] = _topology_sql(_contour_cte(80, 40, 25), 25)

    # contour_vertices: the ordered-traversal twin of the topology
    # oracle — same endpoint-node CTEs, then a LINEAR recursive walk
    # from each line's canonical head (min open end for chains, min
    # node for rings; first step toward the min neighbor; ring walks
    # stop on re-entering the head).  The Spark side computes the same
    # sequence via O(log L) pointer jumping; level decodes back out of
    # the node pack (node // 2^40 // 2 * interval).
    sql["contour_vertices"] = f"""
        WITH RECURSIVE segs AS (
          SELECT * FROM (WITH {_contour_cte(48, 24, 15)})
        ), eps AS (
          SELECT px, py, level, seg, 0 AS e_end,
                 ((level // 15 * 2
                   + CASE WHEN ea IN (1, 3) THEN 1 ELSE 0 END) * 1048576
                  + px + CASE WHEN ea = 1 THEN 1 ELSE 0 END) * 1048576
                 + py + CASE WHEN ea = 2 THEN 1 ELSE 0 END AS node
          FROM segs
          UNION ALL
          SELECT px, py, level, seg, 1 AS e_end,
                 ((level // 15 * 2
                   + CASE WHEN eb IN (1, 3) THEN 1 ELSE 0 END) * 1048576
                  + px + CASE WHEN eb = 1 THEN 1 ELSE 0 END) * 1048576
                 + py + CASE WHEN eb = 2 THEN 1 ELSE 0 END AS node
          FROM segs
        ), seg_edges AS (
          SELECT a.node AS src, b.node AS dst
          FROM eps a JOIN eps b
            ON a.px = b.px AND a.py = b.py AND a.level = b.level
           AND a.seg = b.seg AND a.e_end = 0 AND b.e_end = 1
        ), bidir AS (
          SELECT src, dst FROM seg_edges
          UNION ALL SELECT dst, src FROM seg_edges
        ), reach(node, label) AS (
          SELECT node, node FROM (SELECT DISTINCT node FROM eps)
          UNION
          SELECT b.dst, r.label FROM reach r JOIN bidir b ON b.src = r.node
        ), labels AS (
          SELECT node, min(label) AS label FROM reach GROUP BY node
        ), deg AS (
          SELECT src AS node, count(*) AS deg FROM bidir GROUP BY src
        ), lines AS (
          SELECT l.label,
                 coalesce(min(CASE WHEN d.deg = 1 THEN d.node END),
                          min(d.node)) AS h
          FROM deg d JOIN labels l ON l.node = d.node
          GROUP BY l.label
        ), heads AS (
          SELECT li.label, li.h, min(b.dst) AS nbr_a
          FROM lines li JOIN bidir b ON b.src = li.h
          GROUP BY li.label, li.h
        ), walk(label, h, seq, src, dst) AS (
          SELECT label, h, CAST(1 AS BIGINT), h, nbr_a FROM heads
          UNION ALL
          SELECT w.label, w.h, w.seq + 1, w.dst, b.dst
          FROM walk w JOIN bidir b ON b.src = w.dst AND b.dst != w.src
          WHERE w.dst != w.h
        )
        SELECT label AS line_id,
               CAST((src // 1099511627776) // 2 * 15 AS BIGINT) AS level,
               seq, src, dst
        FROM walk
    """

    # warc_records: every fixture field re-derived arithmetically from
    # the record index (tools/make_warc_fixture.py is the shared truth).
    sql["warc_records"] = """
        WITH r AS (SELECT unnest(range(60)) AS i),
        f AS (
          SELECT i,
            CASE WHEN i = 0 THEN 'warcinfo'
                 WHEN i % 10 = 9 THEN 'request'
                 ELSE 'response' END AS warc_type,
            '<urn:test:' || lpad(CAST(i AS VARCHAR), 8, '0') || '>'
              AS record_id,
            CASE WHEN i = 0 THEN NULL
                 ELSE 'http://site' || CAST(i % 7 AS VARCHAR)
                      || '.example.org/page/' || CAST(i AS VARCHAR)
            END AS target_uri,
            '2026-07-' || lpad(CAST(1 + i % 28 AS VARCHAR), 2, '0')
              || 'T' || lpad(CAST(i % 24 AS VARCHAR), 2, '0')
              || ':00:00Z' AS warc_date,
            CASE WHEN i = 0 THEN 'software: fixture' || chr(13) || chr(10)
                 WHEN i % 10 = 9 THEN ''
                 ELSE '<html><head><title>Doc ' || CAST(i AS VARCHAR)
                      || ' &amp; Co</title></head><body><p>alpha '
                      || CAST(i AS VARCHAR) || ' beta</p><script>var x='
                      || CAST(i AS VARCHAR)
                      || ';</script><p>gamma &lt;tag&gt; delta '
                      || CAST(i * 7 % 97 AS VARCHAR)
                      || '</p><a href="/p/' || CAST(i AS VARCHAR)
                      || '">next</a></body></html>'
            END AS payload
          FROM r
        )
        SELECT record_id, warc_type, target_uri, warc_date,
               CAST(CASE WHEN warc_type = 'response'
                         THEN CASE WHEN i % 9 = 0 THEN 404 ELSE 200 END
                    END AS INT) AS http_status,
               CASE WHEN warc_type = 'response'
                    THEN 'text/html; charset=UTF-8' END
                 AS http_content_type,
               CAST(length(payload) AS BIGINT) AS payload_len,
               md5(payload) AS payload_md5
        FROM f
    """

    # html_extract: the regexp chain REGENERATED from the operator's
    # own constants, applied to the identically-reassembled markup.
    from osm2world_spark.operators.html import (
        _BLOCK_TAGS as _h_block,
        _DROP_TAGS as _h_drop,
        _NAMED_ENTITIES as _h_ents,
    )

    def _h_sq(s: str) -> str:
        return s.replace("'", "''")

    def _html_strip(expr: str) -> str:
        out = expr
        for t in _h_drop:
            out = (
                f"regexp_replace({out}, "
                f"'(?is)<{t}(\\s[^>]*)?>.*?</{t}\\s*>', ' ', 'g')"
            )
        out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
        out = (
            f"regexp_replace({out}, "
            f"'(?s)<!\\[CDATA\\[.*?\\]\\]>', ' ', 'g')"
        )
        out = (
            f"regexp_replace({out}, "
            f"'(?i)</?({_h_block})(\\s[^>]*|/)?>', chr(10), 'g')"
        )
        return f"regexp_replace({out}, '<[^>]*>', '', 'g')"

    def _html_ents(expr: str) -> str:
        out = expr
        for src, dst in _h_ents:
            out = f"replace({out}, '{_h_sq(src)}', '{_h_sq(dst)}')"
        return out

    def _html_ws(expr: str) -> str:
        out = (
            f"regexp_replace({expr}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
        )
        out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
        out = (
            f"regexp_replace({out}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
        )
        return f"regexp_replace({out}, '^\\s+|\\s+$', '', 'g')"

    _h_src = (
        "'<html><head><title>D' || CAST(doc_id AS VARCHAR)"
        " || ' &amp; T</title></head><body><p>' || text"
        " || '</p><!-- c --><script>var x=1;</script>"
        "<DIV>mid &lt;x&gt;</div><ul><li>one</li><li>two</li></ul>"
        "<a href=''/d/' || CAST(doc_id AS VARCHAR)"
        " || '''>l1</a><a href=\"/e/' || CAST(doc_id AS VARCHAR)"
        " || '\">l2</a>&#65;</body></html>'"
    )
    _h_title = (
        "regexp_extract(h, '(?is)<title[^>]*>(.*?)</title>', 1)"
    )
    sql["html_extract"] = f"""
        WITH src AS (
          SELECT doc_id, {_h_src} AS h FROM documents
        )
        SELECT doc_id,
               trim(regexp_replace({_html_ents(_h_title)},
                                   '\\s+', ' ', 'g')) AS title,
               {_html_ws(_html_ents(_html_strip("h")))} AS text,
               list_transform(
                 regexp_extract_all(h,
                   '(?i)href=(\"[^\"]*\"|''[^'']*'')', 1),
                 x -> substr(x, 2, length(x) - 2)) AS links
        FROM src
    """

    # jl_projection: the identical md5-derived sign matrix regenerated
    # here (jl_sign_matrix is pure hashlib), injected as a nested list
    # literal; exact bigint dot products on the u6 grid.
    from osm2world_spark.operators.similarity import jl_sign_matrix as _jlm

    _mat = _jlm(16, 64)
    _mat_sql = "[" + ", ".join(
        "[" + ", ".join(str(v) for v in row) + "]" for row in _mat
    ) + "]"
    sql["jl_projection"] = f"""
        WITH xu AS (
          SELECT vec_id,
                 list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS x
          FROM embeddings
        ), m AS (SELECT {_mat_sql} AS mm),
        rows AS (
          SELECT vec_id, j.j, i.i, mm[j.j + 1][i.i + 1] * x[i.i + 1] AS t
          FROM xu, m,
               (SELECT unnest(range(16)) AS j) j,
               (SELECT unnest(range(64)) AS i) i
        )
        SELECT vec_id, CAST(j AS INT) AS j, CAST(sum(t) AS BIGINT) AS y
        FROM rows GROUP BY vec_id, j
    """

    # embed_quantize: per-vector max-abs scale on the u6 grid; the
    # round-half-up rational through the same single IEEE division.
    sql["embed_quantize"] = """
        WITH xu AS (
          SELECT vec_id,
                 list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS x
          FROM embeddings
        ), s AS (
          SELECT vec_id, x,
                 list_max(list_transform(x, v -> abs(v))) AS scale
          FROM xu
        )
        SELECT vec_id,
               CAST(scale AS BIGINT) AS scale_u6,
               CAST(i.i AS INT) AS i,
               CAST(CASE WHEN scale > 0 THEN
                      floor(CAST(x[i.i + 1] * 254 + scale AS DOUBLE)
                            / (2.0 * CAST(scale AS DOUBLE)))
                    END AS INT) AS q
        FROM s, (SELECT unnest(range(64)) AS i) i
    """

    # geodesy_ops: bearing / haversine-fold perimeter / spherical
    # shoelace area restated with the IDENTICAL d2r literal, fold
    # order, and Python-evaluated R^2/2 constant.
    _d2r = "0.017453292519943295"
    _r2h = repr(6371008.8 * 6371008.8 / 2.0)

    def _hav(la1, lo1, la2, lo2):
        return (
            f"(2.0 * 6371008.8) * asin(sqrt(least("
            f"sin(({la2} * {_d2r} - {la1} * {_d2r}) / 2)"
            f" * sin(({la2} * {_d2r} - {la1} * {_d2r}) / 2)"
            f" + cos({la1} * {_d2r}) * cos({la2} * {_d2r})"
            f" * sin(({lo2} * {_d2r} - {lo1} * {_d2r}) / 2)"
            f" * sin(({lo2} * {_d2r} - {lo1} * {_d2r}) / 2), 1.0)))"
        )

    def _cd_term(la1, lo1, la2, lo2):
        return (
            f"({lo2} * {_d2r} - {lo1} * {_d2r})"
            f" * (2.0 + sin({la1} * {_d2r}) + sin({la2} * {_d2r}))"
        )

    sql["geodesy_ops"] = f"""
        WITH p AS (
          SELECT o_orderkey AS key,
                 {LAT.format(k="o_orderkey")} AS la1, {LON.format(k="o_orderkey")} AS lo1,
                 {LAT.format(k="o_orderkey * 3 + 1")} AS la2, {LON.format(k="o_orderkey * 3 + 1")} AS lo2,
                 {LAT.format(k="o_orderkey * 7 + 2")} AS la3, {LON.format(k="o_orderkey * 7 + 2")} AS lo3,
                 {LAT.format(k="o_custkey")} AS lab, {LON.format(k="o_custkey")} AS lob
          FROM orders
        )
        SELECT key,
               round(((atan2(
                   sin(lob * {_d2r} - lo1 * {_d2r}) * cos(lab * {_d2r}),
                   cos(la1 * {_d2r}) * sin(lab * {_d2r})
                   - sin(la1 * {_d2r}) * cos(lab * {_d2r})
                     * cos(lob * {_d2r} - lo1 * {_d2r})
                 ) / {_d2r}) % 360.0 + 360.0) % 360.0, 6) AS bearing_deg,
               round({_hav("la1", "lo1", "la2", "lo2")}
                     + {_hav("la2", "lo2", "la3", "lo3")}
                     + {_hav("la3", "lo3", "la1", "lo1")}, 6) AS perimeter_m,
               round(abs({_cd_term("la1", "lo1", "la2", "lo2")}
                         + {_cd_term("la2", "lo2", "la3", "lo3")}
                         + {_cd_term("la3", "lo3", "la1", "lo1")})
                     * {_r2h}, 3) AS area_m2
        FROM p
    """

    # curate_model_gate: the curate oracle extended with the classifier
    # and LM gate CTEs over the same synthesized text — keep_all =
    # rule AND model AND not-tail, then the identical dedup / split /
    # pack chain.
    sql["curate_model_gate"] = f"""
        WITH built AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN 'tiny.'
                      ELSE 'the steady data rows that have to be of and with all these words here '
                           || (doc_id % 7)::VARCHAR || ' '
                           || repeat('extra word here ', CAST(doc_id % 13 AS INT))
                           || 'end.' END AS g
          FROM documents
        ), m AS (
          SELECT doc_id, g,
                 string_split(replace(g, chr(10), ' '), ' ') AS words,
                 string_split(g, chr(10)) AS lines,
                 ' ' || replace(g, chr(10), ' ') || ' ' AS pad
          FROM built
        ), v AS (
          SELECT doc_id, g,
                 len(words) AS n_words,
                 CAST(length(g) - (len(words) - 1) AS DOUBLE) / len(words) AS mean_len,
                 CAST((length(g) - length(replace(g, '#', '')))
                      + CAST((length(g) - length(replace(g, '...', ''))) / 3 AS BIGINT) AS DOUBLE)
                   / len(words) AS sym_ratio,
                 CAST(len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* '))) AS DOUBLE)
                   / len(lines) AS bul_ratio,
                 CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE)
                   / len(lines) AS ell_ratio,
                 CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                   / len(words) AS alpha_ratio,
                 {_gstops} AS n_stop
          FROM m
        ), kq AS (
          SELECT doc_id, g,
                 ((n_words >= 10 AND n_words <= 100000)
                  AND (mean_len >= 3.0 AND mean_len <= 10.0)
                  AND sym_ratio <= 0.1 AND bul_ratio <= 0.9 AND ell_ratio <= 0.3
                  AND alpha_ratio >= 0.8 AND n_stop >= 2) AS keep_quality
          FROM v
        ), wv AS (
          SELECT b,
                 ((b * 2654435761) % 2001) - 1000 AS w0,
                 ((b * 2654435761 + 40503) % 2001) - 1000 AS w1,
                 ((b * 2654435761 + 81006) % 2001) - 1000 AS w2
          FROM (SELECT unnest(generate_series(0, 63)) AS b)
        ), tokc AS (
          SELECT doc_id,
                 (('0x' || substr(md5(t.tok), 1, 8))::BIGINT) % 64 AS b
          FROM built, unnest(string_split(g, ' ')) AS t(tok)
          WHERE t.tok != ''
        ), sc AS (
          SELECT tokc.doc_id, count(*) AS n,
                 sum(wv.w0) AS r0, sum(wv.w1) AS r1, sum(wv.w2) AS r2
          FROM tokc JOIN wv ON wv.b = tokc.b
          GROUP BY tokc.doc_id
        ), lbl AS (
          SELECT doc_id,
                 (NOT (r0 >= r1 + 197 * n AND r0 >= r2 - 100000 * n))
                 AND (r1 + 197 * n >= r2 - 100000 * n) AS keep_model
          FROM sc
        ), gramsb AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(string_split(g, ' ')) - 1 >= 1 THEN
                   list_transform(range(len(string_split(g, ' ')) - 1),
                     i -> string_split(g, ' ')[i+1] || ' ' || string_split(g, ' ')[i+2])
                   ELSE [g] END) AS gram
          FROM built
        ), countsb AS (
          SELECT gram, count(*) AS freq FROM gramsb GROUP BY gram
        ), lmb AS (
          SELECT gb.doc_id,
                 CASE WHEN CAST(sum(cb.freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 1400.0 THEN 'head'
                      WHEN CAST(sum(cb.freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 300.0 THEN 'middle'
                      ELSE 'tail' END AS lm_bucket
          FROM gramsb gb JOIN countsb cb USING (gram)
          GROUP BY gb.doc_id
        ), gated AS (
          SELECT kq.doc_id, kq.g, kq.keep_quality,
                 coalesce(lbl.keep_model, false) AS keep_model,
                 coalesce(lmb.lm_bucket, 'tail') AS lm_bucket
          FROM kq LEFT JOIN lbl USING (doc_id) LEFT JOIN lmb USING (doc_id)
        ), dd AS (
          SELECT doc_id, g, keep_quality, keep_model, lm_bucket,
                 coalesce((keep_quality AND keep_model AND lm_bucket != 'tail')
                   AND doc_id = min(CASE WHEN keep_quality AND keep_model
                                          AND lm_bucket != 'tail'
                                    THEN doc_id END) OVER (PARTITION BY g),
                   false) AS is_canonical
          FROM gated
        ), sp AS (
          SELECT doc_id, g, keep_quality, keep_model, lm_bucket, is_canonical,
                 CASE WHEN is_canonical THEN
                   CASE WHEN {_u32.format(c="doc_id")} / 4294967296.0 < 0.1
                        THEN 'val' ELSE 'train' END
                 END AS split,
                 CAST({_u32.format(c="doc_id")} % 8 AS INT) AS bkt,
                 CAST(length(g) - length(replace(g, ' ', '')) + 1 AS BIGINT) AS ntok
          FROM dd
        ), ctb AS (
          SELECT *, CASE WHEN split = 'train' THEN ntok ELSE 0 END AS contrib
          FROM sp
        )
        SELECT doc_id, keep_quality, keep_model, lm_bucket, is_canonical, split,
               CASE WHEN split = 'train' THEN bkt END AS bucket,
               CASE WHEN split = 'train' THEN
                 CAST(floor((sum(contrib) OVER w - contrib) / 128.0) AS BIGINT)
               END AS bin_id,
               CASE WHEN split = 'train' THEN ntok END AS n_tokens
        FROM ctb
        WINDOW w AS (PARTITION BY bkt ORDER BY contrib DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """

    # building_heights: the oracle re-derives every parsed tag value
    # from the generator parameters (doc_id arithmetic) and replays the
    # LevelAndHeightData.java:108-222 chain in CASE form — an
    # independent arithmetic derivation, never re-running the Column
    # code.  Parser constraints are honoured where the generator can
    # hit them: roof:height "0" fails parseMeasure's POSITIVE
    # constraint (trh gated b6>0); the k=8 "bogus" height falls through
    # to est_height (WorldModuleParseUtil.java:141-153).
    _bh_types_sql = ", ".join(f"'{t}'" for t in _BH_TYPES)
    _bh_shapes_sql = ", ".join(f"'{s}'" for s in _BH_SHAPES)
    sql["building_heights"] = f"""
        WITH g AS (
          SELECT doc_id,
                 list_extract([{_bh_types_sql}],
                              CAST(doc_id % 15 AS INT) + 1) AS bt,
                 CAST(doc_id % 8 AS INT) AS shi,
                 CAST(doc_id % 11 AS INT) AS k,
                 10.0 + CAST(doc_id % 9 AS INT) AS diameter
          FROM documents
        ), t AS (
          SELECT *,
                 CASE WHEN shi >= 1
                      THEN list_extract([{_bh_shapes_sql}], shi) END AS shape_tag,
                 (k = 10 OR bt = 'chimney') AS is_chimney,
                 (k = 9) AS multistorey,
                 CASE WHEN k = 1 THEN CAST(doc_id % 7 AS DOUBLE)
                      WHEN k = 2 THEN CAST(doc_id % 5 AS DOUBLE) + 0.5 END AS parsed_levels,
                 CASE WHEN k = 3 THEN CAST(doc_id % 40 + 2 AS DOUBLE)
                      WHEN k = 4 THEN CAST(doc_id % 30 + 4 AS DOUBLE)
                      WHEN k = 5 THEN CAST(doc_id % 25 + 3 AS DOUBLE)
                      WHEN k = 8 THEN CAST(doc_id % 12 + 1 AS DOUBLE)
                      WHEN k = 10 THEN CAST(doc_id % 60 + 20 AS DOUBLE) END AS th,
                 CASE WHEN k = 4 AND doc_id % 6 > 0
                      THEN CAST(doc_id % 6 AS DOUBLE) END AS trh,
                 CASE WHEN k = 5 THEN CAST(doc_id % 4 AS INT) ELSE 0 END AS b_min,
                 CASE WHEN k = 7 THEN CAST(doc_id % 3 AS INT) ELSE 0 END AS ug,
                 CAST(doc_id % 3 AS INT) AS rl,
                 CASE WHEN k = 7 THEN CAST(doc_id % 5 AS DOUBLE) + 0.5 END AS tmh
          FROM g
        ), d AS (
          SELECT *,
                 CASE WHEN is_chimney THEN 1
                      WHEN multistorey THEN 5
                      WHEN bt IN ('greenhouse','garage','garages','carport',
                                  'hut','shed','cabin','roof') THEN 1
                      ELSE 3 END AS d_levels,
                 CASE WHEN is_chimney THEN 10.0 ELSE 2.5 END AS d_hpl,
                 COALESCE(shape_tag,
                          CASE WHEN is_chimney THEN 'chimney'
                               ELSE 'flat' END) AS roof_shape,
                 (bt NOT IN ('carport', 'roof')) AS d_walls,
                 CASE WHEN b_min > 0 THEN b_min
                      ELSE LEAST(b_min, -ug) END AS mlwu0,
                 COALESCE(th, 0.0) - COALESCE(trh, 0.0) AS thwr
          FROM t
        ), lv AS (
          SELECT *,
                 CASE WHEN parsed_levels IS NOT NULL
                        THEN GREATEST(0, CAST(CEIL(parsed_levels) AS INT))
                      WHEN th IS NOT NULL AND trh IS NOT NULL AND th <= trh
                        THEN 0
                      WHEN trh IS NOT NULL AND thwr > 0
                        THEN GREATEST(mlwu0 + 1,
                               GREATEST(1, CAST(FLOOR(thwr / d_hpl) AS INT)))
                      WHEN mlwu0 > 0 THEN mlwu0 + 1
                      ELSE d_levels END AS levels
          FROM d
        ), rf AS (
          SELECT *,
                 COALESCE(
                   COALESCE(
                     -- FlatRoof is the createRoofForShape DEFAULT
                     -- (Roof.java:134): only shapes with their own
                     -- class are non-flat
                     CASE WHEN roof_shape NOT IN
                            ('pyramidal','onion','skillion','saltbox',
                             'gabled','hipped','side_hipped','half-hipped',
                             'side_half-hipped','gambrel','mansard',
                             'sawtooth','dome','round','cone','complex')
                          THEN 0.0
                          ELSE trh END,
                     CASE WHEN levels = 0 AND COALESCE(th, 0.0) > 0
                          THEN th END),
                   CASE WHEN k = 6 THEN d_hpl * rl END,
                   CASE WHEN roof_shape = 'dome' THEN diameter / 2.0 END,
                   CASE WHEN levels = 1 THEN 1.0 END,
                   5.0) AS rh
          FROM lv
        ), hh AS (
          SELECT *,
                 CASE WHEN rh = 0 THEN 0
                      WHEN k = 6 THEN rl ELSE 1 END AS roof_levels,
                 GREATEST(COALESCE(th, CAST(levels AS DOUBLE) * d_hpl + rh),
                          0.01) AS height
          FROM rf
        ), fin AS (
          SELECT *,
                 CASE WHEN levels + roof_levels < mlwu0 + 1
                      THEN levels + roof_levels - 1
                      ELSE mlwu0 END AS mlwu,
                 FLOOR((height - rh) * 10000.0 + 0.5) / 10000.0 AS hwr
          FROM hh
        ), mh AS (
          SELECT *,
                 COALESCE(tmh,
                          CASE WHEN b_min > 0
                               THEN (hwr / CAST(levels AS DOUBLE))
                                    * CAST(b_min AS DOUBLE) END,
                          CASE WHEN NOT d_walls THEN hwr - 0.3 END,
                          0.0) AS minh0
          FROM fin
        )
        SELECT doc_id,
               bt AS btype,
               roof_shape,
               levels AS building_levels,
               roof_levels,
               mlwu AS min_level_wu,
               CAST(FLOOR(height * 1000000.0 + 0.5) AS BIGINT) AS height_u,
               CAST(FLOOR(rh * 1000000.0 + 0.5) AS BIGINT) AS roof_height_u,
               CAST(FLOOR(hwr * 1000000.0 + 0.5) AS BIGINT) AS hwr_u,
               CAST(FLOOR((CASE WHEN minh0 > hwr THEN hwr - 0.1
                                ELSE minh0 END) * 1000000.0 + 0.5)
                    AS BIGINT) AS min_height_u
        FROM mh
    """

    # road_widths: independent arithmetic re-derivation of the
    # RoadModule chain from the generator parameters.  The float32 lane
    # accumulation (RoadModule.java:1236-1253) is replayed with
    # list_reduce over the SAME leftmost-to-rightmost lane order,
    # narrowing to REAL after every add.  D/K literals are the
    # reference's 0.1f/0.15f promoted to double.
    _rw_hws_sql = ", ".join(f"'{h}'" for h in _RW_HIGHWAYS)
    _D = "0.10000000149011612"
    _K = "0.15000000596046448"
    sql["road_widths"] = f"""
        WITH g AS (
          SELECT doc_id,
                 list_extract([{_rw_hws_sql}], CAST(doc_id % 16 AS INT) + 1) AS hw,
                 CAST(doc_id % 12 AS INT) AS k,
                 CAST(doc_id % 3 AS INT) AS a3,
                 CAST(doc_id % 5 AS INT) AS a5,
                 CAST(doc_id % 9 AS INT) AS a9,
                 CAST(doc_id % 2 AS INT) AS a2,
                 CAST(doc_id % 4 AS INT) AS a4
          FROM documents
        ), f AS (
          SELECT *,
                 (k = 5) OR hw IN ('motorway', 'motorway_link') AS oneway,
                 (hw = 'steps') AS steps,
                 (k = 7 AND a3 <> 1) AS unmarked,
                 (k IN (1, 5, 6, 8, 10)) AS has_lane_info,
                 CASE WHEN k = 1 THEN a5 + 1 WHEN k = 5 THEN a3 + 1
                      WHEN k = 8 THEN 4 END AS lanes_val,
                 CASE WHEN k IN (6, 10) THEN a3 + 1 END AS lanes_r,
                 CASE WHEN k = 10 THEN 1
                      WHEN k = 6 AND a3 > 0 THEN a3 END AS lanes_l,
                 CASE WHEN k = 8 THEN
                   list_extract(['dashed_line','solid_line','no'], a3 + 1)
                 ELSE '' END AS divider,
                 CASE WHEN hw IN ('path','footway','cycleway','bridleway','steps')
                          OR ends_with(hw, '_link')
                          OR hw IN ('service','track','residential',
                                    'living_street','pedestrian','platform')
                      THEN 1
                      WHEN hw = 'motorway' THEN 2
                      WHEN (k = 5) OR hw = 'motorway' THEN 1
                      ELSE 2 END AS dflt_lanes,
                 (k = 4) AS cw_l, (k = 4) AS cw_r,
                 (k = 9 AND a3 IN (0, 2)) AS bb_l,
                 (k = 9 AND a3 IN (1, 2)) AS bb_r,
                 ((k = 3 AND a3 IN (0, 2)) OR k = 11) AS sw_l,
                 ((k = 3 AND a3 IN (1, 2)) OR k = 11) AS sw_r,
                 NOT (k = 11 AND a2 = 0) AS kerb_l,
                 TRUE AS kerb_r,  -- right kerb merges left/right keys only (:1056-1058); neither is generated
                 CASE WHEN k = 11 THEN 2.5 END AS sw_w_l,
                 CAST(NULL AS DOUBLE) AS sw_w_r
          FROM g
        ), c AS (
          SELECT *,
                 COALESCE(lanes_val, dflt_lanes) AS vlc_base
          FROM f
        ), c2 AS (
          SELECT *,
                 CASE WHEN lanes_r IS NOT NULL THEN lanes_r
                      WHEN lanes_l IS NOT NULL
                        THEN GREATEST(vlc_base, lanes_l) - lanes_l
                      ELSE vlc_base - CAST(FLOOR(vlc_base / 2.0) AS INT)
                 END AS vlc_r,
                 CASE WHEN lanes_r IS NOT NULL AND lanes_l IS NOT NULL
                        THEN lanes_l
                      WHEN lanes_r IS NOT NULL
                        THEN GREATEST(vlc_base, lanes_r) - lanes_r
                      WHEN lanes_l IS NOT NULL THEN lanes_l
                      ELSE CAST(FLOOR(vlc_base / 2.0) AS INT)
                 END AS vlc_l
          FROM c
        ), d AS (
          SELECT *,
                 (vlc_r > 0 AND vlc_l > 0 AND
                  (divider = 'dashed_line' OR divider = 'solid_line'
                   OR (divider <> 'no' AND NOT unmarked))) AS center_present
          FROM c2
        ), l AS (
          SELECT *,
                 -- ordered resolved-width lists (NULL = unknown V/B width)
                 flatten([CASE WHEN j > 0 AND NOT unmarked
                               THEN [CAST({_D} AS DOUBLE),
                                     CASE WHEN k = 10 THEN CAST(3 + (doc_id + j) % 4 AS DOUBLE) END]
                               ELSE [CASE WHEN k = 10 THEN CAST(3 + (doc_id + j) % 4 AS DOUBLE) END]
                          END for j in range(0, vlc_r)]) AS part_r,
                 flatten([CASE WHEN j > 0 AND NOT unmarked
                               THEN [CAST({_D} AS DOUBLE),
                                     CASE WHEN k = 10 THEN CAST(3.5 AS DOUBLE) END]
                               ELSE [CASE WHEN k = 10 THEN CAST(3.5 AS DOUBLE) END]
                          END for j in range(0, vlc_l)]) AS part_l,
                 flatten([[CAST({_D} AS DOUBLE)] for j in range(0, CASE WHEN vlc_r > 1 AND NOT unmarked THEN vlc_r - 1 ELSE 0 END)]) AS div_only_r,
                 flatten([[CAST({_D} AS DOUBLE)] for j in range(0, CASE WHEN vlc_l > 1 AND NOT unmarked THEN vlc_l - 1 ELSE 0 END)]) AS div_only_l
          FROM d
        ), l2 AS (
          SELECT *,
                 CASE WHEN cw_l THEN [CAST({_D} AS DOUBLE), 1.5] ELSE [] END
                 || CASE WHEN bb_l THEN [CAST({_D} AS DOUBLE), CAST(NULL AS DOUBLE)] ELSE [] END
                 || CASE WHEN sw_l AND kerb_l THEN [CAST({_K} AS DOUBLE)] ELSE [] END
                 || CASE WHEN sw_l THEN [COALESCE(sw_w_l, 1.0)] ELSE [] END AS spec_l,
                 CASE WHEN cw_r THEN [CAST({_D} AS DOUBLE), 1.5] ELSE [] END
                 || CASE WHEN bb_r THEN [CAST({_D} AS DOUBLE), CAST(NULL AS DOUBLE)] ELSE [] END
                 || CASE WHEN sw_r AND kerb_r THEN [CAST({_K} AS DOUBLE)] ELSE [] END
                 || CASE WHEN sw_r THEN [COALESCE(sw_w_r, 1.0)] ELSE [] END AS spec_r,
                 CASE WHEN center_present THEN [CAST({_D} AS DOUBLE)] ELSE [] END AS ctr
          FROM l
        ), l3 AS (
          SELECT *,
                 list_reverse(part_l || spec_l) || ctr || part_r || spec_r AS ltr,
                 list_reverse(div_only_l || spec_l) || ctr || div_only_r || spec_r AS ltr_nv
          FROM l2
        ), w AS (
          SELECT *,
                 (len(list_filter(ltr, x -> x IS NULL)) = 0) AS known_ok,
                 CAST(list_reduce(list_prepend(CAST(0.0 AS REAL), CAST(ltr AS DOUBLE[])),
                      (a, x) -> CAST(CAST(a AS DOUBLE) + x AS REAL)) AS DOUBLE) AS sum_known,
                 CAST(list_reduce(list_prepend(CAST(0.0 AS REAL),
                        CAST(list_transform(ltr, x -> COALESCE(x, 3.5)) AS DOUBLE[])),
                      (a, x) -> CAST(CAST(a AS DOUBLE) + x AS REAL)) AS DOUBLE) AS sum_dflt,
                 CAST(list_reduce(list_prepend(CAST(0.0 AS REAL),
                        CAST(list_transform(ltr_nv, x -> COALESCE(x, 3.5)) AS DOUBLE[])),
                      (a, x) -> CAST(CAST(a AS DOUBLE) + x AS REAL)) AS DOUBLE) AS sum_nv,
                 CASE WHEN k = 2 THEN (3 + a9) + 0.5 END AS explicit_w,
                 CASE WHEN hw IN ('path','footway','cycleway','bridleway','steps') THEN 1.0
                      WHEN hw = 'track' THEN 2.5
                      WHEN hw = 'service' THEN 3.5
                      WHEN hw IN ('primary','secondary') THEN 7.0
                      WHEN hw = 'motorway' THEN 8.75
                      WHEN k = 5 THEN 3.5
                      ELSE 4.0 END AS est
          FROM l3
        )
        SELECT doc_id,
               hw AS highway,
               oneway,
               unmarked AS unmarked_lanes,
               vlc_r AS n_lanes_forward,
               vlc_l AS n_lanes_backward,
               vlc_r + vlc_l AS n_lanes,
               CASE WHEN NOT center_present THEN NULL
                    WHEN divider = 'dashed_line' THEN 'dashed_line'
                    WHEN divider = 'solid_line' THEN 'solid_line'
                    ELSE 'dashed_line' END AS centre_divider,
               CAST(FLOOR(
                 (CASE WHEN steps THEN COALESCE(explicit_w, 1.0)
                       ELSE COALESCE(CASE WHEN known_ok THEN sum_known END,
                                     explicit_w,
                                     CASE WHEN has_lane_info THEN sum_dflt END,
                                     sum_nv + est)
                  END) * 1000000.0 + 0.5) AS BIGINT) AS width_u
        FROM w
    """

    # barrier_dims: BarrierModule.java:64-98 dispatch + :142-148
    # parse-or-default, re-derived in CASE form with the exact
    # float-literal defaults.
    _bar_vals_sql = ", ".join(f"'{v}'" for v in _BAR_VALUES)
    _bar_fts_sql = ", ".join(f"'{v}'" for v in _BAR_FENCE_TYPES)
    sql["barrier_dims"] = f"""
        WITH g AS (
          SELECT doc_id,
                 list_extract([{_bar_vals_sql}], CAST(doc_id % 16 AS INT) + 1) AS bval,
                 list_extract([{_bar_fts_sql}], CAST(doc_id % 6 AS INT) + 1) AS ft0,
                 CAST(doc_id % 4 AS INT) AS k
          FROM documents
        ), t AS (
          SELECT *,
                 CASE WHEN bval = 'fence' THEN ft0 END AS ft
          FROM g
        ), d AS (
          SELECT *,
                 CASE WHEN bval = 'wall' THEN 'wall'
                      WHEN bval = 'city_wall' THEN 'city_wall'
                      WHEN bval = 'hedge' THEN 'hedge'
                      WHEN bval = 'fence' AND ft = 'railing' THEN 'railing'
                      WHEN bval = 'fence' AND ft = 'balustrade' THEN 'balustrade'
                      WHEN bval = 'fence' AND ft IN ('chain_link','metal')
                        THEN 'chain_link_fence'
                      WHEN bval = 'cable_barrier' THEN 'cable_barrier'
                      WHEN bval = 'handrail' THEN 'handrail'
                      WHEN bval = 'guard_rail' THEN 'guardrail'
                      WHEN bval = 'jersey_barrier' THEN 'jersey_barrier'
                      WHEN bval = 'fence' AND ft = 'trellis_work'
                        THEN 'trellis_work_fence'
                      WHEN bval = 'fence' THEN 'pole_fence'
                      WHEN bval = 'bollard' THEN 'bollard_row'
                      WHEN bval = 'chain' THEN 'chain_row'
                 END AS kind
          FROM t
        ), w AS (
          SELECT *,
                 CASE kind WHEN 'city_wall' THEN 10.0
                           WHEN 'guardrail' THEN 0.75
                           WHEN 'jersey_barrier' THEN 1.1449999809265137
                           WHEN 'trellis_work_fence' THEN 0.699999988079071
                           ELSE 1.0 END AS dh,
                 CASE kind WHEN 'wall' THEN 0.25
                           WHEN 'city_wall' THEN 2.0
                           WHEN 'hedge' THEN 0.5
                           WHEN 'railing' THEN 0.10000000149011612
                           WHEN 'balustrade' THEN 0.25
                           WHEN 'guardrail' THEN 0.00009999999747378752
                           WHEN 'jersey_barrier' THEN 0.8199999928474426
                           WHEN 'trellis_work_fence' THEN 0.10000000149011612
                           WHEN 'bollard_row' THEN 0.3
                           ELSE 0.019999999552965164 END AS dw,
                 CASE WHEN k = 1 THEN CAST(doc_id % 7 + 1 AS DOUBLE)
                      WHEN k = 3 THEN CAST(doc_id % 5 + 1 AS DOUBLE) END AS ph,
                 CASE WHEN k = 2
                      THEN CAST(doc_id % 9 + 1 AS DOUBLE) * POWER(10.0, -1)
                 END AS pw
          FROM d
        )
        SELECT doc_id, bval AS barrier, kind AS barrier_kind,
               CASE WHEN kind IS NOT NULL
                    THEN CAST(FLOOR(COALESCE(ph, dh) * 1000000.0 + 0.5) AS BIGINT)
               END AS height_u,
               CASE WHEN kind IS NOT NULL
                    THEN CAST(FLOOR(COALESCE(pw, dw) * 1000000.0 + 0.5) AS BIGINT)
               END AS width_u
        FROM w
    """

    # rail_geometry: RailwayModule.java:51-179 re-derived — the gauge
    # division replayed in REAL (float32), the derived widths with the
    # reference's widened float constants, left-to-right order.
    _rail_vals_sql = ", ".join(f"'{v}'" for v in _RAIL_VALUES)
    sql["rail_geometry"] = f"""
        WITH g AS (
          SELECT doc_id,
                 list_extract([{_rail_vals_sql}], CAST(doc_id % 7 AS INT) + 1) AS rv,
                 CAST(doc_id % 3 AS INT) AS k,
                 CAST(doc_id % 5 AS INT) AS t5
          FROM documents
        ), t AS (
          SELECT *,
                 (rv IN ('rail','light_rail','tram','subway','disused')) AS ok,
                 CASE WHEN k = 1 THEN CAST(600 + doc_id % 1400 AS INT)
                      ELSE 1435 END AS gauge_mm,
                 CASE WHEN t5 = 1 THEN 'yes' WHEN t5 = 2 THEN 'no'
                      WHEN t5 = 3 THEN 'building_passage'
                      WHEN t5 = 4 THEN 'culvert' ELSE '' END AS tunnel,
                 CASE WHEN doc_id % 11 = 0 THEN 'yes'
                      WHEN doc_id % 11 = 1 THEN 'no' ELSE '' END AS bridge
          FROM g
        ), d AS (
          SELECT *,
                 CAST(CAST(gauge_mm AS REAL) / CAST(1000.0 AS REAL) AS DOUBLE)
                   AS gauge_m
          FROM t
        )
        SELECT doc_id, rv AS railway,
               CASE WHEN ok THEN CAST(FLOOR(gauge_m * 1000000.0 + 0.5) AS BIGINT) END AS gauge_u,
               CASE WHEN ok THEN CAST(FLOOR((gauge_m + 0.06700000166893005) * 1000000.0 + 0.5) AS BIGINT) END AS rail_dist_u,
               CASE WHEN ok THEN CAST(FLOOR(((gauge_m + 0.1340000033378601) + 1.0) * 1000000.0 + 0.5) AS BIGINT) END AS sleeper_w_u,
               CASE WHEN ok THEN CAST(FLOOR((((gauge_m + 0.1340000033378601) + 1.0) + 0.40000000596046448) * 1000000.0 + 0.5) AS BIGINT) END AS ground_w_u,
               CASE WHEN ok THEN CAST(rv <> 'tram' AS INT) END AS own_ground_i,
               CASE WHEN ok THEN
                 CASE WHEN (rv = 'subway' AND tunnel <> 'no') OR tunnel = 'yes'
                      THEN 'BELOW'
                      WHEN bridge <> '' AND bridge <> 'no' THEN 'ABOVE'
                      WHEN tunnel <> '' AND tunnel <> 'no'
                           AND tunnel <> 'building_passage' THEN 'BELOW'
                      ELSE 'ON' END
               END AS ground_state
        FROM d
    """

    # power_cables: PowerModule.java:66-99,399-490 re-derived with a
    # REAL relational tower aggregate (endpoint explode + MAX group +
    # join back — same shape as the Spark plan) and the run tables as
    # ordered struct lists indexed by a bounded range cross join.
    sql["power_cables"] = """
        WITH s AS (
          SELECT doc_id AS seg_id,
                 CAST(doc_id // 4 AS BIGINT) * 10 + doc_id % 4 AS sn,
                 CAST(doc_id // 4 AS BIGINT) * 10 + doc_id % 4 + 1 AS en,
                 (doc_id % 4 <> 3) AS is_line,
                 list_extract([2, 3, 5, 8, 12, NULL],
                              CAST(doc_id % 6 AS INT) + 1) AS cables,
                 list_extract([NULL, 15000, 60000, 220000, NULL],
                              CAST(doc_id % 5 AS INT) + 1) AS voltage
          FROM documents
        ), eps AS (
          SELECT sn AS node_id, cables, voltage FROM s WHERE is_line
          UNION ALL
          SELECT en, cables, voltage FROM s WHERE is_line
        ), towers AS (
          SELECT node_id,
                 COALESCE(MAX(cables), -1) AS cables_n,
                 COALESCE(MAX(voltage), -1) AS voltage_n
          FROM eps GROUP BY node_id
        ), th AS (
          SELECT node_id,
                 (voltage_n >= 50000 OR cables_n >= 6) AS is_high,
                 CASE WHEN node_id % 7 = 0
                      THEN CAST(8 + node_id % 25 AS DOUBLE) END AS h
          FROM towers
        ), j AS (
          SELECT s.*, COALESCE(ts.is_high, FALSE) OR COALESCE(te.is_high, FALSE) AS high,
                 ts.h AS hs_tag, te.h AS he_tag,
                 COALESCE(s.voltage, -1) AS volt
          FROM s
          LEFT JOIN th ts ON s.sn = ts.node_id
          LEFT JOIN th te ON s.en = te.node_id
          WHERE s.is_line AND s.cables IS NOT NULL AND s.cables > 0
        ), runs AS (
          SELECT *,
            CASE WHEN NOT high THEN
              -- normal towers (:426-445)
              [{'r': 2.0,  'ys': (COALESCE(hs_tag, 14.0) + 0.25 - 0.5) + 0.5,
                           'ye': (COALESCE(he_tag, 14.0) + 0.25 - 0.5) + 0.5},
               {'r': -2.0, 'ys': (COALESCE(hs_tag, 14.0) + 0.25 - 0.5) + 0.5,
                           'ye': (COALESCE(he_tag, 14.0) + 0.25 - 0.5) + 0.5}]
              || CASE WHEN cables >= 3 THEN
                   [{'r': 0.0, 'ys': (COALESCE(hs_tag, 14.0) + 0.25 - 0.5) + 0.5,
                               'ye': (COALESCE(he_tag, 14.0) + 0.25 - 0.5) + 0.5}]
                 ELSE [] END
              || CASE WHEN cables >= 5 THEN
                   [{'r': 1.5,  'ys': (COALESCE(hs_tag, 14.0) + 0.25 - 0.5) - 0.5,
                                'ye': (COALESCE(he_tag, 14.0) + 0.25 - 0.5) - 0.5},
                    {'r': -1.5, 'ys': (COALESCE(hs_tag, 14.0) + 0.25 - 0.5) - 0.5,
                                'ye': (COALESCE(he_tag, 14.0) + 0.25 - 0.5) - 0.5}]
                 ELSE [] END
            ELSE
              -- high-voltage towers (:448-489); hq = 2.5*((int(h/2.5))//5)
              [{'r': 0.0,
                'ys': -0.5 + 5.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT)),
                'ye': -0.5 + 5.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT))}]
              || [{'r': 0.9 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                   'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                   'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2},
                  {'r': -0.9 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                   'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                   'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2}]
              || CASE WHEN cables > 3 AND cables <= 9 THEN
                   [{'r': 0.45 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2},
                    {'r': -0.45 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2}]
                 WHEN cables > 9 THEN
                   [{'r': 0.6 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2},
                    {'r': -0.6 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2},
                    {'r': 0.3 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2},
                    {'r': -0.3 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2,
                     'ye': -0.7 + COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2}]
                 ELSE [] END
              || CASE WHEN cables >= 7 THEN
                   [{'r': 0.54 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT)),
                     'ye': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT))},
                    {'r': -0.54 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                     'ys': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT)),
                     'ye': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT))}]
                   || CASE WHEN cables >= 9 THEN
                        [{'r': 0.27 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                          'ys': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT)),
                          'ye': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT))},
                         {'r': -0.27 * (CASE WHEN volt > 150000 THEN 16.0 ELSE 13.0 END),
                          'ys': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(hs_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT)),
                          'ye': -0.7 + 4.0 * (2.5 * CAST(CAST(TRUNC(COALESCE(he_tag, CASE WHEN volt > 150000 THEN 40.0 ELSE 30.0 END) / 2.5) AS INT) // 5 AS INT))}]
                      ELSE [] END
                 ELSE [] END
            END AS l
          FROM j
        )
        SELECT seg_id,
               CAST(high AS INT) AS is_high_i,
               CAST(len(l) AS INT) AS n_runs,
               CAST(idx.i AS INT) AS run_idx,
               CAST(FLOOR(l[idx.i + 1].r * 1000000.0 + 0.5) AS BIGINT) AS right_u,
               CAST(FLOOR(l[idx.i + 1].ys * 1000000.0 + 0.5) AS BIGINT) AS y_start_u,
               CAST(FLOOR(l[idx.i + 1].ye * 1000000.0 + 0.5) AS BIGINT) AS y_end_u
        FROM runs, (SELECT unnest(range(12)) AS i) idx
        WHERE idx.i < len(l)
    """

    # tree_dims: TreeModule.java:130-185 re-derived arithmetically —
    # diameter's millimetre default unit, circumference/pi, the height
    # fallback chain (crown*2, trunk*30*2, default 10), crown = h/2.
    sql["tree_dims"] = """
        WITH g AS (
          SELECT doc_id, CAST(doc_id % 8 AS INT) AS k FROM documents
        ), t AS (
          SELECT *,
                 CASE WHEN k = 4 THEN CAST(doc_id % 500 + 100 AS DOUBLE) * 1.0e-3
                      WHEN k = 5 THEN CAST(doc_id % 9 + 1 AS DOUBLE) * POWER(10.0, -1)
                      WHEN k = 6 THEN CAST(doc_id % 4 + 1 AS DOUBLE) / PI()
                 END AS trunk,
                 CASE WHEN k IN (3, 7) THEN CAST(doc_id % 9 + 2 AS DOUBLE) END AS crown0,
                 CASE WHEN k IN (1, 7) THEN CAST(doc_id % 30 + 3 AS DOUBLE)
                      WHEN k = 2 THEN CAST(doc_id % 12 + 4 AS DOUBLE) END AS th
          FROM g
        ), h AS (
          SELECT *,
                 COALESCE(th, crown0 * 2.0, (trunk * 30.0) * 2.0, 10.0) AS height
          FROM t
        )
        SELECT doc_id,
               CAST(FLOOR(height * 1000000.0 + 0.5) AS BIGINT) AS height_u,
               CAST(FLOOR(COALESCE(crown0, height / 2.0) * 1000000.0 + 0.5) AS BIGINT) AS crown_u,
               CAST(FLOOR(trunk * 1000000.0 + 0.5) AS BIGINT) AS trunk_u
        FROM h
    """

    # waterway_widths: WaterModule.java:44-125 re-derived — the type
    # default table and the width/est_width override chain.
    sql["waterway_widths"] = """
        WITH g AS (
          SELECT doc_id,
                 list_extract(['river','stream','canal','ditch','drain',
                               'weir','dam'], CAST(doc_id % 7 AS INT) + 1) AS wv,
                 CAST(doc_id % 3 AS INT) AS k
          FROM documents
        ), t AS (
          SELECT *,
                 CASE wv WHEN 'river' THEN 3.0 WHEN 'stream' THEN 0.5
                         WHEN 'canal' THEN 2.0 WHEN 'ditch' THEN 1.0
                         WHEN 'drain' THEN 1.0 END AS dflt,
                 CASE WHEN k = 1 THEN CAST(doc_id % 9 + 1 AS DOUBLE)
                      WHEN k = 2 THEN CAST(doc_id % 6 + 1 AS DOUBLE) END AS pw
          FROM g
        )
        SELECT doc_id, wv AS waterway,
               CASE WHEN dflt IS NOT NULL THEN wv END AS waterway_kind,
               CASE WHEN dflt IS NOT NULL
                    THEN CAST(FLOOR(COALESCE(pw, dflt) * 1000000.0 + 0.5) AS BIGINT)
               END AS width_u
        FROM t
    """

    # structure_flags: the bridge/tunnel predicates, cliff default
    # height, and bicycle-stand integer division re-derived.
    sql["structure_flags"] = """
        WITH g AS (
          SELECT doc_id,
                 list_extract([NULL, 'yes', 'no', 'viaduct'],
                              CAST(doc_id % 4 AS INT) + 1) AS bridge,
                 list_extract([NULL, 'yes', 'no', 'building_passage',
                               'culvert'], CAST(doc_id % 5 AS INT) + 1) AS tunnel,
                 (doc_id % 3 = 0) AS is_cliff,
                 CASE WHEN doc_id % 6 = 0
                      THEN CAST(doc_id % 12 + 2 AS DOUBLE) END AS h,
                 (doc_id % 2 = 0) AS is_bp,
                 CASE WHEN doc_id % 7 = 1 THEN CAST(doc_id % 40 AS INT) END AS cap
          FROM documents
        )
        SELECT doc_id,
               CAST(bridge IS NOT NULL AND bridge <> 'no' AS INT) AS is_bridge_i,
               CAST(tunnel IS NOT NULL AND tunnel <> 'no'
                    AND tunnel <> 'building_passage' AS INT) AS is_tunnel_i,
               CASE WHEN is_cliff
                    THEN CAST(FLOOR(COALESCE(h, 5.0) * 1000000.0 + 0.5) AS BIGINT)
               END AS cliff_height_u,
               CASE WHEN is_bp AND cap > 0
                    THEN CAST(FLOOR((cap + 1) / 2.0) AS INT)
               END AS bicycle_stands
        FROM g
    """

    # traffic_signs: TrafficSignIdentifier.java re-derived per
    # generator template; config_key_no_sub uses replace() (replace-all
    # literal semantics, same as Java String.replace) on the
    # independently built key string.
    sql["traffic_signs"] = """
        WITH g AS (
          SELECT doc_id, CAST(doc_id % 8 AS INT) AS k,
                 CAST(doc_id % 90 + 10 AS INT) AS n1,
                 CAST(doc_id % 5 AS INT) AS b1,
                 CAST(doc_id % 9 AS INT) AS b2,
                 CAST(doc_id % 900 + 100 AS INT) AS n3,
                 CAST(doc_id % 300 AS INT) AS n5,
                 CAST(doc_id % 30 + 10 AS INT) AS n7
          FROM documents
        ), rows_ AS (
          SELECT doc_id, 0 AS sign_idx,
                 CASE WHEN k IN (1, 2, 5, 7) THEN 'DE'
                      WHEN k = 3 THEN 'GB' END AS country,
                 CASE k WHEN 0 THEN 'city_limit'
                        WHEN 1 THEN '274-' || n1
                        WHEN 2 THEN '265'
                        WHEN 3 THEN CAST(n3 AS VARCHAR)
                        WHEN 4 THEN 'stop'
                        WHEN 5 THEN CAST(n5 AS VARCHAR)
                        WHEN 7 THEN '1000-' || n7 || 'A' END AS sign,
                 CASE WHEN k = 2 THEN b1 || '.' || b2 END AS bracket_text,
                 CASE WHEN k = 1 THEN CAST(n1 AS VARCHAR)
                      WHEN k = 7 THEN CAST(n7 AS VARCHAR) END AS sub_type
          FROM g WHERE k <> 6
          UNION ALL
          SELECT doc_id, 1,
                 CASE WHEN k = 3 THEN 'GB' END,
                 CASE WHEN k = 3 THEN 'GB:' || (n3 + 1) ELSE 'give_way' END,
                 NULL, NULL
          FROM g WHERE k IN (3, 4)
        ), keys_ AS (
          SELECT *,
                 'SIGN_' || COALESCE(country || '_', '')
                 || upper(replace(sign, '-', '_')) AS config_key
          FROM rows_
        )
        SELECT doc_id, sign_idx, country, sign, bracket_text, sub_type,
               config_key,
               CASE WHEN sub_type IS NOT NULL
                    THEN replace(config_key, '_' || sub_type, '')
                    ELSE config_key END AS config_key_no_sub
        FROM keys_
    """

    # aeroway_widths: AerowayModule.java:212,:235 re-derived.
    sql["aeroway_widths"] = """
        WITH g AS (
          SELECT doc_id,
                 list_extract(['runway','taxiway','apron','helipad'],
                              CAST(doc_id % 4 AS INT) + 1) AS av,
                 CAST(doc_id % 3 AS INT) AS k
          FROM documents
        ), t AS (
          SELECT *,
                 CASE av WHEN 'runway' THEN 20.0 WHEN 'taxiway' THEN 5.0 END AS dflt,
                 CASE WHEN k = 1 THEN CAST(doc_id % 50 + 10 AS DOUBLE)
                      WHEN k = 2 THEN CAST(doc_id % 30 + 5 AS DOUBLE) END AS pw
          FROM g
        )
        SELECT doc_id, av AS aeroway,
               CASE WHEN dflt IS NOT NULL THEN av END AS aeroway_kind,
               CASE WHEN dflt IS NOT NULL
                    THEN CAST(FLOOR(COALESCE(pw, dflt) * 1000000.0 + 0.5) AS BIGINT)
               END AS width_u
        FROM t
    """

    # furniture: StreetFurnitureModule per-kind dims re-derived from
    # the generator parameters (one kind template per doc; k=16 unknown
    # post-box operator and k=21 untagged emit NOTHING, matching the
    # reference's early returns).  Float-literal defaults pinned; the
    # cross width quirk (width from the HEIGHT parse) encoded.
    sql["furniture"] = """
        WITH g AS (
          SELECT doc_id, CAST(doc_id % 22 AS INT) AS k,
                 CAST(doc_id % 3 AS INT) AS j,
                 CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 12 + 2 AS DOUBLE) END AS hv,
                 CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 5 + 1 AS DOUBLE) END AS wv,
                 CAST(doc_id % 8 AS INT) AS cap,
                 CAST(doc_id % 6 AS INT) AS seats
          FROM documents
        ), r AS (
          SELECT *,
                 CASE k WHEN 0 THEN 'swing' WHEN 1 THEN 'pole'
                        WHEN 2 THEN 'flagpole' WHEN 3 THEN 'advertising_column'
                        WHEN 4 THEN 'billboard' WHEN 5 THEN 'bench'
                        WHEN 6 THEN 'table' WHEN 7 THEN 'bus_stop'
                        WHEN 8 THEN 'bus_stop' WHEN 9 THEN 'cross'
                        WHEN 10 THEN 'cross' WHEN 11 THEN 'clock'
                        WHEN 12 THEN 'waste_basket' WHEN 13 THEN 'grit_bin'
                        WHEN 14 THEN 'post_box' WHEN 15 THEN 'post_box'
                        WHEN 17 THEN 'phone' WHEN 18 THEN 'vending_machine'
                        WHEN 19 THEN 'street_lamp' WHEN 20 THEN 'fire_hydrant'
                 END AS kind,
                 CASE k WHEN 0 THEN 1.5 WHEN 1 THEN 5.0 WHEN 2 THEN 10.0
                        WHEN 3 THEN 3.0 WHEN 4 THEN 3.5 WHEN 6 THEN 0.75
                        WHEN 7 THEN 3.0 WHEN 8 THEN 3.0 WHEN 9 THEN 2.0
                        WHEN 10 THEN 4.0 WHEN 11 THEN 10.0 WHEN 13 THEN 0.5
                        WHEN 14 THEN 0.800000011920929 WHEN 15 THEN 2.0
                        WHEN 17 THEN 2.0999999046325684
                        WHEN 18 THEN 1.7999999523162842
                        WHEN 19 THEN 5.0 WHEN 20 THEN 1.0
                 END AS dh
          FROM g WHERE k NOT IN (16, 21)
        ), h AS (
          SELECT *, COALESCE(hv, dh) AS height
          FROM r
        )
        SELECT doc_id, kind,
               CASE WHEN dh IS NOT NULL
                    THEN CAST(FLOOR(height * 1000000.0 + 0.5) AS BIGINT)
               END AS height_u,
               CAST(FLOOR((CASE k
                 WHEN 0 THEN COALESCE(wv, 0.5 * cap)
                 WHEN 1 THEN COALESCE(wv, 0.2)
                 WHEN 4 THEN COALESCE(wv, 4.0)
                 WHEN 5 THEN COALESCE(wv, 0.5 * seats)
                 WHEN 6 THEN COALESCE(wv, height * 1.2000000476837158)
                 WHEN 9 THEN COALESCE(hv, height * 2.0 / 3.0)
                 WHEN 10 THEN COALESCE(hv, height * 2.0 / 3.0)
                 WHEN 11 THEN COALESCE(wv, 1.0)
                 WHEN 13 THEN COALESCE(wv, 1.0)
                 WHEN 14 THEN COALESCE(wv, 0.30000001192092896)
                 WHEN 15 THEN COALESCE(wv, 0.5)
                 WHEN 17 THEN COALESCE(wv, 0.800000011920929)
               END) * 1000000.0 + 0.5) AS BIGINT) AS width_u
        FROM h
    """

    return sql
