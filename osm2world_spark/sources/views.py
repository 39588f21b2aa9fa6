"""Bounded reader views: a source limited to a geographic region, parsed
once and reused across outputs (SURVEY S5).

Reference: core/src/main/java/org/osm2world/osm/creation/
OSMDataReaderView.java:17-80 —
- wraps a reader, optionally limited to LatLonBounds OR a TileNumber;
  setting both is an error (:49-52)
- getAllData() reads once and caches (getAllDataCache :24,55-69); the
  desktop pipeline likewise converts one cached scene to many outputs
  (desktop/.../ConvertCommand.java:89-92,123-128)
- getBounds() returns the explicit bound, the tile's bounds, or the
  parsed data's extent (:72-80)

Spark shape: the bound becomes a WHERE clause on the geo columns so
Catalyst pushes it into the parquet scan (PushedFilters / partition
pruning on tile-partitioned stage tables — the filter reaches storage
instead of trimming rows post-read); the parse-once cache is persist()
plus an optional named temp view, so every downstream output over the
same region reuses one materialization instead of re-scanning. At
cluster scale the same predicate prunes Iceberg partitions/files via
metadata min/max before any task launches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import py_tile2lat, py_tile2lon

GeoBounds = tuple[float, float, float, float]  # (minlat, minlon, maxlat, maxlon)


def tile_bounds(zoom: int, x: int, y: int) -> GeoBounds:
    """LatLonBounds of a slippy tile (TileNumber.bounds() analogue)."""
    return (
        py_tile2lat(y + 1, zoom),
        py_tile2lon(x, zoom),
        py_tile2lat(y, zoom),
        py_tile2lon(x + 1, zoom),
    )


def bounds_predicate(df: DataFrame, bounds: GeoBounds) -> Column:
    """Region predicate over whichever geo convention `df` carries:
    point rows (lat, lon) -> containment; bbox rows (minlat..maxlon,
    the elements convention) -> intersection, matching the reference's
    intersecting-element semantics (data for the region includes every
    element that touches it)."""
    minlat, minlon, maxlat, maxlon = bounds
    cols = set(df.columns)
    if {"lat", "lon"} <= cols:
        return (
            (F.col("lat") >= minlat)
            & (F.col("lat") < maxlat)
            & (F.col("lon") >= minlon)
            & (F.col("lon") < maxlon)
        )
    if {"minlat", "minlon", "maxlat", "maxlon"} <= cols:
        return (
            (F.col("maxlat") >= minlat)
            & (F.col("minlat") < maxlat)
            & (F.col("maxlon") >= minlon)
            & (F.col("minlon") < maxlon)
        )
    raise ValueError(
        "source has neither point (lat, lon) nor bbox (minlat..maxlon) geo columns"
    )


class BoundedView:
    """View of a source DataFrame, optionally limited to a bounding
    region or a tile; `.data()` materializes once and reuses.

    >>> view = BoundedView(elements, bounds=(48.5, 13.3, 48.6, 13.5), name="passau")
    >>> view.data().count()          # bounded scan, cached
    >>> spark.sql("SELECT element_type, count(*) FROM passau GROUP BY 1")
    >>> view.release()
    """

    def __init__(
        self,
        source: DataFrame,
        *,
        bounds: GeoBounds | None = None,
        tile: tuple[int, int, int] | None = None,
        name: str | None = None,
        cache: bool = True,
    ):
        if bounds is not None and tile is not None:
            # OSMDataReaderView.java:49-52 — tile and bounds are exclusive
            raise ValueError("can only use either tile or bounds")
        self.source = source
        self.explicit_bounds = bounds
        self.tile = tile
        self.name = name
        self._cache = cache
        self._data: DataFrame | None = None

    def data(self) -> DataFrame:
        """The bounded rows; first call persists (and registers the
        named view) so later outputs reuse one materialization
        (getAllData's read-once cache, OSMDataReaderView.java:55-69)."""
        if self._data is None:
            df = self.source
            b = self._bound()
            if b is not None:
                df = df.where(bounds_predicate(df, b))
            if self._cache:
                df = df.persist()
            if self.name:
                df.createOrReplaceTempView(self.name)
            self._data = df
        return self._data

    def _bound(self) -> GeoBounds | None:
        if self.explicit_bounds is not None:
            return self.explicit_bounds
        if self.tile is not None:
            return tile_bounds(*self.tile)
        return None

    def bounds(self) -> GeoBounds:
        """The explicit bound, the tile's bounds, or the data extent
        (OSMDataReaderView.getBounds, :72-80). The extent fallback is one
        distributed min/max aggregate over the cached data."""
        b = self._bound()
        if b is not None:
            return b
        df = self.data()
        cols = set(df.columns)
        if {"lat", "lon"} <= cols:
            lo_lat, lo_lon, hi_lat, hi_lon = "lat", "lon", "lat", "lon"
        else:
            lo_lat, lo_lon, hi_lat, hi_lon = "minlat", "minlon", "maxlat", "maxlon"
        row = df.agg(
            F.min(lo_lat), F.min(lo_lon), F.max(hi_lat), F.max(hi_lon)
        ).first()
        return (row[0], row[1], row[2], row[3])

    def release(self) -> None:
        """Unpersist and drop the named view (scene-cache eviction)."""
        if self._data is not None:
            if self._cache:
                self._data.unpersist()
            if self.name:
                self._data.sparkSession.catalog.dropTempView(self.name)
            self._data = None

    def __enter__(self) -> "BoundedView":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def bounded_docs(
    docs: DataFrame,
    *,
    bounds: GeoBounds | None = None,
    tile: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Restrict an interleaved-document table to documents with at least
    one geometry element intersecting the region — the document-table
    analogue of the reference CLI's source restriction
    (`convert --tile z,x,y` / bbox args, ConvertCommand.java:281-312:
    db-backed inputs REQUIRE a tile or bbox). Extraction + semi-join:
    elements are extracted, the bbox predicate keeps intersecting ones,
    and the surviving doc_ids semi-join the original docs — so the
    pipeline then runs over the pruned corpus (a city tile out of a
    planet). Documents carrying NO geometry spans have no spatial
    footprint and are excluded by any restriction (matching a bounded
    geodata read, which only returns elements in the region). bounds
    and tile are mutually exclusive like BoundedView."""
    if bounds is not None and tile is not None:
        raise ValueError("can only use either tile or bounds")
    b = bounds if bounds is not None else (
        tile_bounds(*tile) if tile is not None else None)
    if b is None:
        return docs
    from .documents import extract_elements

    els = extract_elements(docs)
    keep = els.where(bounds_predicate(els, b)).select("doc_id").distinct()
    return docs.join(keep, "doc_id", "left_semi")
