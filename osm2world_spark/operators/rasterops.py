"""Raster algebra over the pixel table: finite-difference gradients
(the slope/aspect primitive of every terrain analysis) expressed as
window functions — no self-join, no UDF.

Relational shape: a raster row is (cell_lon, cell_lat, px, py, elev)
(sources/raster.py, sources/srtm.py — both emit this table). Central
differences need the 4 axis neighbors; instead of a join on
(px±1, py±1) — which would shuffle the raster twice and build a
4x-wide intermediate — the E/W neighbors come from lag/lead over a
window partitioned by (cell, ROW) ordered by px, and N/S neighbors
from a second window partitioned by (cell, COLUMN) ordered by py.
Two exchanges total, each carrying the raster exactly once; windows
are adjacency-GUARDED (the lagged pixel must be exactly px-1) so
subsampled or cropped grids yield NULL at gaps rather than a gradient
across a hole.

Determinism: elevation is integer (int16 in the SRTM layout), so the
central differences and the squared gradient magnitude are EXACT
bigints — the driver oracle replays them bit-for-bit. The float
slope/aspect angles (atan / atan2 — ulp-sensitive across engines)
are pytest-verified against numpy, not part of the hash contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.raster import BLANK_VALUE


def raster_gradients(
    raster: DataFrame,
    cell_cols: tuple[str, ...] = ("cell_lon", "cell_lat"),
    blank_value: int = BLANK_VALUE,
) -> DataFrame:
    """(cell_cols..., px, py, dzdx2, dzdy2, grad2): twice the central
    differences (z[e]-z[w], z[n]-z[s], both exact bigints) and the
    squared gradient magnitude. NULL wherever a needed neighbor is
    missing (grid border, subsampling gap) or is no-data."""
    cc = list(cell_cols)
    z = F.when(F.col("elev") != blank_value, F.col("elev").cast("bigint"))
    wx = Window.partitionBy(*cc, "py").orderBy("px")
    wy = Window.partitionBy(*cc, "px").orderBy("py")
    zw = F.when(F.lag("px").over(wx) == F.col("px") - 1, F.lag(z).over(wx))
    ze = F.when(F.lead("px").over(wx) == F.col("px") + 1, F.lead(z).over(wx))
    zs = F.when(F.lag("py").over(wy) == F.col("py") - 1, F.lag(z).over(wy))
    zn = F.when(F.lead("py").over(wy) == F.col("py") + 1, F.lead(z).over(wy))
    out = raster.select(
        *cc,
        "px",
        "py",
        (ze - zw).alias("dzdx2"),
        (zn - zs).alias("dzdy2"),
    )
    return out.withColumn(
        "grad2",
        F.col("dzdx2") * F.col("dzdx2") + F.col("dzdy2") * F.col("dzdy2"),
    )


def slope_aspect(
    gradients: DataFrame, pixel_size_m: float = 90.0
) -> DataFrame:
    """Adds slope_deg and aspect_deg to a raster_gradients frame:
    slope = atan(|grad| / (2 * pixel)), aspect = atan2(dz/dy, -dz/dx)
    in degrees from east, counterclockwise. Float trig — use for
    analysis, not for the cross-engine hash contract (see module
    docstring)."""
    p = F.col("dzdx2").cast("double") / (2.0 * pixel_size_m)
    q = F.col("dzdy2").cast("double") / (2.0 * pixel_size_m)
    return gradients.withColumn(
        "slope_deg", F.degrees(F.atan(F.sqrt(p * p + q * q)))
    ).withColumn("aspect_deg", F.degrees(F.atan2(q, -p)))


def hillshade(
    gradients: DataFrame,
    pixel_size_m: float = 90.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> DataFrame:
    """Analytical hillshade over the central-difference gradients — the
    Zevenbergen-Thorne variant of the classic terrain-rendering pass
    (Horn 1981's formula with this module's 2-neighbor derivatives):

        shade = 255 * max(0, cos(zen)*cos(slope)
                             + sin(zen)*sin(slope)*cos(az - aspect))

    with zenith = 90 - altitude and the azimuth rotated from
    compass-from-north-clockwise into this module's from-east-CCW
    aspect convention (GDAL's ``360 - az + 90``). Illumination default:
    the cartographic NW / 45 degrees.

    The zenith/azimuth trig is evaluated ONCE in Python at plan-build
    time and embedded as double literals, so any engine restating the
    formula starts from bit-identical constants; the per-pixel trig is
    whole-stage-codegen Columns. Adds ``shade`` (0..255 double; NULL
    exactly where the gradients are NULL — borders and no-data). The
    plan is a pure projection over the gradient frame: hillshading a
    planet-scale DEM costs zero shuffles beyond ``raster_gradients``."""
    import math

    p = F.col("dzdx2").cast("double") / (2.0 * pixel_size_m)
    q = F.col("dzdy2").cast("double") / (2.0 * pixel_size_m)
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(360.0 - azimuth_deg + 90.0)
    slope = F.atan(F.sqrt(p * p + q * q))
    aspect = F.atan2(q, -p)
    shade = F.lit(255.0) * (
        F.lit(math.cos(zen)) * F.cos(slope)
        + F.lit(math.sin(zen)) * F.sin(slope) * F.cos(F.lit(az) - aspect)
    )
    return gradients.withColumn(
        "shade",
        F.when(shade.isNotNull(), F.greatest(F.lit(0.0), shade)),
    )
