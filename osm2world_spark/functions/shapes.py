"""Round-shape outline generation (CircleXZ / CircularSectorXZ parity)
plus sequenceAbove.

Reference: core/.../math/shapes/CircleXZ.java:45-65 (vertices at
angle = -i * 2pi/n, point = center + (r*sin, r*cos), ring closed by
repeating the first point), CircularSectorXZ.java:28-45 (points from
startAngle to endAngle inclusive, REVERSED to counterclockwise, then
closed) and :52-56 (getArea), Angle.java:63-77 (every Angle operation
re-normalizes through ((r % 2pi) + 2pi) % 2pi — replicated exactly,
including the nested normalization of interval.times(i) BEFORE the
final plus), GeometryUtil.java:367-380 (sequenceAbove).

Pure Column projections. Spark's % matches Java's sign-of-dividend
remainder, so fit_angle is the literal Java expression.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_PI = 2 * math.pi


def _xz(x: Column, z: Column) -> Column:
    return F.struct(x.alias("x"), z.alias("z"))


def fit_angle(rad) -> Column:
    """Angle.fitToRange: ((rad % 2pi) + 2pi) % 2pi."""
    return ((rad % TWO_PI) + TWO_PI) % TWO_PI


def circle_vertices(cx, cz, radius, n_points) -> Column:
    """CircleXZ.vertices(numPoints): closed clockwise ring of
    n_points + 1 structs (first point repeated at the end)."""
    interval = TWO_PI / n_points

    def pt(i):
        angle = -i.cast("double") * interval
        return _xz(cx + radius * F.sin(angle), cz + radius * F.cos(angle))

    ring = F.transform(F.sequence(F.lit(0), n_points.cast("int") - 1), pt)
    return F.concat(ring, F.slice(ring, 1, 1))


def sector_vertices(cx, cz, radius, start_rad, end_rad, n_points) -> Column:
    """CircularSectorXZ.vertices(numPoints): n_points arc points from
    startAngle to endAngle (inclusive), reversed to counterclockwise,
    closed. Every intermediate Angle op re-normalizes like the Java."""
    start_a = fit_angle(start_rad)
    interval = fit_angle(fit_angle(end_rad) - start_a) / (n_points.cast("double") - 1)

    def pt(i):
        angle = fit_angle(start_a + fit_angle(interval * i.cast("double")))
        return _xz(cx + F.sin(angle) * radius, cz + F.cos(angle) * radius)

    arc = F.reverse(F.transform(F.sequence(F.lit(0), n_points.cast("int") - 1), pt))
    return F.concat(arc, F.slice(arc, 1, 1))


def sector_area(radius, start_rad, end_rad) -> Column:
    """CircularSectorXZ.getArea: circle area scaled by the normalized
    angular span."""
    span = fit_angle(fit_angle(end_rad) - fit_angle(start_rad))
    return radius * radius * math.pi * span / TWO_PI


def sequence_above(vs: Column, y_distance) -> Column:
    """GeometryUtil.sequenceAbove: every struct<x,y,z> shifted by
    y_distance along y (negative for a sequence below)."""
    return F.transform(
        vs,
        lambda v: F.struct(
            v["x"].alias("x"), (v["y"] + y_distance).alias("y"), v["z"].alias("z")
        ),
    )
