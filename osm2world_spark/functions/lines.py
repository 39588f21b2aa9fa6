"""Line / segment scalar primitives (GeometryUtil parity).

Reference: core/.../math/algorithms/GeometryUtil.java —
getLineIntersection (:189-215), getLineSegmentIntersection (:222-261),
getTrueLineSegmentIntersection (:267-278), isRightOf (:283-287),
isBetween (:297-306), distanceFromLine (:335-346),
distanceFromLineSegment (:348-352, which delegates to JTS
LineSegment.distance), projectPerpendicular (:354-359, JTS
LineSegment.project).

All pure Column arithmetic, replicated operation-for-operation
(including `denom = 1/denom` then multiplying — NOT dividing — so the
doubles match the Java bit-for-bit). Where Java returns null, these
return NULL.

EPSILON quirk kept faithfully: the reference declares
`double EPSILON = 0.0001f` — a FLOAT literal widened to double, i.e.
9.999999747378752e-05, not 1e-4. Parallel-line cutoffs use that exact
value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java `0.0001f` widened to double (GeometryUtil.java:800)
EPSILON = 9.999999747378752e-05


def _xz(x, z) -> Column:
    return F.struct(x.alias("x"), z.alias("z"))


def _approx_zero(v: Column) -> Column:
    return (v <= EPSILON) & (v >= -EPSILON)


def line_intersection(pax, paz, dax, daz, pbx, pbz, dbx, dbz) -> Column:
    """Intersection of two (point, direction) lines; NULL when the
    denominator is approximately zero (parallel)."""
    denom0 = daz * dbx - dax * dbz
    denom = 1.0 / denom0
    amc_x = pbx - pax
    amc_z = pbz - paz
    t = (amc_z * dbx - amc_x * dbz) * denom
    return F.when(~_approx_zero(denom0), _xz(pax + t * dax, paz + t * daz))


def segment_intersection(a1x, a1z, a2x, a2z, b1x, b1z, b2x, b2z) -> Column:
    """Intersection point of two segments; NULL when parallel-ish or
    the parameters fall outside [0, 1]."""
    vx = a2x - a1x
    vz = a2z - a1z
    qx = b2x - b1x
    qz = b2z - b1z
    denom0 = vz * qx - vx * qz
    denom = 1.0 / denom0
    amcx = b1x - a1x
    amcz = b1z - a1z
    t = (amcz * qx - amcx * qz) * denom
    s = (amcz * vx - amcx * vz) * denom
    return F.when(
        ~_approx_zero(denom0) & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1),
        _xz(a1x + t * vx, a1z + t * vz),
    )


def true_segment_intersection(a1x, a1z, a2x, a2z, b1x, b1z, b2x, b2z) -> Column:
    """segment_intersection, but NULL when the segments share an end
    point (exact coordinate equality, like VectorXZ.equals)."""
    shared = (
        ((a1x == b1x) & (a1z == b1z))
        | ((a1x == b2x) & (a1z == b2z))
        | ((a2x == b1x) & (a2z == b1z))
        | ((a2x == b2x) & (a2z == b2z))
    )
    return F.when(~shared, segment_intersection(a1x, a1z, a2x, a2z, b1x, b1z, b2x, b2z))


def is_right_of(px, pz, l1x, l1z, l2x, l2z) -> Column:
    """p strictly right of the directed line l1 -> l2 (cross sign)."""
    return F.lit(0) > (pz - l1z) * (l2x - l1x) - (px - l1x) * (l2z - l1z)


def is_between(px, pz, l1x, l1z, l2x, l2z) -> Column:
    """l1-l2 is strictly the longest side of triangle (p, l1, l2)."""
    d_l1l2 = (l2x - l1x) * (l2x - l1x) + (l2z - l1z) * (l2z - l1z)
    d_pl1 = (l1x - px) * (l1x - px) + (l1z - pz) * (l1z - pz)
    d_pl2 = (l2x - px) * (l2x - px) + (l2z - pz) * (l2z - pz)
    return (d_l1l2 > d_pl1) & (d_l1l2 > d_pl2)


def distance_from_line(px, pz, v1x, v1z, v2x, v2z) -> Column:
    """Java's own arithmetic (:335-346): projection-length subtraction
    with the max(, 0) clamp against negative rounding residue."""
    to_v2x = v2x - v1x
    to_v2z = v2z - v1z
    to_px = px - v1x
    to_pz = pz - v1z
    dot = to_px * to_v2x + to_pz * to_v2z
    proj_sq = dot * dot / (to_v2x * to_v2x + to_v2z * to_v2z)
    length_sq = (to_px * to_px + to_pz * to_pz) - proj_sq
    return F.sqrt(F.greatest(length_sq, F.lit(0.0)))


def distance_from_line_segment(px, pz, ax, az, bx, bz) -> Column:
    """JTS LineSegment.distance semantics: clamp the projection
    parameter to the segment, perpendicular distance inside it."""
    len2 = (bx - ax) * (bx - ax) + (bz - az) * (bz - az)
    r = ((px - ax) * (bx - ax) + (pz - az) * (bz - az)) / len2
    d_a = F.sqrt((px - ax) * (px - ax) + (pz - az) * (pz - az))
    d_b = F.sqrt((px - bx) * (px - bx) + (pz - bz) * (pz - bz))
    s = ((az - pz) * (bx - ax) - (ax - px) * (bz - az)) / len2
    perp = F.abs(s) * F.sqrt(len2)
    # JTS: degenerate segment (len2 == 0) -> distance to the point A
    return (
        F.when(len2 == 0.0, d_a)
        .when(r <= 0.0, d_a)
        .when(r >= 1.0, d_b)
        .otherwise(perp)
    )


def project_perpendicular(px, pz, v1x, v1z, v2x, v2z) -> Column:
    """JTS LineSegment.project: UNCLAMPED foot of the perpendicular on
    the infinite line through v1, v2 (NaN coords for a degenerate
    line, like the Java 0/0)."""
    len2 = (v2x - v1x) * (v2x - v1x) + (v2z - v1z) * (v2z - v1z)
    r = ((px - v1x) * (v2x - v1x) + (pz - v1z) * (v2z - v1z)) / len2
    return _xz(v1x + r * (v2x - v1x), v1z + r * (v2z - v1z))
