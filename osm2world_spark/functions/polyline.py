"""GeometryUtil scalar functions over polylines/polygons (pure Columns).

Reference: GeometryUtil.equallyDistributePointsAlong (/root/reference/core/
src/main/java/org/osm2world/math/algorithms/GeometryUtil.java:548-676) —
used by the world modules to place repeated features along a line (steps
along a way, street lights, fence posts, railway sleepers, bench seats).

Semantics (matching the reference exactly):
- numSegments = round(length / preferredDistance); zero segments -> no
  points at all.
- the actual spacing is length / numSegments (as close to the preferred
  distance as divides the line evenly).
- pointsAtStartAndEnd=True places numSegments + 1 points including both
  endpoints (the final point is the EXACT last vertex, the reference's
  float-error special case); False places numSegments points starting
  half a spacing from the line start.
- the target distance is located on the vertex sequence by advancing
  while t > cumulative_length (GeometryUtil.java:647-656), then linearly
  interpolating within the segment (interpolateBetween :389-396).

Everything is Catalyst higher-order functions over the packed
[x0, z0, x1, z1, ...] geometry array — no Python in the plan.

Implementation note — LET-BINDING THROUGH LAMBDAS: the cumulative-length
array is referenced ~3x per emitted point; written as one nested Column
(or as staged Projects, which CollapseProject re-merges), the subtree
re-expands per reference into a ~10^6-node interpreted expression
(observed ~60 ms PER ROW). Catalyst has no let construct, but a lambda
variable IS one at runtime: `transform(array(struct(...)), s -> body)`
evaluates the struct once and binds it, and the optimizer cannot inline
through a lambda variable. Each pipeline stage below is such a
single-element transform; the final element_at unwraps it. Positions use
the closed form start + k * spacing rather than the reference's running
accumulation; the difference is below 1e-12 per point and the oracle SQL
shares the identical op tree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PTS_T = "array<struct<i:int,px:double,pz:double>>"


def distribute_points_along(
    geom: Column,
    preferred_distance: Column,
    points_at_start_and_end: Column,
) -> Column:
    """array<struct<i int, px double, pz double>> of equally distributed
    points along the packed polyline `geom` (empty when
    round(length / preferred_distance) == 0)."""

    def stage1(s0):
        g = s0["g"]
        nv = (F.size(g) / 2).cast("int")

        def seg_len(i):
            x1 = F.element_at(g, (i * 2 + 1).cast("int"))
            z1 = F.element_at(g, (i * 2 + 2).cast("int"))
            x2 = F.element_at(g, (i * 2 + 3).cast("int"))
            z2 = F.element_at(g, (i * 2 + 4).cast("int"))
            return F.sqrt((x2 - x1) * (x2 - x1) + (z2 - z1) * (z2 - z1))

        return F.struct(
            g.alias("g"),
            s0["pd"].alias("pd"),
            s0["ends"].alias("ends"),
            nv.alias("nv"),
            F.transform(F.sequence(F.lit(0), nv - 2), seg_len).alias("lens"),
        )

    def stage2(s1):
        lens = s1["lens"]
        # cumulative length BEFORE vertex j (cum[0] = 0, summed left to
        # right like the reference's running offset)
        cum = F.transform(
            F.sequence(F.lit(0), s1["nv"] - 1),
            lambda j: F.aggregate(F.slice(lens, 1, j), F.lit(0.0), lambda a, x: a + x),
        )
        total = F.aggregate(lens, F.lit(0.0), lambda a, x: a + x)
        ns = F.floor(total / s1["pd"] + 0.5).cast("int")
        return F.struct(
            s1["g"].alias("g"),
            s1["ends"].alias("ends"),
            s1["nv"].alias("nv"),
            cum.alias("cum"),
            ns.alias("ns"),
            # try_divide: ns == 0 yields NULL here instead of an ANSI
            # DIVIDE_BY_ZERO; the stage-3 guard discards that branch
            F.try_divide(total, ns.cast("double")).alias("sp"),
            (ns + F.when(s1["ends"], F.lit(1)).otherwise(F.lit(0))).alias("np"),
        )

    def stage3(s):
        g, cum, nv, np_ = s["g"], s["cum"], s["nv"], s["np"]
        start = F.when(s["ends"], F.lit(0.0)).otherwise(s["sp"] / 2.0)

        def point(k):
            t = start + k.cast("double") * s["sp"]
            # advance while t > cum[j+1] (strictly greater, :647), i.e.
            # j = |{jj in 1..nv-1 : cum[jj] < t}|, clamped to the last
            # segment
            j = F.least(
                F.size(F.filter(F.slice(cum, 2, nv - 1), lambda c: c < t)),
                nv - 2,
            )
            c0 = F.element_at(cum, (j + 1).cast("int"))
            c1 = F.element_at(cum, (j + 2).cast("int"))
            # try_divide: a zero-length segment yields NULL coordinates
            # (the reference yields NaN there) instead of an ANSI error
            ratio = F.try_divide(t - c0, c1 - c0)
            x1 = F.element_at(g, (j * 2 + 1).cast("int"))
            z1 = F.element_at(g, (j * 2 + 2).cast("int"))
            x2 = F.element_at(g, (j * 2 + 3).cast("int"))
            z2 = F.element_at(g, (j * 2 + 4).cast("int"))
            last = s["ends"] & (k == np_ - 1)
            px = F.when(last, F.element_at(g, (nv * 2 - 1).cast("int"))).otherwise(
                x1 + (x2 - x1) * ratio
            )
            pz = F.when(last, F.element_at(g, (nv * 2).cast("int"))).otherwise(
                z1 + (z2 - z1) * ratio
            )
            return F.struct(k.cast("int").alias("i"), px.alias("px"), pz.alias("pz"))

        return F.when(
            (s["ns"] > 0) & (nv >= 2),
            F.transform(F.sequence(F.lit(0), np_ - 1), point),
        ).otherwise(F.array().cast(_PTS_T))

    s0 = F.array(
        F.struct(
            geom.alias("g"),
            preferred_distance.alias("pd"),
            points_at_start_and_end.alias("ends"),
        )
    )
    return F.element_at(
        F.transform(F.transform(F.transform(s0, stage1), stage2), stage3), 1
    )


def interpolate_on_triangle(px, pz, t1x, t1z, t2x, t2z, t3x, t3z, v1, v2, v3) -> Column:
    """Barycentric interpolation of a value over a triangle —
    GeometryUtil.interpolateOnTriangle (GeometryUtil.java:499-513),
    used by the terrain/elevation passes to read a value at a point
    inside a triangulated surface. The reference THROWS for points
    outside the triangle (weight > 1); the relational surface returns
    NULL instead (and NULL for a degenerate triangle, where the
    reference would divide by zero)."""
    denom = F.try_divide(
        F.lit(1.0),
        (t2z - t3z) * (t1x - t3x) + (t3x - t2x) * (t1z - t3z),
    )
    w1 = ((t2z - t3z) * (px - t3x) + (t3x - t2x) * (pz - t3z)) * denom
    w2 = ((t3z - t1z) * (px - t3x) + (t1x - t3x) * (pz - t3z)) * denom
    w3 = F.lit(1.0) - w1 - w2
    return F.when((w1 <= 1.0) & (w2 <= 1.0), w1 * v1 + w2 * v2 + w3 * v3)


def insert_into_polygon(geom: Column, px, pz, snap_distance) -> Column:
    """GeometryUtil.insertIntoPolygon (GeometryUtil.java:687-717): insert
    a point into the closest segment of a simple polygon — unless the
    point is within `snap_distance` of either endpoint of that segment,
    in which case the polygon is returned unchanged. `geom` is one packed
    CLOSED ring [x0, z0, ..., x0, z0]; the closest segment is the FIRST
    minimum of the point-to-segment distances (clamped perpendicular
    projection), matching getClosestSegment's iteration order.

    The segment index j is LET-BOUND through a staging lambda (see the
    module docstring): referenced inline 6x, its distance-array subtree
    re-expands into a ~70 MiB task binary."""

    def stage1(s):
        g = s["g"]
        n = (F.size(g) / 2).cast("int") - 1  # vertex count (ring closed)

        def seg_dist(j):
            ax = F.element_at(g, (j * 2 + 1).cast("int"))
            az = F.element_at(g, (j * 2 + 2).cast("int"))
            bx = F.element_at(g, (j * 2 + 3).cast("int"))
            bz = F.element_at(g, (j * 2 + 4).cast("int"))
            t = F.try_divide(
                (s["px"] - ax) * (bx - ax) + (s["pz"] - az) * (bz - az),
                (bx - ax) * (bx - ax) + (bz - az) * (bz - az),
            )
            tc = F.least(F.greatest(F.coalesce(t, F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
            dx = s["px"] - (ax + tc * (bx - ax))
            dz = s["pz"] - (az + tc * (bz - az))
            return F.sqrt(dx * dx + dz * dz)

        dists = F.transform(F.sequence(F.lit(0), n - 1), seg_dist)
        return F.struct(
            g.alias("g"),
            s["px"].alias("px"),
            s["pz"].alias("pz"),
            s["sd"].alias("sd"),
            n.alias("n"),
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("j"),
        )

    def stage2(s):
        g, px_, pz_, n, j = s["g"], s["px"], s["pz"], s["n"], s["j"]
        vjx = F.element_at(g, (j * 2 + 1).cast("int"))
        vjz = F.element_at(g, (j * 2 + 2).cast("int"))
        wjx = F.element_at(g, (j * 2 + 3).cast("int"))
        wjz = F.element_at(g, (j * 2 + 4).cast("int"))
        snapped = (
            F.sqrt((px_ - vjx) * (px_ - vjx) + (pz_ - vjz) * (pz_ - vjz)) <= s["sd"]
        ) | (F.sqrt((px_ - wjx) * (px_ - wjx) + (pz_ - wjz) * (pz_ - wjz)) <= s["sd"])
        inserted = F.concat(
            F.slice(g, 1, (j + 1) * 2),
            F.array(px_, pz_),
            F.slice(g, (j + 1) * 2 + 1, (n - j) * 2),
        )
        return F.when(snapped, g).otherwise(inserted)

    s0 = F.array(
        F.struct(
            geom.alias("g"), px.alias("px"), pz.alias("pz"), snap_distance.alias("sd")
        )
    )
    return F.element_at(F.transform(F.transform(s0, stage1), stage2), 1)


def _let(col: Column, fn) -> Column:
    """Bind `col` once through a single-element transform lambda (see the
    LET-BINDING note in the module docstring) and evaluate fn(col)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _x(g: Column, i) -> Column:
    """x of vertex i (0-based) in a packed [x0, z0, ...] ring."""
    return F.element_at(g, (i * 2 + 1).cast("int"))


def _z(g: Column, i) -> Column:
    return F.element_at(g, (i * 2 + 2).cast("int"))


def _ring_signed_area(g: Column, n) -> Column:
    """SimplePolygonXZ.calculateSignedArea (SimplePolygonXZ.java:664-675):
    shoelace over the CLOSED loop, same (sum + a) - b accumulation order,
    divided by 2 at the end. `n` = vertex count (loop has n+1 points)."""
    return (
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit(0.0),
            lambda a, i: a + _x(g, i) * _z(g, i + 1) - _x(g, i + 1) * _z(g, i),
        )
        / 2.0
    )


def _true_segment_intersects(ax1, az1, ax2, az2, bx1, bz1, bx2, bz2) -> Column:
    """Boolean form of GeometryUtil.getTrueLineSegmentIntersection
    (GeometryUtil.java:267-278 over :222-260): parallel test
    |vz*qx - vx*qz| <= 1e-4 (approxZero, :802), t and s in [0,1]
    inclusive, and no hit when the segments share an exact endpoint."""
    vx, vz = ax2 - ax1, az2 - az1
    qx, qz = bx2 - bx1, bz2 - bz1
    denom = vz * qx - vx * qz
    inv = F.lit(1.0) / denom  # double division: never an ANSI error
    amcx, amcz = bx1 - ax1, bz1 - az1
    t = (amcz * qx - amcx * qz) * inv
    s = (amcz * vx - amcx * vz) * inv
    shared = (
        ((ax1 == bx1) & (az1 == bz1))
        | ((ax1 == bx2) & (az1 == bz2))
        | ((ax2 == bx1) & (az2 == bz1))
        | ((ax2 == bx2) & (az2 == bz2))
    )
    return (
        (F.abs(denom) > 1e-4)
        & (t >= 0.0) & (t <= 1.0)
        & (s >= 0.0) & (s <= 1.0)
        & ~shared
    )


def _ring_self_intersects(ring: Column, m) -> Column:
    """Any true intersection between non-adjacent edges of the closed ring
    (SimplePolygonXZ.isSelfIntersecting :552+, the semantics the numpy
    kernel in functions/geometry.py also replicates). `m` = vertex count."""
    def pair_hit(a):
        return F.exists(
            F.sequence(a + 2, m - 1),
            lambda b: ~((a == 0) & (b == m - 1))
            & _true_segment_intersects(
                _x(ring, a), _z(ring, a), _x(ring, a + 1), _z(ring, a + 1),
                _x(ring, b), _z(ring, b), _x(ring, b + 1), _z(ring, b + 1),
            ),
        )

    return F.exists(F.sequence(F.lit(0), m - 3), pair_hit)


def simplified_polygon(geom: Column) -> Column:
    """SimplePolygonXZ.getSimplifiedPolygon (SimplePolygonXZ.java:355-369)
    with the tolerance pass :375-414: drop every vertex whose adjacent
    segments are nearly parallel (|normalized dot - 1| < maxDotProduct),
    first at 0.05; if that result is invalid or changes the area by more
    than 10%, redo at 0.001; fall back to the original ring. A pass
    returns the ORIGINAL ring untouched when it would delete nothing or
    leave fewer than 3 vertices (:391-393). Validity of a simplified ring
    mirrors the SimplePolygonXZ constructor (:40-51): no consecutive
    duplicate vertices, not self-intersecting, area nonzero and >= 1e-6.
    Input/output: one packed CLOSED ring [x0, z0, ..., x0, z0]."""

    def stage1(s):
        g = s["g"]
        n = (F.size(g) / 2).cast("int") - 1

        def vertex_dot(i):
            ip = (i - 1 + n) % n
            inx = (i + 1) % n
            bx, bz = _x(g, i) - _x(g, ip), _z(g, i) - _z(g, ip)
            ax, az = _x(g, inx) - _x(g, i), _z(g, inx) - _z(g, i)
            lb = F.sqrt(bx * bx + bz * bz)
            la = F.sqrt(ax * ax + az * az)
            # normalize-then-dot, the reference's op order (:384-386)
            return (bx / lb) * (ax / la) + (bz / lb) * (az / la)

        return F.struct(
            g.alias("g"),
            n.alias("n"),
            F.transform(F.sequence(F.lit(0), n - 1), vertex_dot).alias("dots"),
            _ring_signed_area(g, n).alias("sa"),
        )

    def stage2(s):
        g, n, dots = s["g"], s["n"], s["dots"]

        def one_pass(tol):
            kept = F.filter(
                F.sequence(F.lit(0), n - 1),
                lambda i: ~(F.abs(F.element_at(dots, (i + 1).cast("int")) - 1.0) < tol),
            )
            dc = n - F.size(kept)
            open_ring = F.flatten(
                F.transform(kept, lambda i: F.array(_x(g, i), _z(g, i)))
            )
            ring = F.concat(open_ring, F.slice(open_ring, 1, 2))
            is_orig = (dc == 0) | (dc > n - 3)
            return F.struct(
                is_orig.alias("orig"),
                F.when(is_orig, g).otherwise(ring).alias("ring"),
            )

        return F.struct(
            s["g"].alias("g"),
            s["sa"].alias("sa"),
            one_pass(F.lit(0.05)).alias("c05"),
            one_pass(F.lit(0.001)).alias("c001"),
        )

    def stage3(s):
        def validated(cand):
            def inner(c):
                ring = c["ring"]
                m = (F.size(ring) / 2).cast("int") - 1
                sa_r = _ring_signed_area(ring, m)
                dup = F.exists(
                    F.sequence(F.lit(0), m - 1),
                    lambda i: (_x(ring, i) == _x(ring, i + 1))
                    & (_z(ring, i) == _z(ring, i + 1)),
                )
                valid = (
                    ~dup
                    & ~_ring_self_intersects(ring, m)
                    & (F.abs(sa_r) != 0.0)
                    & (F.abs(sa_r) >= 1e-6)
                )
                out_ring = F.when(c["orig"] | valid, ring)
                return F.struct(
                    out_ring.alias("ring"),
                    F.when(out_ring.isNotNull(), F.abs(sa_r)).alias("area"),
                )

            return _let(cand, inner)

        return F.struct(
            s["g"].alias("g"),
            F.abs(s["sa"]).alias("area_g"),
            validated(s["c05"]).alias("v05"),
            validated(s["c001"]).alias("v001"),
        )

    def stage4(s):
        r05 = s["v05"]["ring"]
        bad05 = r05.isNull() | (
            F.abs(s["v05"]["area"] - s["area_g"]) / s["area_g"] > 0.1
        )
        return F.coalesce(
            F.when(bad05, s["v001"]["ring"]).otherwise(r05), s["g"]
        )

    s0 = F.array(F.struct(geom.alias("g")))
    return F.element_at(
        F.transform(F.transform(F.transform(F.transform(s0, stage1), stage2), stage3), stage4),
        1,
    )


def convex_hull_ring(geom: Column) -> Column:
    """SimplePolygonXZ.convexHull (SimplePolygonXZ.java:444-493) +
    convexHullPart (:496-535): make the vertex order clockwise, split at
    the min-x / max-x vertices (first occurrence in clockwise order, as
    Collections.min/max), run the Sklansky pop-while chain on each half
    with isRightOf (GeometryUtil.java:283-287), concatenate, and reverse
    back for counterclockwise input. Returns the CLOSED hull ring,
    starting at the min-x vertex, same rotation sense as the input.

    The pop-while stack is expressed as F.aggregate: the post-pop stack
    length equals max{L in 1..|acc| : L == 1 or NOT isRightOf(acc[L-2],
    v, acc[L-1])} (every larger prefix length fails, which is exactly
    the while condition), found with an inner aggregate — no Python in
    the plan. Faithfulness note: Sklansky's chain is the REFERENCE's
    algorithm; for simple polygons that are not weakly externally
    visible it can return a non-convex superset of the hull, and this
    function reproduces that behavior (buggy-but-golden, like the P12
    vertex rule)."""

    def right_of(g, p, l1x, l1z, l2):
        return (
            (_z(g, p) - l1z) * (_x(g, l2) - l1x)
            - (_x(g, p) - l1x) * (_z(g, l2) - l1z)
        ) < 0.0

    def chain(g, vs):
        """convexHullPart over vertex-index array vs (indices into g)."""

        def merge(acc, vi):
            keep = F.aggregate(
                F.sequence(F.lit(1), F.size(acc)),
                F.lit(1),
                lambda best, L: F.when(
                    (L == 1)
                    | ~right_of(
                        g,
                        F.element_at(acc, L - 1),
                        _x(g, vi),
                        _z(g, vi),
                        F.element_at(acc, L),
                    ),
                    F.greatest(best, L),
                ).otherwise(best),
            )
            return F.concat(F.slice(acc, 1, keep), F.array(vi))

        return F.when(F.size(vs) < 3, vs).otherwise(
            F.aggregate(F.slice(vs, 3, F.size(vs) - 2), F.slice(vs, 1, 2), merge)
        )

    def stage1(s):
        g = s["g"]
        n = (F.size(g) / 2).cast("int") - 1
        cw = _ring_signed_area(g, n) < 0.0
        # makeClockwise().getVertices(): reversing the closed loop keeps
        # vertex 0 first, then walks the original order backwards
        cw_idx = F.when(cw, F.sequence(F.lit(0), n - 1)).otherwise(
            F.concat(F.array(F.lit(0)), F.reverse(F.sequence(F.lit(1), n - 1)))
        )
        return F.struct(g.alias("g"), n.alias("n"), cw.alias("cw"), cw_idx.alias("ci"))

    def stage2(s):
        g, n, ci = s["g"], s["n"], s["ci"]
        xs = F.transform(ci, lambda i: _x(g, i))
        min_i = (F.array_position(xs, F.array_min(xs)) - 1).cast("int")
        max_i = (F.array_position(xs, F.array_max(xs)) - 1).cast("int")
        d_up = (max_i - min_i + n) % n
        d_lo = (min_i - max_i + n) % n
        upper = F.transform(
            F.sequence(F.lit(0), d_up), lambda j: F.element_at(ci, ((min_i + j) % n + 1).cast("int"))
        )
        lower = F.transform(
            F.sequence(F.lit(0), d_lo), lambda j: F.element_at(ci, ((max_i + j) % n + 1).cast("int"))
        )
        return F.struct(
            g.alias("g"), s["cw"].alias("cw"),
            chain(g, upper).alias("hu"), chain(g, lower).alias("hl"),
        )

    def stage3(s):
        g = s["g"]
        loop = F.concat(s["hu"], F.slice(s["hl"], 2, F.size(s["hl"]) - 1))
        ordered = F.when(s["cw"], loop).otherwise(F.reverse(loop))
        return F.flatten(F.transform(ordered, lambda i: F.array(_x(g, i), _z(g, i))))

    s0 = F.array(F.struct(geom.alias("g")))
    return F.element_at(
        F.transform(F.transform(F.transform(s0, stage1), stage2), stage3), 1
    )


def _seg_dists(g: Column, n) -> Column:
    """Per-segment lengths of a packed polyline (VectorXZ.distance
    op tree: sqrt(dx*dx + dz*dz), VectorXZ.java:254-257). `n` = point
    count; returns n-1 lengths."""
    def d(i):
        dx = _x(g, i + 1) - _x(g, i)
        dz = _z(g, i + 1) - _z(g, i)
        return F.sqrt(dx * dx + dz * dz)

    return F.transform(F.sequence(F.lit(0), n - 2), d)


def _polyline_length(ds: Column) -> Column:
    """PolylineXZ.getLength (PolylineXZ.java:47-57): sequential
    `length += distance` left fold, replicated exactly."""
    return F.aggregate(ds, F.lit(0.0), lambda a, d: a + d)


def _walk(g: Column, ds: Column, n, rem0: Column, clamp_t: bool) -> Column:
    """Shared remaining-distance walk: the reference loops
    `if (rem <= d_i) return lerp else rem -= d_i`. rem at step k equals
    the re-reduction aggregate(slice(ds, 1, k), rem0, a - d) — the SAME
    left-to-right fp subtraction sequence, so branch decisions match the
    loop bit-for-bit. Returns struct(px, pz); falls back to the last
    vertex when accumulated fp error exhausts every segment
    (GeometryUtil.java:465-466, PolylineShapeXZ.java:112-115)."""
    def rem(k):
        return F.aggregate(F.slice(ds, 1, k), rem0, lambda a, d: a - d)

    k = F.aggregate(
        F.sequence(F.lit(0), n - 2),
        F.lit(-1),
        lambda best, i: F.when(
            (best == -1) & (rem(i) <= F.element_at(ds, (i + 1).cast("int"))),
            i.cast("int"),
        ).otherwise(best),
    )

    def out(kk):
        t = rem(kk) / F.element_at(ds, (kk + 1).cast("int"))
        if clamp_t:
            t = F.greatest(F.lit(0.0), t)  # pointAtOffset's max(0, ...)
        # interpolateBetween (GeometryUtil.java:389-393):
        # pos1 * (1 - t) + pos2 * t
        px = _x(g, kk) * (1 - t) + _x(g, kk + 1) * t
        pz = _z(g, kk) * (1 - t) + _z(g, kk + 1) * t
        return F.struct(px.alias("px"), pz.alias("pz"))

    last = F.struct(_x(g, n - 1).alias("px"), _z(g, n - 1).alias("pz"))
    return F.when(k == -1, last).otherwise(out(k))


def interpolate_on(geom: Column, ratio) -> Column:
    """GeometryUtil.interpolateOn (GeometryUtil.java:440-467), XZ form:
    the point at `ratio` (0..1) of the way along a packed polyline —
    total length, remaining = ratio * total, remaining-distance walk,
    last-vertex fallback for accumulated fp error. Returns
    struct(px, pz)."""
    def stage(s):
        g = s["g"]
        n = (F.size(g) / 2).cast("int")
        ds = _seg_dists(g, n)
        rem0 = s["r"] * _polyline_length(ds)
        return _let(
            F.struct(g.alias("g"), ds.alias("ds"), rem0.alias("r0")),
            lambda c: _walk(c["g"], c["ds"], (F.size(c["g"]) / 2).cast("int"), c["r0"], clamp_t=False),
        )

    r = ratio if isinstance(ratio, Column) else F.lit(float(ratio))
    return _let(F.struct(geom.alias("g"), r.alias("r")), stage)


def point_at_offset(geom: Column, offset) -> Column:
    """PolylineShapeXZ.pointAtOffset (PolylineShapeXZ.java:87-116): the
    point at an absolute distance from the start — same walk as
    interpolate_on but with the reference's max(0, offset/length) clamp
    and the last-vertex fallback. Returns struct(px, pz)."""
    def stage(s):
        g = s["g"]
        n = (F.size(g) / 2).cast("int")
        ds = _seg_dists(g, n)
        return _let(
            F.struct(g.alias("g"), ds.alias("ds"), s["o"].alias("r0")),
            lambda c: _walk(c["g"], c["ds"], (F.size(c["g"]) / 2).cast("int"), c["r0"], clamp_t=True),
        )

    o = offset if isinstance(offset, Column) else F.lit(float(offset))
    return _let(F.struct(geom.alias("g"), o.alias("o")), stage)


def interpolate_ele_of_polyline(geom: Column, ele1, ele2) -> Column:
    """GeometryUtil.interpolateEleOfPolyline (GeometryUtil.java:494-497
    over interpolateEleOfSegment :471-491) for the polyline's own
    vertices: each vertex's elevation ratio is offsetOf(closestPoint(v))
    / getLength(); for a vertex of the line, closestPoint(v) == v and
    offsetOf takes the indexOf exact-vertex path
    (PolylineShapeXZ.java:48-54) — the prefix length at the FIRST
    occurrence of the coordinates (a revisited point maps to its first
    visit, reproduced faithfully). ele = interpolateBetween((0, ele1),
    (1, ele2), ratio).z = ele1 * (1 - r) + ele2 * r. Returns
    array<double> of per-vertex elevations."""
    e1 = ele1 if isinstance(ele1, Column) else F.lit(float(ele1))
    e2 = ele2 if isinstance(ele2, Column) else F.lit(float(ele2))

    def stage(s):
        g, a, b = s["g"], s["e1"], s["e2"]
        n = (F.size(g) / 2).cast("int")
        ds = _seg_dists(g, n)
        total = _polyline_length(ds)

        def ele(i):
            first = F.aggregate(
                F.sequence(F.lit(0), n - 1),
                F.lit(-1),
                lambda best, j: F.when(
                    (best == -1)
                    & (_x(g, j) == _x(g, i))
                    & (_z(g, j) == _z(g, i)),
                    j.cast("int"),
                ).otherwise(best),
            )
            prefix = F.aggregate(
                F.slice(ds, 1, first), F.lit(0.0), lambda acc, d: acc + d
            )
            r = prefix / total
            return a * (1 - r) + b * r

        return F.transform(F.sequence(F.lit(0), n - 1), ele)

    return _let(
        F.struct(geom.alias("g"), e1.alias("e1"), e2.alias("e2")), stage
    )
