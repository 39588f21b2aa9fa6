"""Polyline point-distribution functions (pure Column expressions).

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
