"""distribute_points_along vs a faithful replica of the reference loop
(GeometryUtil.equallyDistributePointsAlong, GeometryUtil.java:548-676)."""

import math
import random

import pytest

from pyspark.sql import functions as F


def _reference_distribute(points, preferred, at_ends):
    """Line-for-line replica of the Java algorithm (running accumulation
    and all), the oracle for the Column implementation."""
    length = 0.0
    for a, b in zip(points, points[1:]):
        length += math.hypot(b[0] - a[0], b[1] - a[1])
    num_segments = math.floor(length / preferred + 0.5)
    if num_segments == 0:
        return []
    point_distance = length / num_segments
    num_points = num_segments + 1 if at_ends else num_segments
    result = []
    current = 0.0 if at_ends else point_distance / 2
    cur_in = 0
    off_cur = 0.0
    off_next = math.hypot(points[1][0] - points[0][0], points[1][1] - points[0][1])
    for i in range(num_points):
        if at_ends and i == num_points - 1:
            result.append(points[-1])
            break
        while current > off_next:
            cur_in += 1
            off_cur = off_next
            off_next = off_cur + math.hypot(
                points[cur_in + 1][0] - points[cur_in][0],
                points[cur_in + 1][1] - points[cur_in][1],
            )
        r = (current - off_cur) / (off_next - off_cur)
        a, b = points[cur_in], points[cur_in + 1]
        result.append((a[0] + (b[0] - a[0]) * r, a[1] + (b[1] - a[1]) * r))
        current += point_distance
    return result


def _run(spark, polyline, preferred, at_ends):
    from osm2world_spark.functions.polyline import distribute_points_along

    packed = [float(c) for p in polyline for c in p]
    df = spark.createDataFrame([(packed,)], "geom array<double>")
    col = distribute_points_along(
        F.col("geom"), F.lit(float(preferred)), F.lit(bool(at_ends))
    )
    rows = df.select(F.explode(col).alias("p")).select("p.i", "p.px", "p.pz").collect()
    return [(r.px, r.pz) for r in sorted(rows, key=lambda r: r.i)]


def test_matches_reference_on_random_polylines(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(12):
        n = rng.randint(2, 7)
        pts = [(rng.uniform(0, 100), rng.uniform(0, 100)) for _ in range(n)]
        cases.append((pts, rng.uniform(3, 40), rng.random() < 0.5))
    for pts, pref, at_ends in cases:
        expected = _reference_distribute(pts, pref, at_ends)
        got = _run(spark, pts, pref, at_ends)
        assert len(got) == len(expected), (pts, pref, at_ends)
        for (gx, gz), (ex, ez) in zip(got, expected):
            assert gx == pytest.approx(ex, abs=1e-9)
            assert gz == pytest.approx(ez, abs=1e-9)


def test_endpoints_and_spacing(spark):
    pts = [(0.0, 0.0), (10.0, 0.0)]
    got = _run(spark, pts, 2.5, True)
    assert got[0] == pytest.approx((0.0, 0.0))
    assert got[-1] == pytest.approx((10.0, 0.0))
    assert len(got) == 5
    for (x0, _), (x1, _) in zip(got, got[1:]):
        assert x1 - x0 == pytest.approx(2.5)


def test_half_spacing_when_not_at_ends(spark):
    got = _run(spark, [(0.0, 0.0), (10.0, 0.0)], 2.5, False)
    assert len(got) == 4
    assert got[0] == pytest.approx((1.25, 0.0))
    assert got[-1] == pytest.approx((8.75, 0.0))


def test_zero_segments_returns_empty(spark):
    # round(length/preferred) == 0 -> no points (GeometryUtil.java:556-558)
    assert _run(spark, [(0.0, 0.0), (1.0, 0.0)], 10.0, True) == []


def test_multi_segment_bend(spark):
    pts = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]
    got = _run(spark, pts, 2.0, True)
    expected = _reference_distribute(pts, 2.0, True)
    assert len(got) == 5
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, abs=1e-12)
    assert (4.0, 0.0) == pytest.approx(got[2])  # the corner vertex


def test_interpolate_on_triangle(spark):
    from osm2world_spark.functions.polyline import interpolate_on_triangle

    df = spark.createDataFrame(
        [
            # (probe), triangle (0,0)(4,0)(0,4), values 10, 20, 30
            (1.0, 1.0),   # inside
            (0.0, 0.0),   # vertex 1 -> exactly v1
            (2.0, 0.0),   # edge midpoint v1-v2 -> 15
            (-2.0, -2.0),  # outside with weight1 > 1 -> NULL
            (4.0, 4.0),   # outside but only NEGATIVE weights: the
                          # reference's guard checks weight > 1 only, so
                          # it extrapolates here — faithful quirk
        ],
        "px double, pz double",
    )
    col = interpolate_on_triangle(
        F.col("px"), F.col("pz"),
        F.lit(0.0), F.lit(0.0), F.lit(4.0), F.lit(0.0), F.lit(0.0), F.lit(4.0),
        F.lit(10.0), F.lit(20.0), F.lit(30.0),
    )
    vals = [r.v for r in df.select(col.alias("v")).collect()]
    assert vals[0] == pytest.approx(10 * 0.5 + 20 * 0.25 + 30 * 0.25)
    assert vals[1] == pytest.approx(10.0)
    assert vals[2] == pytest.approx(15.0)
    assert vals[3] is None
    assert vals[4] == pytest.approx(-1 * 10 + 1 * 20 + 1 * 30)
    # degenerate triangle -> NULL, not an ANSI error
    d = df.limit(1).select(
        interpolate_on_triangle(
            F.col("px"), F.col("pz"),
            F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(1.0), F.lit(2.0), F.lit(2.0),
            F.lit(1.0), F.lit(2.0), F.lit(3.0),
        ).alias("v")
    ).collect()
    assert d[0].v is None


def test_insert_into_polygon(spark):
    from osm2world_spark.functions.polyline import insert_into_polygon

    ring = [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    df = spark.createDataFrame([(ring,)], "geom array<double>")

    def run(px, pz, snap):
        col = insert_into_polygon(F.col("geom"), F.lit(px), F.lit(pz), F.lit(snap))
        return df.select(col.alias("g")).collect()[0].g

    # point below the bottom edge -> inserted between v0 and v1
    assert run(4.0, -2.0, 0.5) == [0.0, 0.0, 4.0, -2.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    # point close to a corner within snap -> unchanged
    assert run(0.3, -0.2, 1.0) == ring
    # point right of the right edge -> inserted between v1 and v2
    assert run(12.0, 5.0, 0.5) == [0.0, 0.0, 10.0, 0.0, 12.0, 5.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]
    # interior point inserts into the closest (bottom) edge
    assert run(5.0, 1.0, 0.5) == [0.0, 0.0, 5.0, 1.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0]


# ---------------------------------------------------------------- replicas
# line-for-line Python replicas of the reference Java, used as oracles

def _sa(loop):
    """SimplePolygonXZ.calculateSignedArea:664-675."""
    s = 0.0
    for i in range(len(loop) - 1):
        s += loop[i][0] * loop[i + 1][1]
        s -= loop[i + 1][0] * loop[i][1]
    return s / 2


def _right_of(p, l1, l2):
    return 0 > (p[1] - l1[1]) * (l2[0] - l1[0]) - (p[0] - l1[0]) * (l2[1] - l1[1])


def _true_int(a1, a2, b1, b2):
    if a1 == b1 or a1 == b2 or a2 == b1 or a2 == b2:
        return False
    vx, vz = a2[0] - a1[0], a2[1] - a1[1]
    qx, qz = b2[0] - b1[0], b2[1] - b1[1]
    denom = vz * qx - vx * qz
    if abs(denom) <= 1e-4:
        return False
    inv = 1.0 / denom
    amcx, amcz = b1[0] - a1[0], b1[1] - a1[1]
    t = (amcz * qx - amcx * qz) * inv
    s = (amcz * vx - amcx * vz) * inv
    return 0 <= t <= 1 and 0 <= s <= 1


def _java_simplify_pass(loop, tol):
    """SimplePolygonXZ.getSimplifiedPolygon(double):375-414 (returns None
    where the Java constructor would throw InvalidGeometryException)."""
    import math

    verts = loop[:-1]
    n = len(verts)
    delete = []
    for i in range(n):
        bx, bz = verts[i][0] - verts[i - 1][0], verts[i][1] - verts[i - 1][1]
        ax = verts[(i + 1) % n][0] - verts[i][0]
        az = verts[(i + 1) % n][1] - verts[i][1]
        lb, la = math.sqrt(bx * bx + bz * bz), math.sqrt(ax * ax + az * az)
        dot = (bx / lb) * (ax / la) + (bz / lb) * (az / la)
        delete.append(abs(dot - 1) < tol)
    dc = sum(delete)
    if dc == 0 or dc > n - 3:
        return loop
    kept = [v for v, d in zip(verts, delete) if not d]
    new = kept + [kept[0]]
    # constructor validity (SimplePolygonXZ.java:40-51)
    m = len(kept)
    for i in range(m):
        if new[i] == new[i + 1]:
            return None
    for a in range(m):
        for b in range(a + 2, m):
            if a == 0 and b == m - 1:
                continue
            if _true_int(new[a], new[a + 1], new[b], new[b + 1]):
                return None
    area = abs(_sa(new))
    if area == 0 or area < 1e-6:
        return None
    return new


def _java_simplified(loop):
    """SimplePolygonXZ.getSimplifiedPolygon():355-369."""
    result = _java_simplify_pass(loop, 0.05)
    area = abs(_sa(loop))
    if result is None or abs(abs(_sa(result)) - area) / area > 0.1:
        result = _java_simplify_pass(loop, 0.001)
    return result if result is not None else loop


def _hull_part(vs):
    """SimplePolygonXZ.convexHullPart:498-535."""
    if len(vs) < 3:
        return list(vs)
    res = [vs[0], vs[1]]
    for v in vs[2:]:
        while len(res) > 1 and _right_of(res[-2], v, res[-1]):
            res.pop()
        res.append(v)
    return res


def _java_hull(loop):
    """SimplePolygonXZ.convexHull:444-493 (returns the closed loop)."""
    verts = loop[:-1]
    cw = _sa(loop) < 0
    vertices = verts if cw else [verts[0]] + verts[1:][::-1]
    min_v = min(vertices, key=lambda v: v[0])
    max_v = max(vertices, key=lambda v: v[0])
    min_i, max_i = vertices.index(min_v), vertices.index(max_v)
    upper, lower = [vertices[min_i]], [vertices[max_i]]
    i = (min_i + 1) % len(vertices)
    while i != max_i:
        upper.append(vertices[i])
        i = (i + 1) % len(vertices)
    upper.append(vertices[max_i])
    i = (max_i + 1) % len(vertices)
    while i != min_i:
        lower.append(vertices[i])
        i = (i + 1) % len(vertices)
    lower.append(vertices[min_i])
    res = _hull_part(upper) + _hull_part(lower)[1:]
    if not cw:
        res = res[::-1]
    return res


def _pack(loop):
    return [c for v in loop for c in v]


def _unpack(flat):
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]


def _run_ring_fn(spark, fn, loops):
    df = spark.createDataFrame([(l,) for l in map(_pack, loops)], "geom array<double>")
    return [
        _unpack(r.g) for r in df.select(fn(F.col("geom")).alias("g")).collect()
    ]


def _random_radial_loop(rng, m, cw=False):
    import math

    pts = []
    phase = rng.random() * 2 * math.pi
    for j in range(m):
        th = 2 * math.pi * j / m + phase
        r = 10.0 + rng.random() * 8.0
        pts.append((r * math.cos(th), r * math.sin(th)))
    if cw:
        pts = pts[::-1]
    return pts + [pts[0]]


def test_simplified_polygon_branches(spark):
    from osm2world_spark.functions.polyline import simplified_polygon

    # sliver: D survives only the 0.001 pass (area check rejects 0.05),
    # M (exactly collinear) is deleted by both
    a, b, c = (0.0, 0.0), (100.0, 0.0), (100.0, 2.0)
    d, e, m = (50.0, 6.0), (0.0, 2.0), (0.0, 1.0)
    sliver = [a, b, c, d, e, m, a]
    # rectangle with one on-edge midpoint: dropped at 0.05, area unchanged
    rect = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0), (10.0, 8.0), (0.0, 8.0), (0.0, 0.0)]
    # regular 20-gon: every dot within 0.05 -> deleteCount > n-3 -> original
    import math

    gon = [
        (math.cos(2 * math.pi * j / 20), math.sin(2 * math.pi * j / 20))
        for j in range(20)
    ]
    gon = gon + [gon[0]]
    # square: nothing deletable at either tolerance
    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]

    loops = [sliver, rect, gon, sq]
    got = _run_ring_fn(spark, simplified_polygon, loops)
    for loop, g in zip(loops, got):
        assert g == _java_simplified(loop), loop
    # the sliver kept D (0.001 pass) and dropped only M
    assert got[0] == [a, b, c, d, e, a]
    # the rectangle midpoint is gone via the 0.05 pass
    assert got[1] == [(0.0, 0.0), (10.0, 0.0), (10.0, 8.0), (0.0, 8.0), (0.0, 0.0)]
    assert got[2] == gon
    assert got[3] == sq


def test_simplified_polygon_random(spark):
    import random

    from osm2world_spark.functions.polyline import simplified_polygon

    rng = random.Random(4242)
    loops = []
    for _ in range(24):
        base = _random_radial_loop(rng, 6 + rng.randrange(5), cw=rng.random() < 0.5)
        # inject near-collinear midpoints with varying perpendicular offset
        out = []
        for p, q in zip(base[:-1], base[1:]):
            out.append(p)
            if rng.random() < 0.6:
                mx, mz = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
                ex, ez = q[0] - p[0], q[1] - p[1]
                ln = (ex * ex + ez * ez) ** 0.5
                off = rng.choice([0.0, 0.01, 0.05, 0.3]) * ln
                out.append((mx - ez / ln * off, mz + ex / ln * off))
        loops.append(out + [out[0]])
    got = _run_ring_fn(spark, simplified_polygon, loops)
    for loop, g in zip(loops, got):
        assert g == _java_simplified(loop)


def test_convex_hull_matches_java_replica(spark):
    import random

    from osm2world_spark.functions.polyline import convex_hull_ring

    rng = random.Random(777)
    loops = [_random_radial_loop(rng, 5 + rng.randrange(9), cw=rng.random() < 0.5)
             for _ in range(30)]
    # plus fixed cases: triangle, square with a notch (concave), both senses
    loops.append([(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)])
    notch = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.5), (0.0, 4.0), (0.0, 0.0)]
    loops.append(notch)
    loops.append(notch[::-1])
    got = _run_ring_fn(spark, convex_hull_ring, loops)
    for loop, g in zip(loops, got):
        assert g == _java_hull(loop), loop


def test_convex_hull_drops_concavity(spark):
    from osm2world_spark.functions.polyline import convex_hull_ring

    notch = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.5), (0.0, 4.0), (0.0, 0.0)]
    (got,) = _run_ring_fn(spark, convex_hull_ring, [notch])
    assert (2.0, 1.5) not in got
    assert set(got) == {(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)}
    assert got[0] == got[-1] == (0.0, 0.0)  # closed, starts at min-x vertex
