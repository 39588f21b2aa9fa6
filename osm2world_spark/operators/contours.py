"""Marching-squares contour extraction over the raster pixel table —
the terrain-isoline pass of a cartographic/terrain pipeline (the
analytic twin of the reference's terrain surface handling,
core/.../map_elevation/ElevationProfile + TerrainInterpolator usage;
the reference renders the surface, this emits its isolines as rows).

Relational shape: the input is the same (cell_lon, cell_lat, px, py,
elev) frame every raster source emits (sources/raster.py,
sources/srtm.py).  A marching-squares cell needs the 2x2 corner block
(z00 z10 / z01 z11); instead of three self-joins (px+1, py+1,
px+1&py+1 — three shuffles and a 4x-wide intermediate) the corners
come from TWO adjacency-guarded windows, exactly the
``raster_gradients`` pattern:

  1. row window  (cell, py) ORDER BY px: lead(z)  -> z10
  2. col window  (cell, px) ORDER BY py: lead(z)  -> z01,
                                          lead(z10) -> z11

Two exchanges total, each carrying the raster once.  Level selection,
the 4-bit case classification, the saddle disambiguation, and the
segment table are all whole-stage-codegen Column arithmetic; the only
row multiplier is one ``explode`` over the levels a cell actually
crosses (bounded by corner-span / interval) and one over the <=2
segments per crossed level — no shuffle after the windows.  Contouring
a planet-scale DEM therefore costs exactly two exchanges end to end.

Determinism / hash contract: elevations are integers (int16 in the
SRTM layout), levels are integer multiples of ``interval``, so the
case index, the saddle test (corner-sum vs 4*level — exact), and the
edge-crossing parameters are EXACT integer rationals.  Each endpoint
is emitted as (edge, t_num, t_den) with t = t_num/t_den in [0, 1] the
fraction along the edge's canonical direction (t=0 / t=1 exactly when
a corner sits ON the level — the b = z > level rule keeps such corners
on the below side, so the crossing lands on the corner itself) — bit-replayable by any
engine, no float in the contract.  Consumers wanting coordinates apply
px + t / py + t per the edge table below.

Edge codes (canonical direction, t measured from the first corner):
  0 = top    c00 -> c10   point = (px + t, py)
  1 = right  c10 -> c11   point = (px + 1, py + t)
  2 = bottom c01 -> c11   point = (px + t, py + 1)
  3 = left   c00 -> c01   point = (px,     py + t)

Corner bit b = (z > level); crossing edges always have one corner
> level and one <= level, so t_den is never 0.  Cells touching
no-data pixels (blank_value) or the grid border emit nothing — the
isoline stops at the data boundary, matching how the reference's
terrain skips voids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.raster import BLANK_VALUE

# marching-squares segment table, shared verbatim by the Column builder
# below and the SQL-oracle generator (segments_case_codes): for each
# case index (b00*1 + b10*2 + b11*4 + b01*8, b = corner > level) the
# (edge_a, edge_b) pairs of the emitted segments.  Cases 5/10 are the
# saddles; they key on the center test (corner sum > 4*level) instead.
_BASE_SEGMENTS: dict[int, tuple[tuple[int, int], ...]] = {
    0: (),
    15: (),
    1: ((0, 3),),
    14: ((0, 3),),
    2: ((0, 1),),
    13: ((0, 1),),
    3: ((3, 1),),
    12: ((3, 1),),
    4: ((1, 2),),
    11: ((1, 2),),
    6: ((0, 2),),
    9: ((0, 2),),
    7: ((3, 2),),
    8: ((3, 2),),
}
_SADDLE_SEGMENTS: dict[tuple[int, bool], tuple[tuple[int, int], ...]] = {
    # above-corners on the TL-BR diagonal (case 5 = c00+c11)
    (5, True): ((0, 1), (2, 3)),   # center above: TL-BR connected
    (5, False): ((0, 3), (1, 2)),  # center below: corners isolated
    # above-corners on the TR-BL diagonal (case 10 = c10+c01)
    (10, True): ((0, 3), (1, 2)),
    (10, False): ((0, 1), (2, 3)),
}


def segments_for(case: int, center_above: bool) -> tuple[tuple[int, int], ...]:
    """The segment table entry for a case (saddles consult the center)."""
    if case in (5, 10):
        return _SADDLE_SEGMENTS[(case, center_above)]
    return _BASE_SEGMENTS[case]


def segments_case_codes() -> list[tuple[str, list[int]]]:
    """The same table as (condition-kind, integer segment codes) rows
    for engines without struct literals: each segment encodes as
    seg*100 + edge_a*10 + edge_b.  Condition kinds are ``"<case>"`` or
    ``"<case>/above"`` / ``"<case>/below"`` for the saddles.  The SQL
    oracle in ``__spark_entry__`` is GENERATED from this so the two
    engines can never disagree on the table."""
    out: list[tuple[str, list[int]]] = []
    for case in range(16):
        if case in (5, 10):
            for center in (True, False):
                segs = _SADDLE_SEGMENTS[(case, center)]
                out.append(
                    (
                        f"{case}/{'above' if center else 'below'}",
                        [i * 100 + a * 10 + b for i, (a, b) in enumerate(segs)],
                    )
                )
        else:
            segs = _BASE_SEGMENTS[case]
            out.append(
                (str(case), [i * 100 + a * 10 + b for i, (a, b) in enumerate(segs)])
            )
    return out


def corner_frame(
    raster: DataFrame,
    cell_cols: tuple[str, ...] = ("cell_lon", "cell_lat"),
    blank_value: int = BLANK_VALUE,
) -> DataFrame:
    """(cell_cols..., px, py, z00, z10, z01, z11): the 2x2 corner block
    anchored at each pixel, via two adjacency-guarded windows (see
    module docstring).  Rows where ANY corner is missing (border,
    subsampling gap, no-data) are dropped — marching squares cannot
    classify an incomplete cell."""
    cc = list(cell_cols)
    z = F.when(F.col("elev") != blank_value, F.col("elev").cast("bigint"))
    wr = Window.partitionBy(*cc, "py").orderBy("px")
    row = raster.select(
        *cc,
        "px",
        "py",
        z.alias("z00"),
        F.when(F.lead("px").over(wr) == F.col("px") + 1, F.lead(z).over(wr)).alias(
            "z10"
        ),
    )
    wc = Window.partitionBy(*cc, "px").orderBy("py")
    nxt = F.lead("py").over(wc) == F.col("py") + 1
    out = row.select(
        *cc,
        "px",
        "py",
        "z00",
        "z10",
        F.when(nxt, F.lead("z00").over(wc)).alias("z01"),
        F.when(nxt, F.lead("z10").over(wc)).alias("z11"),
    )
    return out.where(
        F.col("z00").isNotNull()
        & F.col("z10").isNotNull()
        & F.col("z01").isNotNull()
        & F.col("z11").isNotNull()
    )


def _segs_lit(segs: tuple[tuple[int, int], ...]):
    if not segs:
        return F.array().cast("array<struct<seg:int,ea:int,eb:int>>")
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("seg"),
                F.lit(a).cast("int").alias("ea"),
                F.lit(b).cast("int").alias("eb"),
            )
            for i, (a, b) in enumerate(segs)
        ]
    )


def contour_segments(
    raster: DataFrame,
    interval: int,
    cell_cols: tuple[str, ...] = ("cell_lon", "cell_lat"),
    blank_value: int = BLANK_VALUE,
) -> DataFrame:
    """Isoline segments at every level = k*interval a cell crosses.

    Output: (cell_cols..., px, py, level, seg, ea, ta_num, ta_den,
    eb, tb_num, tb_den) — one row per segment, endpoints as exact
    rationals along the coded edges (module docstring).  ``seg`` is
    the 0/1 index within a (cell, level) — only saddles emit 2.
    """
    if interval <= 0:
        raise ValueError("interval must be a positive integer")
    corners = corner_frame(raster, cell_cols=cell_cols, blank_value=blank_value)
    cc = list(cell_cols)
    z00, z10, z01, z11 = (F.col(c) for c in ("z00", "z10", "z01", "z11"))
    zmin = F.least(z00, z10, z01, z11)
    zmax = F.greatest(z00, z10, z01, z11)
    # levels k*interval with zmin <= level < zmax (a level outside that
    # range yields case 0/15 = no segments).  ceil(a/I) = floor((a+I-1)/I)
    # holds for all integer a, I>0; the double division is exact-rank
    # at int16..int32 magnitudes (quotient never within ulp of a wrong
    # integer, same argument as functions/projection.py).
    kmin = F.floor((zmin + interval - 1) / F.lit(float(interval))).cast("bigint")
    kmax = (F.floor((zmax + interval - 1) / F.lit(float(interval))) - 1).cast("bigint")
    lv = corners.withColumn(
        "k",
        F.explode(
            F.when(kmax >= kmin, F.sequence(kmin, kmax)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    ).withColumn("level", F.col("k") * interval)
    level = F.col("level")
    case = (
        (z00 > level).cast("int")
        + (z10 > level).cast("int") * 2
        + (z11 > level).cast("int") * 4
        + (z01 > level).cast("int") * 8
    )
    center_above = (z00 + z10 + z11 + z01) > level * 4
    segs = None
    for c in range(16):
        if c in (5, 10):
            for ctr in (True, False):
                cond = (F.col("ms_case") == c) & (
                    F.col("ms_center") if ctr else ~F.col("ms_center")
                )
                lit = _segs_lit(segments_for(c, ctr))
                segs = F.when(cond, lit) if segs is None else segs.when(cond, lit)
        else:
            lit = _segs_lit(segments_for(c, False))
            cond = F.col("ms_case") == c
            segs = F.when(cond, lit) if segs is None else segs.when(cond, lit)
    exploded = (
        lv.withColumn("ms_case", case)
        .withColumn("ms_center", center_above)
        .withColumn("s", F.explode(segs))
    )

    def _num(edge):
        # t_num = level - z_first(edge)
        return (
            F.when(edge == 0, level - z00)
            .when(edge == 1, level - z10)
            .when(edge == 2, level - z01)
            .otherwise(level - z00)
        )

    def _den(edge):
        # t_den = z_second(edge) - z_first(edge); never 0 on a crossing
        return (
            F.when(edge == 0, z10 - z00)
            .when(edge == 1, z11 - z10)
            .when(edge == 2, z11 - z01)
            .otherwise(z01 - z00)
        )

    ea, eb = F.col("s.ea"), F.col("s.eb")
    return exploded.select(
        *cc,
        "px",
        "py",
        "level",
        F.col("s.seg").alias("seg"),
        ea.alias("ea"),
        _num(ea).alias("ta_num"),
        _den(ea).alias("ta_den"),
        eb.alias("eb"),
        _num(eb).alias("tb_num"),
        _den(eb).alias("tb_den"),
    )


def contour_points(segments: DataFrame) -> DataFrame:
    """Float convenience view: resolves the rational endpoints into
    (xa, ya, xb, yb) pixel coordinates per the edge table.  Analysis /
    rendering only — the hash contract stays on the rationals."""

    def _xy(edge, num, den, which):
        t = num.cast("double") / den.cast("double")
        x = (
            F.when(edge == 0, F.col("px") + t)
            .when(edge == 1, F.col("px") + 1)
            .when(edge == 2, F.col("px") + t)
            .otherwise(F.col("px").cast("double"))
        )
        y = (
            F.when(edge == 0, F.col("py").cast("double"))
            .when(edge == 1, F.col("py") + t)
            .when(edge == 2, (F.col("py") + 1).cast("double"))
            .otherwise(F.col("py") + t)
        )
        return x.alias(f"x{which}"), y.alias(f"y{which}")

    xa, ya = _xy(F.col("ea"), F.col("ta_num"), F.col("ta_den"), "a")
    xb, yb = _xy(F.col("eb"), F.col("tb_num"), F.col("tb_den"), "b")
    return segments.select("*", xa, ya, xb, yb)


# ---------------------------------------------------------------- stitching

# node-key packing bounds: pixel coords < 2^20 (1M-pixel rasters; the
# planet-wide global grid is 360*1201 = 432,360 columns, 180*1201 =
# 216,180 rows — both comfortably inside), level-index*2+orient < 2^22
# — 62 bits total
_XY_BITS = 1 << 20
_K_LIMIT = 1 << 22


def halo_raster(raster: DataFrame, cell_pixels: int) -> DataFrame:
    """Stencil halo exchange for the per-cell marching-squares windows:
    every cell gains its east / north / north-east neighbors' border
    pixels as virtual rows at px = cell_pixels / py = cell_pixels, so
    the 2x2 corner block anchored at a cell's last row/column is
    complete and seam-crossing cells classify exactly like interior
    ones.

    This is the classic distributed-stencil move: THREE filtered
    projections over the border rows only (2/cell_pixels of the data —
    0.17% at SRTM 1201) union onto the raster; the re-keyed rows ride
    the window exchange the contour pass already pays, so planet-scale
    seam correctness costs no extra shuffle.  Works on the abutting
    pixel-center convention of sources/raster.py (global pixel
    gx = (cell_lon+180)*cell_pixels + px); for rasters whose tiles
    share the border sample (classic SRTM .hgt) drop the duplicate row
    first and the same halo applies.

    Halo rows are corner DATA only, never anchors: an anchor at
    px = cell_pixels would need px = cell_pixels + 1, which never
    exists, so corner_frame's completeness guard drops it — every
    marching-squares cell is computed exactly once, in its home cell."""
    if cell_pixels <= 0:
        raise ValueError("cell_pixels must be positive")
    n = cell_pixels
    east = (
        raster.where(F.col("px") == 0)
        .withColumn("cell_lon", F.col("cell_lon") - 1)
        .withColumn("px", F.lit(n).cast("int"))
    )
    north = (
        raster.where(F.col("py") == 0)
        .withColumn("cell_lat", F.col("cell_lat") - 1)
        .withColumn("py", F.lit(n).cast("int"))
    )
    corner = (
        raster.where((F.col("px") == 0) & (F.col("py") == 0))
        .withColumn("cell_lon", F.col("cell_lon") - 1)
        .withColumn("cell_lat", F.col("cell_lat") - 1)
        .withColumn("px", F.lit(n).cast("int"))
        .withColumn("py", F.lit(n).cast("int"))
    )
    return raster.unionByName(east).unionByName(north).unionByName(corner)


def endpoint_nodes(
    segments: DataFrame, interval: int, cell_pixels: int | None = None
) -> DataFrame:
    """Two rows per segment — one per endpoint — keyed by the GLOBAL
    grid-edge identity of the crossing, so the same isoline crossing
    seen from the two cells sharing a grid edge gets the SAME node id:

      edge 0 (top)    -> horizontal grid edge (px,   py),   orient 0
      edge 2 (bottom) -> horizontal grid edge (px,   py+1), orient 0
      edge 1 (right)  -> vertical   grid edge (px+1, py),   orient 1
      edge 3 (left)   -> vertical   grid edge (px,   py),   orient 1

    node = ((level/interval * 2 + orient) * 2^20 + ex) * 2^20 + ey —
    a pure-Column bigint pack (bounds in _XY_BITS/_K_LIMIT), including
    the level so different isolines never connect.  Output adds
    (node, end) with end 0/1 for the a/b endpoint.

    With ``cell_pixels`` set, (ex, ey) are GLOBAL pixel coordinates
    ((cell_lon+180) * cell_pixels + ex, (cell_lat+90) * cell_pixels
    + ey) — the two cells flanking a tile seam then agree on the node
    id of a seam-edge crossing, so stitching connects isolines across
    the whole raster (pair with halo_raster so seam cells classify at
    all).  Planet bound: 360 * 1201 < 2^20, enforced below."""
    sn = segment_nodes(segments, interval, cell_pixels=cell_pixels)
    orig = segments.columns
    a = sn.select(*orig, F.lit(0).alias("end"), F.col("src").alias("node"))
    b = sn.select(*orig, F.lit(1).alias("end"), F.col("dst").alias("node"))
    return a.unionByName(b)


def _node_expr(edge, interval: int, cell_pixels: int | None):
    """The endpoint_nodes pack for one edge code, as a Column."""
    orient = F.when((edge == 1) | (edge == 3), F.lit(1)).otherwise(F.lit(0))
    ex = F.col("px") + F.when(edge == 1, F.lit(1)).otherwise(F.lit(0))
    ey = F.col("py") + F.when(edge == 2, F.lit(1)).otherwise(F.lit(0))
    if cell_pixels is not None:
        ex = (F.col("cell_lon") + 180) * cell_pixels + ex
        ey = (F.col("cell_lat") + 90) * cell_pixels + ey
    k = (F.col("level") / interval).cast("bigint")
    return (((k * 2 + orient) * _XY_BITS + ex) * _XY_BITS + ey).cast("bigint")


def segment_nodes(
    segments: DataFrame, interval: int, cell_pixels: int | None = None
) -> DataFrame:
    """segments + (src, dst) endpoint node ids as two pure-Column
    projections on the SAME row — no self-join, no shuffle (the
    endpoint identities were computed together by marching squares;
    splitting them apart only to join them back would cost an exchange
    per consumer).  src is the ea endpoint, dst the eb one."""
    if interval <= 0:
        raise ValueError("interval must be a positive integer")
    if cell_pixels is not None and 360 * cell_pixels >= _XY_BITS:
        # ex reaches (179+180+1)*cell_pixels; beyond 2^20 the pack
        # aliases across level indices and stitching silently fuses
        # unrelated isolines — refuse instead (SRTM3's 1201 fits; a
        # 3601-pixel SRTM1 planet grid needs a wider pack first)
        raise ValueError(
            f"cell_pixels={cell_pixels} overflows the 2^20 node pack "
            f"(360 * cell_pixels must stay below {_XY_BITS})"
        )
    return segments.select(
        "*",
        _node_expr(F.col("ea"), interval, cell_pixels).alias("src"),
        _node_expr(F.col("eb"), interval, cell_pixels).alias("dst"),
    )


def _guard_single_cell(segments: DataFrame, cell_pixels: int | None) -> None:
    """Without cell_pixels the node pack is cell-local, so feeding a
    multi-cell frame would collide node ids across cells and silently
    fuse unrelated lines — refuse (one bounded distinct-limit action;
    the iterative stitch runs several actions anyway)."""
    if cell_pixels is not None:
        return
    cc = [c for c in ("cell_lon", "cell_lat") if c in segments.columns]
    if not cc:
        return
    if segments.select(*cc).distinct().limit(2).count() > 1:
        raise ValueError(
            "multi-cell segment input requires cell_pixels= (global "
            "node identity); cell-local packs collide across cells"
        )


def stitch_contours(
    segments: DataFrame,
    interval: int,
    max_rounds: int = 16,
    cell_pixels: int | None = None,
) -> DataFrame:
    """Groups marching-squares segments into topological contour LINES:
    connected components over the endpoint-node graph (one line per
    component), using the pointer-doubled min-label propagation from
    operators/network.py — a ring of R segments converges in
    O(log R) rounds, so planet-scale coastline-length isolines stitch
    in ~a dozen iterative joins rather than R/2.

    Output, one row per line: (line_id = min node id in the line,
    level, n_segments, n_nodes, n_open_ends, closed).  A closed ring
    has every crossing shared by exactly 2 segments (n_open_ends = 0,
    n_nodes == n_segments); an isoline that exits the data boundary
    (grid border, no-data void) has exactly 2 open ends.  Marching
    squares never produces degree > 2 (a saddle's two segments use
    disjoint cell edges), so these are the only shapes.

    Without ``cell_pixels`` the node pack is cell-local, so the input
    must be a SINGLE cell's raster — enforced (_guard_single_cell)
    because a multi-cell frame would silently fuse unrelated lines
    through node-id collisions.  WITH it, node ids are global pixel
    coordinates and lines stitch across tile seams — feed halo_raster
    output through contour_segments first so the seam-straddling
    marching-squares cells exist at all.  The component propagation is
    pointer-doubled, so a coastline-length planet isoline of R
    segments converges in O(log R) rounds."""
    from .network import components_from_edges

    _guard_single_cell(segments, cell_pixels)
    pair = segment_nodes(segments, interval, cell_pixels=cell_pixels).select(
        "level", "src", "dst"
    )
    mentions = pair.select("level", F.col("src").alias("node")).unionByName(
        pair.select("level", F.col("dst").alias("node"))
    )
    nodes = mentions.select("node").distinct()
    edges = pair.select("src", "dst").unionByName(
        pair.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = components_from_edges(edges, nodes, max_rounds=max_rounds)
    deg = mentions.groupBy("level", "node").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.join(labels, "node")
        .groupBy(F.col("label").alias("line_id"))
        .agg(
            F.min("level").alias("level"),
            (F.sum("deg") / 2).cast("bigint").alias("n_segments"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum((F.col("deg") == 1).cast("int")).cast("int").alias("n_open_ends"),
        )
        .withColumn("closed", F.col("n_open_ends") == 0)
    )


# ------------------------------------------------------- vertex ordering


def order_contours(
    segments: DataFrame,
    interval: int,
    max_rounds: int = 24,
    cell_pixels: int | None = None,
) -> DataFrame:
    """Serializes each stitched contour line into its ORDERED edge
    sequence — the step that turns topological components into
    drawable/exportable polylines — via distributed LIST RANKING
    (Wyllie pointer jumping): every directed segment copy gets a
    successor (the unique continuation through its head node), ranks
    double-jump in O(log L) rounds, and seq = L - rank + 1 reads the
    traversal order off the converged ranks.  A coastline-length
    isoline of 10^6 segments orders in ~21 iterative joins instead of
    a 10^6-step sequential walk — the difference between feasible and
    not at planet scale, and the same O(log) discipline as the
    stitcher's pointer-doubled components.

    Canonical deterministic traversal: head h = the min open-end node
    for chains / the min node for rings; the first edge leaves h
    toward its smallest neighbor; rings break at the edge re-entering
    h.  Output, one row per segment: (line_id, level, seq, src, dst)
    with seq = 1..n_segments along the line (chains list V = E + 1
    nodes as src of 1..L plus the last dst; rings close back to h).

    Exactness: node ids, ranks, and the head/orientation rules are
    all integer — the output is a pure function of the input under
    any partitioning, same hash contract as stitch_contours."""
    _guard_single_cell(segments, cell_pixels)
    und = segment_nodes(segments, interval, cell_pixels=cell_pixels).select(
        "level", F.col("src").alias("u"), F.col("dst").alias("v")
    )
    dire = und.select("level", F.col("u").alias("src"), F.col("v").alias("dst")) \
        .unionByName(
            und.select("level", F.col("v").alias("src"), F.col("u").alias("dst"))
        )

    from .network import components_from_edges

    nodes = dire.select(F.col("src").alias("node")).distinct()
    labels = components_from_edges(
        dire.select("src", "dst"), nodes, max_rounds=max_rounds
    )
    deg = dire.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # per line: head h (min open end, else min node), ring flag, and
    # h's min/max neighbors (the canonical first edge and ring break)
    nl = deg.join(labels, deg["src"] == labels["node"]).select(
        "node", "deg", "label"
    )
    lines = nl.groupBy("label").agg(
        F.coalesce(
            F.min(F.when(F.col("deg") == 1, F.col("node"))), F.min("node")
        ).alias("h"),
        (F.min("deg") == 2).alias("is_ring"),
    )
    hnbrs = (
        dire.join(lines, dire["src"] == lines["h"])
        .groupBy("label", "h", "is_ring")
        .agg(F.min("dst").alias("nbr_a"), F.max("dst").alias("nbr_b"))
    )

    # successor of (src, dst): the edge leaving dst away from src;
    # NULL at open ends and (for rings) at the edge re-entering h
    nxt = dire.select(
        F.col("src").alias("j_src"), F.col("dst").alias("n_dst")
    )
    lab_e = dire.join(labels, dire["src"] == labels["node"]).select(
        "level", "src", "dst", "label"
    )
    info = lab_e.join(hnbrs, "label")
    alive = F.col("n_dst").isNotNull() & ~(
        F.col("is_ring") & (F.col("dst") == F.col("h"))
    )
    succ = (
        info.join(nxt, (F.col("dst") == F.col("j_src"))
                  & (F.col("n_dst") != F.col("src")), "left")
        .select(
            "level", "label", "h", "is_ring", "nbr_a", "nbr_b",
            "src", "dst",
            F.when(alive, F.col("dst")).alias("s_src"),
            F.when(alive, F.col("n_dst")).alias("s_dst"),
        )
    )
    frame = succ.select(
        "*",
        F.lit(1).cast("bigint").alias("rank"),
        F.when(F.col("s_src").isNull(), F.col("src")).alias("t_src"),
        F.when(F.col("s_src").isNull(), F.col("dst")).alias("t_dst"),
    ).localCheckpoint(eager=False)

    # Wyllie pointer jumping: rank += rank(succ); succ <- succ(succ);
    # terminal identity rides along.  One count action per round.
    pending = -1
    for _ in range(max_rounds):
        pending = frame.where(F.col("s_src").isNotNull()).count()
        if pending == 0:
            break
        s = frame.select(
            F.col("src").alias("k_src"), F.col("dst").alias("k_dst"),
            F.col("rank").alias("k_rank"),
            F.col("s_src").alias("k_ssrc"), F.col("s_dst").alias("k_sdst"),
            F.col("t_src").alias("k_tsrc"), F.col("t_dst").alias("k_tdst"),
        )
        frame = (
            frame.join(
                s,
                (F.col("s_src") == F.col("k_src"))
                & (F.col("s_dst") == F.col("k_dst")),
                "left",
            )
            .select(
                "level", "label", "h", "is_ring", "nbr_a", "nbr_b",
                "src", "dst",
                F.col("k_ssrc").alias("s_src"),
                F.col("k_sdst").alias("s_dst"),
                F.when(
                    F.col("k_rank").isNotNull(),
                    F.col("rank") + F.col("k_rank"),
                ).otherwise(F.col("rank")).alias("rank"),
                F.coalesce(F.col("t_src"), F.col("k_tsrc")).alias("t_src"),
                F.coalesce(F.col("t_dst"), F.col("k_tdst")).alias("t_dst"),
            )
            .localCheckpoint(eager=False)
        )

    if pending != 0 and frame.where(F.col("s_src").isNotNull()).count() > 0:
        # an unfinished jump would emit a scrambled order with no
        # signal — a line longer than ~2^max_rounds segments needs a
        # higher max_rounds, never silent truncation
        raise RuntimeError(
            f"order_contours did not converge within max_rounds="
            f"{max_rounds}; the longest line exceeds ~2^{max_rounds} "
            "segments"
        )

    # forward orbit: chains end anywhere but h; rings end at (nbr_b, h)
    fwd = frame.where(
        (~F.col("is_ring") & (F.col("t_dst") != F.col("h")))
        | (
            F.col("is_ring")
            & (F.col("t_dst") == F.col("h"))
            & (F.col("t_src") == F.col("nbr_b"))
        )
    )
    w = Window.partitionBy("label")
    return fwd.select(
        F.col("label").alias("line_id"),
        "level",
        (F.max("rank").over(w) - F.col("rank") + 1).alias("seq"),
        "src",
        "dst",
    )
