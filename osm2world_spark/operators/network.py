"""Road/rail network calculation: node classification, connector and
junction cut geometry, and network connected components.

Reference (/root/reference/core/src/main/java/org/osm2world/):
- world/network/NetworkCalculator.java — per-node dispatch (:45-115):
  >= 3 same-class segments form a junction, exactly 2 a connector, else
  orthogonal cuts; connector cut = angle bisector (:118-200, inVector/
  outVector inversion rules :129-133, equal-direction fallback to
  rightNormal :137-139, right-pointing normalization via the cross
  product sign :145-149); junction outline = neighbor-edge intersections
  (parallel threshold PI/18 :38) projected onto each segment, picking
  the farthest-back cut point via a 200 m-beyond reference point
  (:225-303); orthogonal end cut (:371-383).
- map_data/data/MapNode.java:134-170 — segments at a node are ordered by
  the clockwise angle (from +Z) of the node->other-endpoint direction
  (VectorXZ.angle(), VectorXZ.java:118-127).
- Node identity is positional (MapNode per coordinate), so the graph is
  derivable from segment endpoints alone.

Spark shape:
- endpoint explosion + groupBy(node) gives degrees/classes in one
  shuffle of pure Column math;
- connector cuts (degree-2 nodes) stay entirely in Column algebra: a
  window over the 2-row node group pairs the segments, everything else
  is arithmetic — whole-stage codegen, no Python;
- junction cut geometry (degree >= 3) is a numpy kernel over
  applyInPandas groups keyed by node — bounded per-node work (a junction
  has a handful of arms), horizontally scalable across nodes;
- connected components run alternating min-label propagation
  (large-star/small-star style) over the edge list: each round is one
  groupBy + join, labels monotonically decrease, and rounds are bounded
  by the graph diameter in label-hops — the standard Spark CC shape
  (no driver-side graph).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: NetworkCalculator.java:38-39
PARALLEL_ROAD_THRESHOLD_ANGLE = np.pi / 18
JUNCTION_OUTLINE_SNAP_DISTANCE = 0.01


def _node_key(x, z):
    """Positional node identity (MapNode per coordinate): exact-double
    string key, -0.0 folded into +0.0."""
    return F.concat_ws(
        ",", (x + F.lit(0.0)).cast("string"), (z + F.lit(0.0)).cast("string")
    )


def segment_endpoints(segments: DataFrame) -> DataFrame:
    """segments (seg_id, x1, z1, x2, z2, width?) -> one row per (segment,
    endpoint): node position, inbound flag (node == end node), the
    node->other-endpoint direction, and the reference's clockwise angle
    used for the per-node ordering (MapNode.sortLinesByAngle)."""
    cols = [F.col(c) for c in segments.columns]
    both = segments.select(
        *cols, F.explode(F.array(F.lit(False), F.lit(True))).alias("inbound")
    )
    nx = F.when(F.col("inbound"), F.col("x2")).otherwise(F.col("x1"))
    nz = F.when(F.col("inbound"), F.col("z2")).otherwise(F.col("z1"))
    ox = F.when(F.col("inbound"), F.col("x1")).otherwise(F.col("x2"))
    oz = F.when(F.col("inbound"), F.col("z1")).otherwise(F.col("z2"))
    dx = ox - nx
    dz = oz - nz
    length = F.sqrt(dx * dx + dz * dz)
    ndx = F.try_divide(dx, length)
    ndz = F.try_divide(dz, length)
    # VectorXZ.angle(): clockwise angle from +Z; acos(dz) for x >= 0,
    # 2*pi - acos(dz) otherwise (VectorXZ.java:118-127)
    angle = F.when((dx == 0.0) & (dz == 0.0), F.lit(0.0)).otherwise(
        F.when(ndx >= 0.0, F.acos(ndz)).otherwise(
            F.lit(2.0 * np.pi) - F.acos(ndz)
        )
    )
    return both.select(
        *cols,
        "inbound",
        _node_key(nx, nz).alias("node"),
        nx.alias("node_x"),
        nz.alias("node_z"),
        ndx.alias("dir_x"),
        ndz.alias("dir_z"),
        angle.alias("angle"),
    )


def node_degrees(segments: DataFrame) -> DataFrame:
    """(node, node_x, node_z, degree, kind): junction (>= 3), connector
    (2), end (1) — NetworkCalculator's per-node dispatch classes."""
    eps = segment_endpoints(segments)
    return eps.groupBy("node").agg(
        F.first("node_x").alias("node_x"),
        F.first("node_z").alias("node_z"),
        F.count("*").alias("degree"),
    ).withColumn(
        "kind",
        F.when(F.col("degree") >= 3, F.lit("junction"))
        .when(F.col("degree") == 2, F.lit("connector"))
        .otherwise(F.lit("end")),
    )


def connector_cuts(segments: DataFrame) -> DataFrame:
    """Cut geometry at degree-2 nodes, entirely in Column algebra
    (calculateConnectorNodeEffects with connectorLength = 0,
    NetworkCalculator.java:118-200).

    Output: one row per (node, segment) with the cut triple
    (left_x/left_z, center = node pos, right_x/right_z) oriented like
    setStartCut/setEndCut. s1/s2 follow the reference's clockwise-angle
    order at the node."""
    eps = segment_endpoints(segments)
    w = Window.partitionBy("node")
    deg = F.count("*").over(w)
    two = eps.withColumn("_deg", deg).where(F.col("_deg") == 2)
    # order the pair by angle (MapNode ordering); the partner's fields
    # arrive via min/max trick over the 2-row window
    ordw = Window.partitionBy("node").orderBy("angle", "seg_id")
    two = two.withColumn("_rank", F.row_number().over(ordw))
    s1 = two.where(F.col("_rank") == 1).select(
        "node",
        F.col("seg_id").alias("seg1"),
        F.col("inbound").alias("in1"),
        F.col("dir_x").alias("d1x_away"),
        F.col("dir_z").alias("d1z_away"),
        F.col("width").alias("w1"),
        "node_x",
        "node_z",
    )
    s2 = two.where(F.col("_rank") == 2).select(
        "node",
        F.col("seg_id").alias("seg2"),
        F.col("inbound").alias("in2"),
        F.col("dir_x").alias("d2x_away"),
        F.col("dir_z").alias("d2z_away"),
        F.col("width").alias("w2"),
    )
    p = s1.join(s2, "node")
    # inVector = dir(line1) inverted unless inbound1; outVector =
    # dir(line2) inverted if inbound2 (:129-133). With `away` = the
    # node->other direction (dir when outbound, -dir when inbound), both
    # rules collapse: inVector = -away1 always, outVector = +away2 always.
    ivx, ivz = -F.col("d1x_away"), -F.col("d1z_away")
    ovx, ovz = F.col("d2x_away"), F.col("d2z_away")
    same = (ivx == ovx) & (ivz == ovz)
    sx, sz = ovx - ivx, ovz - ivz
    slen = F.sqrt(sx * sx + sz * sz)
    cut_x0 = F.when(same, ovz).otherwise(sx / slen)  # rightNormal = (z, -x)
    cut_z0 = F.when(same, -ovx).otherwise(sz / slen)
    flip = (ivz * cut_x0 - ivx * cut_z0) <= 0.0  # :145-149
    cut_x = F.when(flip, -cut_x0).otherwise(cut_x0)
    cut_z = F.when(flip, -cut_z0).otherwise(cut_z0)

    # connectorLength = 0 (invisible connector): centers sit on the node;
    # toRight sign: segment1 inbound -> +, outbound -> -; segment2
    # mirrored (:160-188)
    def cut_row(seg, inb, wdt, sign_in, sign_out):
        sgn = F.when(inb, F.lit(sign_in)).otherwise(F.lit(sign_out))
        trx = cut_x * (wdt * 0.5) * sgn
        trz = cut_z * (wdt * 0.5) * sgn
        side = F.when(inb, F.lit("end")).otherwise(F.lit("start"))
        return F.struct(
            seg.alias("seg_id"),
            side.alias("side"),
            (F.col("node_x") - trx).alias("left_x"),
            (F.col("node_z") - trz).alias("left_z"),
            F.col("node_x").alias("center_x"),
            F.col("node_z").alias("center_z"),
            (F.col("node_x") + trx).alias("right_x"),
            (F.col("node_z") + trz).alias("right_z"),
            cut_x.alias("cut_x"),
            cut_z.alias("cut_z"),
        )

    rows = F.array(
        cut_row(F.col("seg1"), F.col("in1"), F.col("w1"), 1.0, -1.0),
        cut_row(F.col("seg2"), F.col("in2"), F.col("w2"), -1.0, 1.0),
    )
    return p.select("node", F.explode(rows).alias("c")).select("node", "c.*")


JUNCTION_SCHEMA = StructType(
    [
        StructField("node", StringType()),
        StructField("seg_id", StringType()),
        StructField("arm_idx", IntegerType()),
        StructField("side", StringType()),
        StructField("cut_x", DoubleType()),
        StructField("cut_z", DoubleType()),
        StructField("left_x", DoubleType()),
        StructField("left_z", DoubleType()),
        StructField("right_x", DoubleType()),
        StructField("right_z", DoubleType()),
    ]
)


def junction_cuts(segments: DataFrame) -> DataFrame:
    """Cut geometry at junction nodes (degree >= 3):
    calculateJunctionNodeEffects (NetworkCalculator.java:225-369) as a
    per-node numpy kernel over applyInPandas — neighbor-edge line
    intersections (parallel arms skipped under PI/18), perpendicular
    projection of the candidates onto each arm, farthest-from-beyond
    reference pick, and the width-scaled segment interface."""
    eps = segment_endpoints(segments)
    w = Window.partitionBy("node")
    ju = eps.withColumn("_deg", F.count("*").over(w)).where(F.col("_deg") >= 3)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for node, g in pdf.groupby("node", sort=False):
            g = g.sort_values(["angle", "seg_id"], kind="mergesort")
            n = len(g)
            nx0, nz0 = float(g["node_x"].iloc[0]), float(g["node_z"].iloc[0])
            # per-arm line geometry (the full segment, not just the arm)
            x1 = g["x1"].to_numpy(float)
            z1 = g["z1"].to_numpy(float)
            x2 = g["x2"].to_numpy(float)
            z2 = g["z2"].to_numpy(float)
            wid = g["width"].to_numpy(float)
            inb = g["inbound"].to_numpy(bool)
            dirx = (x2 - x1) / np.hypot(x2 - x1, z2 - z1)
            dirz = (z2 - z1) / np.hypot(x2 - x1, z2 - z1)
            rnx, rnz = dirz, -dirx  # rightNormal of the line direction
            cxm = (x1 + x2) / 2.0
            czm = (z1 + z2) / 2.0
            # step 1: intersection i between left edge of arm i and right
            # edge of arm i+1 (:233-275); outbound arms flip both vectors
            inter = [None] * n
            for i in range(n):
                j = (i + 1) % n
                sdx, sdz = dirx[i], dirz[i]
                svx, svz = -0.5 * wid[i] * rnx[i], -0.5 * wid[i] * rnz[i]
                if not inb[i]:  # startNode == junction -> flip
                    sdx, sdz, svx, svz = -sdx, -sdz, -svx, -svz
                spx, spz = cxm[i] + svx, czm[i] + svz
                tdx, tdz = dirx[j], dirz[j]
                tvx, tvz = 0.5 * wid[j] * rnx[j], 0.5 * wid[j] * rnz[j]
                if not inb[j]:
                    tdx, tdz, tvx, tvz = -tdx, -tdz, -tvx, -tvz
                tpx, tpz = cxm[j] + tvx, czm[j] + tvz
                # angleBetween(sDir, -tDir) < threshold -> parallel
                dot = sdx * (-tdx) + sdz * (-tdz)
                ang = np.arccos(min(1.0, max(-1.0, dot)))
                if ang < PARALLEL_ROAD_THRESHOLD_ANGLE:
                    continue
                den = sdx * tdz - sdz * tdx
                if den == 0.0:
                    continue
                t = ((tpx - spx) * tdz - (tpz - spz) * tdx) / den
                inter[i] = (spx + t * sdx, spz + t * sdz)
            # step 2: project candidates onto each arm's line, pick the
            # farthest from a point 201 m beyond the junction (:277-303)
            for i in range(n):
                cands = [(nx0, nz0)]
                if inter[i] is not None:
                    cands.append(inter[i])
                if inter[i - 1] is not None:
                    cands.append(inter[i - 1])
                px_, pz_ = x1[i], z1[i]
                qx_, qz_ = x2[i], z2[i]
                ux, uz = qx_ - px_, qz_ - pz_
                uu = ux * ux + uz * uz
                proj = [
                    (
                        px_ + ((cx - px_) * ux + (cz - pz_) * uz) / uu * ux,
                        pz_ + ((cx - px_) * ux + (cz - pz_) * uz) / uu * uz,
                    )
                    for cx, cz in cands
                ]
                tonx, tonz = nx0 - cxm[i], nz0 - czm[i]
                tlen = np.hypot(tonx, tonz)
                refx = cxm[i] + tonx / tlen * 201.0
                refz = czm[i] + tonz / tlen * 201.0
                best = max(proj, key=lambda p: np.hypot(p[0] - refx, p[1] - refz))
                # interface: cut point +- width/2 * rightNormal, inverted
                # for inbound (endNode == junction) arms (:307-327)
                sgn = -1.0 if inb[i] else 1.0
                vx_ = sgn * 0.5 * wid[i] * rnx[i]
                vz_ = sgn * 0.5 * wid[i] * rnz[i]
                out.append(
                    (
                        node,
                        str(g["seg_id"].iloc[i]),
                        i,
                        "end" if inb[i] else "start",
                        best[0],
                        best[1],
                        best[0] - vx_,
                        best[1] - vz_,
                        best[0] + vx_,
                        best[1] + vz_,
                    )
                )
        return pd.DataFrame(
            out, columns=[f.name for f in JUNCTION_SCHEMA.fields]
        )

    return ju.groupBy("node").applyInPandas(kernel, schema=JUNCTION_SCHEMA)



def _segment_edges(segments: DataFrame, weighted: bool = False) -> DataFrame:
    """(src, dst[, w]) directed edge list of the positional node graph:
    both directions per segment, self-loops (zero-length segments)
    dropped, distinct. The one shared construction every segment-graph
    operator (components / BFS / shortest paths / PageRank) builds on;
    w = segment length when weighted."""
    eps = segment_endpoints(segments).select("seg_id", "node")
    edges = (
        eps.alias("a")
        .join(eps.alias("b"), "seg_id")
        .where(F.col("a.node") != F.col("b.node"))
    )
    if weighted:
        length = F.sqrt(
            (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
            + (F.col("z2") - F.col("z1")) * (F.col("z2") - F.col("z1"))
        )
        seg_w = segments.select("seg_id", length.alias("w"))
        return (
            edges.join(seg_w, "seg_id")
            .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"), "w")
            .distinct()
        )
    return (
        edges.select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
        .distinct()
    )


def connected_components(
    segments: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """(node, component) labels for the positional node graph: min-label
    propagation to a fixpoint over the segment-endpoint edge list."""
    edges = _segment_edges(segments)
    nodes = segment_endpoints(segments).select("node").distinct()
    return components_from_edges(edges, nodes, max_rounds=max_rounds).withColumnRenamed(
        "label", "component"
    )


def components_from_edges(
    edges: DataFrame, nodes: DataFrame, max_rounds: int = 30,
    shortcut: bool = True,
) -> DataFrame:
    """Generic connected components: (src, dst) edges + (node) universe ->
    (node, label) where label = min node id reachable (nodes off the edge
    list keep their own id — singleton components). Min-label propagation
    to a fixpoint: each round joins current labels to the edge list, takes
    the min over neighbors + self, and stops when no label changed (one
    count action per round on a lazily checkpointed frame — the
    iterative-join shape Spark CC implementations use; label count is
    monotonically non-increasing, max_rounds is a backstop). Also the
    dedup backbone: near-dup pair edges -> document clusters.

    ``shortcut=True`` adds POINTER DOUBLING after each propagation:
    label(u) <- label(label(u)) via one self-join (valid because every
    label is itself a node id whose label is at most it — the Shiloach-
    Vishkin shortcutting step). The min now spreads through both graph
    edges and label pointers, so rounds drop from O(diameter) to
    O(log diameter) — a 500-hop contour ring or tile-spanning coastline
    converges in ~9 rounds instead of 250, which is the difference
    between feasible and not at 100 TB. Exit detection is unchanged and
    stays correct: if PROPAGATION changes nothing then label(u) <=
    label(v) across every edge, hence (symmetry) labels are constant
    per component and already the min — compression is pure
    acceleration and needs no change tracking."""
    labels = nodes.select("node").distinct().withColumn("label", F.col("node"))
    changed = -1
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("_changed"),
            )
        ).localCheckpoint(eager=False)
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
        if shortcut:
            parent = labels.select(
                F.col("node").alias("label"), F.col("label").alias("_plabel")
            )
            labels = (
                labels.join(parent, "label", "left")
                .select(
                    "node",
                    F.coalesce(F.col("_plabel"), F.col("label")).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
    if changed != 0:
        # same discipline as weighted_distances: a max_rounds exit means
        # labels may not be final component minima — say so, loudly
        import logging

        logging.getLogger(__name__).warning(
            "components_from_edges stopped at max_rounds=%d with %d "
            "labels still changing; labels may be unconverged",
            max_rounds,
            changed,
        )
    return labels


def hop_distances(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Multi-source BFS over (src, dst) edges: (node, hops) = minimum hop
    count from any seed node, nodes beyond `max_hops` omitted.

    Frontier iteration, the Pregel shape in DataFrame form: each round
    expands only the LAST round's frontier (not the whole settled set) and
    anti-joins the settled set away, so per-round work is proportional to
    the frontier, rounds are bounded by min(max_hops, graph diameter), and
    the loop exits early when a frontier comes back empty (one bounded
    isEmpty action per round on a lazily checkpointed frame — same
    iteration discipline as components_from_edges)."""
    dist = seeds.select("node").distinct().withColumn("hops", F.lit(0))
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return dist


def segment_hop_distances(
    segments: DataFrame, seeds: DataFrame, max_hops: int = 8
) -> DataFrame:
    """BFS hop distances over the positional node graph of a segment set
    (edge list built exactly as connected_components does)."""
    return hop_distances(_segment_edges(segments), seeds, max_hops=max_hops)


def weighted_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 16,
    weight_col: str = "w",
) -> DataFrame:
    """Multi-source shortest-path distances over weighted (src, dst, w)
    edges: (node, dist) = minimum total weight from any seed, unreachable
    nodes absent. Non-negative weights assumed (road/way lengths).

    Bellman-Ford in the frontier shape: each round relaxes only edges out
    of nodes IMPROVED last round, folds candidates into the settled map
    with a min-agg, and keeps as the new frontier only nodes whose
    distance actually improved — so work tracks the improvement wave, not
    |V| x rounds, and the loop exits as soon as a round improves nothing.
    Rounds are bounded by the longest shortest path's hop count
    (max_rounds backstop); one min-agg shuffle per round.

    If the improvement wave is still active when max_rounds is hit, the
    returned distances are UPPER BOUNDS (minimum over paths of at most
    max_rounds edges), not final shortest distances; that truncation is
    logged as a warning so callers can distinguish converged from
    truncated results."""
    dist = seeds.select("node").distinct().withColumn("dist", F.lit(0.0))
    frontier = dist
    for _ in range(max_rounds):
        cand = (
            edges.join(
                frontier.select(
                    F.col("node").alias("src"), F.col("dist").alias("d_src")
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("d_src") + F.col(weight_col)).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.withColumnRenamed("dist", "d_old")
            .join(cand.withColumnRenamed("dist", "d_new"), "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("d_old"), F.lit(float("inf"))),
                    F.coalesce(F.col("d_new"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.coalesce(F.col("d_new"), F.lit(float("inf")))
                    < F.coalesce(F.col("d_old"), F.lit(float("inf")))
                ).alias("_improved"),
            )
            .localCheckpoint(eager=False)
        )
        frontier = merged.where(F.col("_improved")).drop("_improved")
        dist = merged.drop("_improved")
        if frontier.isEmpty():
            break
    else:
        # loop exhausted max_rounds with the in-loop isEmpty never breaking:
        # the wave is still active, so distances are bounds, not finals
        import logging

        logging.getLogger(__name__).warning(
            "weighted_distances hit max_rounds=%d with an active improvement "
            "wave; returned distances are upper bounds (paths of <= %d edges)",
            max_rounds,
            max_rounds,
        )
    return dist


def segment_weighted_distances(
    segments: DataFrame, seeds: DataFrame, max_rounds: int = 16
) -> DataFrame:
    """Shortest metric distances over the positional node graph, edge
    weight = segment length (both directions)."""
    return weighted_distances(
        _segment_edges(segments, weighted=True), seeds, max_rounds=max_rounds
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, rank_u6): PageRank over (src, dst) edges in EXACT integer
    fixed-point (Page/Brin/Motwani/Winograd 1999; rank in `scale` units,
    damping as the rational damping_num/damping_den).

    Every quantity is a bigint and every per-edge contribution uses true
    integer division — `(damping_num * rank_u) div (damping_den *
    outdeg)` — so the per-node sum is order-independent (a double-rank
    PageRank is not: groupBy accumulation order perturbs ulps) and any
    ANSI engine replays the iteration bit-for-bit. Floor division sheds
    up to 1 unit per edge per round, so ranks are a lower fixed-point
    envelope of real PageRank; at scale=1e6 the drift is < 1e-5 per
    round — far under ranking resolution. Dangling-node mass is dropped
    (the simplified variant); duplicate edges count with multiplicity.

    Iteration discipline matches components_from_edges: fixed `iters`
    rounds, one lazy localCheckpoint per round to truncate lineage, no
    driver-side graph, N from a 1-row aggregate (never a collect). Each
    round is outdeg-join + groupBy(dst) — two bounded exchanges over the
    edge list, the standard distributed PageRank shape.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").distinct()
    stats = nodes.agg(F.count("*").cast("bigint").alias("n_nodes"))
    base = F.expr(
        f"({damping_den - damping_num} * {scale}L) div ({damping_den} * n_nodes)"
    )
    ranks = (
        nodes.crossJoin(F.broadcast(stats))
        .select("node", F.expr(f"{scale}L div n_nodes").alias("rank_u6"))
    )
    outdeg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("outdeg"))
    for _ in range(iters):
        in_mass = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({damping_num} * rank_u6) div ({damping_den} * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(stats))
            .join(in_mass, "node", "left")
            .select(
                "node",
                (base + F.coalesce(F.col("in_mass"), F.lit(0))).alias("rank_u6"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def segment_pagerank(segments: DataFrame, iters: int = 3) -> DataFrame:
    """PageRank over the positional node graph of a segment set (both
    directions per segment, the same edge construction as
    connected_components)."""
    return pagerank(_segment_edges(segments), iters=iters)


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles): per-node triangle participation over an
    undirected graph given as (src, dst) rows (direction and duplicates
    ignored).

    Degree-orientation algorithm (the standard distributed form, e.g.
    Suri/Vassilvitskii WWW'11): orient every undirected edge from the
    lower-(degree, id) endpoint to the higher; every triangle then has
    exactly ONE wedge a->b->c with both edges oriented, closed by an
    oriented a->c edge — so each triangle is found exactly once, and the
    wedge intermediate is sum-of-squared OUT-degrees, which orientation
    bounds by O(m^1.5) regardless of hub skew (a raw wedge join on an
    unoriented hub of degree d would build d^2 rows; oriented, a hub's
    out-degree is at most ~sqrt(m)).

    Plan: canonicalize+distinct (one exchange), degree groupBy (one),
    wedge self-join on the middle vertex + closing-edge join (joins on
    oriented src/dst keys), explode each triangle to its 3 corners,
    count per node. All integer arithmetic — any engine replays it
    bit-for-bit.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"), F.col("e1.dst") == F.col("e2.src")
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tris = wedges.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
    )
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
