"""The grid-partitioned spatial self-join: typed overlaps between elements.

Reference semantics (/root/reference/core/src/main/java/org/osm2world/
map_data/creation/OSMToMapDataConverter.java):

- candidate generation :418-439 — IndexGrid over padded bounds with
  ~1000-unit cells; every element is inserted into ALL cells its bbox
  overlaps and probed against its cell-mates.
- WW :486-509 — segment x segment: skip connected segments, else plain
  getLineSegmentIntersection -> MapIntersectionWW with the position.
- WA :515-620 — segment x area: SHARE_SEGMENT if both endpoints coincide
  with one area edge :522-536; else (not connected) INTERSECT if any true
  ring intersection, CONTAIN if both endpoints inside; (connected) 1 %-of-
  length epsilon near the shared nodes :559-567, contains tested at the
  segment center :574. INTERSECT payload = true intersections with each
  area edge :584-607.
- AA :623-718 — SHARE_SEGMENT if any exactly-equal edge pair :630-643;
  true intersection = any crossing farther than 0.01 from every common
  node :656-685; containment by the reference's idiosyncratic vertex rule
  (PolygonShapeXZ.java:84-91: each outer vertex of the other polygon is an
  exact vertex of this one OR inside it) — kept buggy-but-golden; CONTAIN
  rows carry (contained, container) order :705-711.
- NA :720-733 — node x area: point-in-polygon -> CONTAIN.

Spark shape: metric-grid cell-cover explode -> hash self-join on the cell
key (a.eid < b.eid dedups unordered pairs) -> dropDuplicates for pairs
meeting in several cells -> inclusive bbox prefilter -> per-type-pair
refinement. WW refinement is pure Column math (whole-stage codegen); the
polygon kernels run as Arrow-batched numpy over packed coordinate arrays.

Scale: the cell key is the shuffle key; dense urban cells are exactly the
skew case — AQE skew-join split is on by default (session.py) and
`salt_cells` adds explicit salting for the heaviest keys.

Output (the MapOverlap golden row format, map_data/data/overlaps/):
    a_id, a_type, b_id, b_type, overlap_kind in
    {INTERSECT, CONTAIN, SHARE_SEGMENT}, positions array<struct<x,z>>
    ordered along a (distance from a's start, MapOverlapWA.java:69-74).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..sources.documents import way_segments

# Candidate-cell size. The reference's IndexGrid uses ~1000-unit cells
# (OSMToMapDataConverter.java:420-421) sized for whole-extract bounds; the
# pair set is IDENTICAL for any cell size (an element is inserted into all
# covered cells, so overlapping bboxes always share a cell) — only the
# within-cell cross-product cost changes. 150 m fits building-scale
# geometry: the dense-cluster n^2 term drops ~40x vs 1000 m.
CELL_SIZE_M = 150.0
_CELL_OFFSET = 1 << 20
EPS_COMMON_NODE = 0.01  # OSMToMapDataConverter.java:676

OVERLAPS_SCHEMA = StructType(
    [
        StructField("a_id", StringType()),
        StructField("a_type", StringType()),
        StructField("b_id", StringType()),
        StructField("b_type", StringType()),
        StructField("overlap_kind", StringType()),
        StructField(
            "positions",
            ArrayType(
                StructType([StructField("x", DoubleType()), StructField("z", DoubleType())])
            ),
        ),
    ]
)


# ------------------------------------------------------------ join surface

def join_surface(elements: DataFrame) -> DataFrame:
    """elements -> the unified join surface: nodes + way *segments* + areas
    (MapData.getMapElements, MapData.java:81-83; ways are flat-mapped into
    segments at construction :47).

    Columns: eid, etype in {node,segment,area}, way_key, seg_idx,
    x1,z1,x2,z2 (node: x1/z1; segment: both ends), geom (areas),
    minx,minz,maxx,maxz.
    """
    nodes = elements.where(F.col("element_type") == "node").select(
        F.concat_ws("#", "doc_id", "span_idx").alias("eid"),
        F.lit("node").alias("etype"),
        F.lit(None).cast("string").alias("way_key"),
        F.lit(None).cast("int").alias("seg_idx"),
        F.col("geom")[0][0].alias("x1"),
        F.col("geom")[0][1].alias("z1"),
        F.lit(None).cast("double").alias("x2"),
        F.lit(None).cast("double").alias("z2"),
        F.lit(None).cast("array<array<double>>").alias("geom"),
        F.col("minx"), F.col("minz"), F.col("maxx"), F.col("maxz"),
    )
    segs = way_segments(elements).select(
        F.concat_ws("#", "doc_id", "span_idx", "seg_idx").alias("eid"),
        F.lit("segment").alias("etype"),
        F.concat_ws("#", "doc_id", "span_idx").alias("way_key"),
        F.col("seg_idx"),
        "x1", "z1", "x2", "z2",
        F.lit(None).cast("array<array<double>>").alias("geom"),
        F.least("x1", "x2").alias("minx"),
        F.least("z1", "z2").alias("minz"),
        F.greatest("x1", "x2").alias("maxx"),
        F.greatest("z1", "z2").alias("maxz"),
    )
    areas = elements.where(F.col("element_type") == "area").select(
        F.concat_ws("#", "doc_id", "span_idx").alias("eid"),
        F.lit("area").alias("etype"),
        F.lit(None).cast("string").alias("way_key"),
        F.lit(None).cast("int").alias("seg_idx"),
        F.lit(None).cast("double").alias("x1"),
        F.lit(None).cast("double").alias("z1"),
        F.lit(None).cast("double").alias("x2"),
        F.lit(None).cast("double").alias("z2"),
        F.col("geom"),
        F.col("minx"), F.col("minz"), F.col("maxx"), F.col("maxz"),
    )
    return nodes.unionByName(segs).unionByName(areas)


def metric_cells(minx, minz, maxx, maxz, cell_size: float = CELL_SIZE_M):
    """array<bigint> of grid cells overlapped by a metric bbox (IndexGrid
    insert semantics: all cells the bbox touches, IndexGrid.java:154-178)."""
    cx0 = F.floor(minx / cell_size).cast("bigint")
    cx1 = F.floor(maxx / cell_size).cast("bigint")
    cz0 = F.floor(minz / cell_size).cast("bigint")
    cz1 = F.floor(maxz / cell_size).cast("bigint")
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cz0, cz1),
                lambda cz: F.shiftleft(cx + _CELL_OFFSET, 21) + (cz + _CELL_OFFSET),
            ),
        )
    )


def candidate_pairs(
    surface: DataFrame,
    cell_size: float = CELL_SIZE_M,
    salt_buckets: int = 8,
    dense_threshold: int = 4000,
) -> DataFrame:
    """Cell-cover explode + self-join on the cell key + pair dedup +
    inclusive bbox prefilter. Inclusive (<=) because SHARE_SEGMENT pairs can
    meet exactly on their bbox edges.

    Skew ("dense urban cells"): besides AQE skew-split, cells holding more
    than `dense_threshold` elements are TRIANGLE-SPLIT — each element gets a
    salt s = hash(eid) % S; the self-join key becomes (cell, i, j) where the
    left side replicates to tasks {(s, j) : j >= s} and the right side to
    {(i, s) : i <= s}, so one quadratic cell becomes S*(S+1)/2 bounded
    tasks. The dense-cell list is tiny and broadcast."""
    covered = surface.withColumn(
        "cell", F.explode(metric_cells(F.col("minx"), F.col("minz"), F.col("maxx"), F.col("maxz"), cell_size))
    )

    S = salt_buckets
    dense = (
        covered.groupBy("cell")
        .agg(F.count("*").alias("n_in_cell"))
        .where(F.col("n_in_cell") > dense_threshold)
        .select("cell")
    )
    covered = covered.join(
        F.broadcast(dense.withColumn("is_dense", F.lit(True))), "cell", "left"
    ).withColumn(
        "salt",
        F.when(F.col("is_dense"), F.pmod(F.xxhash64("eid"), F.lit(S))).otherwise(F.lit(0)).cast("int"),
    )
    # left replicas: (salt, j) for j in salt..S-1 (non-dense: only (0, 0))
    left = covered.withColumn(
        "tj",
        F.explode(
            F.when(F.col("is_dense"), F.sequence(F.col("salt"), F.lit(S - 1))).otherwise(
                F.array(F.lit(0))
            )
        ),
    ).withColumn("ti", F.col("salt"))
    # right replicas: (i, salt) for i in 0..salt
    right = covered.withColumn(
        "ti",
        F.explode(
            F.when(F.col("is_dense"), F.sequence(F.lit(0), F.col("salt"))).otherwise(
                F.array(F.lit(0))
            )
        ),
    ).withColumn("tj", F.col("salt"))

    a = left.alias("a")
    b = right.alias("b")
    # Diagonal tasks (i == j) see each unordered pair on both sides, so
    # eid< dedups there; an off-diagonal task sees the pair exactly once
    # with ARBITRARY side order, so eid< would drop half the pairs —
    # accept both orders there and canonicalize (swap to eid order) after.
    cols = ("eid", "etype", "way_key", "seg_idx", "x1", "z1", "x2", "z2", "geom")
    joined = a.join(
        b,
        on=[
            F.col("a.cell") == F.col("b.cell"),
            F.col("a.ti") == F.col("b.ti"),
            F.col("a.tj") == F.col("b.tj"),
            (F.col("a.ti") != F.col("a.tj")) | (F.col("a.eid") < F.col("b.eid")),
            F.col("a.eid") != F.col("b.eid"),
            F.col("a.minx") <= F.col("b.maxx"),
            F.col("b.minx") <= F.col("a.maxx"),
            F.col("a.minz") <= F.col("b.maxz"),
            F.col("b.minz") <= F.col("a.maxz"),
        ],
    )
    swap = F.col("a.eid") > F.col("b.eid")
    exprs = []
    for c in cols:
        exprs.append(F.when(swap, F.col(f"b.{c}")).otherwise(F.col(f"a.{c}")).alias(f"a_{c}"))
        exprs.append(F.when(swap, F.col(f"a.{c}")).otherwise(F.col(f"b.{c}")).alias(f"b_{c}"))
    return joined.select(*exprs).dropDuplicates(["a_eid", "b_eid"])


def _oriented(pairs: DataFrame) -> DataFrame:
    """Normalize pair orientation to (node < segment < area) so each
    refinement kernel sees a fixed argument order."""
    rank = {"node": 0, "segment": 1, "area": 2}
    rk = F.create_map(*[x for kv in rank.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])
    swap = rk[F.col("a_etype")] > rk[F.col("b_etype")]
    cols = ("eid", "etype", "way_key", "seg_idx", "x1", "z1", "x2", "z2", "geom")
    out = pairs
    exprs = []
    for c in cols:
        exprs.append(F.when(swap, F.col(f"b_{c}")).otherwise(F.col(f"a_{c}")).alias(f"a_{c}"))
        exprs.append(F.when(swap, F.col(f"a_{c}")).otherwise(F.col(f"b_{c}")).alias(f"b_{c}"))
    return out.select(*exprs)


# ------------------------------------------------------------- refinement

def _refine_ww(pairs: DataFrame) -> DataFrame:
    """segment x segment, pure Column math (GeometryUtil.java:222-260 with
    approxZero eps=1e-4 :799-804). Connected segments skip
    (line1.isConnectedTo(line2), OSMToMapDataConverter.java:489): under the
    document model node identity == same way + adjacent seg_idx."""
    p = pairs.where((F.col("a_etype") == "segment") & (F.col("b_etype") == "segment"))
    connected = (F.col("a_way_key") == F.col("b_way_key")) & (
        F.abs(F.col("a_seg_idx") - F.col("b_seg_idx")) <= 1
    )
    vx = F.col("a_x2") - F.col("a_x1")
    vz = F.col("a_z2") - F.col("a_z1")
    qx = F.col("b_x2") - F.col("b_x1")
    qz = F.col("b_z2") - F.col("b_z1")
    denom = vz * qx - vx * qz
    amcx = F.col("b_x1") - F.col("a_x1")
    amcz = F.col("b_z1") - F.col("a_z1")
    t = (amcz * qx - amcx * qz) / denom
    s = (amcz * vx - amcx * vz) / denom
    hit = (
        ~connected
        & (F.abs(denom) > 0.0001)
        & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1)
    )
    ix = F.col("a_x1") + t * vx
    iz = F.col("a_z1") + t * vz
    return p.where(hit).select(
        F.col("a_eid").alias("a_id"),
        F.lit("segment").alias("a_type"),
        F.col("b_eid").alias("b_id"),
        F.lit("segment").alias("b_type"),
        F.lit("INTERSECT").alias("overlap_kind"),
        F.array(F.struct(ix.alias("x"), iz.alias("z"))).alias("positions"),
    )


def _refine_na(pairs: DataFrame) -> DataFrame:
    """node x area -> CONTAIN via batched even-odd ray cast
    (OSMToMapDataConverter.java:720-733)."""
    p = pairs.where((F.col("a_etype") == "node") & (F.col("b_etype") == "area"))

    def kernel(batches):
        from osm2world_spark.functions.geometry import contains_point, flatten

        for pdf in batches:
            if len(pdf) == 0:
                continue
            flat = flatten(pdf["b_geom"])
            inside = contains_point(pdf["a_x1"].values, pdf["a_z1"].values, flat)
            sub = pdf[inside]
            yield pd.DataFrame(
                {
                    "a_id": sub["a_eid"],
                    "a_type": "node",
                    "b_id": sub["b_eid"],
                    "b_type": "area",
                    "overlap_kind": "CONTAIN",
                    "positions": [[] for _ in range(len(sub))],
                }
            )

    return p.mapInPandas(kernel, schema=OVERLAPS_SCHEMA)


def _refine_wa(pairs: DataFrame) -> DataFrame:
    """segment x area (OSMToMapDataConverter.java:515-620)."""
    p = pairs.where((F.col("a_etype") == "segment") & (F.col("b_etype") == "area"))

    def kernel(batches):
        from osm2world_spark.functions.geometry import (
            contains_point,
            flatten,
            segment_ring_intersections,
        )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            flat = flatten(pdf["b_geom"])
            sx1 = pdf["a_x1"].values
            sz1 = pdf["a_z1"].values
            sx2 = pdf["a_x2"].values
            sz2 = pdf["a_z2"].values

            # --- SHARE_SEGMENT: both endpoints equal one area edge's ends
            ex1, ez1, ex2, ez2, erow, _ = flat.edges()
            fwd = (ex1 == sx1[erow]) & (ez1 == sz1[erow]) & (ex2 == sx2[erow]) & (ez2 == sz2[erow])
            rev = (ex1 == sx2[erow]) & (ez1 == sz2[erow]) & (ex2 == sx1[erow]) & (ez2 == sz1[erow])
            share = np.zeros(n, dtype=bool)
            hitrows = erow[fwd | rev]
            if len(hitrows):
                share[hitrows] = True

            # --- connectivity: a segment endpoint equals any area vertex
            pt_row = np.repeat(flat.ring_row, flat.ring_npts)
            p1_match = (flat.px == sx1[pt_row]) & (flat.pz == sz1[pt_row])
            p2_match = (flat.px == sx2[pt_row]) & (flat.pz == sz2[pt_row])
            connected = np.zeros(n, dtype=bool)
            np.logical_or.at(connected, pt_row[p1_match | p2_match], True)

            # --- true intersections with every ring edge
            irow, _, ix, iz, ta = segment_ring_intersections(sx1, sz1, sx2, sz2, flat)

            seg_len = np.sqrt((sx2 - sx1) ** 2 + (sz2 - sz1) ** 2)
            d1 = np.sqrt((ix - sx1[irow]) ** 2 + (iz - sz1[irow]) ** 2)
            d2 = np.sqrt((ix - sx2[irow]) ** 2 + (iz - sz2[irow]) ** 2)
            far_from_ends = (d1 > seg_len[irow] / 100) & (d2 > seg_len[irow] / 100)

            any_int = np.zeros(n, dtype=bool)
            if len(irow):
                np.logical_or.at(any_int, irow, True)
            any_far_int = np.zeros(n, dtype=bool)
            if len(irow):
                np.logical_or.at(any_far_int, irow[far_from_ends], True)

            # intersects: connected rows need the 1%-length epsilon rule
            intersects = np.where(connected, any_far_int, any_int) & ~share

            # contains: not connected -> both endpoints inside & no ring
            # intersection; connected -> center inside & not intersects
            in1 = contains_point(sx1, sz1, flat)
            in2 = contains_point(sx2, sz2, flat)
            cx = (sx1 + sx2) / 2
            cz = (sz1 + sz2) / 2
            in_c = contains_point(cx, cz, flat)
            contains = np.where(connected, in_c, in1 & in2 & ~any_int) & ~intersects & ~share

            rows = []
            share_idx = np.nonzero(share)[0]
            for i in share_idx:
                rows.append((i, "SHARE_SEGMENT", []))
            int_idx = np.nonzero(intersects)[0]
            if len(int_idx):
                order = np.argsort(ta, kind="stable")
                irow_s, ix_s, iz_s, ta_s = irow[order], ix[order], iz[order], ta[order]
                for i in int_idx:
                    m = irow_s == i
                    pos = [{"x": float(a), "z": float(b)} for a, b in zip(ix_s[m], iz_s[m])]
                    rows.append((i, "INTERSECT", pos))
            for i in np.nonzero(contains)[0]:
                rows.append((i, "CONTAIN", []))

            if not rows:
                continue
            ridx = [r[0] for r in rows]
            yield pd.DataFrame(
                {
                    "a_id": pdf["a_eid"].values[ridx],
                    "a_type": "segment",
                    "b_id": pdf["b_eid"].values[ridx],
                    "b_type": "area",
                    "overlap_kind": [r[1] for r in rows],
                    "positions": [r[2] for r in rows],
                }
            )

    return p.mapInPandas(kernel, schema=OVERLAPS_SCHEMA)


def _refine_aa(pairs: DataFrame) -> DataFrame:
    """area x area (OSMToMapDataConverter.java:623-718). CONTAIN rows are
    emitted as (contained, container) per the reference's constructor-arg
    convention (:705-711)."""
    p = pairs.where((F.col("a_etype") == "area") & (F.col("b_etype") == "area"))

    def kernel(batches):
        from osm2world_spark.functions.geometry import (
            flatten,
            ring_crossings,
            true_segment_intersection,
        )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            fa = flatten(pdf["a_geom"])
            fb = flatten(pdf["b_geom"])
            out_kind = np.array([""] * n, dtype=object)
            contained_first = np.zeros(n, dtype=bool)  # True -> b contains a

            ax1, az1, ax2, az2, arow, _ = fa.edges()
            bx1, bz1, bx2, bz2, brow, _ = fb.edges()

            for i in range(n):
                am = arow == i
                bm = brow == i
                ea = np.nonzero(am)[0]
                eb = np.nonzero(bm)[0]
                if len(ea) == 0 or len(eb) == 0:
                    continue
                ii, jj = np.meshgrid(ea, eb, indexing="ij")
                ii, jj = ii.ravel(), jj.ravel()

                # shared segment (exact, either direction)
                sf = (ax1[ii] == bx1[jj]) & (az1[ii] == bz1[jj]) & (ax2[ii] == bx2[jj]) & (az2[ii] == bz2[jj])
                sr = (ax1[ii] == bx2[jj]) & (az1[ii] == bz2[jj]) & (ax2[ii] == bx1[jj]) & (az2[ii] == bz1[jj])
                if (sf | sr).any():
                    out_kind[i] = "SHARE_SEGMENT"
                    continue

                # common nodes (vertex coordinate equality, both polygons)
                a_pts_m = np.repeat(fa.ring_row, fa.ring_npts) == i
                b_pts_m = np.repeat(fb.ring_row, fb.ring_npts) == i
                apx, apz = fa.px[a_pts_m], fa.pz[a_pts_m]
                bpx, bpz = fb.px[b_pts_m], fb.pz[b_pts_m]
                common = apx[:, None] == bpx[None, :]
                common &= apz[:, None] == bpz[None, :]
                cn_x = apx[common.any(axis=1)]
                cn_z = apz[common.any(axis=1)]

                # true ring-x-ring intersections
                hit, ix, iz = true_segment_intersection(
                    ax1[ii], az1[ii], ax2[ii], az2[ii], bx1[jj], bz1[jj], bx2[jj], bz2[jj]
                )
                intersects = False
                if hit.any():
                    hx, hz = ix[hit], iz[hit]
                    if len(cn_x):
                        d2 = (hx[:, None] - cn_x[None, :]) ** 2 + (hz[:, None] - cn_z[None, :]) ** 2
                        near = (d2 < EPS_COMMON_NODE**2).any(axis=1)
                        intersects = bool((~near).any())
                    else:
                        intersects = True
                if intersects:
                    out_kind[i] = "INTERSECT"
                    continue

                # vertex-based containment (PolygonShapeXZ.java:84-91)
                if _poly_contains_outer(fa, fb, i):
                    out_kind[i] = "CONTAIN"       # a contains b -> (b, a)
                    contained_first[i] = False
                elif _poly_contains_outer(fb, fa, i):
                    out_kind[i] = "CONTAIN"       # b contains a -> (a, b)
                    contained_first[i] = True

            keep = out_kind != ""
            idx = np.nonzero(keep)[0]
            if len(idx) == 0:
                continue
            a_ids = pdf["a_eid"].values
            b_ids = pdf["b_eid"].values
            first, second = [], []
            for i in idx:
                if out_kind[i] == "CONTAIN" and not contained_first[i]:
                    first.append(b_ids[i])   # contained
                    second.append(a_ids[i])  # container
                else:
                    first.append(a_ids[i])
                    second.append(b_ids[i])
            yield pd.DataFrame(
                {
                    "a_id": first,
                    "a_type": "area",
                    "b_id": second,
                    "b_type": "area",
                    "overlap_kind": out_kind[idx],
                    "positions": [[] for _ in idx],
                }
            )

    return p.mapInPandas(kernel, schema=OVERLAPS_SCHEMA)


def _poly_contains_outer(f_container, f_other, i) -> bool:
    """PolygonShapeXZ.contains(PolygonShapeXZ) vertex rule
    (PolygonShapeXZ.java:84-91): every vertex of the other polygon's OUTER
    ring is either an exact vertex of the container or inside it (with
    holes). Kept vertex-based on purpose (the reference FIXME)."""
    from osm2world_spark.functions.geometry import FlatRings, contains_point

    import numpy as np

    o_m = (f_other.ring_row == i) & (f_other.ring_idx == 0)
    if not o_m.any():
        return False
    r = np.nonzero(o_m)[0][0]
    s, np_ = f_other.ring_start[r], f_other.ring_npts[r]
    qx = f_other.px[s : s + np_]
    qz = f_other.pz[s : s + np_]

    c_pts_m = np.repeat(f_container.ring_row, f_container.ring_npts) == i
    cpx, cpz = f_container.px[c_pts_m], f_container.pz[c_pts_m]
    is_vertex = ((qx[:, None] == cpx[None, :]) & (qz[:, None] == cpz[None, :])).any(axis=1)

    # PIP for the non-vertex queries against container rings of row i
    need = ~is_vertex
    if not need.any():
        return True
    rings_m = f_container.ring_row == i
    sel = np.nonzero(rings_m)[0]
    sub = FlatRings(
        n_rows=1,
        ring_row=np.zeros(len(sel), dtype=np.int64),
        ring_idx=f_container.ring_idx[sel],
        ring_start=f_container.ring_start[sel],
        ring_npts=f_container.ring_npts[sel],
        px=f_container.px,
        pz=f_container.pz,
    )
    for x, z in zip(qx[need], qz[need]):
        if not contains_point(np.array([x]), np.array([z]), sub)[0]:
            return False
    return True


# ----------------------------------------------------------- entry point

def spatial_self_join(elements: DataFrame, cell_size: float = CELL_SIZE_M) -> DataFrame:
    """Full typed-overlap self-join over an elements DataFrame.

    The candidate join is materialized once (localCheckpoint) and the four
    type-pair refinements read it — otherwise each union branch would
    re-run the shuffle join. On a cluster the equivalent is a persisted
    intermediate or an exchange reuse; localCheckpoint also keeps the plan
    short for AQE."""
    surface = join_surface(elements)
    pairs = _oriented(candidate_pairs(surface, cell_size)).localCheckpoint(eager=False)
    ww = _refine_ww(pairs)
    na = _refine_na(pairs)
    wa = _refine_wa(pairs)
    aa = _refine_aa(pairs)
    return ww.unionByName(na).unionByName(wa).unionByName(aa)
