"""The interleaved text+media document table: synthesis and extraction.

Input schema (BASELINE.json input_hint):

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

kind in {'text','media','geo_point','geo_way','geo_area'}; geo_* spans carry
geometry in `text` as space-separated "lat,lon" pairs; area spans may append
hole rings separated by " hole:" (mirrors MapArea outer+holes,
/root/reference/core/src/main/java/org/osm2world/map_data/data/MapArea.java:31-33).

`synthetic_documents` is a deterministic pure function of (seed, doc index)
via splitmix64 hashing — no RNG state, so the same rows materialize no
matter how Spark partitions the id range (safe under task retry, which is
what makes it valid at cluster scale).

`extract_elements` is the analogue of the reference's
OSMToMapDataConverter.createMapData (OSMToMapDataConverter.java:55-76):
documents -> one element row per geo span (node / way / area), geometry
parsed, projected to the metric XZ plane and packed into coordinate arrays.
Extraction only *reads* spans: span-sequence equality per document is an
engine invariant (verified in tests + the span_roundtrip query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.projection import Origin, np_to_xz

# Test bbox: the region of the reference's golden tile 13/4402/2828
# (TileNumberTest.java:96-98).
BBOX = (48.52, 13.37, 48.62, 13.50)  # minlat, minlon, maxlat, maxlon
N_CENTERS = 16
DEFAULT_ORIGIN = Origin(48.56687, 13.45127)

SPANS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
)

DOCS_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("spans", SPANS_SCHEMA)]
)


# ------------------------------------------------------------ splitmix64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        z = np.asarray(x, dtype=np.uint64) + _GOLD
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(i: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic uniform [0,1) as a pure function of (seed, i, stream)."""
    h = _splitmix64(i.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D) + np.uint64(seed * 1_000_003 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ----------------------------------------------------------- generation

def _gen_rows(ids: np.ndarray, seed: int, scale: float = 1.0) -> pd.DataFrame:
    """Generate document rows for an array of doc indices (vectorized per
    span slot; at most 12 slots). `scale` widens the bbox (and the cluster
    grid) around its center so spatial DENSITY stays constant as the corpus
    grows — the realistic 100 TB shape (more area, not denser cells); the
    100x cluster skew is preserved."""
    b_minlat, b_minlon, b_maxlat, b_maxlon = BBOX
    c0lat, c0lon = (b_minlat + b_maxlat) / 2, (b_minlon + b_maxlon) / 2
    minlat = c0lat - (c0lat - b_minlat) * scale
    maxlat = c0lat + (b_maxlat - c0lat) * scale
    minlon = c0lon - (c0lon - b_minlon) * scale
    maxlon = c0lon + (b_maxlon - c0lon) * scale
    maxlat = min(maxlat, 84.0)
    minlat = max(minlat, -84.0)
    n = len(ids)
    n_spans = 1 + np.floor(_u01(ids, 0, seed) * 12).astype(np.int64)

    # skewed cluster choice: cube-law concentrates docs in low-index centers
    # (exercises salting + AQE skew-split, FIXTURES.md section 1); the
    # number of centers grows with the area so per-center density is stable
    n_centers = max(N_CENTERS, int(N_CENTERS * scale * scale))
    center_idx = np.floor(_u01(ids, 1, seed) ** 3 * n_centers).astype(np.int64)
    c_lat = minlat + _u01(center_idx, 900, seed) * (maxlat - minlat)
    c_lon = minlon + _u01(center_idx, 901, seed) * (maxlon - minlon)

    words = np.array(
        "the spark tile join scan area point way node query data span doc media river road park".split()
    )
    bounds = (minlat, minlon, maxlat, maxlon)

    spans_per_doc: list[list[dict]] = [[] for _ in range(n)]
    max_spans = int(n_spans.max()) if n else 0
    for j in range(max_spans):
        active = n_spans > j
        idx = np.nonzero(active)[0]
        if len(idx) == 0:
            break
        di = ids[idx]
        kind_u = _u01(di, 10 + 7 * j, seed)
        # 40% text, 15% media, 25% geo_point, 10% geo_way, 10% geo_area
        kind_code = np.select(
            [kind_u < 0.40, kind_u < 0.55, kind_u < 0.80, kind_u < 0.90],
            [0, 1, 2, 3],
            default=4,
        )
        # log-normal radial offset around the doc's cluster center
        u_r = _u01(di, 11 + 7 * j, seed)
        u_t = _u01(di, 12 + 7 * j, seed)
        r_deg = np.exp(-6.0 + 1.0 * _norminv(u_r))
        theta = 2 * np.pi * u_t
        lat0 = np.clip(c_lat[idx] + r_deg * np.sin(theta), minlat + 1e-4, maxlat - 1e-4)
        lon0 = np.clip(c_lon[idx] + r_deg * np.cos(theta) * 1.5, minlon + 1e-4, maxlon - 1e-4)

        # span text synthesis, vectorized per kind across the slot's rows
        # (hashing, random draws, coordinate walks, and number formatting
        # are all numpy batch ops; only the final nested-struct assembly —
        # inherently per-row python objects for Arrow — loops)
        m0 = kind_code == 0
        if m0.any():
            w_sel = words[
                (_splitmix64((di[m0] * 31 + j).astype(np.uint64)) % np.uint64(len(words))).astype(int)
            ]
            for k, w, i in zip(idx[m0], w_sel, di[m0]):
                spans_per_doc[k].append(
                    {"kind": "text", "text": f"{w} span {j} of doc {i}", "media_ref": "", "offset": j}
                )
        m1 = kind_code == 1
        if m1.any():
            hv = _splitmix64((di[m1] * 131 + j).astype(np.uint64))
            for k, h in zip(idx[m1], hv):
                spans_per_doc[k].append(
                    {"kind": "media", "text": f"media span {j}", "media_ref": f"media://{int(h):016x}", "offset": j}
                )
        m2 = kind_code == 2
        if m2.any():
            txts = np.char.add(
                np.char.add(np.char.mod("%.7f", lat0[m2]), ","), np.char.mod("%.7f", lon0[m2])
            )
            for k, t in zip(idx[m2], txts):
                spans_per_doc[k].append({"kind": "geo_point", "text": t, "media_ref": "", "offset": j})
        m3 = kind_code == 3
        if m3.any():
            di3 = di[m3]
            npts3 = 2 + (_u01(di3, 13 + 7 * j, seed) * 5).astype(np.int64)
            la_cur, lo_cur = lat0[m3].copy(), lon0[m3].copy()
            las, los = [la_cur.copy()], [lo_cur.copy()]
            for s in range(1, int(npts3.max())):
                dla = (_u01(di3 * 97 + s, 40 + j, seed) - 0.5) * 0.0008
                dlo = (_u01(di3 * 89 + s, 41 + j, seed) - 0.5) * 0.0012
                la_cur = np.clip(la_cur + dla, bounds[0], bounds[2])
                lo_cur = np.clip(lo_cur + dlo, bounds[1], bounds[3])
                las.append(la_cur.copy())
                los.append(lo_cur.copy())
            pt_mat = np.char.add(
                np.char.add(np.char.mod("%.7f", np.stack(las, axis=1)), ","),
                np.char.mod("%.7f", np.stack(los, axis=1)),
            )
            for r, k in enumerate(idx[m3]):
                spans_per_doc[k].append(
                    {"kind": "geo_way", "text": " ".join(pt_mat[r, : npts3[r]]), "media_ref": "", "offset": j}
                )
        m4 = kind_code == 4
        if m4.any():
            di4 = di[m4]
            la4, lo4 = lat0[m4], lon0[m4]
            nv4 = 4 + (_u01(di4 * 53 + j, 50, seed) * 5).astype(np.int64)
            rad4 = 0.00006 + _u01(di4 * 59 + j, 51, seed) * 0.0004
            ph4 = _u01(di4 + j, 52, seed)
            mxv = int(nv4.max())
            ang = 2 * np.pi * (ph4[:, None] + np.arange(mxv)[None, :] / nv4[:, None])
            rla = np.clip(la4[:, None] + rad4[:, None] * np.sin(ang), bounds[0], bounds[2])
            rlo = np.clip(lo4[:, None] + rad4[:, None] * 1.5 * np.cos(ang), bounds[1], bounds[3])
            ring_mat = np.char.add(
                np.char.add(np.char.mod("%.7f", rla), ","), np.char.mod("%.7f", rlo)
            )
            has_hole = _u01(di4 * 61 + j, 53, seed) < 0.2
            ang_h = 2 * np.pi * (0.1 + np.arange(4) / 4)
            hla = np.clip(
                la4[:, None] + (rad4 * 0.4)[:, None] * np.sin(ang_h)[None, :], bounds[0], bounds[2]
            )
            hlo = np.clip(
                lo4[:, None] + (rad4 * 0.4)[:, None] * 1.5 * np.cos(ang_h)[None, :], bounds[1], bounds[3]
            )
            hole_mat = np.char.add(
                np.char.add(np.char.mod("%.7f", hla), ","), np.char.mod("%.7f", hlo)
            )
            for r, k in enumerate(idx[m4]):
                nv = nv4[r]
                ring = list(ring_mat[r, :nv])
                ring.append(ring[0])  # closed loop (GeometryUtil.closeLoop)
                txt = " ".join(ring)
                if has_hole[r]:
                    hole = list(hole_mat[r])
                    hole.append(hole[0])
                    txt += " hole:" + " ".join(hole)
                spans_per_doc[k].append({"kind": "geo_area", "text": txt, "media_ref": "", "offset": j})

    return pd.DataFrame(
        {"doc_id": [f"doc_{int(i):012d}" for i in ids], "spans": spans_per_doc}
    )


def _norminv(u: np.ndarray) -> np.ndarray:
    """Cheap deterministic normal via inverse-ish transform (Box-Muller with
    paired uniform derived from u)."""
    u = np.clip(u, 1e-12, 1 - 1e-12)
    return np.sqrt(-2.0 * np.log(u)) * np.cos(2 * np.pi * ((u * 7919) % 1.0))


def _fmt_pts(pts) -> str:
    return " ".join(f"{la:.7f},{lo:.7f}" for la, lo in pts)


def _walk(i: int, j: int, lat: float, lon: float, seed: int, bounds, npts: int):
    pts = [(lat, lon)]
    for s in range(1, npts):
        dla = (_u01(np.array([i * 97 + s]), 40 + j, seed)[0] - 0.5) * 0.0008
        dlo = (_u01(np.array([i * 89 + s]), 41 + j, seed)[0] - 0.5) * 0.0012
        la = min(max(pts[-1][0] + dla, bounds[0]), bounds[2])
        lo = min(max(pts[-1][1] + dlo, bounds[1]), bounds[3])
        pts.append((la, lo))
    return pts


def _area_text(i: int, j: int, lat: float, lon: float, seed: int, bounds) -> str:
    nv = 4 + int(_u01(np.array([i * 53 + j]), 50, seed)[0] * 5)  # 4..8 vertices
    rad = 0.00006 + _u01(np.array([i * 59 + j]), 51, seed)[0] * 0.0004
    ring = _regular_ring(lat, lon, rad, nv, bounds, phase=_u01(np.array([i + j]), 52, seed)[0])
    txt = _fmt_pts(ring)
    if _u01(np.array([i * 61 + j]), 53, seed)[0] < 0.2:  # 20% get one hole
        hole = _regular_ring(lat, lon, rad * 0.4, 4, bounds, phase=0.1)
        txt += " hole:" + _fmt_pts(hole)
    return txt


def _regular_ring(lat: float, lon: float, rad: float, nv: int, bounds, phase: float):
    ang = 2 * np.pi * (phase + np.arange(nv) / nv)
    pts = [
        (
            min(max(lat + rad * np.sin(a), bounds[0]), bounds[2]),
            min(max(lon + rad * 1.5 * np.cos(a), bounds[1]), bounds[3]),
        )
        for a in ang
    ]
    pts.append(pts[0])  # closed loop (GeometryUtil.closeLoop convention)
    return pts


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    constant_density: bool = False,
) -> DataFrame:
    """Deterministic interleaved-document table, generated distributively:
    spark.range drives doc indices; each Arrow batch materializes its rows
    as a pure function of (seed, index, n_docs).

    constant_density=True widens the bbox with sqrt(n_docs/5000) so per-cell
    density (and thus per-cell join cost) is independent of corpus size —
    the realistic planetary-scale shape used for throughput benchmarks."""
    rng = spark.range(0, n_docs, numPartitions=partitions)
    scale = max(1.0, (n_docs / 2000.0) ** 0.5) if constant_density else 1.0

    def gen(batches):
        for pdf in batches:
            yield _gen_rows(pdf["id"].values, seed, scale)

    return rng.mapInPandas(gen, schema=DOCS_SCHEMA)


# ----------------------------------------------------------- extraction

GEOM_TYPE = ArrayType(ArrayType(DoubleType()))

ELEMENTS_EXTRA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("element_type", StringType()),
        StructField("geom", GEOM_TYPE),       # metric XZ packed rings
        StructField("minx", DoubleType()),
        StructField("minz", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxz", DoubleType()),
        StructField("minlat", DoubleType()),
        StructField("minlon", DoubleType()),
        StructField("maxlat", DoubleType()),
        StructField("maxlon", DoubleType()),
    ]
)


def parse_geo_spans(docs: DataFrame) -> DataFrame:
    """documents -> one row per geo span with lat/lon rings parsed by pure
    Column expressions (split/transform — stays in whole-stage codegen):

    (doc_id, span_idx, kind, rings: array<array<double>>, is_valid)
    rings are packed [lat0, lon0, lat1, lon1, ...]; ring 0 outer, 1..
    holes.

    Malformed geometry text NEVER fails the task: coordinates parse with
    try_cast (ANSI-safe), and `is_valid` flags rows where any coordinate
    is NULL / any point is not a lat,lon pair / no ring has points — the
    FaultTolerantIterationUtil contract (reference
    FaultTolerantIterationUtil.java:20-54: per-element failures are routed
    to the log, iteration continues)."""
    exploded = docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).where(F.col("span.kind").startswith("geo_"))
    ring_strs = F.split(F.col("span.text"), " hole:")
    rings = F.transform(
        ring_strs,
        lambda rs: F.flatten(
            F.transform(
                F.split(rs, " "),
                lambda pt: F.array(
                    F.get(F.split(pt, ","), 0).try_cast("double"),
                    F.get(F.split(pt, ","), 1).try_cast("double"),
                ),
            )
        ),
    )
    rings_col = rings
    is_valid = (
        (F.size(rings_col) >= 1)
        & ~F.exists(
            rings_col,
            lambda r: (F.size(r) < 2) | F.exists(r, lambda v: v.isNull()),
        )
    )
    return exploded.select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        rings.alias("rings"),
        is_valid.alias("is_valid"),
    )


def geo_span_errors(docs: DataFrame) -> DataFrame:
    """The quarantine stream: one row per malformed geo span
    (doc_id, span_idx, kind, reason). These rows are EXCLUDED from
    extract_elements output; a pipeline writes them to its conversion log
    instead of failing (ConversionLog.java:18-97 semantics)."""
    p = parse_geo_spans(docs).where(~F.col("is_valid"))
    reason = F.when(F.size("rings") < 1, F.lit("no_rings")).otherwise(
        F.lit("unparseable_coordinates")
    )
    return p.select("doc_id", "span_idx", "kind", reason.alias("reason"))


def extract_elements(
    docs: DataFrame,
    origin: Origin = DEFAULT_ORIGIN,
    projection: str = "MetricMapProjection",
) -> DataFrame:
    """documents -> elements DataFrame (the engine's MapData analogue,
    /root/reference/core/src/main/java/org/osm2world/map_data/data/
    MapData.java:27-51): node/way/area rows with projected packed-XZ
    geometry and both geo and metric bboxes.

    Projection runs once per element inside an Arrow batch (numpy over the
    concatenated coordinate arrays) — the per-dataset-origin local plane of
    MetricMapProjection.java:30-43 with mm snap.

    Malformed geo spans are dropped here (fault-tolerant iteration: bad
    elements become log rows, not task failures); recover them with
    `geo_span_errors(docs)` for the quarantine log.

    `projection` selects the map projection by name, mirroring the
    reference's config dispatch (O2WConfig.mapProjection,
    O2WConfig.java:465-470): "OrthographicAzimuthalMapProjection" for the
    tangent-plane projection, anything else for the metric default.
    """
    parsed = parse_geo_spans(docs).where(F.col("is_valid"))
    type_col = (
        F.when(F.col("kind") == "geo_point", "node")
        .when(F.col("kind") == "geo_way", "way")
        .otherwise("area")
    )
    parsed = parsed.select(
        "doc_id", "span_idx", type_col.alias("element_type"), "rings"
    )

    from ..functions.projection import np_projection

    fwd = np_projection(projection)

    def project(batches):
        for pdf in batches:
            yield _project_batch(pdf, origin, fwd)

    return parsed.mapInPandas(project, schema=ELEMENTS_EXTRA)


def _project_batch(pdf: pd.DataFrame, origin: Origin, fwd=np_to_xz) -> pd.DataFrame:
    rings_col = pdf["rings"]
    # flatten every ring of every row into one coord array
    lengths = []
    chunks = []
    for rings in rings_col:
        for ring in rings:
            arr = np.asarray(ring, dtype=np.float64)
            chunks.append(arr)
            lengths.append(len(arr) // 2)
    if chunks:
        flat = np.concatenate(chunks)
        lat, lon = flat[0::2], flat[1::2]
        x, z = fwd(lat, lon, origin)
    else:
        lat = lon = x = z = np.empty(0)

    geoms = []
    b = np.zeros((len(pdf), 8))
    pos = 0
    ring_i = 0
    for row_i, rings in enumerate(rings_col):
        out_rings = []
        row_start = pos
        for ring in rings:
            npts = lengths[ring_i]
            packed = np.empty(npts * 2)
            packed[0::2] = x[pos : pos + npts]
            packed[1::2] = z[pos : pos + npts]
            out_rings.append(packed.tolist())
            pos += npts
            ring_i += 1
        geoms.append(out_rings)
        sl = slice(row_start, pos)
        b[row_i] = (
            x[sl].min(), z[sl].min(), x[sl].max(), z[sl].max(),
            lat[sl].min(), lon[sl].min(), lat[sl].max(), lon[sl].max(),
        )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "span_idx": pdf["span_idx"],
            "element_type": pdf["element_type"],
            "geom": geoms,
            "minx": b[:, 0], "minz": b[:, 1], "maxx": b[:, 2], "maxz": b[:, 3],
            "minlat": b[:, 4], "minlon": b[:, 5], "maxlat": b[:, 6], "maxlon": b[:, 7],
        }
    )


def way_segments(elements: DataFrame) -> DataFrame:
    """Flat-map ways into 2-point segments (MapData.java:47: ways are
    expanded into MapWaySegments at construction). Pure Column expressions:
    one row per consecutive point pair, seg_idx preserved for identity.

    Output: (doc_id, span_idx, seg_idx, x1, z1, x2, z2)."""
    ways = elements.where(F.col("element_type") == "way")
    line = F.col("geom").getItem(0)
    n_pts = (F.size(line) / 2).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_pts - 2),
        lambda i: F.struct(
            i.cast("int").alias("seg_idx"),
            line[i * 2].alias("x1"),
            line[i * 2 + 1].alias("z1"),
            line[i * 2 + 2].alias("x2"),
            line[i * 2 + 3].alias("z2"),
        ),
    )
    return ways.select(
        "doc_id", "span_idx", F.explode(segs).alias("s")
    ).select("doc_id", "span_idx", "s.seg_idx", "s.x1", "s.z1", "s.x2", "s.z2")
