"""PowerModule cable-run semantics (PowerModule.java) — which cable
runs a power line carries between its towers, and at what attachment
offsets/heights.

Unlike the other world-module attribute operators this one is
relational, not a pure projection: a tower's configuration derives from
ALL power lines meeting at its node (generateTowerConfig,
PowerModule.java:66-99), so the derivation is an endpoint explode + a
per-node aggregate + a join back to the segments — two exchanges, both
on node_id, both broadcast-able when the tower table is small.

Transcription notes (citations PowerModule.java):

- Tower config :66-99: every connected power=line segment's
  cables/voltage tags are parsed (Integer.valueOf, strict); the Java
  loop keeps the LAST parseable value in iteration order, which is
  data-structure order and not reproducible relationally — this engine
  takes MAX per node (documented deviation; identical whenever the
  values agree, which is the overwhelmingly common case of one line
  passing through a tower).
- isHighVoltagePowerTower :192-194: voltage >= 50000 || cables >= 6.
- WirePos.setup :399-490: the segment's own cables tag gates
  everything (cables <= 0 or unparseable -> no runs, :414-416); branch
  on either endpoint tower being high-voltage (:422).
  - normal towers :426-445: tower height parseHeight(node tags, 14)
    + 0.25, cable base at height-0.5, runs (right offset, up):
    (2, .5), (-2, .5); cables>=3 adds (0, .5); cables>=5 adds
    (1.5, -.5), (-1.5, -.5).
  - high-voltage towers :448-489: default height 40 (voltage>150000)
    else 30, pole width 16 else 13; the quantised tower height
    heightS = 2.5 * (((int)(height/2.5)) / 5) with INTEGER division;
    runs: top (0, -0.5 + 5*heightQ); base column (+-0.9w,
    -0.7 + height/2); 3<cables<=9 adds (+-0.45w, same); cables>9 adds
    (+-0.6w, +-0.3w, same); cables>=7 adds (+-0.54w, -0.7 + 4*heightQ)
    and cables>=9 further (+-0.27w, same).

Output: one row per cable run (seg join keys, is_high, n_runs,
run_idx in the reference's append order, right offset, y_start, y_end
— y relative to the tower base).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import values as V


def _java_int(col: Column) -> Column:
    """Integer.valueOf — strict int parse, NULL on failure."""
    return V.parse_int(col)


def tower_flags(segments: DataFrame, tags_col: str = "tags",
                start_col: str = "start_node",
                end_col: str = "end_node") -> DataFrame:
    """Per-node tower configuration from connected power=line segments
    (generateTowerConfig :66-99): (node_id, cables_n, voltage_n,
    is_high).  MAX aggregation over connected lines (see module
    docstring for the documented deviation)."""
    tags = F.col(tags_col)
    lines = segments.where(tags["power"] == "line").select(
        F.explode(F.array(F.col(start_col), F.col(end_col))).alias("node_id"),
        _java_int(tags["cables"]).alias("_c"),
        _java_int(tags["voltage"]).alias("_v"),
    )
    per_node = lines.groupBy("node_id").agg(
        F.coalesce(F.max("_c"), F.lit(-1)).alias("cables_n"),
        F.coalesce(F.max("_v"), F.lit(-1)).alias("voltage_n"),
    )
    return per_node.select(
        "node_id", "cables_n", "voltage_n",
        ((F.col("voltage_n") >= 50000) | (F.col("cables_n") >= 6)).alias("is_high"),
    )


def _run(right: Column | float, ys: Column, ye: Column) -> Column:
    r = right if isinstance(right, Column) else F.lit(float(right))
    return F.struct(r.alias("right"), ys.alias("y_start"), ye.alias("y_end"))


def power_cable_runs(
    segments: DataFrame,
    nodes: DataFrame,
    tags_col: str = "tags",
    start_col: str = "start_node",
    end_col: str = "end_node",
    node_id_col: str = "node_id",
    node_tags_col: str = "tags",
) -> DataFrame:
    """One row per cable run for every power=line segment with a
    positive cables tag.  `nodes` supplies tower heights
    ((node_id, tags)); tower high-voltage flags come from
    :func:`tower_flags` over the same segments frame."""
    tags = F.col(tags_col)
    towers = tower_flags(segments, tags_col, start_col, end_col)
    node_h = nodes.select(
        F.col(node_id_col).alias("node_id"),
        F.coalesce(
            V.parse_measure(F.col(node_tags_col)["height"]),
            V.parse_measure(F.col(node_tags_col)["building:height"]),
            V.parse_measure(F.col(node_tags_col)["est_height"]),
        ).alias("_nh"),
    )
    # one node-attribute table instead of separate tower/height joins:
    # each endpoint then costs ONE node-keyed join, not two (towers is
    # restricted to power-line endpoints, so the outer join stays the
    # size of the node set actually touched)
    node_attrs = towers.join(node_h, "node_id", "full_outer").select(
        "node_id",
        F.coalesce(F.col("is_high"), F.lit(False)).alias("_nhigh"),
        "_nh",
    )

    lines = segments.where(
        (tags["power"] == "line") & (_java_int(tags["cables"]) > 0)
    ).select(
        "*",
        _java_int(tags["cables"]).alias("_cables"),
        F.coalesce(_java_int(tags["voltage"]), F.lit(-1)).alias("_voltage"),
    )

    j = lines.join(
        node_attrs.select(
            F.col("node_id").alias("_sn"),
            F.col("_nhigh").alias("_sh"),
            F.col("_nh").alias("_hs_tag"),
        ),
        F.col(start_col) == F.col("_sn"),
        "left",
    ).join(
        node_attrs.select(
            F.col("node_id").alias("_en"),
            F.col("_nhigh").alias("_eh"),
            F.col("_nh").alias("_he_tag"),
        ),
        F.col(end_col) == F.col("_en"),
        "left",
    )

    C = F.col
    is_high = F.coalesce(C("_sh"), F.lit(False)) | F.coalesce(C("_eh"), F.lit(False))
    j = j.select("*", is_high.alias("_high"))

    empty = F.array().cast(
        "array<struct<right:double,y_start:double,y_end:double>>"
    )

    # --- normal towers (:426-445) ---
    hs = F.coalesce(C("_hs_tag"), F.lit(14.0)) + F.lit(0.25)
    he = F.coalesce(C("_he_tag"), F.lit(14.0)) + F.lit(0.25)
    base_s, base_e = hs - F.lit(0.5), he - F.lit(0.5)
    up, dn = F.lit(0.5), F.lit(-0.5)
    normal = F.concat(
        F.array(
            _run(2.0, base_s + up, base_e + up),
            _run(-2.0, base_s + up, base_e + up),
        ),
        F.when(C("_cables") >= 3, F.array(_run(0.0, base_s + up, base_e + up))).otherwise(empty),
        F.when(
            C("_cables") >= 5,
            F.array(
                _run(1.5, base_s + dn, base_e + dn),
                _run(-1.5, base_s + dn, base_e + dn),
            ),
        ).otherwise(empty),
    )

    # --- high-voltage towers (:448-489) ---
    dflt_h = F.when(C("_voltage") > 150000, F.lit(40.0)).otherwise(F.lit(30.0))
    pw = F.when(C("_voltage") > 150000, F.lit(16.0)).otherwise(F.lit(13.0))
    hhs = F.coalesce(C("_hs_tag"), dflt_h)
    hhe = F.coalesce(C("_he_tag"), dflt_h)
    # 2.5 * (((int)(h/2.5)) / 5) — both divisions truncate
    hq = lambda h: F.lit(2.5) * ((h / F.lit(2.5)).cast("int") / F.lit(5)).cast("int")  # noqa: E731
    hqs, hqe = hq(hhs), hq(hhe)
    top_y = lambda q: F.lit(-0.5) + F.lit(5.0) * q  # noqa: E731
    col_ys, col_ye = F.lit(-0.7) + hhs / 2, F.lit(-0.7) + hhe / 2
    up_ys, up_ye = F.lit(-0.7) + F.lit(4.0) * hqs, F.lit(-0.7) + F.lit(4.0) * hqe

    high = F.concat(
        F.array(_run(0.0, top_y(hqs), top_y(hqe))),
        F.array(
            _run(F.lit(0.9) * pw, col_ys, col_ye),
            _run(F.lit(-0.9) * pw, col_ys, col_ye),
        ),
        F.when(
            (C("_cables") > 3) & (C("_cables") <= 9),
            F.array(
                _run(F.lit(0.45) * pw, col_ys, col_ye),
                _run(F.lit(-0.45) * pw, col_ys, col_ye),
            ),
        ).when(
            C("_cables") > 9,
            F.array(
                _run(F.lit(0.6) * pw, col_ys, col_ye),
                _run(F.lit(-0.6) * pw, col_ys, col_ye),
                _run(F.lit(0.3) * pw, col_ys, col_ye),
                _run(F.lit(-0.3) * pw, col_ys, col_ye),
            ),
        ).otherwise(empty),
        F.when(
            C("_cables") >= 7,
            F.concat(
                F.array(
                    _run(F.lit(0.9 * 0.6) * pw, up_ys, up_ye),
                    _run(F.lit(-0.9 * 0.6) * pw, up_ys, up_ye),
                ),
                F.when(
                    C("_cables") >= 9,
                    F.array(
                        _run(F.lit(0.45 * 0.6) * pw, up_ys, up_ye),
                        _run(F.lit(-0.45 * 0.6) * pw, up_ys, up_ye),
                    ),
                ).otherwise(empty),
            ),
        ).otherwise(empty),
    )

    runs = F.when(C("_high"), high).otherwise(normal)
    out = j.select(
        *[c for c in segments.columns],
        C("_high").cast("int").alias("is_high_i"),
        F.size(runs).alias("n_runs"),
        F.posexplode(runs),
    )
    return out.select(
        *[c for c in segments.columns],
        "is_high_i",
        "n_runs",
        F.col("pos").alias("run_idx"),
        F.col("col.right").alias("right"),
        F.col("col.y_start").alias("y_start"),
        F.col("col.y_end").alias("y_end"),
    )
