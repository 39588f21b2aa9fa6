"""BarrierModule dimension semantics (BarrierModule.java) as a pure
Column projection — barrier kind dispatch plus height/width defaulting
for every linear barrier the reference models.

The reference walks an if/else-if chain of ``fits()`` predicates over
way-segment tags (BarrierModule.java:64-98, first match wins) and each
class passes its default height/width to the LinearBarrier constructor
(:142-148: height = parseHeight(tags, defaultHeight), width =
parseWidth(tags, defaultWidth)).  Several defaults are float literals
promoted to double at the ctor call — pinned here as their exact double
values (0.1f = 0.10000000149011612, 0.02f = 0.019999999552965164,
0.0001f = 9.999999747378752e-05, 1.145f = 1.1449999809265137,
0.82f = 0.8199999928474426, 0.7f = 0.699999988079071).

Kinds and their (fits predicate, default height, default width), in
dispatch order:

  wall              barrier=wall                       1.0    0.25    (:265,:298)
  city_wall         barrier=city_wall                  10.0   2.0     (:304,:308)
  hedge             barrier=hedge                      1.0    0.5     (:313,:317)
  railing           barrier=fence + fence_type=railing 1.0    0.1f    (:333,:339)
  balustrade        barrier=fence + fence_type=balustrade 1.0 0.25    (:411,:417)
  chain_link_fence  barrier=fence + fence_type in
                    (chain_link, metal)                1.0    0.02f   (:478,:484)
  cable_barrier     barrier=cable_barrier              1.0    0.02f   (:695,:699 via PoleFence :550)
  handrail          barrier=handrail                   1.0    0.02f   (:714,:718 via PoleFence)
  guardrail         barrier=guard_rail                 0.75f  0.0001f (:770,:775)
  jersey_barrier    barrier=jersey_barrier             1.145f 0.82f   (:863,:868)
  trellis_work_fence barrier=fence + fence_type=trellis_work
                                                       0.7f   0.1f    (:644,:650)
  pole_fence        barrier=fence (any other)          1.0    0.02f   (:545,:550)
  bollard_row       barrier=bollard                    1.0    0.3     (:915; model dims
                    from createBollardModel :125-133 — the ROW's own
                    getWidth() is a fixed 0.15, :941-943)
  chain_row         barrier=chain                      1.0    0.02f   (:958 via PoleFence)

Rows whose barrier value matches nothing (or carry no barrier key)
surface kind=NULL with NULL dimensions — the module's fast exit
(:66-67).  Node barriers (single bollards/chains) and area shrubbery
are separate element surfaces; this operator covers the way-segment
dispatch, which is where all the dimension semantics live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import values as V

F01 = 0.10000000149011612
F002 = 0.019999999552965164
F0001 = 9.999999747378752e-05
F1145 = 1.1449999809265137
F082 = 0.8199999928474426
F07 = 0.699999988079071

#: (kind, requires fence_type value(s) or None, default height, default width)
#: in the reference's dispatch order (BarrierModule.java:69-97)
BARRIER_DISPATCH = [
    ("wall", "wall", None, 1.0, 0.25),
    ("city_wall", "city_wall", None, 10.0, 2.0),
    ("hedge", "hedge", None, 1.0, 0.5),
    ("railing", "fence", ("railing",), 1.0, F01),
    ("balustrade", "fence", ("balustrade",), 1.0, 0.25),
    ("chain_link_fence", "fence", ("chain_link", "metal"), 1.0, F002),
    ("cable_barrier", "cable_barrier", None, 1.0, F002),
    ("handrail", "handrail", None, 1.0, F002),
    ("guardrail", "guard_rail", None, 0.75, F0001),
    ("jersey_barrier", "jersey_barrier", None, F1145, F082),
    ("trellis_work_fence", "fence", ("trellis_work",), F07, F01),
    ("pole_fence", "fence", None, 1.0, F002),
    ("bollard_row", "bollard", None, 1.0, 0.3),
    ("chain_row", "chain", None, 1.0, F002),
]


def barrier_dimensions(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Append kind / height / width columns for way-segment barriers."""
    tags = F.col(tags_col)
    b = tags["barrier"]
    ft = tags["fence_type"]

    kind = F.lit(None).cast("string")
    dflt_h = F.lit(None).cast("double")
    dflt_w = F.lit(None).cast("double")
    # build the when-chain in dispatch order (first match wins, so the
    # chain is authored forward, not reversed)
    kind_expr = None
    h_expr = None
    w_expr = None
    for k, bval, ftvals, dh, dw in BARRIER_DISPATCH:
        cond = b == bval
        if ftvals is not None:
            cond = cond & ft.isin(*ftvals)
        if kind_expr is None:
            kind_expr = F.when(cond, F.lit(k))
            h_expr = F.when(cond, F.lit(dh))
            w_expr = F.when(cond, F.lit(dw))
        else:
            kind_expr = kind_expr.when(cond, F.lit(k))
            h_expr = h_expr.when(cond, F.lit(dh))
            w_expr = w_expr.when(cond, F.lit(dw))
    kind = kind_expr.otherwise(F.lit(None).cast("string"))
    dflt_h = h_expr.otherwise(F.lit(None).cast("double"))
    dflt_w = w_expr.otherwise(F.lit(None).cast("double"))

    parsed_h = F.coalesce(
        V.parse_measure(tags["height"]),
        V.parse_measure(tags["building:height"]),
        V.parse_measure(tags["est_height"]),
    )
    parsed_w = F.coalesce(
        V.parse_measure(tags["width"]), V.parse_measure(tags["est_width"])
    )

    out = df.select(
        "*",
        kind.alias("barrier_kind"),
        F.when(kind.isNotNull(), F.coalesce(parsed_h, dflt_h)).alias("barrier_height"),
        F.when(kind.isNotNull(), F.coalesce(parsed_w, dflt_w)).alias("barrier_width"),
    )
    return out
