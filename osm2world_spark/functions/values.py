"""OSM tag-value parsers (util/ValueParseUtil.java) as pure Column
expressions — the unit-aware scalar layer every tag-driven operator
(speed limits, widths, heights, weights, inclines, directions) needs
before it can compare or aggregate raw OSM strings.

Reference semantics, branch for branch:

- parseUInt / parseInt (ValueParseUtil.java:42-77): Integer.parseInt
  (no trimming, optional sign, int32 overflow -> null), parseUInt
  additionally rejects negatives.
- parseOsmDecimal (:87-134): int parse first, else the anchored
  DEC_POINT_PATTERN `^(-?\\d+)\\.(\\d+)$` with BOTH groups int-parsed
  (overlong fraction digits overflow to null) and the value rebuilt as
  abs(before) + 10^-len(after) * after, negated on a leading '-'; an
  optional constraint (POSITIVE / NONNEGATIVE, :24-29) filters the
  result. Same kernel as operators/elevation.py::parse_osm_decimal,
  extended here with the constraint argument.
- parseSpeed (:143-187): unitless decimal (POSITIVE) in km/h, else
  `^(\\d+)\\s*km/h$` (plain int, NO positivity check — "0 km/h" parses
  to 0.0 where bare "0" does not), else `^(\\d+)\\s*mph$` scaled by
  KM_PER_MILE — a FLOAT literal in the reference (1.609344f), so the
  exact double multiplier is float32(1.609344) = 1.6093440055847168.
- parseMeasure / parseMeasureWithSpecialDefaultUnit (:196-281):
  unitless decimal (POSITIVE) times the default-unit factor, else
  m / km / mi suffix forms whose numeric group is itself
  parseOsmDecimal(POSITIVE), else feet-inches `^(\\d+)'\\s*(\\d+)\"$`
  with inches < 12, scaled by M_PER_INCH = float32(0.0254) =
  0.02539999969303608 (another float literal) and M_PER_MI = 1609.344
  (a double literal). Deviation, documented: on a km/mi group that
  matches `[\\d.]+` but fails decimal parse (e.g. "1.2.3 km") the
  reference unboxes null and throws NPE; this engine yields NULL — a
  crash is not reproducible relationally, and NULL routes the row to
  the O6 quarantine path instead of killing the job.
- parseWeight (:284-313): unitless decimal (POSITIVE) in tonnes, else
  `^([\\d.]+)\\s*t$` with the group re-parsed (null-safe in the
  reference too).
- parseIncline (:322-340): `^(-?\\d+(?:\\.\\d+)?)\\s*%$`, group parsed
  with NO constraint (inclines are signed).
- parseAngle (:354-388): unitless decimal (NONNEGATIVE) mod 360, else
  the 16-point compass rose (N=0, NNE=22.5, ... NNW=337.5).

All parsers return DOUBLE (NULL on unparseable input) and run entirely
inside codegen — regexp_extract / try_cast / arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT = r"^[+-]?\d+$"  # Integer.parseInt surface (try_cast also trims; the rlike guard restores Java's no-trim rule)
_DEC = r"^(-?\d+)\.(\d+)$"  # DEC_POINT_PATTERN :35

# float32 literals in the reference, pinned as their exact double values
KM_PER_MILE = 1.6093440055847168  # (double) 1.609344f  :146
M_PER_INCH = 0.02539999969303608  # (double) 0.0254f    :203
M_PER_MI = 1609.344  # double literal               :202


def parse_int(col: Column) -> Column:
    """parseInt :67-77 — int32 or NULL."""
    return F.when(col.rlike(_INT), col.try_cast("int"))


def parse_uint(col: Column) -> Column:
    """parseUInt :42-54 — non-negative int32 or NULL."""
    i = parse_int(col)
    return F.when(i >= 0, i)


def _constrained(value: Column, constraint: str | None) -> Column:
    if constraint == "positive":
        return F.when(value > 0, value)
    if constraint == "nonnegative":
        return F.when(value >= 0, value)
    return value


def osm_decimal(col: Column, constraint: str | None = None) -> Column:
    """parseOsmDecimal :87-134 with the ValueConstraint applied.

    Constraint-after-coalesce is equivalent to the reference's
    per-branch test: an int string never matches DEC_POINT_PATTERN, so
    a constraint-rejected int branch falls through to null either way.
    """
    as_int = F.when(col.rlike(_INT), col.try_cast("int")).cast("double")
    before = F.regexp_extract(col, _DEC, 1).try_cast("int")
    after_s = F.regexp_extract(col, _DEC, 2)
    after = after_s.try_cast("int")
    dec_val = F.when(
        col.rlike(_DEC) & before.isNotNull() & after.isNotNull(),
        F.when(F.regexp_extract(col, _DEC, 1).startswith("-"), F.lit(-1.0)).otherwise(
            F.lit(1.0)
        )
        * (
            F.abs(before).cast("double")
            + after.cast("double") * F.pow(F.lit(10.0), -F.length(after_s))
        ),
    )
    return _constrained(F.coalesce(as_int, dec_val), constraint)


def _unit_group(col: Column, pattern: str, constraint: str | None = "positive") -> Column:
    """The numeric group of an anchored single-group unit pattern,
    re-parsed through osm_decimal — NULL when the pattern misses OR the
    group itself fails the decimal parse."""
    return F.when(col.rlike(pattern), osm_decimal(F.regexp_extract(col, pattern, 1), constraint))


def parse_speed(col: Column) -> Column:
    """parseSpeed :153-187 — km/h; unitless implies km/h."""
    kmh = F.when(
        col.rlike(r"^\d+\s*km/h$"),
        F.regexp_extract(col, r"^(\d+)\s*km/h$", 1).try_cast("int").cast("double"),
    )
    mph = F.when(
        col.rlike(r"^\d+\s*mph$"),
        F.regexp_extract(col, r"^(\d+)\s*mph$", 1).try_cast("int").cast("double")
        * F.lit(KM_PER_MILE),
    )
    return F.coalesce(osm_decimal(col, "positive"), kmh, mph)


def parse_measure(col: Column, unitless_factor: float = 1.0) -> Column:
    """parseMeasure / parseMeasureWithSpecialDefaultUnit :211-277 — meters."""
    unitless = osm_decimal(col, "positive") * F.lit(float(unitless_factor))
    m = _unit_group(col, r"^([\d\.]+)\s*m$")
    km = _unit_group(col, r"^([\d\.]+)\s*km$") * F.lit(1000.0)
    mi = _unit_group(col, r"^([\d\.]+)\s*mi$") * F.lit(M_PER_MI)
    fi_pat = r"^(\d+)'\s*(\d+)\"$"
    feet = F.regexp_extract(col, fi_pat, 1).try_cast("int")
    inches = F.regexp_extract(col, fi_pat, 2).try_cast("int")
    fi = F.when(
        col.rlike(fi_pat) & feet.isNotNull() & inches.isNotNull() & (inches < 12),
        F.lit(M_PER_INCH) * (F.lit(12) * feet + inches).cast("double"),
    )
    return F.coalesce(unitless, m, km, mi, fi)


def parse_weight(col: Column) -> Column:
    """parseWeight :291-313 — tonnes; unitless implies tonnes."""
    return F.coalesce(osm_decimal(col, "positive"), _unit_group(col, r"^([\d\.]+)\s*t$"))


def parse_incline(col: Column) -> Column:
    """parseIncline :329-340 — signed percent."""
    return _unit_group(col, r"^(-?\d+(?:\.\d+)?)\s*%$", constraint=None)


_COMPASS = [
    ("N", 0.0), ("NNE", 22.5), ("NE", 45.0), ("ENE", 67.5),
    ("E", 90.0), ("ESE", 112.5), ("SE", 135.0), ("SSE", 157.5),
    ("S", 180.0), ("SSW", 202.5), ("SW", 225.0), ("WSW", 247.5),
    ("W", 270.0), ("WNW", 292.5), ("NW", 315.0), ("NNW", 337.5),
]


def parse_angle(col: Column) -> Column:
    """parseAngle :354-388 — degrees from north in [0, 360); cardinal
    letters accepted."""
    num = osm_decimal(col, "nonnegative") % F.lit(360.0)
    rose = F.element_at(
        F.create_map(*[F.lit(v) for pair in _COMPASS for v in pair]), col
    )
    return F.coalesce(num, rose)


def parse_levels(col: Column) -> Column:
    """parseLevels :443-483 — Simple Indoor Tagging level list.

    Whitespace stripped, ';'-separated pieces; a piece is either a full
    range `(-?\\d+)-(-?\\d+)` expanded min..max (so "4-2" is [2,3,4]
    and "-5--2" works) or a single Integer.parseInt; unparseable pieces
    are skipped silently (the reference swallows the
    NumberFormatException — an overflowing range bound also kills just
    its piece). Result is sorted ascending, duplicate-free,
    array<int>; NULL when nothing parsed. Higher-order transform +
    flatten — still a single codegen-adjacent projection, no UDF."""
    rng = r"^(-?\d+)-(-?\d+)$"
    pieces = F.split(F.regexp_replace(col, r"\s+", ""), ";")

    def piece_levels(p: Column) -> Column:
        a = F.regexp_extract(p, rng, 1).try_cast("int")
        b = F.regexp_extract(p, rng, 2).try_cast("int")
        range_arr = F.when(
            p.rlike(rng) & a.isNotNull() & b.isNotNull(),
            F.sequence(F.least(a, b), F.greatest(a, b)),
        )
        single_i = F.when(p.rlike(_INT), p.try_cast("int"))
        single = F.when(single_i.isNotNull(), F.array(single_i))
        return F.coalesce(range_arr, single, F.array().cast("array<int>"))

    levels = F.array_sort(F.array_distinct(F.flatten(F.transform(pieces, piece_levels))))
    return F.when(F.size(levels) > 0, levels)


def java_split(col: Column, sep_pattern: str) -> Column:
    """Java ``String.split(regex)`` with the default limit 0: trailing
    empty components removed (interior ones kept), ``"" -> [""]`` (the
    no-match special case returns the original string), a string of
    only separators -> ``[]``.  Used wherever the reference splits tag
    values (per-lane ``:lanes`` pipes, traffic-sign ``;``/``,`` lists);
    Spark's F.split alone keeps trailing empties and would inflate the
    component counts."""
    stripped = F.regexp_replace(col, f"(?:{sep_pattern})+$", "")
    return (
        F.when(col.isNull(), F.lit(None).cast("array<string>"))
        .when(col == "", F.array(F.lit("")))
        .when(stripped == "", F.array().cast("array<string>"))
        .otherwise(F.split(stripped, sep_pattern))
    )
