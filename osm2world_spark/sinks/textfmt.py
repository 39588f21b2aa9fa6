"""Engine-portable fixed-point number formatting for text serializers.

The reference prints doubles with Java's shortest-round-trip
``Double.toString`` (ObjOutput.java:266-275, POVRayOutput.java:741-754).
That representation is JVM-specific (DuckDB, C printf and Python all
choose different shortest forms, and printf-style ``%.4f`` rounds ties
differently across libc/fmt/java.util.Formatter), so serializer output
built with it could never be hash-verified across engines.

Deviation (documented in SURVEY §2 S8): coordinates are snapped to a
fixed decimal grid with ``floor(x * scale + 0.5)`` — plain IEEE double
arithmetic that every engine evaluates identically — and the decimal
string is assembled with integer/string ops only. No printf, no
float-to-string cast, therefore bit-identical text in Spark and DuckDB.
The default scale 10^4 is 0.1 mm, finer than the reference's own
coordinate precision convention (functions/projection.py mm snap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000
DECIMALS = 4


def fixed(col: Column, scale: int = SCALE, decimals: int = DECIMALS) -> Column:
    """Format a double as a fixed-point decimal string, e.g. ``-1.2500``.

    ``floor(x*scale + 0.5)`` (round-half-up toward +inf on the scaled
    value) then integer/string assembly. ``-0.0`` and values that snap
    to 0 come out as ``0.0000`` — the reference's negative-zero
    normalization (ObjOutput.java:252 withoutNegativeZero) for free.
    """
    s = F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    a = F.abs(s)
    # a/scale is exact for integer quotients and >1e-4 away from the
    # next integer otherwise, so the double division + floor is safe
    # for any |coordinate| < 2^49/scale.
    ip = F.floor(a / F.lit(scale)).cast("bigint")
    frac = (a % F.lit(scale)).cast("string")
    return F.concat(
        F.when(s < 0, F.lit("-")).otherwise(F.lit("")),
        ip.cast("string"),
        F.lit("."),
        F.lpad(frac, decimals, "0"),
    )


def fixed_sql(expr: str, scale: int = SCALE, decimals: int = DECIMALS) -> str:
    """The DuckDB twin of :func:`fixed` for oracle SQL strings."""
    s = f"CAST(floor(({expr}) * {scale}.0 + 0.5) AS BIGINT)"
    return (
        f"concat(CASE WHEN {s} < 0 THEN '-' ELSE '' END, "
        f"CAST(abs({s}) // {scale} AS VARCHAR), '.', "
        f"lpad(CAST(abs({s}) % {scale} AS VARCHAR), {decimals}, '0'))"
    )
