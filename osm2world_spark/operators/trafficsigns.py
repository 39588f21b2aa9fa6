"""TrafficSignIdentifier parsing (traffic_sign/TrafficSignIdentifier
.java) as Column arithmetic — the traffic_sign=* value decomposition
every sign-aware query needs ("which speed-limit signs along this
route").

Transcription (citations TrafficSignIdentifier.java):

- parseTrafficSignValue :102-133: empty/null -> no rows; a value
  containing ':' splits into country prefix (before the FIRST ':')
  and a sign list; the sign list splits on ';' or ',' with Java
  split semantics — TRAILING empty components dropped, interior empty
  components kept; each component is trimmed.
- bracket text :30-45: the FIRST (greedy) "[...]" match becomes
  bracketText and is removed from the sign — greedy means
  "a[b]c[d]" yields bracketText "b]c[d", exactly like the Java
  Matcher.find on "\\[(.*)\\]".
- subType :54-70: the sign matched (entire-string) against
  "\\d*-(\\d+)[A-Za-z]*" — "274-50" -> "50".
- configKey :72-88: "SIGN_" + country + "_" + sign with '-'->'_',
  uppercased; configKeyWithoutSubType :94-100 removes EVERY
  "_"+subType occurrence (Java String.replace replaces all).

One explode per tag value; everything else is codegen string Columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import values as V


def parse_traffic_signs(df: DataFrame, value_col: str) -> DataFrame:
    """Explode a traffic_sign tag value into one row per identifier
    with columns sign_idx, country, sign, bracket_text, sub_type,
    config_key, config_key_no_sub."""
    v = F.col(value_col)
    has_country = v.contains(":")
    country = F.when(has_country, F.split(v, ":", 2).getItem(0))
    rest = F.when(has_country, F.split(v, ":", 2).getItem(1)).otherwise(v)
    # Java split semantics via the shared helper — trailing empties
    # dropped, "DE:" yields ONE empty-sign identifier (rest "" splits
    # to [""]), "DE:;;" yields none; the reference's own empty-VALUE
    # guard (:104) stays separate
    signs = F.when(
        v.isNull() | (v == ""), F.array().cast("array<string>")
    ).otherwise(V.java_split(rest, "[;,]"))

    out = df.select(
        "*",
        country.alias("country"),
        F.posexplode(signs).alias("sign_idx", "_raw"),
    )

    raw = F.trim(F.col("_raw"))
    bracket = F.when(
        raw.rlike(r"\[.*\]"), F.regexp_extract(raw, r"\[(.*)\]", 1)
    )
    sign = F.when(
        bracket.isNotNull(),
        F.replace(raw, F.concat(F.lit("["), bracket, F.lit("]")), F.lit("")),
    ).otherwise(raw)
    out = out.select(
        *[c for c in out.columns if c != "_raw"],
        sign.alias("sign"),
        bracket.alias("bracket_text"),
    )

    s = F.col("sign")
    sub = F.when(
        s.rlike(r"^\d*-(\d+)[A-Za-z]*$"),
        F.regexp_extract(s, r"^\d*-(\d+)[A-Za-z]*$", 1),
    )
    key = F.concat(
        F.lit("SIGN_"),
        F.when(F.col("country").isNotNull(), F.concat(F.col("country"), F.lit("_")))
        .otherwise(F.lit("")),
        F.upper(F.translate(s, "-", "_")),
    )
    out = out.select("*", sub.alias("sub_type"), key.alias("config_key"))
    return out.select(
        "*",
        F.when(
            F.col("sub_type").isNotNull(),
            F.replace(
                F.col("config_key"),
                F.concat(F.lit("_"), F.col("sub_type")),
                F.lit(""),
            ),
        )
        .otherwise(F.col("config_key"))
        .alias("config_key_no_sub"),
    )
