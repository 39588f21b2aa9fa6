"""CCNet-style text normalization for dedup keys.

The CCNet / RefinedWeb / Dolma pipelines deduplicate on a NORMALIZED
form of the text — lowercased, digits folded, accents stripped,
whitespace collapsed — so trivially-variant pages ("Copyright 2019" vs
"copyright 2020") hash to the same key, while the ORIGINAL text is what
survives into the corpus. (CCNet: Wenzek et al. 2020, the
`text_normalizer.normalize` hashing key; same trick in BigScience ROOTS
and Dolma's dedup config.)

Everything is pure Column arithmetic chosen for ENGINE PORTABILITY —
the same normalization is restated verbatim by the DuckDB oracle:

* lowercase (`lower`; the corpus surface is ASCII — the unicode simple
  case mapping agrees between engines there, documented boundary),
* digit folding 0-9 -> '0' (`translate`),
* accent stripping for the Latin-1 letter block via one fixed
  `translate` table (the bounded, deterministic subset of CCNet's
  unicodedata.normalize("NFD") + combining-mark strip; full NFD needs
  ICU, out of sandbox scope and documented),
* punctuation-adjacent whitespace discipline: runs of whitespace
  collapse to one space, ends trimmed (`regexp_replace` + `trim`;
  the oracle uses the 'g' flag — DuckDB replaces first-match only by
  default, Spark always replaces globally).

`normalized_dup_groups` is `dedup.exact_dup_groups` keyed on the
normalized digest: one linear hash aggregation, no new shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Latin-1 accented letter -> base letter (both cases), the fixed
# translate table the oracle restates. One char per char: translate()
# semantics are identical in Spark and DuckDB.
ACCENTS_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
ACCENTS_DST = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"
assert len(ACCENTS_SRC) == len(ACCENTS_DST)

DIGITS_SRC = "123456789"
DIGITS_DST = "000000000"


def normalize_text(col: Column) -> Column:
    """The CCNet dedup-key normalization as one codegen Project."""
    x = F.translate(col, ACCENTS_SRC, ACCENTS_DST)
    x = F.lower(x)
    x = F.translate(x, DIGITS_SRC, DIGITS_DST)
    x = F.regexp_replace(x, r"[ \t\r\n]+", " ")
    return F.trim(x)


def normalized_digest(col: Column) -> Column:
    """md5 of the normalized form — the dedup key."""
    return F.md5(normalize_text(col))


def normalized_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups under the normalized key: (norm_md5, n_docs,
    doc_ids sorted, survivor = lowest id). Same one-exchange linear
    shape as `dedup.exact_dup_groups`; catches the variant-page family
    the raw-text digest misses."""
    return (
        docs.groupBy(normalized_digest(F.col(text_col)).alias("norm_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            "norm_md5",
            "n_docs",
            "doc_ids",
            F.element_at("doc_ids", 1).alias("survivor"),
        )
    )


# UTF-8-as-Latin-1 mojibake pairs for the LOWERCASE accent table: é has
# UTF-8 bytes 0xC3 0xA9, which mis-decoded as Latin-1 render as 'Ã©'.
# Lowercase accents (U+00E0..U+00FF) have PRINTABLE second bytes
# (0xA0..0xBF); uppercase accents decode to C1 control characters and
# stay out of the bounded table (documented boundary — full repair is
# ftfy/ICU territory).
_LOWER_ACCENTS = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
MOJIBAKE_PAIRS = [
    (c.encode("utf-8").decode("latin-1"), c) for c in _LOWER_ACCENTS
]


def fix_mojibake(col: Column) -> Column:
    """Repair UTF-8-as-Latin-1 double-encoding (the classic crawled-web
    mojibake ftfy fixes): each 2-char 'Ã?' sequence from the bounded
    lowercase-accent table is replaced by the intended character — one
    chained `replace` Column per pair, a single codegen Project. The
    same chain is restatable verbatim in SQL (driver query
    `mojibake_fix`), applied in table order on both engines."""
    x = col
    for broken, fixed in MOJIBAKE_PAIRS:
        x = F.replace(x, F.lit(broken), F.lit(fixed))
    return x
