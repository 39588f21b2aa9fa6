"""CCNet-style text normalization (operators/normalize.py)."""

from __future__ import annotations

import re

from osm2world_spark.operators.normalize import (
    ACCENTS_DST,
    ACCENTS_SRC,
    DIGITS_DST,
    DIGITS_SRC,
)


def _scalar_norm(s: str) -> str:
    s = s.translate(str.maketrans(ACCENTS_SRC, ACCENTS_DST))
    s = s.lower()
    s = s.translate(str.maketrans(DIGITS_SRC, DIGITS_DST))
    s = re.sub(r"[ \t\r\n]+", " ", s)
    return s.strip()


CASES = [
    "Héllo Wörld",  # ö is NOT in the Latin-1 table? (it is: ö -> o)
    "Copyright 2019 — all rights reserved",
    "  doubled  spaces\tand\ttabs\r\nnewlines  ",
    "ÀÁÂÃÄÅ àáâãäå ÇÈÉÊË çèéêë ÌÍÎÏ ìíîï Ñ ñ ÒÓÔÕÖ òóôõö ÙÚÛÜ ùúûü Ý ý ÿ",
    "price: 1234,56 or 9.99",
    "",
    "nochange",
]


def test_column_matches_scalar(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.operators.normalize import normalize_text

    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "i int, s string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text(F.col("s")).alias("n")).collect()
    }
    assert got == {i: _scalar_norm(s) for i, s in enumerate(CASES)}


def test_idempotent():
    for s in CASES:
        once = _scalar_norm(s)
        assert _scalar_norm(once) == once


def test_variant_pages_collapse(spark):
    from osm2world_spark.operators.normalize import normalized_dup_groups

    docs = spark.createDataFrame(
        [
            ("d1", "Copyright 2019 Example Corp"),
            ("d2", "copyright   2024  EXAMPLE corp"),
            ("d3", "çopyright 0000 example corp"),  # ç folds to c
            ("d4", "something else entirely"),
            ("d5", "Something  ELSE   entirely"),
            ("d6", "unique document"),
        ],
        "doc_id string, text string",
    )
    groups = {
        r["survivor"]: (r["n_docs"], list(r["doc_ids"]))
        for r in normalized_dup_groups(docs).collect()
    }
    assert groups == {
        "d1": (3, ["d1", "d2", "d3"]),
        "d4": (2, ["d4", "d5"]),
    }


def test_raw_digest_misses_what_normalized_catches(spark):
    """The point of the operator: the raw-text digest finds nothing on
    variant pages, the normalized key collapses them."""
    from osm2world_spark.operators.dedup import exact_dup_groups
    from osm2world_spark.operators.normalize import normalized_dup_groups

    docs = spark.createDataFrame(
        [("a", "Hello World 1999"), ("b", "hello  world 2024")],
        "doc_id string, text string",
    )
    assert exact_dup_groups(docs).count() == 0
    assert normalized_dup_groups(docs).count() == 1


def test_fix_mojibake_column_and_roundtrip(spark):
    from pyspark.sql import functions as F

    from osm2world_spark.operators.normalize import fix_mojibake

    originals = [
        "héllo wörld çafé",
        "plain ascii stays put",
        "mixed: naïve façade déjà vu",  # em dash etc. are outside the
        # bounded table (3-byte UTF-8 -> C1 controls) and would stay
        # broken — lowercase Latin-1 accents are the repair scope
        "",
    ]
    rows = [(i, s.encode("utf-8").decode("latin-1")) for i, s in
            enumerate(originals)]
    df = spark.createDataFrame(rows, "i int, broken string")
    got = {
        r["i"]: r["fixed"]
        for r in df.select(
            "i", fix_mojibake(F.col("broken")).alias("fixed")).collect()
    }
    assert got == dict(enumerate(originals))


def test_fix_mojibake_uppercase_out_of_scope(spark):
    """Uppercase accents decode to C1 controls — documented boundary:
    they pass through unchanged rather than being misrepaired."""
    from pyspark.sql import functions as F

    from osm2world_spark.operators.normalize import fix_mojibake

    broken = "ÀÉ".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame([(broken,)], "b string")
    out = df.select(fix_mojibake(F.col("b")).alias("f")).first()["f"]
    assert out == broken
