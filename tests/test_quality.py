"""Gopher / C4 / boilerplate-line quality filters: rule-by-rule checks
against hand-computed values, a python line-for-line replica on random
documents, and plan-shape guards (the doc-level filters must stay
shuffle-free projections)."""

import random

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.quality import (
    GOPHER_STOP_WORDS,
    boilerplate_line_dedup,
    c4_line_filter,
    gopher_quality,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and then it have run "
    "to the river of calm water with that steady pace be kept all day "
    "the quick brown fox jumps over the lazy dog and then it have run "
    "to the river of calm water with that steady pace be kept all day"
)


def test_gopher_good_doc_keeps(spark):
    out = gopher_quality(_docs(spark, [("g", GOOD)]), min_words=50).collect()[0]
    assert out["keep"] is True
    assert out["n_words"] == len(GOOD.split(" "))


def test_gopher_rule_flags(spark):
    rows = [
        ("short", "too few words here"),  # fails word floor
        ("symbols", " ".join(["#word"] * 60)),  # symbol ratio 1.0
        ("numeric", " ".join(["1234"] * 60)),  # alpha ratio 0
        ("bullets", "\n".join(["- the point of it all be that"] * 10)),
        ("ellipsis", "\n".join(["the story of and that have trailed..."] * 10)),
    ]
    got = {r["doc_id"]: r for r in gopher_quality(_docs(spark, rows), min_words=5).collect()}
    assert got["short"]["ok_words"] is False
    assert got["symbols"]["ok_symbols"] is False and got["symbols"]["symbol_ratio_u6"] == 1_000_000
    assert got["numeric"]["ok_alpha"] is False and got["numeric"]["alpha_ratio_u6"] == 0
    assert got["bullets"]["ok_bullets"] is False and got["bullets"]["bullet_ratio_u6"] == 1_000_000
    assert got["ellipsis"]["ok_ellipsis"] is False
    for k in got:
        assert got[k]["keep"] is False


def test_gopher_counts_newline_separated_words(spark):
    # words are separated by spaces AND newlines; mean length must not
    # glue "b\nc" into one word
    out = gopher_quality(_docs(spark, [("d", "aa bb\ncc dd")]), min_words=1).collect()[0]
    assert out["n_words"] == 4
    assert out["mean_word_len_u6"] == 2_000_000


def test_gopher_stop_word_floor(spark):
    out = {
        r["doc_id"]: r
        for r in gopher_quality(
            _docs(spark, [("none", "alpha beta gamma delta"), ("two", "the cat of note")]),
            min_words=1,
        ).collect()
    }
    assert out["none"]["n_stop_words"] == 0 and out["none"]["ok_stops"] is False
    assert out["two"]["n_stop_words"] == 2 and out["two"]["ok_stops"] is True


def _py_gopher(text, min_words=5):
    """Line-for-line python replica of the rule arithmetic."""
    flat = text.replace("\n", " ")
    words = flat.split(" ")
    lines = text.split("\n")
    n_words = len(words)
    mean_len = (len(text) - (n_words - 1)) / n_words
    n_sym = text.count("#") + text.count("...")
    pad = f" {flat} "
    n_stop = sum(pad.count(f" {w} ") for w in GOPHER_STOP_WORDS)
    import re

    n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    n_bul = sum(1 for l in lines if l.startswith("- ") or l.startswith("* "))
    n_ell = sum(1 for l in lines if l.endswith("..."))
    return {
        "n_words": n_words,
        "mean_word_len_u6": int(mean_len * 1e6 + 0.5),
        "symbol_ratio_u6": int(n_sym / n_words * 1e6 + 0.5),
        "bullet_ratio_u6": int(n_bul / len(lines) * 1e6 + 0.5),
        "ellipsis_ratio_u6": int(n_ell / len(lines) * 1e6 + 0.5),
        "alpha_ratio_u6": int(n_alpha / n_words * 1e6 + 0.5),
        "n_stop_words": n_stop,
    }


def test_gopher_random_replica(spark):
    rng = random.Random(7)
    vocab = ["the", "and", "of", "fox", "1234", "##", "x...", "- y", "word"]
    rows = []
    for i in range(40):
        n = rng.randint(3, 30)
        toks = [rng.choice(vocab) for _ in range(n)]
        text = " ".join(toks)
        if rng.random() < 0.5:
            cut = rng.randint(1, len(text) - 2)
            text = text[:cut] + "\n" + text[cut + 1 :]
        rows.append((f"d{i}", text))
    got = {r["doc_id"]: r for r in gopher_quality(_docs(spark, rows), min_words=3).collect()}
    for doc_id, text in rows:
        want = _py_gopher(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, text)


def test_gopher_plan_is_projection_only(spark):
    plan = (
        gopher_quality(_docs(spark, [("d", GOOD)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "this line ends with a period.",  # kept
            "no terminal punctuation here",  # dropped: no terminal
            "too short.",  # dropped: < 3 words
            "enable javascript to view this.",  # dropped: javascript
            'a quoted line with enough words."',  # kept
            "is this a question with words?",  # kept
        ]
    )
    out = c4_line_filter(_docs(spark, [("d", text)])).collect()[0]
    assert out["n_lines"] == 6 and out["n_kept_lines"] == 3
    assert out["keep_doc"] is True
    assert out["text_clean"].split("\n") == [
        "this line ends with a period.",
        'a quoted line with enough words."',
        "is this a question with words?",
    ]


def test_c4_doc_level_drops(spark):
    rows = [
        ("brace", "a fine sentence right here.\nanother good sentence is here.\nand a third one closes it. {"),
        ("lorem", "Lorem Ipsum dolor sit amet.\nanother good sentence is here.\nand a third one closes it."),
        ("thin", "only one surviving line here."),
    ]
    got = {r["doc_id"]: r for r in c4_line_filter(_docs(spark, rows)).collect()}
    for k in got:
        assert got[k]["keep_doc"] is False and got[k]["text_clean"] == "", k


def test_c4_plan_is_projection_only(spark):
    plan = (
        c4_line_filter(_docs(spark, [("d", "x.")]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_boilerplate_line_dedup(spark):
    boiler = "all rights reserved."
    rows = [
        ("a", f"unique alpha line.\n{boiler}\nsecond alpha line."),
        ("b", f"{boiler}\nunique beta line."),
        ("c", f"unique gamma line.\n{boiler}"),
        ("d", "no boilerplate at all here."),
    ]
    got = {
        r["doc_id"]: r
        for r in boilerplate_line_dedup(_docs(spark, rows), max_docs=2).collect()
    }
    assert got["a"]["text_dedup"] == "unique alpha line.\nsecond alpha line."
    assert got["b"]["text_dedup"] == "unique beta line."
    assert got["c"]["text_dedup"] == "unique gamma line."
    assert got["d"]["text_dedup"] == rows[3][1]
    assert got["a"]["n_lines"] == 3 and got["a"]["n_kept_lines"] == 2


def test_boilerplate_within_doc_repeats_not_counted(spark):
    # 3 occurrences in ONE doc = 1 distinct doc -> not boilerplate
    rows = [("a", "same line.\nsame line.\nsame line."), ("b", "other.")]
    got = {
        r["doc_id"]: r
        for r in boilerplate_line_dedup(_docs(spark, rows), max_docs=2).collect()
    }
    assert got["a"]["n_kept_lines"] == 3


def test_boilerplate_doc_fully_boiler_kept_as_empty(spark):
    boiler = "subscribe to our newsletter."
    rows = [("a", boiler), ("b", boiler), ("c", boiler), ("d", "real content.")]
    got = {
        r["doc_id"]: r
        for r in boilerplate_line_dedup(_docs(spark, rows), max_docs=2).collect()
    }
    for k in ("a", "b", "c"):
        assert got[k]["n_kept_lines"] == 0 and got[k]["text_dedup"] == ""
    assert got["d"]["n_kept_lines"] == 1
