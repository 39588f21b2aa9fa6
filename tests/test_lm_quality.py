"""Stupid-backoff LM scoring + CCNet perplexity buckets
(operators/text.py::stupid_backoff_score, operators/quality.py::
perplexity_buckets / calibrate_cutoffs).

Oracle: a scalar Python replica of Brants et al. 2007 §4 — unigram and
count-cutoff-pruned bigram tables built from the same corpus, per-doc
fold in exact ints plus math.log for the float score.
"""

from __future__ import annotations

import math

import pytest

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat on the hat"),
    ("d3", "the dog sat on the mat"),
    ("d4", "a completely novel sentence here"),
    ("d5", "the cat"),
    ("d6", "singleton"),  # < 2 tokens: no bigrams, omitted
]
ALPHA = 0.4
MIN_COUNT = 2


def _scalar(docs, min_count=MIN_COUNT, alpha=ALPHA):
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, text in docs:
        toks = [t for t in text.split(" ") if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for i in range(len(toks) - 1):
            bi[(toks[i], toks[i + 1])] = bi.get((toks[i], toks[i + 1]), 0) + 1
    n_total = sum(uni.values())
    bi = {g: f for g, f in bi.items() if f >= min_count}
    out = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        if len(toks) < 2:
            continue
        n = hits = backoffs = hit_num = hit_den = backoff_num = 0
        lg = 0.0
        for i in range(len(toks) - 1):
            g = (toks[i], toks[i + 1])
            n += 1
            if g in bi:
                hits += 1
                hit_num += bi[g]
                hit_den += uni[toks[i]]
                lg += math.log(bi[g] / uni[toks[i]])
            else:
                backoffs += 1
                backoff_num += uni[toks[i + 1]]
                lg += math.log(alpha * uni[toks[i + 1]] / n_total)
        out[doc_id] = (n, hits, backoffs, hit_num, hit_den, backoff_num, lg)
    return out


def _run(spark, docs=DOCS, **kw):
    from osm2world_spark.operators.text import stupid_backoff_score

    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {
        r["doc_id"]: (
            r["n_bigrams"],
            r["n_hits"],
            r["n_backoffs"],
            r["sum_hit_num"],
            r["sum_hit_den"],
            r["sum_backoff_num"],
            r["logscore"],
        )
        for r in stupid_backoff_score(df, **kw).collect()
    }


def test_matches_scalar_brants_replica(spark):
    got = _run(spark)
    want = _scalar(DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][:6] == want[d][:6], d
        assert got[d][6] == pytest.approx(want[d][6], rel=1e-12), d
    # the fixture must exercise BOTH branches
    assert any(v[1] > 0 for v in want.values())
    assert any(v[2] > 0 for v in want.values())


def test_short_docs_are_omitted(spark):
    got = _run(spark)
    assert "d6" not in got


def test_min_count_1_never_backs_off(spark):
    """Unpruned counts from the corpus itself contain every observed
    bigram, so with min_count=1 the backoff branch must be dead — the
    property that motivates the cutoff."""
    got = _run(spark, min_count=1)
    assert all(v[2] == 0 for v in got.values())


def test_alpha_only_moves_backoff_terms(spark):
    base = _run(spark)
    double = _run(spark, alpha_u6=800000)
    for d in base:
        n_backoffs = base[d][2]
        delta = double[d][6] - base[d][6]
        assert delta == pytest.approx(n_backoffs * math.log(2.0), abs=1e-9)


def test_perplexity_buckets_threshold_rule(spark):
    from osm2world_spark.operators.quality import perplexity_buckets

    scored = spark.createDataFrame(
        [("a", 90, 10), ("b", 50, 10), ("c", 49, 10), ("d", 10, 10)],
        "doc_id string, sum_freq bigint, n_ngrams bigint",
    )
    got = {
        r["doc_id"]: (r["bucket"], r["familiarity"])
        for r in perplexity_buckets(scored, (5.0, 3.0)).collect()
    }
    assert got["a"] == ("head", 9.0)
    assert got["b"] == ("head", 5.0)  # boundary: >= head cutoff is head
    assert got["c"] == ("middle", 4.9)
    assert got["d"] == ("tail", 1.0)


def test_perplexity_buckets_rejects_ascending_cutoffs(spark):
    from osm2world_spark.operators.quality import perplexity_buckets

    scored = spark.createDataFrame(
        [("a", 1, 1)], "doc_id string, sum_freq bigint, n_ngrams bigint"
    )
    with pytest.raises(ValueError):
        perplexity_buckets(scored, (1.0, 2.0))


def test_calibrate_then_bucket_splits_calibration_corpus(spark):
    """Cutoffs derived from a calibration set split that same set into
    non-empty head/middle/tail with head the most familiar."""
    from osm2world_spark.operators.quality import (
        calibrate_cutoffs,
        perplexity_buckets,
    )

    rows = [(f"d{i}", 10 * (i + 1), 10) for i in range(9)]
    scored = spark.createDataFrame(
        rows, "doc_id string, sum_freq bigint, n_ngrams bigint"
    )
    c1, c2 = calibrate_cutoffs(scored)
    assert c1 >= c2
    b = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(scored, (c1, c2)).collect()
    }
    assert set(b.values()) == {"head", "middle", "tail"}
    assert b["d8"] == "head" and b["d0"] == "tail"


def test_end_to_end_lm_to_buckets(spark):
    """The composed CCNet pass: corpus LM evidence -> fixed cutoffs ->
    bucket column, using stupid_backoff_score's exact integer evidence
    (hit mass per bigram) as the familiarity statistic."""
    from osm2world_spark.operators.quality import perplexity_buckets
    from osm2world_spark.operators.text import stupid_backoff_score

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    scored = stupid_backoff_score(df)
    out = perplexity_buckets(
        scored, (1.5, 0.5), num_col="sum_hit_num", den_col="n_bigrams"
    )
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    want_fam = {
        d: v[3] / v[0] for d, v in _scalar(DOCS).items()
    }
    for d, fam in want_fam.items():
        want = "head" if fam >= 1.5 else ("middle" if fam >= 0.5 else "tail")
        assert got[d] == want, (d, fam)
