"""TF-IDF top terms and stratified sampling semantics."""

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.packing import stratified_sample
from osm2world_spark.operators.text import tfidf_top_terms


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha shared"),
            (2, "beta shared shared"),
            (3, "shared gamma"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'shared' appears in every doc (df=3 -> idf (3+1)/(3+1)=1); the rare
    # terms (df=1 -> idf 2) win even at equal tf, and doc 2's double-tf
    # 'shared' (score 2*1) ties rare 'beta' (1*2) -> term asc tie-break
    assert top[1] == "alpha"  # tf=2 * idf 2 = 4 beats shared 1*1
    assert top[2] == "beta"  # tie 2.0 vs 2.0 -> 'beta' < 'shared'
    assert top[3] == "gamma"
    assert all(r["rk"] == 1 for r in out)


def test_tfidf_k_and_scores(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a a a a a")], "doc_id bigint, text string"
    )
    out = tfidf_top_terms(docs, k=3)
    counts = {r[0]: r[1] for r in out.groupBy("doc_id").count().collect()}
    assert counts == {1: 3, 2: 1}  # doc 2 has a single distinct term
    # doc 2: tf=5, df('a')=2, N=2 -> 5 * 3/3 = 5.0 -> 5_000_000 micro
    row = out.where(F.col("doc_id") == 2).first()
    assert row["term"] == "a" and row["score_u6"] == 5_000_000


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string")
    out = stratified_sample(df, {"a": 1.0, "b": 0.2}, id_col="event_id")
    got = {r[0]: r[1] for r in out.groupBy("event_type").count().collect()}
    assert got["a"] == 1000  # fraction 1.0 keeps every row
    assert 100 <= got["b"] <= 300  # ~0.2 of 1000, hash-uniform
    # determinism: identical membership on a re-run
    again = stratified_sample(df, {"a": 1.0, "b": 0.2}, id_col="event_id")
    assert sorted(r[0] for r in out.collect()) == sorted(r[0] for r in again.collect())
    # unlisted strata default to dropped
    none_kept = stratified_sample(df, {"zzz": 1.0}, id_col="event_id")
    assert none_kept.count() == 0


def test_ngram_lm_score(spark):
    """Bigram LM familiarity: integer evidence exact, mean_logp matches a
    hand-computed add-one-smoothed unigram-of-bigrams model."""
    import math

    import pyspark.sql.functions as F

    from osm2world_spark.operators.text import ngram_lm_score

    docs = spark.createDataFrame(
        [("a", "x y x y"), ("b", "x y z"), ("c", "q")],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r for r in ngram_lm_score(docs, n=2).collect()}
    # grams: a -> [x y, y x, x y]; b -> [x y, y z]; c -> [q] (short-doc rule)
    # counts: "x y": 3, "y x": 1, "y z": 1, "q": 1 -> vocab 4, total 6
    assert rows["a"].n_ngrams == 3 and rows["a"].sum_freq == 3 + 1 + 3
    assert rows["b"].n_ngrams == 2 and rows["b"].sum_freq == 3 + 1
    assert rows["c"].n_ngrams == 1 and rows["c"].sum_freq == 1
    assert rows["a"].vocab == 4
    denom = math.log(6 + 4)
    want_a = (math.log(4) + math.log(2) + math.log(4)) / 3 - denom
    assert rows["a"].mean_logp == pytest.approx(want_a, abs=1e-12)
    want_c = math.log(2) - denom
    assert rows["c"].mean_logp == pytest.approx(want_c, abs=1e-12)
    # familiar docs score higher than the singleton
    assert rows["a"].mean_logp > rows["c"].mean_logp


def test_pii_scrub(spark):
    from osm2world_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            ("a", "write to john.doe+x@corp.example.org or visit https://ex.com/a?q=1 now"),
            ("b", "no pii here"),
            ("c", "two mails x@y.io and z@w.co plus http://u.v/w"),
            # an email-looking string inside a URL counts as the URL only
            ("d", "see https://ex.com/mail/me@host.com please"),
        ],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert rows["a"].n_emails == 1 and rows["a"].n_urls == 1
    assert rows["a"].scrubbed == "write to <EMAIL> or visit <URL> now"
    assert rows["b"].n_emails == 0 and rows["b"].n_urls == 0
    assert rows["b"].scrubbed == "no pii here"
    assert rows["c"].n_emails == 2 and rows["c"].n_urls == 1
    assert rows["d"].n_urls == 1 and rows["d"].n_emails == 0
    assert rows["d"].scrubbed == "see <URL> please"
