"""Hashed linear classifier inference (operators/classify.py).

Oracle: a scalar Python replica of the fastText scoring rule in exact
integer arithmetic — md5 buckets recomputed with hashlib, xxhash64
buckets exported from Spark itself (the token->bucket map is the only
engine-specific piece; the arithmetic on top is pure Python ints).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _md5_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _scalar_scores(docs, bucket_of, weights, biases):
    """docs: [(doc_id, text)]; weights: {bucket: [w_c...]}; exact ints."""
    out = {}
    n_classes = len(biases)
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        sums = [0] * n_classes
        for t in toks:
            ws = weights.get(bucket_of(t), [0] * n_classes)
            for c in range(n_classes):
                sums[c] += ws[c]
        scores = [sums[c] + len(toks) * biases[c] for c in range(n_classes)]
        best = max(scores)
        out[doc_id] = (len(toks), scores, scores.index(best))
    return out


DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "buy cheap pills now  now now"),  # double space: empty token
    ("d3", "spark catalyst optimizer shuffles partitions"),
    ("d4", "the the the"),
    ("d5", "singleton"),
]
B = 32
BIASES = [5, -3, 0]


def _weights(bucket_keys):
    return {
        b: [((b * 7 + c * 13) % 41) - 20 for c in range(3)] for b in bucket_keys
    }


def _weights_df(spark, w):
    return spark.createDataFrame(
        [(b, ws) for b, ws in w.items()], "bucket bigint, ws array<bigint>"
    )


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _collect(df):
    return {
        r["doc_id"]: (r["n_tokens"], list(r["scores"]), r["label"])
        for r in df.collect()
    }


def test_md5_mode_matches_scalar_model(spark):
    from osm2world_spark.operators.classify import hashed_linear_scores

    # weights over a subset of buckets: missing buckets must score 0
    w = _weights(range(0, B, 3))
    got = _collect(
        hashed_linear_scores(
            _docs_df(spark), _weights_df(spark, w), BIASES, B, key="md5"
        )
    )
    want = _scalar_scores(DOCS, lambda t: _md5_bucket(t, B), w, BIASES)
    assert got == want


def test_xxhash64_mode_matches_scalar_model(spark):
    """Production hash family: export Spark's own token->bucket map,
    then replay the arithmetic in exact Python ints."""
    from osm2world_spark.operators.classify import (
        hash_bucket,
        hashed_linear_scores,
    )

    toks = sorted({t for _, x in DOCS for t in x.split(" ") if t})
    tok_df = spark.createDataFrame([(t,) for t in toks], "tok string")
    bmap = {
        r["tok"]: r["b"]
        for r in tok_df.select(
            "tok", hash_bucket(F.col("tok"), B).alias("b")
        ).collect()
    }
    w = _weights(range(B))
    got = _collect(
        hashed_linear_scores(
            _docs_df(spark), _weights_df(spark, w), BIASES, B, key="hash"
        )
    )
    want = _scalar_scores(DOCS, lambda t: bmap[t], w, BIASES)
    assert got == want


def test_tie_breaks_to_lowest_class_index(spark):
    from osm2world_spark.operators.classify import hashed_linear_scores

    docs = spark.createDataFrame([("d", "a a")], "doc_id string, text string")
    b = _md5_bucket("a", B)
    w = {b: [4, 4, 1]}  # classes 0 and 1 tie exactly
    row = hashed_linear_scores(
        docs, _weights_df(spark, w), [0, 0, 0], B, key="md5"
    ).collect()[0]
    assert list(row["scores"])[0] == list(row["scores"])[1]
    assert row["label"] == 0


def test_partitioning_invariance(spark):
    """Exact integer sums: any repartitioning yields identical rows."""
    from osm2world_spark.operators.classify import hashed_linear_scores

    w = _weights(range(B))
    base = hashed_linear_scores(
        _docs_df(spark), _weights_df(spark, w), BIASES, B, key="md5"
    )
    shuffled = hashed_linear_scores(
        _docs_df(spark).repartition(7), _weights_df(spark, w), BIASES, B,
        key="md5",
    )
    assert _collect(base) == _collect(shuffled)


def test_zero_token_docs_are_omitted(spark):
    from osm2world_spark.operators.classify import hashed_linear_scores

    docs = spark.createDataFrame(
        [("d1", "x y"), ("d2", ""), ("d3", "  ")], "doc_id string, text string"
    )
    got = _collect(
        hashed_linear_scores(docs, _weights_df(spark, _weights(range(B))),
                             BIASES, B, key="md5")
    )
    assert set(got) == {"d1"}


def test_classifier_filter_margin(spark):
    from osm2world_spark.operators.classify import (
        classifier_filter,
        hashed_linear_scores,
    )

    w = _weights(range(B))
    scored = hashed_linear_scores(
        _docs_df(spark), _weights_df(spark, w), BIASES, B, key="md5"
    )
    kept0 = {r["doc_id"] for r in classifier_filter(scored, 0).collect()}
    want = _scalar_scores(DOCS, lambda t: _md5_bucket(t, B), w, BIASES)
    assert kept0 == {d for d, (_, _, lbl) in want.items() if lbl == 0}
    # a margin so large nothing passes
    assert classifier_filter(scored, 0, min_margin=10**9).count() == 0
    # margin filter keeps exactly the docs whose winning score clears the
    # runner-up by the margin
    m = 7
    kept_m = {r["doc_id"] for r in classifier_filter(scored, 0, m).collect()}
    want_m = {
        d
        for d, (_, sc, lbl) in want.items()
        if lbl == 0 and sc[0] - max(sc[1:]) >= m
    }
    assert kept_m == want_m


def test_classifier_filter_single_class_model(spark):
    """One-class model: the margin condition is vacuously true — every
    labeled doc passes instead of being rejected by a NULL compare."""
    from osm2world_spark.operators.classify import (
        classifier_filter,
        hashed_linear_scores,
    )

    docs = spark.createDataFrame([("d", "x y z")], "doc_id string, text string")
    w = {b: [1] for b in range(B)}
    scored = hashed_linear_scores(docs, _weights_df(spark, w), [0], B,
                                  key="md5")
    assert classifier_filter(scored, 0, min_margin=100).count() == 1
