"""Distributed batch-perceptron training epoch (operators/classify.py).

Oracle: a scalar Python replica of the multiclass perceptron update in
exact integer arithmetic — score every doc under the current model,
apply the +gold/-pred token-count update for misclassified docs, and
compare the full weight table, bias deltas, and error counts.
"""

from __future__ import annotations

import hashlib

import pytest


def _md5_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _scalar_epoch(docs, labels, weights, biases, n_buckets, lr=1):
    """Pure-int replica. Returns (new_weights, db, n_scored, n_wrong).

    new_weights covers every bucket present in the input model OR
    touched by an update (the same occupancy rule as the operator)."""
    n_classes = len(biases)
    w = {b: list(ws) for b, ws in weights.items()}
    db = [0] * n_classes
    n_scored = n_wrong = 0
    upd: dict[int, list[int]] = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        n_scored += 1
        sums = [0] * n_classes
        for t in toks:
            ws = w.get(_md5_bucket(t, n_buckets), [0] * n_classes)
            for c in range(n_classes):
                sums[c] += ws[c]
        scores = [sums[c] + len(toks) * biases[c] for c in range(n_classes)]
        pred = scores.index(max(scores))
        y = labels[doc_id]
        if pred == y:
            continue
        n_wrong += 1
        db[y] += lr * len(toks)
        db[pred] -= lr * len(toks)
        for t in toks:
            row = upd.setdefault(_md5_bucket(t, n_buckets), [0] * n_classes)
            row[y] += lr
            row[pred] -= lr
    new_w = {}
    for b in set(w) | set(upd):
        base = w.get(b, [0] * n_classes)
        d = upd.get(b, [0] * n_classes)
        new_w[b] = [base[c] + d[c] for c in range(n_classes)]
    return new_w, db, n_scored, n_wrong


DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "buy cheap pills now now now"),
    ("d3", "spark catalyst optimizer shuffles partitions"),
    ("d4", "the the the quick"),
    ("d5", "cheap cheap fox"),
    ("d6", "optimizer partitions broadcast join"),
]
LABELS = {"d1": 0, "d2": 1, "d3": 2, "d4": 0, "d5": 1, "d6": 2}
B = 32
BIASES = [2, -1, 0]


def _weights(bucket_keys):
    return {
        b: [((b * 11 + c * 7) % 31) - 15 for c in range(3)] for b in bucket_keys
    }


def _dfs(spark, w):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    labels = spark.createDataFrame(
        list(LABELS.items()), "doc_id string, y int"
    )
    wdf = spark.createDataFrame(
        [(b, ws) for b, ws in w.items()], "bucket bigint, ws array<bigint>"
    )
    return docs, labels, wdf


def _run(spark, w, lr=1):
    from osm2world_spark.operators.classify import perceptron_epoch

    docs, labels, wdf = _dfs(spark, w)
    nw, stats = perceptron_epoch(
        docs, labels, wdf, BIASES, B, lr=lr, key="md5"
    )
    got_w = {r["bucket"]: list(r["ws"]) for r in nw.collect()}
    s = stats.collect()[0]
    return got_w, list(s["db"]), s["n_scored"], s["n_wrong"]


def test_epoch_matches_scalar_replica(spark):
    w = _weights(range(0, B, 3))  # sparse model: absent buckets score 0
    got_w, got_db, n_scored, n_wrong = _run(spark, w)
    want_w, want_db, want_scored, want_wrong = _scalar_epoch(
        DOCS, LABELS, w, BIASES, B
    )
    assert (n_scored, n_wrong) == (want_scored, want_wrong)
    assert n_wrong > 0  # the fixture must actually exercise the update
    assert got_db == want_db
    assert got_w == want_w


def test_learning_rate_scales_update(spark):
    w = _weights(range(0, B, 3))
    got_w, got_db, _, _ = _run(spark, w, lr=3)
    want_w, want_db, _, _ = _scalar_epoch(DOCS, LABELS, w, BIASES, B, lr=3)
    assert got_db == want_db
    assert got_w == want_w


def test_perfect_model_is_a_no_op(spark):
    """An epoch under a model that classifies everything correctly must
    return the input weights unchanged and zero bias deltas."""
    from osm2world_spark.operators.classify import perceptron_epoch

    # build a "cheat" model: huge weight on each doc's gold class for
    # every token bucket that doc touches, disjointness not required
    # because the margins dominate
    w: dict[int, list[int]] = {}
    for doc_id, text in DOCS:
        y = LABELS[doc_id]
        for t in text.split(" "):
            row = w.setdefault(_md5_bucket(t, B), [0, 0, 0])
            row[y] += 1000
    docs, labels, wdf = _dfs(spark, w)
    nw, stats = perceptron_epoch(docs, labels, wdf, BIASES, B, key="md5")
    s = stats.collect()[0]
    assert s["n_wrong"] == 0
    assert list(s["db"]) == [0, 0, 0]
    got_w = {r["bucket"]: list(r["ws"]) for r in nw.collect()}
    assert got_w == w


def test_epoch_chaining_converges_on_separable_data(spark):
    """Classic perceptron guarantee on separable data: chained epochs
    reach zero training error, verified end-to-end through the operator
    (each epoch's output weights feed the next epoch)."""
    from osm2world_spark.operators.classify import perceptron_epoch

    w = {b: [0, 0, 0] for b in range(B)}
    docs, labels, wdf = _dfs(spark, w)
    biases = [0, 0, 0]
    n_wrong = None
    for _ in range(12):
        nw, stats = perceptron_epoch(docs, labels, wdf, biases, B, key="md5")
        s = stats.collect()[0]
        n_wrong = s["n_wrong"]
        biases = [biases[c] + int(s["db"][c]) for c in range(3)]
        wdf = nw
        if n_wrong == 0:
            break
    assert n_wrong == 0


def test_partitioning_invariance(spark):
    """Integer-exact update: identical output under any partitioning."""
    from osm2world_spark.operators.classify import perceptron_epoch

    w = _weights(range(0, B, 3))
    docs, labels, wdf = _dfs(spark, w)
    nw1, st1 = perceptron_epoch(docs, labels, wdf, BIASES, B, key="md5")
    nw2, st2 = perceptron_epoch(
        docs.repartition(7), labels.repartition(3), wdf, BIASES, B, key="md5"
    )
    as_map = lambda df: {r["bucket"]: list(r["ws"]) for r in df.collect()}
    assert as_map(nw1) == as_map(nw2)
    assert st1.collect()[0].asDict() == st2.collect()[0].asDict()
