"""DSIR importance scoring vs a line-for-line python replica, plus the
directional property (target-like docs outrank off-target docs) and the
broadcast plan shape."""

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from osm2world_spark.operators.dsir import dsir_scores, dsir_select

B = 16


def _bucket(tok):
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B


def _dist(texts, alpha=1.0):
    c = Counter()
    for t in texts:
        for tok in t.replace("\n", " ").split(" "):
            if tok:
                c[_bucket(tok)] += 1
    total = sum(c.values())
    return {b: math.log((c.get(b, 0) + alpha) / (total + alpha * B)) for b in range(B)}


def _py_scores(raw, target):
    pt, pr = _dist(target), _dist(raw)
    out = {}
    for doc_id, text in enumerate(raw):
        c = Counter(
            _bucket(tok) for tok in text.replace("\n", " ").split(" ") if tok
        )
        out[str(doc_id)] = sum(n * (pt[b] - pr[b]) for b, n in c.items())
    return out


RAW = [
    "spark join shuffle partition agg",
    "le chat et le chien et la maison",
    "join agg window sort shuffle spark spark",
    "der hund und die katze und",
    "partition spark window agg",
]
TARGET = ["spark join agg window", "shuffle partition spark spark agg join"]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_scores_match_replica(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in dsir_scores(_docs(spark, RAW), _docs(spark, TARGET), n_buckets=B).collect()
    }
    want = _py_scores(RAW, TARGET)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_target_like_docs_outrank(spark):
    sel = dsir_select(_docs(spark, RAW), _docs(spark, TARGET), k=3, n_buckets=B)
    top = [r["doc_id"] for r in sel.orderBy("sel_rank").collect()]
    # the three spark-vocabulary docs (0, 2, 4) must beat the two
    # off-target French/German docs
    assert set(top) == {"0", "2", "4"}


def test_distribution_join_is_broadcast(spark):
    plan = (
        dsir_scores(_docs(spark, RAW), _docs(spark, TARGET), n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
