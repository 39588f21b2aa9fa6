"""BPE trainer/segmenter vs a line-for-line replica of the Sennrich
2016 reference algorithm (learn_bpe) on small corpora, plus the
determinism and plan-shape contracts."""

import random
from collections import Counter

from pyspark.sql import functions as F

from osm2world_spark.operators.bpe import (
    EOW,
    adjacent_pair_weights,
    apply_merge,
    best_pair,
    bpe_segment,
    bpe_train,
    initial_symbols,
    word_counts,
)


# ---------------------------------------------------------------- replica

def _py_symbols(word):
    return [c for c in word[:-1]] + [word[-1] + EOW]


def _py_apply(symbols, a, b):
    out = []
    for s in symbols:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_train(texts, n_merges):
    words = Counter()
    for t in texts:
        for w in t.replace("\n", " ").split(" "):
            if w:
                words[w] += 1
    syms = {w: _py_symbols(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # weight DESC, pair ASC
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        syms = {w: _py_apply(s, a, b) for w, s in syms.items()}
    return merges, syms, words


CORPUS = [
    "low lower lowest low low newer newest new wider wide wide",
    "low lower newer newer wider new new low",
    "the newest widest lowest the the low newer",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_train_matches_reference_replica(spark):
    merges, words = bpe_train(_docs(spark, CORPUS), n_merges=10)
    want_merges, want_syms, want_counts = _py_train(CORPUS, 10)
    assert merges == want_merges
    got = {r["word"]: (r["count"], list(r["symbols"])) for r in words.collect()}
    assert got == {w: (want_counts[w], want_syms[w]) for w in want_syms}


def test_train_matches_replica_random_corpus(spark):
    rng = random.Random(5)
    vocab = ["aa", "ab", "abc", "bca", "aab", "ba", "a", "b", "c", "ccc"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for _ in range(25)
    ]
    merges, words = bpe_train(_docs(spark, texts), n_merges=12)
    want_merges, want_syms, _ = _py_train(texts, 12)
    assert merges == want_merges
    got = {r["word"]: list(r["symbols"]) for r in words.collect()}
    assert got == want_syms


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "s array<string>")
    out = df.select(apply_merge(F.col("s"), "a", "a").alias("o")).first()["o"]
    assert list(out) == ["aa", "aa"]  # (aa)(aa), not a(aa)a


def test_segment_join_and_fallback(spark):
    train = _docs(spark, CORPUS)
    merges, vocab = bpe_train(train, n_merges=8)
    # corpus containing a word the vocab has never seen
    apply_docs = _docs(spark, ["low newer zzz"])
    seg = {
        (r["pos"]): (r["word"], list(r["tokens"]))
        for r in bpe_segment(apply_docs, vocab, merges).collect()
    }
    _, want_syms, _ = _py_train(CORPUS, 8)
    assert seg[0] == ("low", want_syms["low"])
    assert seg[1] == ("newer", want_syms["newer"])
    # OOV falls back to chars + the same merges
    fb = _py_symbols("zzz")
    for a, b in merges:
        fb = _py_apply(fb, a, b)
    assert seg[2] == ("zzz", fb)


def test_pair_weights_single_aggregation(spark):
    words = word_counts(_docs(spark, CORPUS)).select(
        "word", "count", initial_symbols(F.col("word")).alias("symbols")
    )
    plan = (
        adjacent_pair_weights(words)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # word_counts agg + pair agg: exactly two exchanges, no more
    assert plan.count("Exchange hashpartitioning") == 2


def test_tie_break_is_deterministic(spark):
    # 'x y' and 'y x' both appear twice -> pairs (x</w>? ...) tie; the
    # lexicographically smallest pair must win on both engines
    texts = ["ab ba ab ba"]
    merges, _ = bpe_train(_docs(spark, texts), n_merges=1)
    want_merges, _, _ = _py_train(texts, 1)
    assert merges == want_merges
