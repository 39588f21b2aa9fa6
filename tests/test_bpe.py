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


# ---------------------------------------------------------------- batched

def test_batched_k1_equals_classic(spark):
    from osm2world_spark.operators.bpe import bpe_train_batched

    d = _docs(spark, CORPUS)
    m_classic, w_classic = bpe_train(d, 6)
    m_batched, w_batched = bpe_train_batched(d, 6, batch_k=1)
    assert m_batched == m_classic
    a = {r["word"]: list(r["symbols"]) for r in w_classic.collect()}
    b = {r["word"]: list(r["symbols"]) for r in w_batched.collect()}
    assert a == b


def test_batched_agrees_on_disjoint_alphabet_corpus(spark):
    """Pairs drawn from disjoint alphabets with well-separated weights:
    every batch is conflict-free AND no created pair can out-rank a
    later batch member, so the batched and classic schedules coincide."""
    from osm2world_spark.operators.bpe import bpe_train_batched

    texts = (
        ["aa"] * 64 + ["bb"] * 32 + ["cc"] * 16 + ["dd"] * 8 + ["ee"] * 4
    )
    d = _docs(spark, [" ".join(texts)])
    m_classic, _ = bpe_train(d, 5)
    m_batched, wb = bpe_train_batched(d, 5, batch_k=4)
    assert m_batched == m_classic == [
        ("a", "a" + EOW), ("b", "b" + EOW), ("c", "c" + EOW),
        ("d", "d" + EOW), ("e", "e" + EOW),
    ]
    # final segmentation fully merged
    segs = {r["word"]: list(r["symbols"]) for r in wb.collect()}
    assert segs["aa"] == ["aa" + EOW]


def test_batched_divergence_is_the_documented_kind(spark):
    """A merge that creates a pair out-ranking the next batch member:
    classic takes the created pair first, batched takes the pre-batch
    runner-up. Both schedules stay valid BPE (same merge SET may
    differ); this pins the documented approximation boundary."""
    from osm2world_spark.operators.bpe import bpe_train_batched

    # 'aaa': merging (a, a) creates (aa, a</w>) with weight 40 — above
    # the runner-up (x, y</w>) at weight 30.
    texts = ["aaa"] * 40 + ["xy"] * 30
    d = _docs(spark, [" ".join(texts)])
    m_classic, _ = bpe_train(d, 2)
    m_batched, _ = bpe_train_batched(d, 2, batch_k=2)
    assert m_classic[0] == m_batched[0] == ("a", "a")
    assert m_classic[1] == ("aa", "a" + EOW)   # the created pair wins
    assert m_batched[1] == ("x", "y" + EOW)    # pre-batch runner-up


def test_batched_job_count(spark, monkeypatch):
    """16 merges at batch_k=8 must cost <= 3 candidate collects (the
    scale fix: n_merges/k jobs, not n_merges)."""
    from pyspark.sql import DataFrame

    from osm2world_spark.operators.bpe import bpe_train_batched

    texts = [f"{c1}{c2}" for c1 in "abcdefgh" for c2 in "qrstuvwx"]
    weighted = []
    for i, t in enumerate(texts):
        weighted.extend([t] * (2 + (i % 7)))
    d = _docs(spark, [" ".join(weighted)])
    n_collects = 0
    orig = DataFrame.collect

    def counting(self):
        nonlocal n_collects
        n_collects += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    merges, _ = bpe_train_batched(d, 16, batch_k=8)
    assert len(merges) == 16
    assert n_collects <= 3, n_collects


def test_select_batch_conflict_rules():
    from osm2world_spark.operators.bpe import select_batch

    cands = [
        ("a", "b", 100),   # take
        ("b", "c", 90),    # skip: b used
        ("c", "d", 80),    # take
        ("ab", "x", 70),   # skip: 'ab' is the merged string of #1
        ("e", "f", 60),    # take
        ("g", "h", 1),     # skip: weight < 2
    ]
    assert select_batch(cands, 10) == [("a", "b"), ("c", "d"), ("e", "f")]
    assert select_batch(cands, 2) == [("a", "b"), ("c", "d")]
