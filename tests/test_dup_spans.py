"""duplicated_spans (exact substring dedup, Lee et al. 2022) tests."""

import random

import pytest

from osm2world_spark.operators.dedup import duplicated_spans


def _brute(texts, k, min_count):
    """Brute-force oracle: count every k-gram, merge duplicated positions
    into maximal spans (merge when overlapping or touching)."""
    toks = {d: t.split(" ") for d, t in texts.items()}
    counts = {}
    for t in toks.values():
        for i in range(len(t) - k + 1):
            gram = " ".join(t[i : i + k])
            counts[gram] = counts.get(gram, 0) + 1
    out = {}
    for d, t in toks.items():
        pos = [
            i
            for i in range(len(t) - k + 1)
            if counts[" ".join(t[i : i + k])] >= min_count
        ]
        merged = []
        for p in pos:
            if merged and p <= merged[-1]["last"] + k:
                merged[-1]["last"] = p
                merged[-1]["n"] += 1
            else:
                merged.append({"first": p, "last": p, "n": 1})
        out[d] = [(m["first"], m["last"] + k, m["n"]) for m in merged]
    return out


def _run(spark, texts, k, min_count, gram_key="exact"):
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id string, text string"
    )
    rows = duplicated_spans(df, k=k, min_count=min_count, gram_key=gram_key).collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.span_idx)):
        out.setdefault(r.doc_id, []).append((r.tok_start, r.tok_end, r.n_grams))
    return out


def test_shared_passage_found(spark):
    boiler = "the quick brown fox jumps over the lazy dog"
    texts = {
        "a": f"intro one two {boiler} tail alpha",
        "b": f"other start {boiler} different ending here",
        "c": "completely unrelated words nothing shared at all today",
    }
    got = _run(spark, texts, k=4, min_count=2)
    # the 9-token boilerplate passage is one maximal span in both docs
    assert "c" not in got
    (s_a,) = got["a"]
    (s_b,) = got["b"]
    assert s_a[1] - s_a[0] == 9
    assert s_b[1] - s_b[0] == 9
    # doc a: boiler starts at token 3
    assert s_a[0] == 3 and s_a[1] == 12
    assert s_b[0] == 2 and s_b[1] == 11


def test_matches_bruteforce_on_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    shared = [" ".join(rng.choice(vocab) for _ in range(rng.randint(5, 12))) for _ in range(4)]
    texts = {}
    for d in range(14):
        parts = [rng.choice(vocab) for _ in range(rng.randint(5, 25))]
        if rng.random() < 0.7:
            ins = rng.choice(shared)
            at = rng.randint(0, len(parts))
            parts = parts[:at] + ins.split(" ") + parts[at:]
        texts[f"d{d}"] = " ".join(parts)
    for k in (3, 5):
        expected = _brute(texts, k, 2)
        got = _run(spark, texts, k, 2)
        exp = {d: v for d, v in expected.items() if v}
        assert got == exp, (k,)


def test_hash_and_exact_keys_agree(spark):
    texts = {
        "a": "one two three four five six seven",
        "b": "zero one two three four five nine",
    }
    assert _run(spark, texts, 3, 2, "hash") == _run(spark, texts, 3, 2, "exact")


def test_within_doc_repeat_counts(spark):
    # min_count counts total corpus occurrences, including within one doc
    texts = {"a": "x y z pad1 pad2 pad3 x y z tail"}
    got = _run(spark, texts, 3, 2)
    assert got["a"] == [(0, 3, 1), (6, 9, 1)]


def test_short_docs_skipped(spark):
    texts = {"a": "one two", "b": "one two"}
    assert _run(spark, texts, 4, 2) == {}


def test_two_exchanges_only(spark):
    df = spark.createDataFrame([("a", "x y z w v")], "doc_id string, text string")
    plan = duplicated_spans(df, k=3)._jdf.queryExecution().executedPlan().toString()
    # one exchange for the gram-frequency window, one for the per-doc
    # window; the island groupBy must reuse the doc partitioning
    assert plan.count("Exchange") == 2, plan
