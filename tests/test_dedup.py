"""Dedup operator tests: correctness on small corpora plus the
pathological-skew guards (ubiquitous shingle, identical-doc mega-cluster)
that make the shingle-join and LSH bucket join survive corpus scale."""

import pytest
from pyspark.sql import functions as F

from osm2world_spark.operators.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_near_dups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_dup_groups(spark):
    d = _docs(
        spark,
        [("a", "same text"), ("b", "same text"), ("c", "other"), ("d", "same text")],
    )
    g = exact_dup_groups(d).collect()
    assert len(g) == 1
    assert g[0]["n_docs"] == 3 and list(g[0]["doc_ids"]) == ["a", "b", "d"]


def test_simhash_matches_bitwise_definition(spark):
    """The 60-aggregate formulation must equal the per-(token, bit)
    definition computed in plain python."""
    import hashlib

    rows = [("d1", "alpha beta gamma alpha"), ("d2", "one"), ("d3", "x y z w v")]
    got = {r["doc_id"]: r["simhash"] for r in simhash64(_docs(spark, rows)).collect()}

    def h60(tok):
        return int(hashlib.md5(f"0|{tok}".encode()).hexdigest()[:15], 16)

    for doc_id, text in rows:
        votes = [0] * 60
        for tok in text.split(" "):
            hv = h60(tok)
            for b in range(60):
                votes[b] += 1 if hv & (1 << b) else -1
        want = sum(1 << b for b in range(60) if votes[b] > 0)
        assert got[doc_id] == want, doc_id


def test_simhash_plan_has_single_aggregate_pair(spark):
    """One partial+final aggregate over token rows — no (token x 60 bit)
    explode feeding a second shuffled aggregation."""
    plan = simhash64(_docs(spark, [("d", "a b c")]))._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange (the doc_id hash partitioning for the final agg)
    assert plan.count("Exchange hashpartitioning") == 1


def test_ngram_jaccard_df_cap_drops_hot_shingle(spark):
    """A shingle present in EVERY doc is a quadratic hot key; the default
    fractional max_df must drop it while genuine near-dup pairs survive."""
    boiler = "click here to subscribe"
    rows = [(f"d{i}", f"{boiler} unique words number {i} tail{i}") for i in range(40)]
    # one true near-dup pair sharing their unique tails
    rows.append(("x1", f"{boiler} shared tail of this pair zzz"))
    rows.append(("x2", f"{boiler} shared tail of this pair qqq"))
    d = _docs(spark, rows)

    pairs = ngram_jaccard_pairs(d, threshold=0.3, n=3)  # default max_df=0.2
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert ("x1", "x2") in got
    # the boilerplate shingles alone must NOT connect unrelated docs
    assert all({a, b} == {"x1", "x2"} for a, b in got)

    # and with the cap disabled the hot shingle connects everything —
    # the guard is what prevents the quadratic pair set
    uncapped = ngram_jaccard_pairs(d, threshold=0.0, n=3, max_df=None)
    capped = ngram_jaccard_pairs(d, threshold=0.0, n=3)
    assert uncapped.count() > 40 * 20  # ~ n^2 / 2 pairs via the hot key
    assert capped.count() < uncapped.count() / 10


def test_minhash_bucket_cap_bounds_mega_cluster(spark):
    """1k identical docs put all signatures in one bucket per band; the
    bucket cap drops those buckets (exact dedup owns clones) instead of
    expanding ~500k pairs x bands."""
    clones = [(f"c{i:04d}", "identical clone text body here") for i in range(1000)]
    pair = [("p1", "rare doc alpha beta gamma delta"), ("p2", "rare doc alpha beta gamma echo")]
    d = _docs(spark, clones + pair)
    sigs = minhash_signatures(d, k=16, n=3)
    capped = lsh_candidate_pairs(sigs, bands=4, max_bucket=100)
    got = capped.collect()
    # the mega-cluster is dropped wholesale, the small-bucket pair survives
    assert all(not (r["a_id"].startswith("c") and r["b_id"].startswith("c")) for r in got)
    assert any({r["a_id"], r["b_id"]} == {"p1", "p2"} for r in got)
    # clones are exact dups — the linear-path operator finds them
    assert exact_dup_groups(d).first()["n_docs"] == 1000


def test_ivf_codebook_deterministic_hash_sample(spark):
    """The codebook sample is a pure hash filter over ids (no global
    corpus sort), so repeated runs yield identical centroids and results;
    zero-norm embeddings (id 0 here) must not abort the job."""
    from osm2world_spark.operators.similarity import ivf_topk

    e = spark.range(200).select(
        F.col("id").cast("string").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.sin(F.col("id") * (i + 1)).cast("float"),
        ).alias("embedding"),
    )
    out = ivf_topk(e.where(F.col("vec_id").isin("1", "2", "3")), e, k=3, n_cells=4, n_probe=2)
    assert out.count() == 9
    # deterministic across repeated invocations
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, ivf_topk(e.where(F.col("vec_id").isin("1", "2", "3")), e, k=3, n_cells=4, n_probe=2).collect()))
    assert a == b


def test_dedup_clusters_transitive_with_singletons(spark):
    """a~b and b~c must collapse into ONE cluster with one canonical doc
    even when a and c never share an LSH bucket pair directly; unrelated
    docs stay singleton self-clusters."""
    from osm2world_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    d = _docs(
        spark,
        [
            ("a", base + " one"),
            ("b", base + " two"),
            ("c", base + " three"),
            ("x", "completely unrelated text about spark shuffle partitions"),
            ("y", "another standalone document with its own words entirely"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_clusters(d, k=16, bands=4, threshold=0.3).collect()}
    assert len(out) == 5  # one row per input doc
    # near-dup family collapses to the lexicographic min
    assert out["a"]["cluster_id"] == out["b"]["cluster_id"] == out["c"]["cluster_id"] == "a"
    assert out["a"]["is_canonical"] and not out["b"]["is_canonical"] and not out["c"]["is_canonical"]
    # singletons label themselves and survive
    for s in ("x", "y"):
        assert out[s]["cluster_id"] == s and out[s]["is_canonical"]
    # exactly one canonical row per cluster id
    assert sum(r["is_canonical"] for r in out.values()) == 3


def test_decontaminate_ngram_hits_and_clean_passthrough(spark):
    """A doc sharing one 3-gram with a probe is removed; clean docs pass
    through unchanged; short docs match on whole-text shingles."""
    from osm2world_spark.operators.dedup import decontaminate

    d = _docs(
        spark,
        [
            ("t1", "the capital of france is paris obviously"),
            ("t2", "nothing in common with any benchmark here"),
            ("t3", "short text"),  # < 3 tokens -> whole-text shingle
            ("t4", "short words"),
        ],
    )
    probes = _docs(
        spark,
        [
            ("b1", "what is the capital of france answer"),  # shares "capital of france"
            ("b2", "short text"),
        ],
    )
    clean = {r["doc_id"] for r in decontaminate(d, probes).collect()}
    assert clean == {"t2", "t4"}
    flags = {r["doc_id"]: r["is_contaminated"] for r in decontaminate(d, probes, flag_only=True).collect()}
    assert flags == {"t1": True, "t2": False, "t3": True, "t4": False}


def test_winnow_guarantee_and_density(spark):
    """Winnowing guarantee: a shared substring of length >= k + w - 1
    yields at least one shared fingerprint; unrelated texts share none;
    fingerprint density ~ 2/(w+1)."""
    from osm2world_spark.operators.dedup import winnow_fingerprints, winnow_near_dups

    shared = "GUARANTEED-COMMON-SUBSTRING-AT-LEAST-K-PLUS-W"  # 45 >= 8+8-1
    docs = spark.createDataFrame(
        [
            ("a", "prefix alpha " + shared + " suffix one"),
            ("b", "totally different start " + shared + " other tail"),
            ("c", "zq!7#kv9@wx2$mn4%pl6^rs8&tu0*ab1(cd3)ef5-gh"),
        ],
        "doc_id string, text string",
    )
    fp = winnow_fingerprints(docs, k=8, w=8).cache()
    by_doc = {
        d: {r.fp for r in rows}
        for d, rows in [
            (x, fp.where(fp.doc_id == x).collect()) for x in ("a", "b", "c")
        ]
    }
    assert by_doc["a"] & by_doc["b"], "shared substring must share a fingerprint"
    assert not (by_doc["a"] & by_doc["c"])
    assert not (by_doc["b"] & by_doc["c"])
    # density: ~2/(w+1) of the ~n k-gram positions, loose factor-2 bounds
    n = len("prefix alpha " + shared + " suffix one") - 7
    assert len(by_doc["a"]) <= 4 * n / 9 + 2
    assert len(by_doc["a"]) >= n / 18
    pairs = winnow_near_dups(docs, k=8, w=8, min_shared=1, max_df=None).collect()
    assert {(r.a_id, r.b_id) for r in pairs} == {("a", "b")}
    fp.unpersist()


def test_winnow_rightmost_tie_break(spark):
    """Identical k-grams in one window: the rightmost minimum is selected
    (the winnowing paper's tie rule). w=9 over a period-8 text puts two
    equal grams in every window, so the tie path is exercised on every
    selection; the engine must match a brute rightmost reference and
    differ from the leftmost variant."""
    import hashlib

    from osm2world_spark.operators.dedup import winnow_fingerprints

    text = "abcde" * 8  # period-5: gram(p) == gram(p+5), ties inside every window
    k, w = 8, 9
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    got = {(r.fp, r.pos) for r in winnow_fingerprints(docs, k=k, w=w, portable=True).collect()}

    def brute(tie):
        n = len(text) - k + 1
        hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:15], 16) for i in range(n)]
        out = set()
        for j in range(n - w + 1):
            win = hs[j:j + w]
            mn = min(win)
            idxs = [i for i, v in enumerate(win) if v == mn]
            out.add((mn, j + (max(idxs) if tie == "right" else min(idxs))))
        return out

    assert got == brute("right")
    assert got != brute("left")  # the tie path is actually exercised
