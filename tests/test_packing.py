"""Split + sequence-packing operators: determinism, bin budgets, and
membership stability under corpus growth."""

from pyspark.sql import functions as F

from osm2world_spark.operators.packing import pack_sequences, sample_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_sample_split_deterministic_and_stable(spark):
    d = _docs(spark, [(f"d{i}", "x") for i in range(400)])
    s1 = {r["doc_id"]: r["split"] for r in sample_split(d, 0.2, 0.1).collect()}
    s2 = {r["doc_id"]: r["split"] for r in sample_split(d, 0.2, 0.1).collect()}
    assert s1 == s2
    # roughly the requested fractions (hash-uniform, 400 draws)
    n = len(s1)
    assert 0.10 < sum(v == "val" for v in s1.values()) / n < 0.30
    assert 0.03 < sum(v == "test" for v in s1.values()) / n < 0.20
    # membership is id-local: growing the corpus never reshuffles old docs
    bigger = _docs(spark, [(f"d{i}", "x") for i in range(800)])
    s3 = {r["doc_id"]: r["split"] for r in sample_split(bigger, 0.2, 0.1).collect()}
    assert all(s3[k] == v for k, v in s1.items())


def test_pack_sequences_budget_and_partition(spark):
    rows = [(f"d{i}", " ".join(["tok"] * (10 + i % 90))) for i in range(300)]
    d = _docs(spark, rows)
    out = pack_sequences(d, budget_tokens=200, n_buckets=4).collect()
    assert len(out) == 300  # every doc lands in exactly one bin
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["bucket"], r["bin_id"]), []).append(r["n_tokens"])
    for (_, _), toks in by_bin.items():
        # next-fit rule: a bin's exclusive prefix stays under budget, so the
        # total may overflow by at most its final (smallest-so-far) doc
        assert sum(toks) - max(toks) < 200
    # most bins are well-filled (packing, not one-doc-per-bin)
    fills = [sum(t) for t in by_bin.values()]
    assert sum(f >= 150 for f in fills) >= len(fills) * 0.6


def test_repetition_stats_flags_looping_text(spark):
    from osm2world_spark.operators.text import repetition_stats

    d = _docs(
        spark,
        [
            ("loop", "spam ham " * 50 + "spam ham"),      # one bigram dominates
            ("varied", " ".join(f"w{i}" for i in range(100))),  # all bigrams unique
            ("tiny", "word"),                              # < 2 tokens
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    # 102 tokens -> 101 bigrams: "spam ham" 51x, "ham spam" 50x
    assert out["loop"]["top_bigram_n"] == 51
    assert out["loop"]["top_bigram_frac_u6"] == int(51 / 101 * 1e6 + 0.5)
    assert out["varied"]["top_bigram_n"] == 1
    assert out["varied"]["distinct_bigram_frac_u6"] == 1000000
    assert out["tiny"]["top_bigram_n"] == 1 and out["tiny"]["top_bigram_frac_u6"] == 1000000


def test_chunk_documents(spark):
    import pytest as _pt

    from osm2world_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [("long", " ".join(toks)), ("short", "a b c")],
        "doc_id string, text string",
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=40, overlap=10).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    short = [r for r in rows if r.doc_id == "short"]
    assert len(short) == 1 and short[0].chunk == "a b c" and short[0].tok_end == 3
    long = [r for r in rows if r.doc_id == "long"]
    # stride 30: starts 0, 30, 60, 90 -> 1 + ceil(60/30) = 3? extra = 60,
    # ceil(60/30)=2 -> 3 chunks... but start 60 covers tokens 60..99 (40
    # tokens) exactly reaching n -> 3 chunks
    assert [r.tok_start for r in long] == [0, 30, 60]
    assert [r.tok_end for r in long] == [40, 70, 100]
    # overlap: chunk 1 starts 10 tokens before chunk 0 ends
    assert long[0].chunk.split(" ")[30:] == long[1].chunk.split(" ")[:10]
    # every token covered
    covered = set()
    for r in long:
        covered.update(range(r.tok_start, r.tok_end))
    assert covered == set(range(100))
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_weighted_sample_topk_matches_replica(spark):
    """A-ES with the md5 unit hash: the Spark ranking equals a python
    replica of key = ln(u)/w with the identical u."""
    import hashlib
    import math

    from osm2world_spark.operators.packing import weighted_sample_topk

    rows = [(f"d{i}", "g" + str(i % 3), float(1 + (i * 7) % 50)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, grp string, w double")
    got = {
        (r["grp"], r["samp_rank"]): r["doc_id"]
        for r in weighted_sample_topk(df, 4, "w", group_col="grp").collect()
    }

    def key(doc_id, w):
        u = (int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) + 0.5) / (1 << 32)
        return math.log(u) / w

    want = {}
    for grp in ("g0", "g1", "g2"):
        ranked = sorted(
            [(doc_id, w) for doc_id, g, w in rows if g == grp],
            key=lambda t: (-key(t[0], t[1]), t[0]),
        )
        for rank, (doc_id, _) in enumerate(ranked[:4], start=1):
            want[(grp, rank)] = doc_id
    assert got == want


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A 1000x weight must dominate the sample: among 200 rows where 10
    carry weight 1000 and the rest weight 1, the top-10 should be mostly
    heavy rows (A-ES inclusion probability ~ w_i / sum)."""
    from osm2world_spark.operators.packing import weighted_sample_topk

    rows = [(f"d{i:03d}", 1000.0 if i < 10 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    top = weighted_sample_topk(df, 10, "w").collect()
    heavy = sum(1 for r in top if r["w"] == 1000.0)
    assert heavy >= 8, heavy


def test_shard_corpus_md5_matches_scalar_and_is_dense(spark):
    import hashlib

    from osm2world_spark.operators.packing import shard_corpus

    ids = [f"doc{i:03d}" for i in range(97)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    rows = shard_corpus(docs, 8, key="md5").collect()
    got = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in rows}

    hv = {i: int(hashlib.md5(i.encode()).hexdigest()[:8], 16) for i in ids}
    want = {}
    for s in range(8):
        members = sorted((hv[i], i) for i in ids if hv[i] % 8 == s)
        for pos, (_, i) in enumerate(members):
            want[i] = (s, pos)
    assert got == want
    # every shard's positions are dense 0..k-1
    by_shard = {}
    for s, p in got.values():
        by_shard.setdefault(s, []).append(p)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))


def test_shard_corpus_partitioning_invariant_and_hash_mode(spark):
    from osm2world_spark.operators.packing import shard_corpus

    docs = spark.range(500).select(F.col("id").cast("string").alias("doc_id"))
    a = {(r["doc_id"], r["shard"], r["shard_pos"])
         for r in shard_corpus(docs, 16).collect()}
    b = {(r["doc_id"], r["shard"], r["shard_pos"])
         for r in shard_corpus(docs.repartition(13), 16).collect()}
    assert a == b
    shards = {s for _, s, _ in a}
    assert shards == set(range(16))  # xxhash64 mode: all shards occupied
