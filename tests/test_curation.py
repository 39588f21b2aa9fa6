"""The curate() composition: audit-trail contract, stage interactions
(a quality-dropped doc must not steal canonicality), and the
three-exchange plan bound."""

from pyspark.sql import functions as F

from osm2world_spark.plans.curation import curate

GOOD = "the quick brown fox and the lazy dog with that steady pace of it " * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_curate_audit_trail(spark):
    rows = [
        ("a", GOOD),                # canonical train/val member
        ("b", GOOD),                # exact dup of a -> not canonical
        ("c", "too short"),         # quality-dropped
        ("d", GOOD + "unique tail the end of it all."),  # canonical
    ]
    out = {r["doc_id"]: r for r in curate(_docs(spark, rows), min_words=10).collect()}
    assert len(out) == 4  # nothing silently dropped
    assert out["a"]["keep_quality"] and out["a"]["is_canonical"]
    assert out["b"]["keep_quality"] and not out["b"]["is_canonical"]
    assert not out["c"]["keep_quality"] and not out["c"]["is_canonical"]
    assert out["d"]["is_canonical"]
    # only canonical survivors get a split; only train docs get a bin
    assert out["c"]["split"] is None and out["b"]["split"] is None
    for k in ("a", "d"):
        assert out[k]["split"] in ("train", "val")
        if out[k]["split"] == "train":
            assert out[k]["bin_id"] is not None and out[k]["n_tokens"] > 0
        else:
            assert out[k]["bin_id"] is None


def test_curate_dropped_doc_cannot_steal_canonicality(spark):
    """doc '0' (lowest id) duplicates doc '1' but fails quality: doc '1'
    must still be canonical."""
    rows = [("0", GOOD), ("1", GOOD)]
    out = {
        r["doc_id"]: r
        for r in curate(_docs(spark, rows), min_words=10_000).collect()
    }
    # both fail quality at min_words=10000 -> nobody canonical
    assert not out["0"]["is_canonical"] and not out["1"]["is_canonical"]

    rows2 = [("0", "tiny"), ("1", GOOD), ("2", GOOD)]
    out2 = {r["doc_id"]: r for r in curate(_docs(spark, rows2), min_words=10).collect()}
    assert not out2["0"]["keep_quality"]
    assert out2["1"]["is_canonical"] and not out2["2"]["is_canonical"]


def test_curate_exchange_bound(spark):
    plan = (
        curate(_docs(spark, [("a", GOOD)]), min_words=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the digest window + the pack window; quality and split are
    # projections and the audit trail is carried, not joined back
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_curate_bins_match_standalone_pack(spark):
    """bin ids must be bit-identical to pack_sequences run on the train
    subset alone — the zero-contribution trick must not perturb them."""
    from osm2world_spark.operators.packing import pack_sequences

    rows = [
        (f"d{i:03d}", GOOD + f"tail {i} " + ("word " * (i % 17)))
        for i in range(120)
    ]
    rows += [("dup" + r[0], r[1]) for r in rows[:30]]  # exact dups
    docs = _docs(spark, rows)
    cur = curate(docs, min_words=10, budget_tokens=64, n_buckets=4)
    got = {
        r["doc_id"]: (r["bucket"], r["bin_id"], r["n_tokens"])
        for r in cur.where(F.col("split") == "train").collect()
    }
    train_ids = list(got)
    train_docs = docs.where(F.col("doc_id").isin(train_ids))
    ref = {
        r["doc_id"]: (r["bucket"], r["bin_id"], r["n_tokens"])
        for r in pack_sequences(
            train_docs, budget_tokens=64, n_buckets=4
        ).collect()
    }
    assert got == ref and len(got) > 20


def _model_args(spark, keep_all=True):
    """A 2-class model: class 1 everywhere if keep_all (bias dominates),
    else class 0 everywhere."""
    wv = spark.createDataFrame(
        [(0, [0, 0])], "bucket bigint, ws array<bigint>"
    )
    biases = [0, 10] if keep_all else [10, 0]
    return wv, biases


def test_curate_model_gate_composition(spark):
    """Each gate drops exactly its own victims and the flags say which;
    a model-dropped duplicate must not steal canonicality."""
    from osm2world_spark.plans.curation import curate_model

    rows = [
        ("a", GOOD),               # passes all gates, canonical
        ("b", GOOD),               # exact dup -> not canonical
        ("c", "too short"),        # rule gate drops
        ("d", GOOD + "unique tail the end of it all."),
    ]
    wv, biases = _model_args(spark, keep_all=True)
    out = {
        r["doc_id"]: r
        for r in curate_model(
            _docs(spark, rows), wv, biases, 16, keep_label=1,
            lm_cutoffs=(1e9, -1.0),  # nothing reaches head; nothing tails
            min_words=10,
        ).collect()
    }
    assert len(out) == 4
    assert out["a"]["is_canonical"] and out["a"]["keep_model"]
    assert out["a"]["lm_bucket"] == "middle"
    assert not out["b"]["is_canonical"] and out["b"]["keep_model"]
    assert not out["c"]["keep_quality"] and not out["c"]["is_canonical"]

    # flip the model: every doc now fails the model gate
    wv0, biases0 = _model_args(spark, keep_all=False)
    out0 = {
        r["doc_id"]: r
        for r in curate_model(
            _docs(spark, rows), wv0, biases0, 16, keep_label=1,
            lm_cutoffs=(1e9, -1.0), min_words=10,
        ).collect()
    }
    assert all(not r["keep_model"] for r in out0.values())
    assert all(not r["is_canonical"] for r in out0.values())
    assert all(r["split"] is None for r in out0.values())


def test_curate_model_lm_tail_drops(spark):
    """With the middle cutoff above every doc's familiarity, every doc
    is 'tail' and the LM gate drops the whole corpus."""
    from osm2world_spark.plans.curation import curate_model

    rows = [("a", GOOD), ("b", GOOD + "extra")]
    wv, biases = _model_args(spark, keep_all=True)
    out = {
        r["doc_id"]: r
        for r in curate_model(
            _docs(spark, rows), wv, biases, 16, keep_label=1,
            lm_cutoffs=(1e9, 1e9), min_words=10,
        ).collect()
    }
    assert all(r["lm_bucket"] == "tail" for r in out.values())
    assert all(not r["is_canonical"] for r in out.values())


def test_curate_model_bins_match_plain_curate(spark):
    """With both model gates wide open, curate_model's dedup / split /
    pack columns must be bit-identical to curate's on the same corpus."""
    from osm2world_spark.plans.curation import curate_model

    rows = [
        (f"d{i:03d}", GOOD + f"tail {i} " + ("word " * (i % 17)))
        for i in range(80)
    ]
    wv, biases = _model_args(spark, keep_all=True)
    plain = {
        r["doc_id"]: (r["is_canonical"], r["split"], r["bucket"], r["bin_id"])
        for r in curate(_docs(spark, rows), min_words=10,
                        budget_tokens=128, n_buckets=8).collect()
    }
    gated = {
        r["doc_id"]: (r["is_canonical"], r["split"], r["bucket"], r["bin_id"])
        for r in curate_model(
            _docs(spark, rows), wv, biases, 16, keep_label=1,
            lm_cutoffs=(1e9, -1.0), min_words=10,
            budget_tokens=128, n_buckets=8,
        ).collect()
    }
    assert plain == gated


def test_curate_model_exchange_bound(spark):
    """The model gates cost corpus-level context: the plan may add
    linear exchanges over curate's two, but stays bounded (<= 8), joins
    only on doc_id / gram keys (no cartesian), broadcasts the model,
    and runs zero Python."""
    from osm2world_spark.plans.curation import curate_model

    rows = [(f"d{i}", GOOD + str(i)) for i in range(8)]
    wv, biases = _model_args(spark, keep_all=True)
    plan = (
        curate_model(
            _docs(spark, rows), wv, biases, 16, keep_label=1,
            lm_cutoffs=(2.0, 1.0), min_words=10,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 8, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the model join
    assert "EvalPython" not in plan
