"""Content-defined chunking: reassembly exactness, edit locality, and
the one-exchange plan shape."""

import pyspark.sql.functions as F


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from osm2world_spark.operators.packing import cdc_chunks

    return cdc_chunks(df, **kw)


def test_cdc_reassembles_exactly(spark):
    texts = [
        " ".join(f"w{(i * 17) % 301}" for i in range(200)),
        "one two three",
        "solo",
        "a  b",  # consecutive spaces -> empty token survives roundtrip
    ]
    out = _chunks(spark, texts).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert " ".join(r["chunk_text"] for r in rows) == texts[d]
        # tok_start/n_tokens tile the token range contiguously
        pos = 0
        for r in rows:
            assert r["tok_start"] == pos
            pos += r["n_tokens"]
        assert pos == len(texts[d].split(" "))


def test_cdc_boundaries_survive_local_edits(spark):
    base = " ".join(f"w{(i * 17) % 301}" for i in range(300))
    edited = "INSERTED " + base  # one token prepended
    rows = _chunks(spark, [base, edited]).collect()
    a = sorted((r for r in rows if r["doc_id"] == 0), key=lambda r: r["chunk_idx"])
    b = sorted((r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])
    # content-defined: every chunk of the original except (at most) the
    # first reappears verbatim in the edited doc
    a_texts = {r["chunk_text"] for r in a}
    b_texts = {r["chunk_text"] for r in b}
    missing = a_texts - b_texts
    assert len(missing) <= 1
    # and most chunks are shared (the dedup-stability property)
    assert len(a_texts & b_texts) >= len(a_texts) - 1 > 2


def test_cdc_expected_chunk_length(spark):
    base = " ".join(f"t{(i * 29) % 997}" for i in range(2000))
    rows = _chunks(spark, [base], mask_bits=4).collect()
    mean = 2000 / len(rows)
    assert 8 <= mean <= 32  # expected 16 +- slack


def test_cdc_hash_modes_agree_on_structure(spark):
    # md5 and xxhash64 modes give different boundaries but both tile
    texts = [" ".join(f"q{i % 53}" for i in range(150))]
    for key in ("hash", "md5"):
        rows = _chunks(spark, texts, key=key).collect()
        assert sum(r["n_tokens"] for r in rows) == 150


def test_cdc_single_exchange_plan(spark):
    df = _chunks(spark, [" ".join(f"w{i}" for i in range(50))])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
