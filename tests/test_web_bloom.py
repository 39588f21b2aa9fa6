"""Tests for paragraph-level dedup, URL/domain caps, and the Bloom
filter membership sketch."""

import pyspark.sql.functions as F
import pytest


# ------------------------------------------------------- paragraph dedup

def _pd_docs(spark):
    rows = [
        (1, "alpha beta\n\ngamma delta\n\nshared one"),
        (2, "shared one\n\nepsilon zeta"),          # para 0 dups doc 1's last
        (3, "gamma delta\n\nshared one\n\nnew tail"),  # two dups
        (4, "  \n\nonly here"),                      # empty para kept as-is
        (5, "alpha beta"),                           # dups doc 1's first
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_paragraph_dedup_first_occurrence_wins(spark):
    from osm2world_spark.operators.dedup import paragraph_dedup

    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(_pd_docs(spark), key="text").collect()
    }
    # doc 1 is first everywhere: keeps all three paragraphs
    assert out[1]["text_dedup"] == "alpha beta\n\ngamma delta\n\nshared one"
    assert (out[1]["n_paragraphs"], out[1]["n_kept"]) == (3, 3)
    # doc 2 loses "shared one" (doc 1 owns it), keeps its own tail
    assert out[2]["text_dedup"] == "epsilon zeta"
    assert (out[2]["n_paragraphs"], out[2]["n_kept"]) == (2, 1)
    # doc 3 loses both duplicated paragraphs
    assert out[3]["text_dedup"] == "new tail"
    assert out[3]["n_kept"] == 1
    # doc 4: the empty paragraph survives (kept verbatim, not deduped)
    assert out[4]["text_dedup"] == "  \n\nonly here"
    assert (out[4]["n_paragraphs"], out[4]["n_kept"]) == (2, 2)
    # doc 5's only paragraph is doc 1's first -> empty doc remains
    assert out[5]["text_dedup"] == ""
    assert (out[5]["n_paragraphs"], out[5]["n_kept"]) == (1, 0)


def test_paragraph_dedup_hash_equals_text_mode(spark):
    from osm2world_spark.operators.dedup import paragraph_dedup

    docs = _pd_docs(spark)
    a = paragraph_dedup(docs, key="hash").orderBy("doc_id").collect()
    b = paragraph_dedup(docs, key="text").orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_paragraph_dedup_whitespace_variants_share_key(spark):
    from osm2world_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "padded para "), (2, " padded para")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, key="text").collect()}
    # trim-normalized key: the doc-2 variant is a duplicate, but doc 1
    # keeps its ORIGINAL (untrimmed) text
    assert out[1]["text_dedup"] == "padded para "
    assert out[2]["n_kept"] == 0


# ------------------------------------------------------------ url/domain

def test_url_parts(spark):
    from osm2world_spark.operators.web import url_parts

    rows = [
        ("https://User:pw@WWW.Sub.Example.COM:8443/a/b?q=1#f",),
        ("http://example.org",),
        ("not a url",),
    ]
    df = spark.createDataFrame(rows, ["url"]).select(url_parts(F.col("url")).alias("p"))
    got = [r["p"] for r in df.collect()]
    assert got[0]["scheme"] == "https"
    assert got[0]["host"] == "www.sub.example.com"
    assert got[0]["domain"] == "example.com"
    assert got[0]["path"] == "/a/b"
    assert got[1] == ("http", "example.org", "example.org", "")
    assert got[2] == ("", "", "", "")


def test_domain_cap_keeps_best_per_domain(spark):
    from osm2world_spark.operators.web import domain_cap

    rows = [
        (i, f"https://h{i % 2}.site{i % 2}.com/p/{i}", float(i % 7))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "url", "score"])
    out = domain_cap(
        docs, max_per_domain=3, order_col="score"
    ).collect()
    kept = sorted(r["doc_id"] for r in out if r["kept"])
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"site0.com", "site1.com"}
    for dom, rs in by_dom.items():
        k = [r for r in rs if r["kept"]]
        assert len(k) == 3
        # kept rows are the top scores, ties broken by doc_id
        best = sorted(rs, key=lambda r: (-r["score"], r["doc_id"]))[:3]
        assert sorted(r["doc_id"] for r in k) == sorted(r["doc_id"] for r in best)
    assert len(kept) == 6


# ------------------------------------------------------------------ bloom

def test_bloom_no_false_negatives_and_exact_negatives(spark):
    from osm2world_spark.operators.sketches import (
        bloom_build,
        bloom_predicate,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], ["v"]
    )
    words = bloom_build(members, "v", n_bits=1 << 12, k=4)
    probes = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)]
        + [(f"absent-{i}",) for i in range(400)],
        ["v"],
    )
    got = {r["v"]: r["might_contain"] for r in bloom_probe(
        probes, words, "v", n_bits=1 << 12, k=4
    ).collect()}
    # Bloom guarantee: every member reports true
    assert all(got[f"member-{i}"] for i in range(200))
    # false-positive rate at these parameters is far below 50%
    fp = sum(1 for i in range(400) if got[f"absent-{i}"])
    assert fp < 100
    # the literal-column predicate agrees with the relational probe
    pred = bloom_predicate(words, n_bits=1 << 12, k=4)
    got2 = {
        r["v"]: r["m"]
        for r in probes.select("v", pred(F.col("v")).alias("m")).collect()
    }
    assert got2 == got


def test_bloom_shard_merge_equals_direct(spark):
    from osm2world_spark.operators.sketches import bloom_build

    a = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["v"])
    b = spark.createDataFrame([(f"x{i}",) for i in range(100, 300)], ["v"])
    direct = bloom_build(a.union(b), "v", n_bits=1 << 10, k=3)
    merged = (
        bloom_build(a, "v", n_bits=1 << 10, k=3)
        .union(bloom_build(b, "v", n_bits=1 << 10, k=3))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_bloom_predicate_inside_lambda(spark):
    """The zero-shuffle corpus path: the predicate runs inside a
    higher-order-function lambda over per-document token arrays."""
    from osm2world_spark.operators.sketches import bloom_build, bloom_predicate

    bench = spark.createDataFrame([("hot",), ("leak",)], ["v"])
    pred = bloom_predicate(bloom_build(bench, "v", n_bits=1 << 10, k=3),
                           n_bits=1 << 10, k=3)
    docs = spark.createDataFrame(
        [(1, "clean words only"), (2, "one hot token"), (3, "leak leak")],
        ["doc_id", "text"],
    )
    out = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.array_distinct(F.split(F.col("text"), " ")),
                lambda t: pred(t),
            )
        ).alias("n_hits"),
    )
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got[2] >= 1 and got[3] >= 1
    # plan must not contain a join or an exchange for the probe side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
