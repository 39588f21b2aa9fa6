"""remove_dup_spans + lsh_index/incremental_near_dups
(operators/dedup.py).

Oracles: scalar Python replicas — the Lee 2022 span pipeline plus token
surgery for the removal op; md5-prefix minhash signatures, banding, and
match counting for the incremental index scan.
"""

from __future__ import annotations

import hashlib

import pytest


# ---------- remove_dup_spans ----------

def _scalar_spans(docs, k, min_count):
    """Replica of duplicated_spans (gram_key='exact')."""
    occ: dict[str, int] = {}
    pos_by_doc: dict[str, list[int]] = {}
    grams_by_doc = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        grams = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]
        grams_by_doc[doc_id] = grams
        for g in grams:
            occ[g] = occ.get(g, 0) + 1
    spans = {}
    for doc_id, grams in grams_by_doc.items():
        dup_pos = [i for i, g in enumerate(grams) if occ[g] >= min_count]
        islands: list[list[int]] = []  # [start_pos, last_pos]
        for p in dup_pos:
            # merge iff p <= prev_pos + k  (pos > prev + k starts new)
            if islands and p <= islands[-1][1] + k:
                islands[-1][1] = p
            else:
                islands.append([p, p])
        spans[doc_id] = [(s, last + k) for s, last in islands]
    return spans


def _scalar_removed(docs, k, min_count):
    spans = _scalar_spans(docs, k, min_count)
    out = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        covered = set()
        for s, e in spans.get(doc_id, []):
            covered.update(range(s, e))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


DUP = "a1 a2 a3 a4 a5 a6 a7 a8"  # an 8-token block repeated across docs
SPAN_DOCS = [
    ("d1", f"u1 u2 {DUP} u3 u4"),
    ("d2", f"v1 {DUP} v2 v3 v4 v5"),
    ("d3", DUP),                      # doc that IS the duplicate
    ("d4", "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  # unique, untouched
    ("d5", "short doc"),              # < k tokens: no grams
]


def test_remove_dup_spans_matches_scalar(spark):
    from osm2world_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_dup_spans(df, k=8, gram_key="exact").collect()
    }
    want = _scalar_removed(SPAN_DOCS, 8, 2)
    assert got == want
    # the fixture must exercise: removal, full wipe, untouched, short doc
    assert got["d3"] == (8, 8, "")
    assert got["d4"][1] == 0 and got["d4"][2] == SPAN_DOCS[3][1]
    assert got["d5"] == (2, 0, "short doc")
    assert got["d1"][1] == 8 and "a1" not in got["d1"][2]


def test_remove_dup_spans_row_count_preserved(spark):
    from osm2world_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id string, text string")
    assert remove_dup_spans(df, k=8, gram_key="exact").count() == len(SPAN_DOCS)


def test_remove_dup_spans_hash_key_same_result(spark):
    from osm2world_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(SPAN_DOCS, "doc_id string, text string")
    exact = {r["doc_id"]: r["text_clean"]
             for r in remove_dup_spans(df, k=8, gram_key="exact").collect()}
    hashed = {r["doc_id"]: r["text_clean"]
              for r in remove_dup_spans(df, k=8, gram_key="hash").collect()}
    assert exact == hashed


# ---------- incremental_near_dups ----------

K = 8
BANDS = 4
N = 3


def _h60(salt: int, s: str) -> int:
    return int(
        hashlib.md5((f"{salt}|" + s).encode()).hexdigest()[:15], 16
    )


def _shingles(text: str, n=N):
    toks = text.split(" ")
    if len(toks) - (n - 1) >= 1:
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    return {text}


def _sig(text: str, k=K):
    sh = _shingles(text)
    return [min(_h60(s, g) for g in sh) for s in range(k)]


def _scalar_incremental(new_docs, old_docs, bands=BANDS, min_matches=4, k=K):
    rows_per_band = k // bands
    old = {d: _sig(t) for d, t in old_docs}
    out = {}
    for nd, nt in new_docs:
        ns = _sig(nt)
        best = None
        for od, os_ in old.items():
            shares_band = any(
                ns[b * rows_per_band : (b + 1) * rows_per_band]
                == os_[b * rows_per_band : (b + 1) * rows_per_band]
                for b in range(bands)
            )
            if not shares_band:
                continue
            m = sum(1 for a, b2 in zip(ns, os_) if a == b2)
            if m < min_matches:
                continue
            cand = (m, od)
            if best is None or m > best[0] or (m == best[0] and od < best[1]):
                best = cand
        if best:
            out[nd] = (best[1], best[0], best[0] * 1000000 // k)
    return out


OLD_DOCS = [
    ("o1", "the quick brown fox jumps over the lazy dog today"),
    ("o2", "spark catalyst optimizer plans shuffles and partitions well"),
    ("o3", "completely different content about raster tiles and cells"),
]
NEW_DOCS = [
    ("n1", "the quick brown fox jumps over the lazy dog today"),   # exact clone of o1
    ("n2", "spark catalyst optimizer plans shuffles and partitions badly"),  # near o2
    ("n3", "fresh unseen document with entirely novel words inside"),  # insert
]


def _dfs(spark):
    new = spark.createDataFrame(NEW_DOCS, "doc_id string, text string")
    old = spark.createDataFrame(OLD_DOCS, "doc_id string, text string")
    return new, old


def test_incremental_matches_scalar_replica(spark):
    from osm2world_spark.operators.dedup import incremental_near_dups, lsh_index

    new, old = _dfs(spark)
    idx = lsh_index(old, k=K, n=N, portable=True)
    got = {
        r["new_id"]: (r["old_id"], r["n_matches"], r["est_jaccard_u6"])
        for r in incremental_near_dups(
            new, idx, bands=BANDS, min_matches=4, k=K, n=N, portable=True
        ).collect()
    }
    want = _scalar_incremental(NEW_DOCS, OLD_DOCS)
    assert got == want
    assert got["n1"] == ("o1", K, 1000000)  # exact clone: all positions agree
    assert "n3" not in got                   # the insert produces no row


def test_incremental_one_row_per_new_doc(spark):
    """Even when a new doc collides with several old docs, only the best
    (highest matches, lowest old_id) survives."""
    from osm2world_spark.operators.dedup import incremental_near_dups, lsh_index

    old = spark.createDataFrame(
        [("oA", "x1 x2 x3 x4 x5 x6"), ("oB", "x1 x2 x3 x4 x5 x6")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("n", "x1 x2 x3 x4 x5 x6")], "doc_id string, text string"
    )
    rows = incremental_near_dups(
        new, lsh_index(old, k=K, n=N, portable=True),
        bands=BANDS, min_matches=4, k=K, n=N, portable=True,
    ).collect()
    assert len(rows) == 1
    assert rows[0]["old_id"] == "oA"  # tie broken to the smallest old_id


def test_incremental_threshold_excludes_weak_matches(spark):
    from osm2world_spark.operators.dedup import incremental_near_dups, lsh_index

    new, old = _dfs(spark)
    idx = lsh_index(old, k=K, n=N, portable=True)
    strict = incremental_near_dups(
        new, idx, bands=BANDS, min_matches=K, k=K, n=N, portable=True
    ).collect()
    # at min_matches = k only the exact clone survives
    assert {r["new_id"] for r in strict} == {"n1"}
