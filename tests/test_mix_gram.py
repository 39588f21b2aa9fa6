"""token_budget_mix and gram_matrix / pca_project."""

import numpy as np
import pyspark.sql.functions as F


# --------------------------------------------------------------- mixing

def _docs(spark, n=40):
    rows = [
        (i, f"src{i % 3}", " ".join(f"w{j}" for j in range((i % 9) + 1)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_token_budget_mix_prefix_and_budget(spark):
    from osm2world_spark.operators.packing import token_budget_mix

    out = token_budget_mix(_docs(spark), budget=20).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["mix_rank"])
        kept = [r for r in rows if r["kept"]]
        # kept rows form a prefix of the hash order
        assert [r["mix_rank"] for r in kept] == list(range(1, len(kept) + 1))
        # running totals are consistent and the budget binds
        total = 0
        for r in rows:
            total += r["n_tokens"]
            assert r["cum_tokens"] == total
        assert sum(r["n_tokens"] for r in kept) <= 20
        if len(kept) < len(rows):
            assert kept[-1]["cum_tokens"] + rows[len(kept)]["n_tokens"] > 20


def test_token_budget_mix_monotone_in_budget(spark):
    from osm2world_spark.operators.packing import token_budget_mix

    docs = _docs(spark)
    small = {r["doc_id"] for r in token_budget_mix(docs, budget=15).collect() if r["kept"]}
    large = {r["doc_id"] for r in token_budget_mix(docs, budget=40).collect() if r["kept"]}
    assert small <= large and len(large) > len(small)


def test_token_budget_mix_column_budget(spark):
    from osm2world_spark.operators.packing import token_budget_mix

    budget = F.when(F.col("source") == "src0", 5).otherwise(1000)
    out = token_budget_mix(_docs(spark), budget=budget).collect()
    src0 = sum(r["n_tokens"] for r in out if r["source"] == "src0" and r["kept"])
    src1 = [r for r in out if r["source"] == "src1" and not r["kept"]]
    assert src0 <= 5
    assert not src1  # unlimited budget keeps everything


# ----------------------------------------------------------- gram / pca

def _embs(spark, n=60, d=8, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    X[:, 0] *= 6.0  # dominant direction
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), X


def test_gram_matrix_matches_numpy(spark):
    from osm2world_spark.operators.similarity import gram_matrix

    df, X = _embs(spark)
    got = {(r["i"], r["j"]): r["val"] for r in gram_matrix(df).collect()}
    G = X.T @ X
    assert len(got) == 64
    for (i, j), v in got.items():
        assert abs(v - G[i, j]) < 1e-8 * max(1.0, abs(G[i, j]))


def test_gram_matrix_quantized_is_exact_and_partition_invariant(spark):
    from osm2world_spark.operators.similarity import gram_matrix

    df, X = _embs(spark, seed=3)
    Q = np.floor(X * 1024).astype(np.int64)
    want = (Q.T @ Q).astype(np.int64)
    for parts in (1, 7):
        got = {
            (r["i"], r["j"]): r["val"]
            for r in gram_matrix(df.repartition(parts), quantize_bits=10).collect()
        }
        assert all(got[(i, j)] == int(want[i, j]) for i in range(8) for j in range(8))


def test_pca_project_recovers_dominant_axis(spark):
    from osm2world_spark.operators.similarity import pca_project

    df, X = _embs(spark, n=120, seed=5)
    out = pca_project(df, k=2).collect()
    got = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in out}
    # pc0 must align with the dominant axis 0 (up to the fixed sign)
    G = X.T @ X
    w, V = np.linalg.eigh(G)
    v0 = V[:, np.argsort(w)[::-1][0]]
    nz = np.nonzero(np.abs(v0) > 1e-12)[0]
    if v0[nz[0]] < 0:
        v0 = -v0
    assert abs(abs(v0[0]) - 1) < 0.2  # dominant axis ~ e0
    for i in range(120):
        assert abs(got[i][0] - float(X[i] @ v0)) < 1e-6
    # variance ordering: pc0 spread dominates pc1 spread
    p0 = np.array([got[i][0] for i in range(120)])
    p1 = np.array([got[i][1] for i in range(120)])
    assert p0.var() > 4 * p1.var()
