"""Integer fixed-point PageRank: bit-equality with an independent
dict/loop reference of the same recurrence, ranking sanity, and the
dangling/duplicate-edge contract."""

from pyspark.sql import functions as F

from osm2world_spark.operators.network import pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
]


def _ref(edges, iters, num=85, den=100, scale=1_000_000):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    rank = {v: scale // n for v in nodes}
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = ((den - num) * scale) // (den * n)
    for _ in range(iters):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += (num * rank[s]) // (den * out[s])
        rank = {v: base + mass[v] for v in nodes}
    return rank


def test_pagerank_matches_reference_bitwise(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    for iters in (1, 3):
        got = {r["node"]: r["rank_u6"] for r in pagerank(edges, iters=iters).collect()}
        assert got == _ref(EDGES, iters)


def test_pagerank_ranking_sanity(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: r["rank_u6"] for r in pagerank(edges, iters=10).collect()}
    # c has 3 in-links (a, b, d) and feeds a; d has none
    assert got["c"] > got["a"] > got["d"]
    # total integer mass never exceeds the scale (floor sheds, never adds)
    assert sum(got.values()) <= 1_000_000


def test_pagerank_dangling_and_duplicates(spark):
    # b is dangling (no out-edges): its mass drops, everyone still gets base
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["rank_u6"] for r in pagerank(edges, iters=2).collect()}
    assert got == _ref([("a", "b")], 2)
    # duplicate edge counts with multiplicity
    dup = [("a", "b"), ("a", "b"), ("a", "c")]
    edges2 = spark.createDataFrame(dup, "src string, dst string")
    got2 = {r["node"]: r["rank_u6"] for r in pagerank(edges2, iters=2).collect()}
    assert got2 == _ref(dup, 2)
    assert got2["b"] > got2["c"]


def test_pagerank_explicit_node_universe(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], "node string")
    got = {r["node"]: r["rank_u6"] for r in pagerank(edges, nodes, iters=1).collect()}
    # isolated z exists with the base + initial-div share semantics
    assert set(got) == {"a", "b", "z"}
    n, scale, num, den = 3, 1_000_000, 85, 100
    base = ((den - num) * scale) // (den * n)
    assert got["z"] == base
    assert got["b"] == base + (num * (scale // n)) // (den * 1)


def test_triangle_counts(spark):
    from osm2world_spark.operators.network import triangle_counts

    # K4 on a,b,c,d (4 triangles, each node in 3) plus a pendant edge,
    # with duplicates and reversed directions thrown in
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("d", "c"),
        ("d", "e"), ("e", "e"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # triangle identity: sum of per-node counts = 3 * n_triangles
    assert sum(got.values()) == 3 * 4


def test_triangle_counts_triangle_free(spark):
    from osm2world_spark.operators.network import triangle_counts

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    assert triangle_counts(chain).count() == 0
