"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. The
  query side is small and broadcast; dot products are JVM-side higher-order
  functions (F.aggregate fold, sequential order -> deterministic), ranking
  is a window per query.
- `lsh_cosine_topk`: the scale path — random-hyperplane (sign) LSH buckets
  prune the candidate set before the exact rerank. Hyperplanes are a
  deterministic function of (seed, plane, dim) so executors regenerate them
  identically; at 10^12 rows the bucket join replaces the full cross
  product.

Reference parity note: OSM2World has no embedding search; these belong to
the training-data-pipeline surface required by the engine spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _cosine(a, b):
    """Cosine similarity, NULL for zero-norm vectors (try_divide — ANSI
    mode would otherwise abort the job on the first all-zero embedding;
    NULL sims sort last under desc ordering, so they never outrank)."""
    return F.round(F.try_divide(_dot(a, b), _norm(a) * _norm(b)), 6)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, rank, n_id, cos_sim rounded to 6).
    Self-matches (same id) are excluded; ties break by neighbor id."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    sim = _cosine(F.col("q_vec"), F.col("n_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        q.crossJoin(F.broadcast(c))
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component list (splitmix-like
    integer hash -> [-1, 1) floats); pure function of (seed, plane, dim)."""
    out = []
    for d in range(dim):
        x = (seed * 1_000_003 + plane * 7919 + d * 104_729) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        out.append((x >> 11) / float(1 << 52) - 1.0)
    return out


def lsh_bucket(vec_col, dim: int, n_planes: int = 16, seed: int = 42):
    """Sign-LSH bucket id Column: bit p = sign(vec . hyperplane_p)."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        dp = _dot(vec_col, plane)
        bucket = bucket + F.when(dp >= 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cos_sim) for
    every unordered pair with cosine >= threshold.

    exact=False (the scale path): sign-LSH bucket self-join with 1-bit
    multi-probe pruning before the exact filter — near-identical vectors
    agree on almost all hyperplane signs, so candidates collapse into
    shared buckets instead of a cross join.
    exact=True: full cross product (correctness baseline; quadratic)."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if exact:
        a = c.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"))
        b = c.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"))
        cand = a.crossJoin(b).where(F.col("a_id") < F.col("b_id"))
    else:
        if dim is None:
            raise ValueError("dim required for the LSH path")
        withb = c.withColumn("bucket", lsh_bucket(F.col("vec"), dim, n_planes))
        flips = F.array(*([F.lit(0)] + [F.lit(1 << p) for p in range(n_planes)]))
        probed = withb.select(
            "id",
            "vec",
            F.explode(
                F.transform(flips, lambda f: F.col("bucket").bitwiseXOR(f.cast("bigint")))
            ).alias("bucket"),
        )
        a = probed.select(
            F.col("id").alias("a_id"), F.col("vec").alias("a_vec"), "bucket"
        )
        b = withb.select(
            F.col("id").alias("b_id"), F.col("vec").alias("b_vec"), "bucket"
        )
        cand = (
            a.join(b, "bucket")
            .where(F.col("a_id") < F.col("b_id"))
            .dropDuplicates(["a_id", "b_id"])
        )
    sim = _cosine(F.col("a_vec"), F.col("b_vec"))
    return (
        cand.withColumn("cos_sim", sim)
        .where(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", "cos_sim")
    )


# ------------------------------------------------------------------- IVF

def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 8,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic spherical k-means over a hash-sampled subset
    (collected to the driver — the coarse codebook is tiny and broadcast
    back). Returns a normalized (n_cells, dim) numpy array.

    The sample is `pmod(xxhash64(id), stride) == 0` — a pure function of
    the ids, so it is deterministic under any partitioning WITHOUT the
    global corpus sort an orderBy().limit() sample would cost; only the
    ~`sample`-row subset crosses to the driver, where it is sorted (tiny)
    for a stable k-means init order."""
    import numpy as np

    n_total = corpus.count()
    if n_total == 0:
        raise ValueError("cannot train an IVF codebook on an empty corpus")
    stride = max(1, n_total // sample)
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .where(F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(stride)) == 0)
        .collect()
    )
    rows = sorted(rows, key=lambda r: str(r["id"]))[:sample]
    X = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(X))
    C = X[:: max(1, len(X) // n_cells)][:n_cells].copy()  # strided init, deterministic
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_cells):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: str = "kmeans",
) -> DataFrame:
    """IVF approximate top-k: a coarse codebook routes each corpus vector
    to its nearest centroid cell; queries probe their `n_probe` nearest
    cells and rerank exactly within them. The inverted index is the
    partitioning — at scale the corpus is written partitioned by cell and
    a probe reads n_probe/n_cells of the data.

    codebook='kmeans' (production): deterministic spherical k-means over a
    hash-sampled subset. codebook='first_k': the n_cells lowest-id corpus
    vectors, normalized — lower recall, but a pure function of the input
    with no iterative training, so a SQL oracle can rebuild the whole
    index (the driver-verified variant)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType

    if codebook == "first_k":
        rows = (
            corpus.select(F.col(id_col), F.col(vec_col)).orderBy(F.col(id_col)).limit(n_cells).collect()
        )
        X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
        C = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    else:
        C = train_ivf_centroids(corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    C_list = C.tolist()

    def make_assign(n_top: int):
        def assign(s):
            import numpy as np

            Cn = np.asarray(C_list)
            if len(s) == 0:
                return pd.Series([], dtype=object)
            X = np.asarray([list(v) for v in s], dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = X @ Cn.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_top]
            return pd.Series([row.tolist() for row in top])

        # `from __future__ import annotations` stringifies hints, which
        # pandas_udf can't resolve from a nested scope — set real objects
        assign.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return F.pandas_udf(assign, ArrayType(IntegerType()))

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.element_at(make_assign(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(make_assign(n_probe)(F.col(vec_col))).alias("cell"),
    )
    sim = _cosine(F.col("q_vec"), F.col("n_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        q.join(c, "cell")
        .where(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket (plus the
    buckets at Hamming distance 1 on the query side for recall), then exact
    rerank. Output schema matches cosine_topk."""
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    # probe own bucket + all 1-bit-flip buckets (multi-probe LSH)
    flips = F.array(*([F.lit(0)] + [F.lit(1 << p) for p in range(n_planes)]))
    q = q0.select(
        "q_id",
        "q_vec",
        F.explode(F.transform(flips, lambda f: F.col("bucket").bitwiseXOR(f.cast("bigint")))).alias("bucket"),
    )
    sim = _cosine(F.col("q_vec"), F.col("n_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        q.join(c, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cos_sim")
    )


def _sq_l2(a, b):
    """Squared L2 between two double arrays: ordered zip_with/aggregate
    fold (sequential summation — the order a SQL list_sum reproduces)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codes(
    corpus: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: str = "first_k",
    centroids=None,
) -> DataFrame:
    """Product-quantization codes (Jegou/Douze/Schmid 2011): the vector is
    split into `m` contiguous subspaces; each sub-vector is assigned to its
    nearest (L2) centroid in a per-subspace codebook of `k_sub` entries;
    the code is the m small indices — the memory-compressed ANN
    representation (m * log2(k_sub) bits per vector).

    codebook='first_k': subspace centroids = the sub-vectors of the k_sub
    lowest-id corpus rows — deterministic, so the whole code table is
    engine-reproducible (the driver-verified mode; a k-means codebook
    per subspace is the production upgrade, same dataflow).

    Output: (vec_id, code array<int> of length m). One projection over
    the corpus; the codebooks are a tiny broadcast literal. A corpus
    smaller than k_sub shrinks the codebook to the corpus size.
    `centroids` lets a caller (pq_topk) pass the already-collected
    codebook instead of re-running the orderBy/limit job."""
    import numpy as np

    if centroids is None:
        rows = (
            corpus.select(F.col(id_col), F.col(vec_col)).orderBy(F.col(id_col)).limit(k_sub).collect()
        )
        if not rows:
            raise ValueError("cannot build a PQ codebook on an empty corpus")
        centroids = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    C = centroids
    k_sub = min(k_sub, len(C))  # (k_sub, dim)
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    def code_col(j: int):
        # squared L2 of subspace j against each centroid (argmin, lowest
        # index on ties). Centroids are a literal array-of-arrays and the
        # distance is a zip_with/aggregate fold — LAMBDA functions keep
        # the generated code small (a fully unrolled m x k_sub x sub
        # expression tree blows the JVM's 64KB codegen method limit and
        # drops the whole stage to interpreted mode)
        q_sub = F.slice(F.col(vec_col), j * sub + 1, sub)
        cents = F.array(*[
            F.array(*[F.lit(float(C[c, j * sub + t])) for t in range(sub)])
            for c in range(k_sub)
        ])
        arr = F.transform(cents, lambda cv: _sq_l2(q_sub, cv))
        return F.array_position(arr, F.array_min(arr)).cast("int") - 1

    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.array(*[code_col(j) for j in range(m)]).alias("code"),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance PQ search: corpus vectors are represented only
    by their codes; each query scores a candidate by the sum over
    subspaces of the exact distance from the query's sub-vector to the
    candidate's ASSIGNED CENTROID (the ADC table lookup). Returns
    (q_id, rank, n_id, adc_u6) — approximate by construction; the rerank
    against true vectors is the usual second stage (cosine_topk over the
    shortlist)."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), F.col(vec_col)).orderBy(F.col(id_col)).limit(k_sub).collect()
    )
    if not rows:
        raise ValueError("cannot build a PQ codebook on an empty corpus")
    C = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    k_sub = min(k_sub, len(C))
    dim = C.shape[1]
    sub = dim // m
    # codes reuse the collected codebook — no second orderBy/limit job
    codes = pq_codes(corpus, m=m, k_sub=k_sub, id_col=id_col, vec_col=vec_col, centroids=C)

    # the query's per-(subspace, centroid) distance table: lambda folds
    # over literal centroid arrays (codegen-bounded; see pq_codes)
    def sub_table(j: int):
        q_sub = F.slice(F.col("q_vec"), j * sub + 1, sub)
        cents = F.array(*[
            F.array(*[F.lit(float(C[c, j * sub + t])) for t in range(sub)])
            for c in range(k_sub)
        ])
        return F.transform(cents, lambda cv: _sq_l2(q_sub, cv))

    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    pairs = q.crossJoin(codes.withColumnRenamed("vec_id", "n_id")).where(
        F.col("q_id") != F.col("n_id")
    )
    adc = None
    for j in range(m):
        term = F.element_at(sub_table(j), F.col("code")[j] + 1)
        adc = term if adc is None else adc + term
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id").asc())
    return (
        pairs.withColumn("adc", adc)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "rank", "n_id",
            F.floor(F.col("adc") * 1e6 + 0.5).cast("bigint").alias("adc_u6"),
        )
    )


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over embedding rows, entirely as
    DataFrame iteration (no driver-side vectors): centroids live in a
    k-row DataFrame; each round broadcast-joins them to the corpus,
    assigns by squared-L2 argmin (lowest index on ties), and re-averages
    per cluster with a zip_with fold — the aggregation is one shuffle of
    k*dim numbers, not corpus rows. Initialization = the k lowest-id
    vectors (deterministic). Empty clusters keep their previous centroid.

    Returns (vec_id, cluster) after `iters` rounds. The iterative shape
    matches the engine's other fixpoint loops (BFS / Bellman-Ford):
    per-round lazy localCheckpoint truncates the growing lineage."""
    vecs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    centroids = (
        vecs.orderBy("vec_id").limit(k)
        .select(
            F.col("v").alias("c"),
            # cluster index = rank of the init vector's id — a REAL order
            # key (row_number over a constant would depend on unspecified
            # plan-order stability and permute the ids on a cluster)
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cluster"),
        )
        .localCheckpoint(eager=True)
    )

    dist2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_d").asc(), F.col("cluster").asc())
    for _ in range(iters):
        assigned = (
            vecs.crossJoin(F.broadcast(centroids))
            .withColumn("_d", dist2)
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("vec_id", "v", "cluster")
        )
        # mean per cluster: dims explode to (cluster, d) rows so the sum
        # combines MAP-SIDE — only k*dim partial sums cross the wire (a
        # collect_list of cluster members would hold whole clusters in
        # task memory)
        exploded = assigned.select("cluster", F.posexplode("v").alias("d", "val"))
        sums = exploded.groupBy("cluster", "d").agg(
            F.sum("val").alias("s"), F.count("*").alias("n")
        )
        new_c = sums.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "s", "n"))),
                lambda t: t["s"] / t["n"],
            ).alias("c")
        )
        centroids = (
            centroids.select("cluster", F.col("c").alias("_old"))
            .join(new_c, "cluster", "left")
            .select("cluster", F.coalesce(F.col("c"), F.col("_old")).alias("c"))
            .localCheckpoint(eager=False)
        )
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("_d", dist2)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("vec_id", F.col("cluster").cast("int").alias("cluster"))
    )


# ------------------------------------------------------ gram matrix / PCA

def gram_matrix(
    embs: DataFrame, vec_col: str = "embedding", quantize_bits: int | None = None
) -> DataFrame:
    """Distributed Gram matrix X^T X as (i, j, val) rows — the one-pass
    building block for covariance/PCA at corpus scale. Each Arrow batch
    contributes ONE d x d numpy matmul partial; only the d^2-row partials
    cross the wire (shuffle bounded by n_partitions * d^2, never by row
    count) and a groupBy sums them — the textbook distributed second-
    moment shape.

    quantize_bits=b first snaps every component to floor(x * 2^b) as
    int64, making the sums ORDER-INDEPENDENT exact integers (float
    partial sums depend on partition boundaries): the mode the driver
    oracle verifies bit-for-bit, and the honest-answer mode for any
    cross-run-reproducible pipeline. int64 bound: |x|<=1 at b=10 gives
    per-product <= 2^20, safe to ~8e18 summed rows. Float mode is the
    production default (one ulp-level nondeterminism, no overflow)."""
    import numpy as np
    import pandas as pd

    q = quantize_bits

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy())
            if q is not None:
                Xq = np.floor(X.astype(np.float64) * (1 << q)).astype(np.int64)
                G = Xq.T @ Xq
            else:
                G = X.astype(np.float64).T @ X.astype(np.float64)
            d = G.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "val": G.ravel().astype(np.float64)
                    if q is None
                    else G.ravel(),
                }
            )

    schema = "i int, j int, val " + ("double" if q is None else "bigint")
    partials = embs.select(vec_col).mapInPandas(kernel, schema=schema)
    return partials.groupBy("i", "j").agg(F.sum("val").alias("val"))


def pca_project(
    embs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> DataFrame:
    """Project embeddings onto their top-k principal axes (eigenvectors
    of the UNcentered Gram matrix — classic truncated-SVD-style
    dimensionality reduction before clustering/ANN). The d x d Gram is
    computed distributed (gram_matrix) and eigendecomposed on the driver
    — a BOUNDED d^2 collect, the same justified pattern as the IVF
    codebook — then the projection is a pure Column dot product per
    component. Component sign is fixed deterministically (first nonzero
    coordinate positive)."""
    import numpy as np

    rows = gram_matrix(embs, vec_col).collect()
    d = max(r["i"] for r in rows) + 1
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"], r["j"]] = r["val"]
    w, V = np.linalg.eigh(G)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for c in range(k):
        v = V[:, order[c]]
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        comps.append(v)

    def proj(vec, comp):
        return F.aggregate(
            F.zip_with(
                vec,
                F.lit([float(x) for x in comp]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return embs.select(
        F.col(id_col),
        *[
            proj(F.col(vec_col), comps[c]).alias(f"pc{c}")
            for c in range(k)
        ],
    )


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means cluster the
    embeddings, then inside each cluster drop every item whose cosine
    to a LOWER-ID cluster member reaches the threshold (keep-first —
    the deterministic stand-in for the paper's keep-one-per-group).

    Scale shape: the quadratic pair work is CLUSTER-bounded — the
    cluster key partitions the self-join, so tasks see one cluster's
    vectors, never the corpus; clustering itself is the distributed
    Lloyd iteration of kmeans_assign (k*dim-bounded shuffles). Raising
    k shrinks the per-task quadratic term — the paper's own lever.

    Returns (vec_id, cluster, keep)."""
    assign = kmeans_assign(corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cl = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .join(assign, "vec_id")
    )
    a = cl.select("cluster", F.col("vec_id").alias("a_id"), F.col("vec").alias("a_vec"))
    b = cl.select("cluster", F.col("vec_id").alias("b_id"), F.col("vec").alias("b_vec"))
    dups = (
        a.join(b, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .where(_cosine(F.col("a_vec"), F.col("b_vec")) >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return cl.join(
        dups.withColumn("_dup", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id", "cluster", F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")
    )


def jl_sign_matrix(out_dim: int, in_dim: int, seed: int = 42) -> list[list[int]]:
    """The deterministic +-1 projection matrix of ``jl_project`` —
    Achlioptas 2003's database-friendly JL variant (entries +-1, no
    Gaussians), generated from md5 so ANY engine or language rebuilds it
    bit-identically: sign[j][i] = +1 iff the first md5 hex digit of
    "<seed>:<j>,<i>" is even. Model-sized (out_dim x in_dim), computed
    once on the driver and embedded as a literal — never shuffled."""
    import hashlib

    def sign(j: int, i: int) -> int:
        h = hashlib.md5(f"{seed}:{j},{i}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1

    return [[sign(j, i) for i in range(in_dim)] for j in range(out_dim)]


def jl_project(
    vecs: DataFrame,
    out_dim: int,
    in_dim: int,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection (Achlioptas 2003): reduce
    ``in_dim`` embeddings to ``out_dim`` with a +-1 sign matrix — the
    standard cheap pre-pass before LSH/IVF when the raw dimension makes
    bucket hashing or codebook training expensive. Distances are
    preserved within (1 +- eps) with eps ~ sqrt(8 ln n / out_dim).

    Exactness contract: inputs quantize to u6 fixed point
    (floor(x * 1e6 + 0.5), exact bigints), the projection is a +-1
    integer dot product, so every output component is an EXACT bigint
    under any partitioning — the full result is hash-verifiable.
    The plan is a pure projection (zero shuffles, zero Python): the sign
    matrix embeds as a nested array literal evaluated by codegen.

    Returns (id_col, j, y) flattened — one row per output component."""
    m = jl_sign_matrix(out_dim, in_dim, seed)
    mat = F.array(*[
        F.array(*[F.lit(v).cast("bigint") for v in row]) for row in m
    ])
    xu = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("bigint"),
    )
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(mat[j], xu, lambda s, x: s * x),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
    )
    return vecs.select(
        F.col(id_col), F.posexplode(comp).alias("j", "y")
    )


def quantize_embeddings(
    vecs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 scalar quantization — the storage/bandwidth pass
    every large vector store applies before ANN (q = round(x / scale *
    127) with scale = max|x| per vector, the FAISS ScalarQuantizer
    QT_8bit_direct shape). 64-dim float32 drops 4x to 64 bytes.

    Exactness contract: on u6 fixed-point inputs the quantizer is the
    exact rational round-half-up q = floor((x*254 + s) / (2s)) evaluated
    through one IEEE double division of exact integers — deterministic
    on any engine. Zero vectors (scale 0) quantize to all-NULL
    components rather than dividing. Pure projection, zero shuffles.

    Returns (id_col, scale_u6, i, q) flattened, q in [-127, 127]."""
    xu = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("bigint"),
    )
    scale = F.array_max(F.transform(xu, lambda v: F.abs(v)))
    q = F.transform(
        xu,
        lambda x: F.when(
            scale > 0,
            F.floor(
                (x * 254 + scale).cast("double") / (2.0 * scale.cast("double"))
            ).cast("int"),
        ),
    )
    return vecs.select(
        F.col(id_col),
        scale.alias("scale_u6"),
        F.posexplode(q).alias("i", "q"),
    )
