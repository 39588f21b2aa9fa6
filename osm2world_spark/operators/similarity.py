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
    sim = F.round(_dot(F.col("q_vec"), F.col("n_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))), 6)
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
    sim = F.round(_dot(F.col("q_vec"), F.col("n_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))), 6)
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
