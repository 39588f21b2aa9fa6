"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling";
public algorithm, the hashed-n-gram variant used for LLM pretraining
data curation).

Pipeline shape, all relational:
1. hashed unigram features: every token hashes into one of B buckets
   (md5 unit hash — the engine's portable family);
2. two bucket distributions, one over the TARGET slice (the data you
   want more of) and one over the RAW corpus, Laplace-smoothed;
3. every raw document scores sum_b count_doc[b] * (log p_target[b] -
   log p_raw[b]) — its hashed-feature log-likelihood ratio;
4. selection = top-k by score (or Gumbel-perturbed score; the
   deterministic top-k is exposed here, weighted_sample_topk supplies
   the randomized variant).

Scale: the distributions are B-row aggregates (B = 10^4 in the paper,
64 in tests) — a broadcast join against per-doc bucket counts; the
whole plan is two aggregations and one broadcast join, no collect, no
Python. Raising B never changes the shuffle shape, only the broadcast
width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Portable token -> bucket hash (md5 prefix, like dedup._hash60)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def doc_bucket_counts(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, c): hashed unigram counts per document. One
    explode + one map-side-combining aggregation."""
    flat = F.replace(F.col(text_col), F.lit("\n"), F.lit(" "))
    toks = docs.select(
        F.col(id_col), F.explode(F.split(flat, " ")).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.select(id_col, _bucket(F.col("tok"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def bucket_distribution(
    docs: DataFrame,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, logp): Laplace-smoothed log bucket probabilities over a
    corpus slice. Buckets with zero mass still appear (the smoothing
    floor), built from an in-plan bucket spine so no bucket is missing."""
    counts = (
        doc_bucket_counts(docs, n_buckets, text_col, id_col)
        .groupBy("bucket")
        .agg(F.sum("c").alias("n"))
    )
    spine = (
        docs.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
    )
    total = spine.agg(F.sum("n").alias("total"))
    return spine.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("n") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha * n_buckets))
        ).alias("logp"),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, score): hashed-feature log-likelihood ratio of
    every raw document under the target vs raw distributions. The two
    B-row distributions broadcast-join the per-doc bucket counts; one
    final per-doc aggregation."""
    p_t = bucket_distribution(target, n_buckets, alpha, text_col, id_col)
    p_r = bucket_distribution(raw, n_buckets, alpha, text_col, id_col)
    ratio = p_t.alias("t").join(p_r.alias("r"), "bucket").select(
        "bucket", (F.col("t.logp") - F.col("r.logp")).alias("llr")
    )
    dc = doc_bucket_counts(raw, n_buckets, text_col, id_col)
    return (
        dc.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("llr")).alias("score"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 64,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic DSIR selection: the k raw documents with the
    highest importance score (ties break by id). Returns
    (doc_id, n_tokens, score, sel_rank)."""
    scores = dsir_scores(raw, target, n_buckets, alpha, text_col, id_col)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scores.withColumn("sel_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sel_rank") <= k)
    )
