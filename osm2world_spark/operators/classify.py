"""Hashed linear text-classifier inference (fastText-style supervised).

The model-based quality/topic filter pass of modern pretraining
pipelines (fastText supervised classifiers as used by CCNet, DCLM and
FineWeb-Edu quality filtering): a document's class score is the mean of
per-token weight vectors plus a bias,

    score(doc, c) = b_c + (1/|T|) * sum_{t in T} W[bucket(t), c]

with tokens hashed into ``n_buckets`` weight rows (the fastText hashing
trick — the model never stores a vocabulary). Training the model is an
offline single-machine step (the models are a few MB); what the corpus
engine needs is INFERENCE over 10^12 documents, and that is pure
relational dataflow:

    explode tokens -> bucket hash -> broadcast join the weight table
    -> ONE groupBy(doc_id) with combine-side partial sums -> argmax.

Scale: the weight table is the model (n_buckets x n_classes rows) and
is broadcast; the only shuffle is the per-document aggregation, which
reuses the corpus partitioning. No per-row Python anywhere.

Determinism (the hash-verification contract): weights and biases are
fixed-point INTEGERS (e.g. millionths), so per-class sums are exact
bigint arithmetic under any partitioning or delivery order. Because
every class of a document shares the SAME token count, argmax over the
integer sums ``sum_c + n_tokens * b_c`` equals argmax over the means —
no division ever happens, so there is nothing to round. Ties break to
the lowest class index (fastText reports the first maximal label).

Hash families: ``key="hash"`` = xxhash64 (production);
``key="md5"`` = the engine's portable md5-prefix family, which the
DuckDB oracle restates verbatim (driver query ``classify_docs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WEIGHTS_COLS = ("bucket", "ws")  # bucket: bigint, ws: array<bigint> per class


def hash_bucket(col: Column, n_buckets: int, key: str = "hash") -> Column:
    """Token -> weight-row index in [0, n_buckets)."""
    if key == "md5":
        h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        return h % F.lit(int(n_buckets))  # u32 prefix: already non-negative
    return F.pmod(F.xxhash64(col), F.lit(int(n_buckets)))


def hashed_linear_scores(
    docs: DataFrame,
    weights: DataFrame,
    biases: list[int],
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "hash",
) -> DataFrame:
    """Score every document against the hashed linear model.

    ``weights``: ``(bucket: bigint, ws: array<bigint>)`` — one row per
    OCCUPIED bucket, ``ws[c]`` the fixed-point weight of class ``c``
    (missing buckets contribute zero, like fastText's zero-init rows).
    ``biases``: one fixed-point integer per class.

    Returns ``(doc_id, n_tokens, scores: array<bigint>, label: int)``
    where ``scores[c] = sum_t W[bucket(t), c] + n_tokens * b_c`` (the
    common-denominator form of the per-class mean) and ``label`` is the
    argmax with lowest-index tie-break. Documents with zero tokens have
    no defined mean and are omitted (both engines drop them).
    """
    n_classes = len(biases)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    j = toks.select(
        "doc_id", hash_bucket(F.col("tok"), n_buckets, key).alias("bucket")
    ).join(F.broadcast(weights.select(*WEIGHTS_COLS)), "bucket", "left")

    sums = [
        F.sum(
            F.coalesce(F.element_at("ws", c + 1), F.lit(0).cast("bigint"))
        ).alias(f"_s{c}")
        for c in range(n_classes)
    ]
    agg = j.groupBy("doc_id").agg(F.count("*").alias("n_tokens"), *sums)
    scores = F.array(
        *[
            (F.col(f"_s{c}") + F.col("n_tokens") * F.lit(int(biases[c]))).cast(
                "bigint"
            )
            for c in range(n_classes)
        ]
    )
    out = agg.select("doc_id", "n_tokens", scores.alias("scores"))
    # first maximal index (0-based): array_position finds the first match
    return out.select(
        "doc_id",
        "n_tokens",
        "scores",
        (F.array_position("scores", F.array_max("scores")) - 1)
        .cast("int")
        .alias("label"),
    )


def classifier_filter(
    scored: DataFrame, keep_label: int, min_margin: int = 0
) -> DataFrame:
    """Keep documents the model assigns ``keep_label``; optional margin
    (fixed-point, same scale x n_tokens as the scores) over the best
    OTHER class — the precision knob quality-filter pipelines expose
    (e.g. FineWeb-Edu keeps score >= threshold, not just argmax)."""
    others = F.array_max(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size("scores") - 1),
                lambda i: F.when(i != keep_label, F.element_at(
                    "scores", i + 1)),
            ),
            lambda v: v.isNotNull(),
        )
    )
    keep = F.element_at("scores", keep_label + 1)
    # single-class model: no "other" class exists, the margin condition
    # is vacuously true (array_max of [] is NULL, which must not reject)
    margin_ok = F.when(
        F.size("scores") > 1, keep - others >= F.lit(min_margin)
    ).otherwise(F.lit(True))
    return scored.where((F.col("label") == keep_label) & margin_ok)
