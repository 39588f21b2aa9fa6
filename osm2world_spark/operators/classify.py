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


def perceptron_epoch(
    docs: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    biases: list[int],
    n_buckets: int,
    lr: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "hash",
) -> tuple[DataFrame, DataFrame]:
    """ONE synchronous batch-perceptron epoch over the corpus — the
    distributed TRAINING step for the hashed linear model, so the
    quality-classifier loop (label a seed set, train, filter, repeat —
    the CCNet / FineWeb-Edu recipe) never leaves the cluster.

    Multiclass perceptron update (Rosenblatt 1958; the multiclass /
    structured form of Collins 2002): for every document the current
    model misclassifies, add the document's feature vector to the gold
    class row and subtract it from the predicted class row. Under this
    engine's score form ``s_c = sum_t W[bucket(t), c] + n_tokens * b_c``
    the features are per-token (one-hot bucket + constant bias feature),
    so the batch update is

        dW[b, c]  = lr * sum_{wrong docs} cnt(doc, b) * (1[y=c] - 1[pred=c])
        db[c]     = lr * sum_{wrong docs} n_tokens    * (1[y=c] - 1[pred=c])

    Everything is fixed-point INTEGER arithmetic, so the update is exact
    and independent of partitioning / delivery order — the same
    hash-verification contract as inference.

    Relational shape (the scale story): scoring is ``hashed_linear_scores``
    (one corpus shuffle); ``labels`` joins on doc_id (hash join, shards
    with the corpus); the gradient re-explodes ONLY the misclassified
    documents' tokens and aggregates by bucket — an exchange whose
    distinct-key count is ``n_buckets`` (model-sized, map-side combine
    collapses it before the wire). The weight merge is a full outer join
    of two model-sized tables. No collect anywhere; per-epoch cost is
    two corpus passes regardless of model size.

    ``labels``: ``(doc_id, y: int)`` gold classes. Returns
    ``(new_weights, stats)`` where ``new_weights`` has the input
    ``WEIGHTS_COLS`` schema (buckets whose every class weight is zero are
    kept — occupancy is monotone, which keeps epoch chaining cheap) and
    ``stats`` is one row ``(n_scored, n_wrong, db: array<bigint>)``
    carrying the bias update and the epoch error count.
    """
    n_classes = len(biases)
    scored = hashed_linear_scores(
        docs, weights, biases, n_buckets, text_col, id_col, key
    )
    wrong = (
        scored.join(labels.select(F.col(id_col).alias("doc_id"), "y"), "doc_id")
        .where(F.col("label") != F.col("y"))
        .select("doc_id", "n_tokens", "y", F.col("label").alias("pred"))
    )

    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt"))
        .join(wrong.select("doc_id", "y", "pred"), "doc_id")
        .select(
            "y", "pred", F.explode(F.split(F.col("_txt"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .select("y", "pred", hash_bucket(F.col("tok"), n_buckets, key).alias("bucket"))
    )
    sign = [
        (
            F.when(F.col("y") == c, F.lit(int(lr))).otherwise(F.lit(0))
            + F.when(F.col("pred") == c, F.lit(-int(lr))).otherwise(F.lit(0))
        ).cast("bigint")
        for c in range(n_classes)
    ]
    deltas = toks.groupBy("bucket").agg(
        *[F.sum(sign[c]).alias(f"_d{c}") for c in range(n_classes)]
    )

    merged = weights.select(*WEIGHTS_COLS).join(deltas, "bucket", "full")
    new_ws = F.array(
        *[
            (
                F.coalesce(F.element_at("ws", c + 1), F.lit(0).cast("bigint"))
                + F.coalesce(F.col(f"_d{c}"), F.lit(0).cast("bigint"))
            ).cast("bigint")
            for c in range(n_classes)
        ]
    )
    new_weights = merged.select("bucket", new_ws.alias("ws"))

    db = [
        F.coalesce(
            F.sum(
                F.col("n_tokens")
                * (
                    F.when(F.col("y") == c, F.lit(int(lr))).otherwise(F.lit(0))
                    + F.when(F.col("pred") == c, F.lit(-int(lr))).otherwise(
                        F.lit(0)
                    )
                )
            ),
            F.lit(0),
        ).cast("bigint")
        for c in range(n_classes)
    ]
    stats = (
        scored.agg(F.count("*").alias("n_scored"))
        .crossJoin(
            wrong.agg(
                F.count("*").alias("n_wrong"),
                F.array(*db).alias("db"),
            )
        )
        .select("n_scored", "n_wrong", "db")
    )
    return new_weights, stats


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
