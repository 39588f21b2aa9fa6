"""End-to-end training-data curation plan: the composition every LLM
pretraining corpus runs, declared as ONE DataFrame plan so Catalyst
sees the whole thing (filters push into the scan, stages share
partitionings, nothing materializes between steps).

Stages (each individually oracle-checked elsewhere; this module is the
composition):
1. quality gate  — Gopher document rules (operators/quality.py);
2. exact dedup   — first-occurrence-wins on the text digest: the
   lowest KEPT doc id per identical text is canonical, the rest drop
   (a quality-dropped doc must not steal canonicality);
3. split         — leakage-safe hash-of-id train/val assignment
   (same md5 unit-hash rule as operators/packing.sample_split);
4. packing       — token-budget bin ids for the surviving TRAIN docs
   (same next-fit rule as operators/packing.pack_sequences); val and
   dropped docs keep bin_id NULL.

Output: one row per input document with the full audit trail
(keep_quality, is_canonical, split, bucket, bin_id, n_tokens) — the
lineage-style contract the engine's tile pipeline uses: downstream
consumers filter, nothing is silently dropped.

Scale shape — TWO exchanges total, zero joins, for any corpus size:
- quality is a shuffle-free projection (pure Column arithmetic);
- dedup is one window partitioned by xxhash64(text) (the digest, not
  the text, is the shuffle key; identical-text hot keys collapse in
  the window's partial sort);
- split is a projection gated on is_canonical;
- packing reuses ONE window partitioned by the id-hash bucket: every
  row participates, but non-train rows contribute ZERO tokens to the
  running sum, so the cumulative total at each train row — and hence
  its bin id — is bit-identical to running pack_sequences on the
  train subset alone, without a join to rebuild the audit trail.
The join-based composition of the same four stages planned 18
exchanges; this formulation plans 2 (pinned by test_curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.packing import _unit_hash
from ..operators.quality import gopher_quality
from ..operators.text import token_count


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    budget_tokens: int = 512,
    n_buckets: int = 16,
    **quality_kwargs,
) -> DataFrame:
    """Quality -> dedup -> split -> pack in one two-exchange plan.
    quality_kwargs forward to gopher_quality (corpora without natural
    stop words set min_stop_words=0, etc.)."""
    q = gopher_quality(
        docs, text_col, id_col, extra_cols=[text_col], **quality_kwargs
    ).select(id_col, text_col, F.col("keep").alias("keep_quality"))

    # exchange 1: digest window — lowest kept id per identical text
    wd = Window.partitionBy(F.xxhash64(F.col(text_col)))
    min_kept = F.min(F.when(F.col("keep_quality"), F.col(id_col))).over(wd)
    d = q.withColumn(
        "is_canonical",
        F.coalesce(
            F.col("keep_quality") & (F.col(id_col) == min_kept), F.lit(False)
        ),
    )

    # split: pure projection, only canonical survivors get one
    u = _unit_hash(F.col(id_col))
    d = d.withColumn(
        "split",
        F.when(
            F.col("is_canonical"),
            F.when(u < val_frac, F.lit("val")).otherwise(F.lit("train")),
        ),
    )

    # exchange 2: pack window. Non-train rows ride along with zero
    # contribution: ordering is (contribution desc, id), so among train
    # rows the order is exactly pack_sequences' (n_tokens desc, id) and
    # the zero rows never move the running sum — bin ids match the
    # train-subset pack bit-for-bit.
    is_train = F.col("split") == "train"
    n_tok = token_count(F.col(text_col)).cast("bigint")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_buckets),
    ).cast("int")
    d = d.withColumn("_contrib", F.when(is_train, n_tok).otherwise(F.lit(0))).withColumn(
        "_bucket", bucket
    )
    wp = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_contrib").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_contrib").over(wp)
    return d.select(
        id_col,
        "keep_quality",
        "is_canonical",
        "split",
        F.when(is_train, F.col("_bucket")).alias("bucket"),
        F.when(is_train, F.floor((cum - F.col("_contrib")) / F.lit(budget_tokens)))
        .cast("bigint")
        .alias("bin_id"),
        F.when(is_train, n_tok).alias("n_tokens"),
    )


def curate_model(
    docs: DataFrame,
    weights: DataFrame,
    biases: list[int],
    model_buckets: int,
    keep_label: int,
    lm_cutoffs: tuple[float, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    budget_tokens: int = 512,
    n_buckets: int = 16,
    key: str = "hash",
    **quality_kwargs,
) -> DataFrame:
    """The MODEL-GATED curation composition — `curate`'s pipeline with
    the two corpus-model gates modern pretraining recipes add between
    the rule gate and dedup (the CCNet / DCLM / FineWeb-Edu shape):

    1. rule gate      — Gopher document rules (projection);
    2. model gate     — hashed linear classifier argmax == keep_label
                        (operators/classify.py: broadcast model join +
                        one per-doc aggregation);
    3. LM gate        — corpus bigram familiarity vs fixed cutoffs
                        (operators/text.ngram_lm_score evidence +
                        operators/quality.perplexity_buckets rule);
                        'tail' drops, 'head'/'middle' pass;
    4. exact dedup    — first-occurrence-wins among docs passing ALL
                        gates (canonicality can't be stolen by a
                        dropped doc);
    5. split + pack   — identical to `curate` (same zero-contribution
                        window trick).

    Unlike `curate` (two exchanges, zero joins), the model gates NEED
    corpus-level context: the classifier aggregates per doc and the LM
    builds a corpus count table, each joining back on doc_id. The plan
    costs a bounded number of extra linear exchanges (pinned by
    test_curation.py) — all keyed on doc_id or the gram key, nothing
    quadratic, no Python anywhere. Model tables broadcast.

    Output: one row per input document — (doc_id, keep_quality,
    keep_model, lm_bucket, is_canonical, split, bucket, bin_id,
    n_tokens): the same audit-trail contract as `curate` plus the two
    model verdicts.
    """
    from ..operators.classify import hashed_linear_scores
    from ..operators.text import ngram_lm_score

    q = gopher_quality(
        docs, text_col, id_col, extra_cols=[text_col], **quality_kwargs
    ).select(id_col, text_col, F.col("keep").alias("keep_quality"))

    scored = hashed_linear_scores(
        docs, weights, biases, model_buckets, text_col, id_col, key
    ).select(F.col("doc_id").alias(id_col), "label")
    lm = ngram_lm_score(docs, n=2, text_col=text_col, id_col=id_col).select(
        F.col("doc_id").alias(id_col),
        (F.col("sum_freq").cast("double") / F.col("n_ngrams").cast("double"))
        .alias("_fam"),
    )

    d = q.join(scored, id_col, "left").join(lm, id_col, "left")
    c1, c2 = float(lm_cutoffs[0]), float(lm_cutoffs[1])
    if not c1 >= c2:
        raise ValueError("lm_cutoffs must be (head_min, middle_min) descending")
    lm_bucket = (
        F.when(F.col("_fam") >= c1, F.lit("head"))
        .when(F.col("_fam") >= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    keep_model = F.coalesce(F.col("label") == keep_label, F.lit(False))
    d = d.withColumn("keep_model", keep_model).withColumn(
        "lm_bucket", lm_bucket
    )
    keep_all = (
        F.col("keep_quality") & F.col("keep_model")
        & (F.col("lm_bucket") != "tail")
    )

    wd = Window.partitionBy(F.xxhash64(F.col(text_col)))
    min_kept = F.min(F.when(keep_all, F.col(id_col))).over(wd)
    d = d.withColumn(
        "is_canonical",
        F.coalesce(keep_all & (F.col(id_col) == min_kept), F.lit(False)),
    )

    u = _unit_hash(F.col(id_col))
    d = d.withColumn(
        "split",
        F.when(
            F.col("is_canonical"),
            F.when(u < val_frac, F.lit("val")).otherwise(F.lit("train")),
        ),
    )

    is_train = F.col("split") == "train"
    n_tok = token_count(F.col(text_col)).cast("bigint")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_buckets),
    ).cast("int")
    d = d.withColumn("_contrib", F.when(is_train, n_tok).otherwise(F.lit(0))).withColumn(
        "_bucket", bucket
    )
    wp = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_contrib").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("_contrib").over(wp)
    return d.select(
        id_col,
        "keep_quality",
        "keep_model",
        "lm_bucket",
        "is_canonical",
        "split",
        F.when(is_train, F.col("_bucket")).alias("bucket"),
        F.when(is_train, F.floor((cum - F.col("_contrib")) / F.lit(budget_tokens)))
        .cast("bigint")
        .alias("bin_id"),
        F.when(is_train, n_tok).alias("n_tokens"),
    )
