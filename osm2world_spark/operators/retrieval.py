"""BM25 ranked retrieval over the documents table.

The retrieval primitive a training-data pipeline needs for search-based
decontamination ("which training docs score highest against this eval
question") and for retrieval-augmented data selection. Okapi BM25
(Robertson et al., TREC-3) with the Lucene idf variant.

Scale shape (100 TB corpus, small query set):
- postings are ONE explode + groupBy(doc_id, term) with map-side combine
  (document length rides along as a group-constant aggregate, no extra
  join against the corpus);
- the query-term table is broadcast, so the corpus-side match is a
  broadcast hash join: only postings whose term appears in some query
  ever shuffle again;
- document frequencies are computed AFTER that match — the groupBy key
  set is bounded by |distinct query terms|, not the vocabulary — and
  broadcast back;
- corpus stats (N, avgdl) are a 1-row aggregate cross-joined in, never
  a driver action;
- final score/top-k is a groupBy + window over query_id, both bounded
  by (queries x matching docs).

Determinism: per-(term, doc) contributions are snapped to micro-units
BEFORE the sum, so the per-query score is an integer SUM — independent
of accumulation order (a raw double sum over postings is not, and any
engine is free to reorder it). idf="lucene" is ln(1 + (N-df+.5)/(df+.5))
(production; ln() can drift by ulps between libm and the JVM);
idf="rational" drops the log — (N-df+.5)/(df+.5) is pure IEEE ratio
arithmetic, bit-identical in every engine, monotone per term on the
same df, so thresholds just live on a different scale. The oracle mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import micro


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "lucene",
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query_id, doc_id, n_terms_hit, score_u6, rk) for rk <= k.

    Query terms are deduplicated (unit query weight — the standard
    document-side BM25; per-term query weighting would add the k3 term).
    Ties break on doc_id ascending.
    """
    if idf not in ("lucene", "rational"):
        raise ValueError("idf must be 'lucene' or 'rational'")

    # dl counts exactly the tokens the postings index (split + drop
    # empties) — a length-arithmetic token count would inflate dl on
    # runs of whitespace relative to tf and skew the length norm
    dl = (
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
        .cast("double")
    )
    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            dl.alias("dl"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.split(F.col(query_text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )

    # corpus-side match first: bounds every later key set by the query
    # vocabulary. Broadcast is safe by construction (queries are small).
    matched = postings.join(F.broadcast(qterms), "term")

    dfreq = matched.select("term", "doc_id").distinct().groupBy("term").agg(
        F.count("*").cast("double").alias("df_t")
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(dl).alias("avgdl"),
    )

    ratio = (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    idf_col = F.log(ratio + 1.0) if idf == "lucene" else ratio
    contrib = idf_col * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms_hit"),
            F.sum(micro(contrib)).alias("score_u6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_u6").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w).cast("int")).where(
        F.col("rk") <= k
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: list[str],
    max_block_ratio: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, n_blocked, block_ratio_u6, keep): the
    blocklist hygiene pass (the C4 "List of Dirty, Naughty ..." rule,
    Raffel et al. 2020 §2.2 — any listed word drops the document at the
    default max_block_ratio=0.0; looser corpora raise the ratio).

    The blocklist is a Column literal array, so the whole filter is a
    shuffle-free projection (Scan + Project, same plan class as the
    Bloom probe in sketches.py) — no join, no explode: the per-token
    membership test runs inside one higher-order filter over the split
    array, JVM-side.
    """
    toks = F.split(F.col(text_col), " ")
    lit_block = F.array(*[F.lit(w) for w in sorted(set(blocklist))])
    n_tok = F.size(F.filter(toks, lambda t: t != ""))
    n_blocked = F.size(F.filter(toks, lambda t: F.array_contains(lit_block, t)))
    # try_divide: an empty/whitespace-only doc has n_tok=0 and must flag
    # keep=false, not abort the job under ANSI mode
    ratio = F.try_divide(n_blocked.cast("double"), n_tok)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("int").alias("n_tokens"),
        n_blocked.cast("int").alias("n_blocked"),
        micro(ratio).alias("block_ratio_u6"),
        ((n_tok > 0) & (ratio <= max_block_ratio)).alias("keep"),
    )
