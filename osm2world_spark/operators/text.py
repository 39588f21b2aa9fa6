"""Text-analysis operators for the documents table (training-data pipeline).

These are the generic large-corpus operators a 100 TB document pipeline
needs alongside the spatial engine: token counting, quality scoring,
language id, fingerprinting. All pure Column expressions (whole-stage
codegen; no Python) and all expressed so an ANSI-SQL oracle can reproduce
them bit-for-bit (arithmetic on lengths/replaces rather than regex, which
differs subtly between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace token count via replace-count arithmetic:
    len(text) - len(replace(text,' ','')) + 1 — identical semantics in any
    ANSI engine (unlike split(), whose empty-string behavior varies)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1).cast("int")


def substring_count(text: Column, sub: str) -> Column:
    """Occurrences of `sub` via length arithmetic."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))) / len(sub)
    ).cast("int")


def micro(x) -> Column:
    """Fixed-point snap to micro-units: floor(x * 1e6 + 0.5) as bigint.
    The engine's cross-engine-stable determinism convention (the same idiom
    as the reference's mm coordinate snap, MetricMapProjection.java:37-39):
    identical doubles in any engine produce identical integers, unlike
    round(), whose half-boundary behavior differs between engines."""
    return F.floor(x * 1000000.0 + 0.5).cast("bigint")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len_u6 in micro-units)."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    n_chars = F.length(t)
    avg_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        micro(avg_len).alias("avg_token_len_u6"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/stopword/repetition quality heuristics:
    (doc_id, n_tokens, stopword_ratio, mean_token_len, quality). The score
    is a deterministic arithmetic blend — rank-stable, SQL-reproducible."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    stop = sum(substring_count(t, f" {w} ") for w in ("the", "and", "of", "a"))
    stop_ratio = stop.cast("double") / n_tokens
    mean_len = (F.length(t) - (n_tokens - 1)).cast("double") / n_tokens
    quality = (
        F.least(F.lit(1.0), n_tokens.cast("double") / 64.0) * 0.5
        + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.3
        + F.when((mean_len >= 3.0) & (mean_len <= 8.0), 0.2).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        micro(stop_ratio).alias("stopword_ratio_u6"),
        micro(mean_len).alias("mean_token_len_u6"),
        micro(quality).alias("quality_u6"),
    )


# marker words per language for the n-gram-heuristic language id; counts of
# these decide the label (deterministic CASE cascade)
_LANG_MARKERS = {
    "en": (" the ", " and "),
    "es": (" el ", " la "),
    "de": (" der ", " und "),
    "fr": (" le ", " et "),
}


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language id: the language whose markers occur most often
    wins; ties resolve in fixed (en, es, de, fr) order; no markers ->
    'unknown'. (doc_id, pred_lang)."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    counts = {
        lang: sum(substring_count(t, m) for m in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.lit("unknown")
    for lang in reversed(list(_LANG_MARKERS)):
        pred = F.when((counts[lang] == best) & (best > 0), lang).otherwise(pred)
    return docs.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the text plus a 60-bit numeric prefix
    (usable as a join/sort key). (doc_id, fp_md5, fp60)."""
    h = F.md5(F.col(text_col))
    fp60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    return docs.select(F.col(id_col), h.alias("fp_md5"), fp60.alias("fp60"))


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition quality filters (the public Gopher-style rules): per doc,
    the fraction of word bigrams occupied by the single most frequent
    bigram (`top_bigram_frac_u6`), the fraction of distinct bigrams
    (`distinct_bigram_frac_u6`), and the most frequent bigram's count
    (`top_bigram_n`). Highly templated / looping documents score a high
    top-bigram fraction and a low distinct fraction and get dropped by a
    threshold filter downstream.

    Scale shape: explode to (doc, bigram) -> ONE partial-aggregated
    groupBy to (doc, bigram, n) -> ONE groupBy to per-doc stats. Both
    aggregations map-side combine; nothing is quadratic in document count
    or length. Pure Column arithmetic, ANSI-portable (split on single
    spaces mirrors the oracle's string_split)."""
    toks = F.split(F.col(text_col), " ")
    k = F.size(toks) - 1
    bigrams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1]),
        ),
    ).otherwise(F.array(F.col(text_col)))
    bg = docs.select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("bg"))
    counts = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        micro(F.max("n") / F.sum("n")).alias("top_bigram_frac_u6"),
        micro(F.count("*") / F.sum("n")).alias("distinct_bigram_frac_u6"),
        F.max("n").cast("bigint").alias("top_bigram_n"),
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k TF-IDF terms: (doc_id, term, score_u6, rk).

    idf is the RATIONAL inverse document frequency (N + 1) / (df + 1)
    rather than its logarithm: integer-ratio division and multiplication
    are bit-identical IEEE ops in every engine, while ln() differs by ulps
    between libm and the JVM — through the micro() fixed-point snap a
    one-ulp drift could flip a floor boundary or a rank. Monotonicity per
    term is the same, thresholds just live on a different scale.

    Scale shape: explode -> (doc, term) count [shuffle 1, map-side
    combine] -> term document-frequency [shuffle 2, vocabulary-sized] ->
    hash join back (vocabulary can be huge at 100 TB; no forced
    broadcast, AQE picks one when it fits) -> per-doc top-k window.
    N comes from a 1-row aggregate cross-joined in, not a driver action."""
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            micro(
                F.col("tf").cast("double")
                * (F.col("n_docs") + 1.0)
                / (F.col("df_t").cast("double") + 1.0)
            ).alias("score_u6"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_u6").desc(), F.col("term").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def ngram_lm_score(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram language-model familiarity score (the perplexity-proxy
    quality signal of a training-data pipeline): per document, the mean
    add-one-smoothed log-probability of its word n-grams under the
    corpus's own n-gram counts, plus the exact integer evidence
    (n_ngrams, sum of corpus frequencies of the doc's n-grams, vocabulary
    size) so the score is auditable.

    Scale shape: pass 1 builds the corpus n-gram count table (explode +
    groupBy = ONE shuffle with map-side combine); pass 2 joins each doc's
    n-grams to the counts on the n-gram key (plain hash join — the count
    table shards with the corpus, nothing collects) and folds per doc.
    Skewed head n-grams are bounded by the combine: a count row per
    distinct n-gram, not per occurrence.
    """
    from .dedup import _shingles

    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_shingles(text_col, n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("freq"))
    vocab = counts.agg(
        F.count("*").alias("vocab"), F.sum("freq").alias("total_grams")
    )
    per_doc = (
        grams.join(counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum("freq").alias("sum_freq"),
            F.sum(F.log(F.col("freq") + 1.0)).alias("_sum_log_num"),
        )
    )
    return per_doc.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        F.col("sum_freq").cast("bigint").alias("sum_freq"),
        F.col("vocab").cast("bigint").alias("vocab"),
        # mean log P(gram) with add-one smoothing over the corpus unigram
        # model of n-grams: log((freq+1) / (total+vocab)) averaged
        (
            (F.col("_sum_log_num") - F.col("n_ngrams") * F.log(F.col("total_grams") + F.col("vocab")))
            / F.col("n_ngrams")
        ).alias("mean_logp"),
    )


def stupid_backoff_score(
    docs: DataFrame,
    min_count: int = 2,
    alpha_u6: int = 400000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stupid-backoff bigram language-model score (Brants et al. 2007,
    "Large Language Models in Machine Translation", §4) — the
    perplexity-grade corpus-LM quality signal (what CCNet computes with
    a KenLM model), trained and applied entirely in-plan:

        S(w_i | w_{i-1}) = f(w_{i-1} w_i) / f(w_{i-1})   if bigram kept
                         = alpha * f(w_i) / N             otherwise

    with the count cutoff Brants applies at scale: bigrams seen fewer
    than ``min_count`` times are pruned from the model, so rare
    continuations genuinely back off (a corpus scored under its own
    unpruned counts would never back off). ``alpha_u6`` is the backoff
    penalty in millionths (default 0.4, the paper's constant).

    Relational shape (100 TB): pass 1 builds the unigram and pruned
    bigram count tables (two explode+groupBy exchanges with map-side
    combine — count rows per DISTINCT gram, not per occurrence); pass 2
    joins each doc's bigrams to the model on the gram / prefix / last
    keys (plain hash joins that shard with the corpus; the head of the
    Zipf curve is exactly what the combine collapses) and folds per
    document. Nothing collects; the model never leaves the cluster.

    Returns one row per document with at least two tokens:
    ``(doc_id, n_bigrams, n_hits, n_backoffs, sum_hit_num, sum_hit_den,
    sum_backoff_num, logscore)`` — the integer columns are exact
    (hash-verifiable on any engine); ``logscore`` is the float
    sum of ln S with ln left to the pytest oracle, mirroring
    ``ngram_lm_score``'s evidence/score split.
    """
    from .dedup import _shingles

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    uni = toks.groupBy("tok").agg(F.count("*").alias("uf"))
    totals = uni.agg(F.sum("uf").alias("n_total"))

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingles(text_col, 2)).alias("gram"),
    ).where(F.size(F.split(F.col(text_col), " ")) >= 2)
    bi = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("bf"))
        .where(F.col("bf") >= int(min_count))
    )

    parts = grams.select(
        "doc_id",
        "gram",
        F.split(F.col("gram"), " ")[0].alias("_prev"),
        F.split(F.col("gram"), " ")[1].alias("_cur"),
    )
    j = (
        parts.join(bi, "gram", "left")
        .join(uni.select(F.col("tok").alias("_prev"), F.col("uf").alias("pf")), "_prev")
        .join(uni.select(F.col("tok").alias("_cur"), F.col("uf").alias("cf")), "_cur")
    )
    hit = F.col("bf").isNotNull()
    alpha = F.lit(int(alpha_u6)) / F.lit(1000000.0)
    per_doc = j.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_hits"),
        F.sum(F.when(hit, 0).otherwise(1)).cast("bigint").alias("n_backoffs"),
        F.sum(F.when(hit, F.col("bf")).otherwise(0)).cast("bigint").alias("sum_hit_num"),
        F.sum(F.when(hit, F.col("pf")).otherwise(0)).cast("bigint").alias("sum_hit_den"),
        F.sum(F.when(hit, 0).otherwise(F.col("cf"))).cast("bigint").alias("sum_backoff_num"),
        F.sum(
            F.when(
                hit, F.log(F.col("bf").cast("double") / F.col("pf"))
            ).otherwise(F.log(alpha * F.col("cf")))
        ).alias("_lg"),
    )
    return per_doc.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "n_bigrams",
        "n_hits",
        "n_backoffs",
        "sum_hit_num",
        "sum_hit_den",
        "sum_backoff_num",
        (F.col("_lg") - F.col("n_backoffs") * F.log(F.col("n_total").cast("double")))
        .alias("logscore"),
    )


# conservative patterns (explicit character classes only, so the Java-regex
# engine in Spark and RE2 in DuckDB agree symbol for symbol)
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
URL_RE = "https?://[^ \\t\\n]+"


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
) -> DataFrame:
    """PII / URL scrubbing (the standard pre-training text hygiene pass):
    masks email addresses and URLs with placeholder tokens and surfaces the
    per-doc match counts as audit columns. Pure Column regexp arithmetic —
    whole-stage codegen, no Python, trivially linear at any corpus size.

    Counts are computed BEFORE masking (a URL containing an @ would
    otherwise double-mask); URLs are masked first so an email inside a URL
    counts once, as part of the URL."""
    t = F.col(text_col)
    n_urls = F.size(F.split(t, URL_RE, -1)) - 1
    scrub_u = F.regexp_replace(t, URL_RE, url_token)
    n_emails = F.size(F.split(scrub_u, EMAIL_RE, -1)) - 1
    scrubbed = F.regexp_replace(scrub_u, EMAIL_RE, email_token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_urls.cast("int").alias("n_urls"),
        n_emails.cast("int").alias("n_emails"),
        scrubbed.alias("scrubbed"),
    )
