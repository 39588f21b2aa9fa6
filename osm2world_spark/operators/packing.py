"""Training-batch assembly operators: deterministic corpus splits and
sequence packing — the last mile between a cleaned corpus and a
pretraining data loader.

Both are pure Column/window arithmetic (no UDFs) and deliberately use the
md5-prefix hash (the engine's cross-engine-portable family, see
dedup._hash60) so the driver oracle reproduces every assignment bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import token_count


def _unit_hash(col) -> F.Column:
    """Deterministic uniform [0, 1) from the md5 prefix of a column's
    string form — stable across engines, seeds nothing."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(float(1 << 32))
    )


def sample_split(
    docs: DataFrame,
    val_frac: float = 0.1,
    test_frac: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split in {train,val,test}): hash-of-id thresholding — the
    standard leakage-safe split (membership depends only on the id, so
    re-runs, corpus growth, and distributed execution can't reshuffle
    membership the way sampling by position would)."""
    u = _unit_hash(F.col(id_col))
    split = (
        F.when(u < val_frac, F.lit("val"))
        .when(u < val_frac + test_frac, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.select(F.col(id_col), split.alias("split"))


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, bin_id, n_tokens): group documents into
    ~budget_tokens bins (sequence packing for pretraining batches).

    Scale shape: a GLOBAL first-fit pack is inherently sequential, so the
    corpus is hash-bucketed first (each bucket ~1/n_buckets of the data —
    size n_buckets so a bucket fits one task) and packed independently
    per bucket with the next-fit rule: docs ordered by (n_tokens desc,
    id), bin = floor(exclusive-prefix-sum / budget). One window over the
    bucket partition — no global sort, no driver loop; bins can overflow
    by at most one document (the standard streaming-pack tolerance).
    """
    n_tok = token_count(F.col(text_col))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_buckets),
    ).cast("int")
    sized = docs.select(
        F.col(id_col), bucket.alias("bucket"), n_tok.cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("n_tokens").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        id_col,
        "bucket",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget_tokens))
        .cast("bigint")
        .alias("bin_id"),
        "n_tokens",
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "event_type",
    id_col: str = "event_id",
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the unit hash of
    its id falls below its stratum's fraction. Unlike sampleBy, membership
    is a pure function of the id — re-runs, added partitions, and engine
    choice cannot change which rows are kept (the leakage-safe property
    sample_split relies on), and the filter pushes down as an ordinary
    predicate (no sampler node, no RNG state per partition)."""
    u = _unit_hash(F.col(id_col))
    thresh = None
    for k, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == k
        thresh = F.when(cond, F.lit(frac)) if thresh is None else thresh.when(cond, F.lit(frac))
    thresh = thresh.otherwise(F.lit(default_frac)) if thresh is not None else F.lit(default_frac)
    return df.where(u < thresh)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into token-budget chunks with overlap (the
    context-window chunking every pretraining / RAG ingest runs):
    chunk c covers tokens [c * stride, c * stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final chunk is the remainder
    (shorter, never empty), and a doc at or under the budget is one chunk.

    Pure Column algebra: tokens -> sequence of chunk starts -> slice +
    concat per chunk — one projection, no shuffle at all; chunk rows
    inherit the input partitioning.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    extra = F.greatest(n - chunk_tokens, F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("int").alias("chunk_idx"),
            (c * stride).cast("int").alias("tok_start"),
            F.least(c * stride + chunk_tokens, n).cast("int").alias("tok_end"),
            F.concat_ws(" ", F.slice(toks, c * stride + 1, chunk_tokens)).alias("chunk"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.tok_start").alias("tok_start"),
            F.col("c.tok_end").alias("tok_end"),
            F.col("c.chunk").alias("chunk"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    mask_bits: int = 4,
    key: str = "hash",
) -> DataFrame:
    """Content-defined chunking: a chunk boundary opens at token 0 and
    at every position whose k-token gram hashes to 0 mod 2^mask_bits
    (expected chunk length 2^mask_bits tokens). Because a boundary
    depends only on the k tokens at the position, an insertion or
    deletion reshifts at most the chunks it touches — downstream
    chunk-level dedup stays stable under local edits, the property
    fixed-stride chunk_documents lacks (the rolling-window boundary
    rule is the public content-defined-chunking construction, e.g.
    Muthitacharoen et al. 2001 LBFS).

    Returns (doc_id, chunk_idx, tok_start, n_tokens, chunk_text).

    key="hash" uses xxhash64 grams (production); key="md5" uses the
    portable md5-prefix family (the oracle mode).

    Scale shape: ONE exchange — the boundary-counting window partitions
    by document, and the per-(doc, chunk) groupBy reuses that
    partitioning (doc_id subsumes the grouping keys' clustering).
    """
    toks = F.split(F.col(text_col), " ")
    arr = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, (i + 1).cast("int")).alias("tok"),
            F.concat_ws(" ", F.slice(toks, i + 1, k)).alias("gram"),
        ),
    )
    t = docs.where(F.size(toks) >= 1).select(
        F.col(id_col).alias("doc_id"), F.posexplode(arr).alias("pos", "s")
    )
    if key == "md5":
        h = F.conv(F.substring(F.md5(F.col("s.gram")), 1, 15), 16, 10).cast(
            "bigint"
        )
    else:
        h = F.xxhash64(F.col("s.gram"))
    boundary = (F.col("pos") == 0) | (F.pmod(h, F.lit(1 << mask_bits)) == 0)
    chunk_idx = (
        F.sum(boundary.cast("int")).over(
            Window.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    return (
        t.select(
            "doc_id", "pos", F.col("s.tok").alias("tok"),
            chunk_idx.cast("int").alias("chunk_idx"),
        )
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.min("pos").alias("tok_start"),
            F.count("*").cast("int").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("chunk_text"),
        )
    )


def token_budget_mix(
    docs: DataFrame,
    budget,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budgeted mixture sampling: within every source, walk the
    documents in deterministic md5-hash order and keep the greedy prefix
    whose running token total stays within that source's budget — the
    data-mixing step that turns per-source weights into an actual
    pretraining subset (the Pile / Dolma mixture construction). `budget`
    is an int (same token budget for every source) or a Column computed
    from the row (per-source budgets).

    Returns every input row plus (n_tokens, mix_rank, cum_tokens, kept);
    kept rows of one source always form a prefix of its hash order, so
    re-runs with a LARGER budget only ever add documents (monotone —
    the property random re-sampling lacks).

    Scale shape: ONE exchange (the running-sum window partitioned by
    source). Hash order, not doc_id order, so the kept subset is an
    unbiased sample of the source regardless of ingest ordering."""
    b = F.lit(budget) if isinstance(budget, int) else budget
    nt = token_count(F.col(text_col))
    w = Window.partitionBy(source_col).orderBy(
        _unit_hash(F.col(id_col)), F.col(id_col)
    )
    cum = F.sum(nt).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.withColumn("n_tokens", nt.cast("int"))
        .withColumn("mix_rank", F.row_number().over(w))
        .withColumn("cum_tokens", cum.cast("bigint"))
        .withColumn("kept", F.col("cum_tokens") <= b)
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-ES (2006): each row draws u in (0,1) and scores key = u^(1/w);
    the k largest keys (per group when group_col is set) are EXACTLY a
    weighted sample without replacement. Ranking by ln(u)/w descending
    is the same order without the overflow-prone pow.

    Determinism: u comes from the md5 unit hash of the id (offset by
    half a step so u is never 0), so membership is a pure function of
    (id, weight) — the leakage-safe property of sample_split — and any
    ANSI engine reproduces the same sample. One window over the group
    partitioning; no RNG state, no sampler node.

    Weights must be > 0. Returns (group?, id, weight, samp_rank) for
    samp_rank <= k.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col)
    part = Window.partitionBy(group_col) if group_col else Window.partitionBy(F.lit(0))
    w = part.orderBy(F.col("_es_key").desc(), F.col(id_col))
    cols = ([group_col] if group_col else []) + [id_col, weight_col]
    return (
        df.select(*cols, key.alias("_es_key"))
        .withColumn("samp_rank", F.row_number().over(w).cast("int"))
        .where(F.col("samp_rank") <= k)
        .select(*cols, "samp_rank")
    )


def shard_corpus(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    key: str = "hash",
) -> DataFrame:
    """Global deterministic shuffle + shard assignment for training.

    The last step before a training run: every document (or packed
    sequence) gets a shard in [0, n_shards) and a position within it,
    both pure functions of the id — the "global shuffle" data loaders
    rely on, without an actual random permutation pass. Hash order is
    uncorrelated with source order (crawl order, tile order), so each
    shard is an unbiased sample and within-shard order is already
    shuffled; re-running on the same corpus yields byte-identical
    shards (resumable, seedless — the sample_split discipline).

    Shape: ONE window exchange (rank within shard by the same hash,
    ties by id). Write with ``.write.partitionBy("shard")`` after
    ``sortWithinPartitions("shard_pos")`` for sequential-read shards.

    key="hash" = xxhash64 (production); key="md5" = the portable
    md5-prefix family (the oracle mode, driver query ``shard_corpus``).
    """
    if key == "md5":
        h = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
    else:
        h = F.xxhash64(F.col(id_col))
    out = docs.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return out.withColumn(
        "shard_pos", (F.row_number().over(w) - 1).cast("bigint")
    ).drop("_h")


def unimax_allocation(
    counts: DataFrame,
    total_budget: int,
    epoch_cap: int,
    source_cols: tuple[str, ...] = ("source",),
    count_col: str = "n_tokens",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): given per-source token counts, a total token budget
    B, and an epoch cap E, walk sources ASCENDING by size and give each
    min(c*E, remaining / sources_remaining) — small sources get their
    full E epochs, large sources split the leftover uniformly.  This is
    the step that turns corpus statistics into the per-source budgets
    ``token_budget_mix`` consumes.

    The sequential waterfill has a closed form (once a source is
    uncapped, the uniform share stays constant and all larger sources
    are uncapped too), so the whole allocation is ONE sorted window
    pass, no driver loop:

      capped_i  <=>  c_i*E * (L-i+1) <= B - S_{i-1}      (exact ints)
      alloc_i   =    capped ? c_i*E : (R + j) DIV (L - m)

    with S the running capped spend, m the number of capped sources,
    R = B - S_m the uncapped pool, and j = i - m - 1 the 0-based rank
    among the uncapped.  (R + j) DIV u is the closed form of the
    sequential cascade floor(remaining / sources_left): the u uncapped
    sources get R DIV u each, with the R mod u leftover tokens going
    one each to the LARGEST sources — the budget is conserved exactly,
    and the whole contract is float-free integer arithmetic.

    Scale shape: the input is one row PER SOURCE (languages, domains —
    bounded at ~1e5 rows by nature, NOT by data size), so the global
    sort window is a single bounded task — the documented exception to
    the no-global-window rule, same discipline as the ANN codebook
    collects.  Compute ``counts`` distributed first:
    ``docs.groupBy(*source_cols).agg(F.sum(token_count(...)))``.

    Output: source_cols + (n_tokens, src_rank, capped, alloc_tokens,
    epochs_u6) with epochs_u6 = floor(alloc * 1e6 / count).
    """
    if total_budget < 0 or epoch_cap <= 0:
        raise ValueError("total_budget must be >= 0 and epoch_cap > 0")
    sc = list(source_cols)
    order = [F.col(count_col).asc()] + [F.col(c).asc() for c in sc]
    w = Window.orderBy(*order)
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cE = (F.col(count_col).cast("bigint") * epoch_cap).alias("_ce")
    base = counts.select(
        *sc,
        F.col(count_col).cast("bigint").alias("n_tokens"),
        cE,
    )
    ranked = base.select(
        *sc,
        "n_tokens",
        "_ce",
        F.row_number().over(w).alias("src_rank"),
        F.count(F.lit(1)).over(everything).alias("_L"),
        F.coalesce(F.sum("_ce").over(prev), F.lit(0)).alias("_s_prev"),
    )
    flagged = ranked.withColumn(
        "capped",
        F.col("_ce") * (F.col("_L") - F.col("src_rank") + 1)
        <= F.lit(total_budget) - F.col("_s_prev"),
    )
    closed = flagged.select(
        "*",
        F.sum(F.col("capped").cast("bigint")).over(everything).alias("_m"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("_ce"))).over(everything),
            F.lit(0),
        ).alias("_s_m"),
    ).withColumn(
        "_rem", F.lit(total_budget) - F.col("_s_m")
    ).withColumn("_n_rem", F.col("_L") - F.col("_m"))
    alloc = F.when(F.col("capped"), F.col("_ce")).otherwise(
        F.expr("(_rem + (src_rank - _m - 1)) DIV _n_rem")
    )
    return (
        closed.withColumn("alloc_tokens", alloc)
        .withColumn(
            "epochs_u6",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(alloc_tokens * 1000000) DIV n_tokens"),
            ),
        )
        .select(
            *sc,
            "n_tokens",
            F.col("src_rank").cast("int").alias("src_rank"),
            "capped",
            "alloc_tokens",
            "epochs_u6",
        )
    )
