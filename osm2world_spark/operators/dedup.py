"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact: one hash-groupBy shuffle on md5(text) — map-side partial counts.
- n-gram Jaccard: shingle explode -> self-join on (group, shingle) ->
  per-pair intersection counts vs distinct-shingle counts. The join is
  keyed by shingle, so frequency-skewed shingles are the hot keys; at
  corpus scale a document-frequency cap (drop shingles with df > N) bounds
  the blow-up — exposed as `max_df`.
- MinHash+LSH: k hash functions (md5 with salt -> 60-bit ints) -> per-doc
  signature -> band buckets -> candidate pairs joining on (band, bucket
  hash) -> exact Jaccard verify. Entirely groupBy/join; no UDFs.
- SimHash: per-token 60-bit hash; per-bit +-1 sums via an explode over bit
  positions; sign -> fingerprint bit; near-dups = equal fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp_md5, n_docs, doc_ids sorted) for texts occurring more than once."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.array_sort(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def _shingles(text_col: str, n: int = 3):
    """Word n-gram shingles as an array Column (split on single spaces;
    docs with fewer than n tokens produce a single whole-text shingle)."""
    toks = F.split(F.col(text_col), " ")
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)]),
        ),
    ).otherwise(F.array(F.col(text_col)))


def shingle_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_shingles(text_col, n)).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.1,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    max_df: int | float | None = 0.2,
    hash_shingles: bool = True,
) -> DataFrame:
    """Pairs with word-n-gram Jaccard >= threshold:
    (a_id, b_id, n_common, n_a, n_b, jaccard_u6 in micro-units).
    `group_col` restricts pairs to the same group (blocking).

    hash_shingles=True (production) replaces each shingle STRING with
    xxhash64 of it before the dedup + self-join: the shuffled key drops
    from ~n·word bytes to 8, and the join compares longs instead of
    strings. Set equality is preserved up to 64-bit collisions (a
    collision can only merge two shingles WITHIN the same doc pair —
    ~2^-64 per co-occurring pair). False keeps raw strings (the
    ANSI-oracle-exact path).

    `max_df` is the skew guard: the self-join is keyed by shingle, so ONE
    ubiquitous shingle (boilerplate, a stop-phrase) creates a quadratic hot
    key at corpus scale. A float (default 0.2) caps document frequency at
    that FRACTION of the corpus (computed in-plan, broadcast scalar — no
    driver action); an int is an absolute df cap; None disables. Shingle
    sets, sizes, and Jaccard are all over the capped vocabulary — dropping
    near-universal shingles barely moves Jaccard (they contribute equally
    to numerator and denominator of any pair) and removes the hot keys."""
    shingle = F.explode(_shingles(text_col, n)).alias("shingle")
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        *( [F.col(group_col).alias("grp")] if group_col else [F.lit(0).alias("grp")] ),
        shingle,
    )
    if hash_shingles:
        sh = sh.select("doc_id", "grp", F.xxhash64("shingle").alias("shingle"))
    sh = sh.dropDuplicates(["doc_id", "shingle"])
    if max_df:
        # df as a window count over the shingle partitioning: ONE exchange
        # (vs groupBy + semi-join = two more) and the filter runs in the
        # same stage
        df_col = F.count("*").over(Window.partitionBy("shingle"))
        sh = sh.withColumn("df", df_col)
        if isinstance(max_df, float):
            total = docs.agg(F.count("*").alias("n_docs"))
            cap = F.greatest(
                F.lit(1).cast("bigint"),
                F.floor(F.lit(max_df) * F.col("n_docs")).cast("bigint"),
            )
            sh = sh.crossJoin(F.broadcast(total)).where(F.col("df") <= cap)
        else:
            sh = sh.where(F.col("df") <= max_df)
        sh = sh.drop("df", "n_docs")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "n_a"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "n_b"), "b_id")
        .withColumn(
            "jaccard_raw",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard_raw") >= threshold)
        .withColumn("jaccard_u6", F.floor(F.col("jaccard_raw") * 1000000.0 + 0.5).cast("bigint"))
    )
    return out.select("a_id", "b_id", "n_common", "n_a", "n_b", "jaccard_u6")


def _hash60(col, salt: int):
    """Deterministic 60-bit integer hash via md5 prefix (portable: the same
    value is computable in any engine with md5 + hex conversion)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(salt) + "|"), col)), 1, 15), 16, 10).cast("bigint")


def minhash_signatures(
    docs: DataFrame,
    k: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, sig array<bigint> of k minhash values over word-n-gram
    shingles). One explode + one groupBy; the k mins aggregate map-side.

    Hash family (default): xxhash64(shingle, salt) — a native JVM codegen
    function, ~20x cheaper than the md5-prefix route (k md5 digests per
    shingle row dominated the whole near-dup pipeline); each salt gives an
    independent permutation surrogate. Signatures are engine-internal
    (pairs are exact-Jaccard verified afterwards), so cross-engine
    portability of the hash values is not required on the production path.

    `portable=True` switches to the md5-prefix family (`_hash60` with the
    salt prepended) whose values any engine with md5 + hex conversion can
    reproduce — used by the driver's oracle-checked query so DuckDB can
    rebuild identical signatures; keep the default for production."""
    sh = shingle_table(docs, text_col, id_col, n)
    hash_fn = (
        (lambda s: _hash60(F.col("shingle"), s))
        if portable
        else (lambda s: F.xxhash64(F.col("shingle"), F.lit(s)))
    )
    mins = [F.min(hash_fn(s)).alias(f"h{s}") for s in range(k)]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[F.col(f"h{s}") for s in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, max_bucket: int | None = 4096
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket:
    (a_id, b_id, n_bands_shared). rows = bands per doc; join key =
    (band_idx, band hash).

    `max_bucket` caps bucket membership: a mega-cluster of identical docs
    puts them all in the same bucket in EVERY band, making that one bucket
    quadratic. Buckets larger than the cap are dropped (NOT sampled — the
    pairs inside are knowably exact/near-exact clones; run exact dedup
    first, which finds them in one linear groupBy). None disables."""
    sig_len = F.size(F.col("sig"))
    rows_per_band = (sig_len / bands).cast("int")
    banded = signatures.select(
        F.col("doc_id"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).join(signatures, "doc_id").select(
        "doc_id",
        "band",
        F.hash(F.concat_ws(",", F.slice(F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band))).alias("bucket"),
    )
    if max_bucket:
        # window count over (band, bucket) — the SAME key the candidate
        # self-join hashes on, so the exchange is shared and the cap costs
        # no extra shuffle
        bsz = F.count("*").over(Window.partitionBy("band", "bucket"))
        banded = banded.withColumn("bsz", bsz).where(F.col("bsz") <= max_bucket).drop("bsz")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def minhash_near_dups(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 4096,
    portable: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified:
    (a_id, b_id, jaccard >= threshold). `portable` selects the
    cross-engine md5-prefix hash family (see minhash_signatures)."""
    sigs = minhash_signatures(docs, k, n, text_col, id_col, portable=portable)
    cand = lsh_candidate_pairs(sigs, bands, max_bucket).select("a_id", "b_id")
    sh = shingle_table(docs, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.withColumnRenamed("doc_id", "a_id").withColumnRenamed("shingle", "s")
    b_sh = sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("shingle", "s")
    common = (
        cand.join(a_sh, "a_id").join(b_sh, ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "n_a"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "n_b"), "b_id")
        .withColumn("jaccard", F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 60-bit simhash: per-token md5-derived hash,
    per-bit +-1 vote, sign -> bit.

    Scale shape: the 60 bit votes are 60 conditional-sum aggregate
    expressions over the token rows — ONE groupBy shuffle whose partial
    rows carry 60 longs per doc, instead of exploding tokens x 60 bit rows
    through two shuffled aggregations (a 60x row blowup). Everything stays
    in whole-stage codegen."""
    from functools import reduce

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = toks.withColumn("h", _hash60(F.col("tok"), 0))
    votes = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.lit(1 << b).cast("bigint")) != 0, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(60)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    fp = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ),
        range(60),
        F.lit(0).cast("bigint"),
    )
    return agg.select("doc_id", fp.alias("simhash"))


def dedup_clusters(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 4096,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate CLUSTERS with a canonical representative per cluster
    — the keep/drop decision step of a training-data dedup pipeline (the
    pair list alone can't drive deletion: transitively-linked dups a~b~c
    must collapse to ONE survivor, not two independent pair picks).

    MinHash-LSH verified pairs (minhash_near_dups) become an undirected
    edge list; connected components by min-label propagation
    (network.components_from_edges — O(diameter) rounds, each one
    edge-list join + groupBy min, no driver-side graph) label every
    document with the lexicographically smallest doc id reachable.
    Documents with no near-dup are their own singleton cluster.

    Output: (doc_id, cluster_id, is_canonical) — one row per input doc;
    keep the is_canonical rows, drop the rest.
    """
    from .network import components_from_edges

    pairs = minhash_near_dups(
        docs, k, bands, threshold, n, text_col, id_col, max_bucket, portable
    ).select("a_id", "b_id")
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    nodes = docs.select(F.col(id_col).alias("node"))
    labels = components_from_edges(edges, nodes)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    flag_only: bool = False,
) -> DataFrame:
    """Benchmark decontamination: remove (or flag) training documents that
    share any word n-gram with a probe/benchmark corpus — the standard
    eval-contamination guard in a training-data pipeline.

    Scale shape: both sides shingle to (id, shingle) pairs; the probe
    shingle set is deduplicated and joined distinct-semi against the doc
    shingles. The probe side is a benchmark suite (thousands of docs, not
    billions), so Spark's planner broadcasts it under AQE size rules; the
    corpus side streams through one hash join with no row blowup (semi
    join emits each doc at most once per partition before the distinct).

    flag_only=True returns every doc row (all columns) with an
    `is_contaminated` column appended; default returns the clean subset of
    `docs` unchanged.
    """
    pt = probe_text_col or text_col
    doc_sh = shingle_table(docs, text_col, id_col, n)
    probe_sh = (
        probes.select(F.explode(_shingles(pt, n)).alias("shingle")).distinct()
    )
    hit_ids = doc_sh.join(probe_sh, "shingle", "left_semi").select("doc_id").distinct()
    if flag_only:
        return docs.join(
            hit_ids.withColumn("is_contaminated", F.lit(True)),
            docs[id_col] == hit_ids["doc_id"],
            "left",
        ).select(
            *[docs[c] for c in docs.columns],
            F.coalesce(F.col("is_contaminated"), F.lit(False)).alias("is_contaminated"),
        )
    return docs.join(hit_ids, docs[id_col] == hit_ids["doc_id"], "left_anti")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every character k-gram, slide a
    window of `w` hashes, select each window's MINIMUM (rightmost
    occurrence on ties), dedupe selections. Guarantees: any shared
    substring of length >= k + w - 1 yields at least one shared
    fingerprint, and fingerprint density is ~2/(w+1).

    Output: (doc_id, fp, pos) distinct rows — pos is the 0-based k-gram
    offset, kept so matches can be verified/located exactly.

    Relational shape: k-grams EXPLODE to rows so each gram is hashed
    exactly once (a nested array formulation re-inlines the hash array
    into every window lambda — Catalyst has no common-subexpression
    elimination across lambdas, turning O(n) hashes into O(n*w)); the
    w-window min-with-rightmost-tie-break is a bounded collect over
    `rowsBetween(0, w-1)` on the per-doc position order — ONE exchange,
    window state capped at w rows. `portable=True` switches the k-gram
    hash to the md5-prefix family so a SQL oracle rebuilds identical
    fingerprints (production default: xxhash64)."""
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(0))

    g = F.col("_gram")
    gram_hash = (
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
        if portable
        else F.xxhash64(g)
    )
    grams = (
        docs.where(n_grams >= w)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_grams - 1),
                    lambda i: F.substring(t, i + 1, k),
                )
            ).alias("i", "_gram"),
        )
        .select("doc_id", "i", gram_hash.alias("gh"))
    )
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    pairs = F.collect_list(F.struct(F.col("gh"), F.col("i"))).over(win)
    mn = F.array_min(F.transform(F.col("_win"), lambda s: s["gh"]))
    rightmost = F.array_max(
        F.transform(
            F.col("_win"), lambda s: F.when(s["gh"] == mn, s["i"]).otherwise(F.lit(-1))
        )
    )
    return (
        grams.withColumn("_win", pairs)
        .where(F.size("_win") == w)  # complete windows only
        .select(
            "doc_id",
            mn.alias("fp"),
            rightmost.cast("int").alias("pos"),
        )
        .dropDuplicates(["doc_id", "fp", "pos"])
    )


def winnow_near_dups(
    docs: DataFrame,
    k: int = 8,
    w: int = 8,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: float | int | None = 0.2,
    portable: bool = False,
) -> DataFrame:
    """Winnowing-based near-duplicate pairs: docs sharing >= `min_shared`
    distinct fingerprints (any common substring of length >= k + w - 1 is
    guaranteed to surface at least one). The fingerprint-keyed self-join
    is the same bucketed shape as the shingle join (no all-pairs), with
    the fractional-df hot-key cap dropping stop-gram fingerprints."""
    fp = winnow_fingerprints(docs, k, w, text_col, id_col, portable=portable)
    fp = fp.select("doc_id", "fp").dropDuplicates(["doc_id", "fp"])
    if max_df:
        df_col = F.count("*").over(Window.partitionBy("fp"))
        fp = fp.withColumn("df", df_col)
        if isinstance(max_df, float):
            n_docs = docs.count()
            cap = max(1, int(max_df * n_docs))
        else:
            cap = int(max_df)
        fp = fp.where(F.col("df") <= cap).drop("df")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_key: str = "hash",
) -> DataFrame:
    """Exact substring-duplication spans (the suffix-array dedup of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally): every maximal token range of a document
    covered by k-token grams that occur >= `min_count` times in the whole
    corpus. Returns (doc_id, span_idx, tok_start, tok_end, n_grams) with
    token positions 0-based and tok_end exclusive; span_idx orders spans
    within the document.

    Plan shape (linear, two exchanges, no pair join):
      1. explode k-gram positions; corpus frequency as ONE window count
         over the gram key (the hot-key failure mode of pair joins does
         not exist here — a million-fold boilerplate gram is just a
         million-row count group),
      2. keep positions of grams with count >= min_count, merge them into
         maximal spans per document with a lag/running-island window
         (overlapping or touching gram ranges merge: new island iff
         pos > prev_pos + k), then aggregate per island — the island
         groupBy reuses the document hash partitioning of step 2's
         window, so it is exchange-free.

    `gram_key='hash'` shuffles 8-byte xxhash64 keys (the 100-TB path:
    gram strings are ~10x wider than their hashes); 'exact' groups by the
    gram string itself — collision-free and reproducible in any SQL
    engine, used by the driver oracle."""
    if gram_key not in ("hash", "exact"):
        raise ValueError(gram_key)
    toks = F.split(F.col(text_col), " ")
    npos = F.size(toks) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(0), npos - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    g = docs.where(npos >= 1).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    key = F.xxhash64("gram") if gram_key == "hash" else F.col("gram")
    g = g.select("doc_id", "pos", key.alias("gk"))
    cnt = F.count("*").over(Window.partitionBy("gk"))
    dup = g.withColumn("cnt", cnt).where(F.col("cnt") >= min_count)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wd)
    new_island = F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    island = F.sum(new_island).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        dup.select("doc_id", "pos", island.alias("island"))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("tok_start"),
            (F.max("pos") + k).alias("tok_end"),
            F.count("*").alias("n_grams"),
        )
    )
    span_idx = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("tok_start")
    )
    return spans.select(
        "doc_id",
        (span_idx - 1).alias("span_idx"),
        "tok_start",
        "tok_end",
        "n_grams",
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    key: str = "hash",
) -> DataFrame:
    """Paragraph-level exact dedup with global first-occurrence-wins
    (the CCNet / RefinedWeb pre-training hygiene pass: Wenzek et al.
    2020 §3.1 dedup paragraphs across shards; Penedo et al. 2023): split
    every document on `sep`, keep each distinct nonempty paragraph only
    in the document where it first occurs (ordered by (doc_id, idx) —
    deterministic under any partitioning), and reassemble the surviving
    paragraphs in original order.

    Only nonempty (after trim) paragraphs participate in dedup; empty
    paragraphs are always kept, under a per-row unique key so they never
    form a hot window partition. Returns one row per input document:
    (doc_id, text_dedup, n_paragraphs, n_kept).

    key="hash" shuffles xxhash64(trim(paragraph)) (narrow rows,
    production); key="text" uses the trimmed paragraph string itself
    (engine-portable, the oracle mode — and collision-free).

    Scale shape: two exchanges, both linear in corpus size — the
    first-occurrence window partitioned by paragraph key, then the
    per-document reassembly groupBy. No UDFs, no driver collect.
    """
    # split() takes a Java regex: quote the separator so metacharacters
    # in a custom sep split literally
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E")).alias(
            "idx", "para"
        ),
    )
    trimmed = F.trim(F.col("para"))
    content_key = (
        F.xxhash64(trimmed).cast("string") if key == "hash" else trimmed
    )
    pk = F.when(trimmed != "", F.concat(F.lit("p:"), content_key)).otherwise(
        F.concat_ws(":", F.lit("e"), F.col("doc_id"), F.col("idx"))
    )
    rn = F.row_number().over(
        Window.partitionBy("pk").orderBy("doc_id", "idx")
    )
    flagged = paras.select("doc_id", "idx", "para", pk.alias("pk")).withColumn(
        "rn", rn
    )
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("idx"), F.col("para"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_paragraphs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("int")
        .alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["para"]
            ),
            sep,
        ).alias("text_dedup"),
    )


def remove_dup_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_key: str = "hash",
) -> DataFrame:
    """The DELIVERABLE of the Lee et al. 2022 exact-substring dedup:
    the cleaned corpus, not just the span report — every token covered
    by a duplicated span (``duplicated_spans`` semantics: maximal ranges
    of corpus-frequent k-grams) is cut from the text, like the paper's
    ExactSubstr pass which removes every occurrence of a duplicated
    substring.

    Fully relational removal (no per-doc array scans over span lists):
    spans explode to one row per COVERED token position (linear — total
    coverage rows are bounded by total corpus tokens), the kept tokens
    are a left ANTI join on (doc_id, pos), and the document reassembles
    with the same sorted-collect idiom as ``paragraph_dedup``. Documents
    shorter than k tokens have no grams and pass through untouched;
    documents that are one giant duplicate come back as the empty
    string, preserving row count for downstream audits.

    Returns (doc_id, n_tokens, n_removed, text_clean). Exchanges: the
    two inside ``duplicated_spans`` plus the anti join and the per-doc
    reassembly — all keyed on doc_id or the gram key, nothing quadratic.
    """
    spans = duplicated_spans(docs, k, min_count, text_col, id_col, gram_key)
    covered = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("tok_start"), F.col("tok_end") - 1)
        ).alias("pos"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    return base.join(clean, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def lsh_index(
    docs: DataFrame,
    k: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """The persistable near-dup index of a corpus: its minhash signature
    table ``(doc_id, sig array<bigint>)`` — k integers per document, the
    compact artifact an ingest pipeline writes once per corpus snapshot
    and every future batch dedups against. Band-bucket rows derive from
    it on read (a projection), so the stored index is band-count
    agnostic."""
    return minhash_signatures(docs, k, n, text_col, id_col, portable)


def incremental_near_dups(
    new_docs: DataFrame,
    index: DataFrame,
    bands: int = 8,
    min_matches: int = 16,
    k: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus index — the
    streaming-ingest case (every crawl snapshot arrives after the corpus
    is already deduped; re-running all-pairs LSH over old+new would
    re-shuffle the whole history every batch). ``index`` is a prior
    ``lsh_index`` output; only the new batch's shingles are computed.

    Candidates: band both signature tables and join new bands against
    old bands on (band, band-slice) — the exchange is sized by the NEW
    batch plus the (already bounded) index rows, never by old corpus
    text. Verification is signature-estimated Jaccard, the standard
    index-side verify when old text is no longer co-resident: the count
    of agreeing minhash positions (``F.zip_with`` equality fold — an
    exact integer, ~Jaccard * k in expectation). A pair is a near-dup
    when ``n_matches >= min_matches``.

    Returns the best old match per new doc (highest n_matches, ties to
    the smallest old_id): ``(new_id, old_id, n_matches, est_jaccard_u6)``
    with ``est_jaccard_u6 = floor(n_matches * 1e6 / k)`` exact integer
    fixed-point. New docs with no candidate above the floor are absent —
    they are the inserts; callers anti-join to route them into the
    corpus and append their signatures to the index.

    Dedup WITHIN the new batch composes separately (``minhash_near_dups``
    on the batch); this operator is deliberately one-directional so the
    index stays immutable during the scan. ``max_bucket`` drops
    mega-buckets exactly like ``lsh_candidate_pairs`` (run exact dedup
    first)."""
    new_sigs = minhash_signatures(new_docs, k, n, text_col, id_col, portable)

    def _bands(sigs: DataFrame, idc: str) -> DataFrame:
        rows_per_band = k // bands
        return sigs.select(
            F.col("doc_id").alias(idc),
            F.col("sig"),
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        ).select(
            idc,
            "sig",
            "band",
            F.concat_ws(
                ",",
                F.slice(
                    F.col("sig"), F.col("band") * rows_per_band + 1, rows_per_band
                ),
            ).alias("bslice"),
        )

    nb = _bands(new_sigs, "new_id")
    ob = _bands(index, "old_id")
    if max_bucket:
        obsz = F.count("*").over(Window.partitionBy("band", "bslice"))
        ob = ob.withColumn("_bsz", obsz).where(
            F.col("_bsz") <= max_bucket
        ).drop("_bsz")
    cand = (
        nb.join(
            ob.select("old_id", "band", "bslice",
                      F.col("sig").alias("old_sig")),
            ["band", "bslice"],
        )
        .select("new_id", "old_id", "sig", "old_sig")
        .dropDuplicates(["new_id", "old_id"])
    )
    n_matches = F.aggregate(
        F.zip_with(
            "sig", "old_sig", lambda a, b: F.when(a == b, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    hits = cand.select(
        "new_id", "old_id", n_matches.cast("int").alias("n_matches")
    ).where(F.col("n_matches") >= int(min_matches))
    best = F.row_number().over(
        Window.partitionBy("new_id").orderBy(
            F.col("n_matches").desc(), F.col("old_id").asc()
        )
    )
    return (
        hits.withColumn("_rn", best)
        .where(F.col("_rn") == 1)
        .select(
            "new_id",
            "old_id",
            "n_matches",
            F.floor(F.col("n_matches") * 1000000 / k)
            .cast("bigint")
            .alias("est_jaccard_u6"),
        )
    )
