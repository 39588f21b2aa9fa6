"""Document-quality filters for the training-data pipeline.

Three public-literature filter families over the documents table, all
pure Column expressions (whole-stage codegen, zero Python in the hot
path) and all written in the engine's cross-engine-determinism idiom
(length/replace arithmetic + micro-unit fixed point) so an ANSI oracle
reproduces them bit-for-bit:

- ``gopher_quality``: the Gopher / MassiveWeb document-level rules
  (Rae et al. 2021, "Scaling Language Models: ...", table A1) — word
  count bounds, mean word length bounds, symbol-to-word ratio, bullet /
  ellipsis line ratios, alpha-word fraction, stop-word floor.
- ``c4_line_filter``: the C4 cleaning pass (Raffel et al. 2020, §2.2) —
  keep lines that end in terminal punctuation and have enough words,
  drop "javascript" lines, drop whole documents containing "{" or
  "lorem ipsum" or with too few surviving lines.
- ``boilerplate_line_dedup``: corpus-level boilerplate removal (the
  CCNet / RefinedWeb line-dedup idea): a line that appears in more than
  ``max_docs`` distinct documents is boilerplate and is removed from
  EVERY document.

Scale notes (100 TB): gopher_quality and the per-line predicates of
c4_line_filter are shuffle-free projections (higher-order functions over
the split-line array — the plan is Scan + Project only).
boilerplate_line_dedup needs corpus context; it is expressed as ONE
aggregation on xxhash64(line) (map-side partial combine collapses the
heavy boilerplate keys before the exchange) plus one join back that
AQE converts to broadcast whenever the boilerplate set is small — which
it is by construction: only lines crossing the frequency threshold are
kept on the build side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import micro, token_count

# Gopher stop words (Rae et al. 2021 appendix A1.1: "the, be, to, of,
# and, that, have, with")
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text: Column) -> Column:
    """Whitespace word array. split on the single literal space keeps
    Spark (regex split) and ANSI engines (literal split) identical as
    long as runs of whitespace don't occur — the guarantee the
    documents table provides and tests assert."""
    return F.split(text, " ")


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_words: int = 2,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher document-level quality rules (Rae et al. 2021, table A1).

    Returns (id_col, n_words, mean_word_len_u6, symbol_ratio_u6,
    bullet_ratio_u6, ellipsis_ratio_u6, alpha_ratio_u6, n_stop_words,
    ok_words, ok_mean_len, ok_symbols, ok_bullets, ok_ellipsis,
    ok_alpha, ok_stops, keep) — every ratio in exact micro-units, every
    rule its own boolean so downstream ablations can re-mix rules
    without recomputing the metrics. ``keep`` is the AND of all rules.

    Lines are '\\n'-separated; documents with no newline are one line.
    Ratios whose denominator is zero fail their rule (reference
    behaviour: an empty document is filtered).
    """
    t = F.col(text_col)
    flat = F.replace(t, F.lit("\n"), F.lit(" "))  # newline == word separator
    words = _words(flat)
    lines = F.split(t, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)

    # mean word length over words (chars excluding the n_words-1
    # single-char separators, spaces and newlines alike)
    total_word_chars = F.length(t) - (n_words - 1)
    mean_word_len = total_word_chars.cast("double") / n_words

    # symbol-to-word ratio: '#' occurrences + '...' occurrences per word
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("bigint")
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words

    # bullet / ellipsis line ratios
    n_bullet_lines = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
    )
    n_ellipsis_lines = F.size(F.filter(lines, lambda l: l.endswith("...")))
    bullet_ratio = n_bullet_lines.cast("double") / n_lines
    ellipsis_ratio = n_ellipsis_lines.cast("double") / n_lines

    # fraction of words containing at least one ASCII letter
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = n_alpha_words.cast("double") / n_words

    # stop-word hits: occurrences of " w " in the padded text (counts
    # repeats, like the reference counting token hits)
    padded = F.concat(F.lit(" "), flat, F.lit(" "))
    n_stop = None
    for w in GOPHER_STOP_WORDS:
        c = (
            (F.length(padded) - F.length(F.replace(padded, F.lit(f" {w} "), F.lit(""))))
            / (len(w) + 2)
        ).cast("bigint")
        n_stop = c if n_stop is None else n_stop + c

    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_mean_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    ok_symbols = symbol_ratio <= max_symbol_ratio
    ok_bullets = bullet_ratio <= max_bullet_ratio
    ok_ellipsis = ellipsis_ratio <= max_ellipsis_ratio
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stops = n_stop >= min_stop_words

    keep = (
        ok_words & ok_mean_len & ok_symbols & ok_bullets & ok_ellipsis & ok_alpha & ok_stops
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in (extra_cols or [])],
        n_words.alias("n_words"),
        micro(mean_word_len).alias("mean_word_len_u6"),
        micro(symbol_ratio).alias("symbol_ratio_u6"),
        micro(bullet_ratio).alias("bullet_ratio_u6"),
        micro(ellipsis_ratio).alias("ellipsis_ratio_u6"),
        micro(alpha_ratio).alias("alpha_ratio_u6"),
        n_stop.alias("n_stop_words"),
        ok_words.alias("ok_words"),
        ok_mean_len.alias("ok_mean_len"),
        ok_symbols.alias("ok_symbols"),
        ok_bullets.alias("ok_bullets"),
        ok_ellipsis.alias("ok_ellipsis"),
        ok_alpha.alias("ok_alpha"),
        ok_stops.alias("ok_stops"),
        keep.alias("keep"),
    )


# terminal punctuation accepted by the C4 line rule (Raffel et al. 2020
# §2.2: "only retained lines that ended in a terminal punctuation mark")
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) as a shuffle-free projection.

    Line rules: keep a line iff it ends in terminal punctuation
    (``C4_TERMINALS``), has >= ``min_words_per_line`` whitespace words,
    and does not contain the word "javascript" (case-insensitive).
    Document rules: drop the whole document if the raw text contains
    "{" or "lorem ipsum" (case-insensitive), or if fewer than
    ``min_kept_lines`` lines survive.

    Returns (id_col, n_lines, n_kept_lines, keep_doc, text_clean) where
    text_clean is the kept lines re-joined with '\\n' ('' when the
    document is dropped).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _line_ok(l: Column) -> Column:
        words_ok = (
            F.length(l) - F.length(F.replace(l, F.lit(" "), F.lit(""))) + 1
            >= min_words_per_line
        ) & (F.length(l) > 0)
        term_ok = None
        for p in C4_TERMINALS:
            c = l.endswith(p)
            term_ok = c if term_ok is None else (term_ok | c)
        no_js = ~F.lower(l).contains("javascript")
        return words_ok & term_ok & no_js

    kept = F.filter(lines, _line_ok)
    n_kept = F.size(kept)
    low = F.lower(t)
    doc_ok = (
        (~low.contains("{"))
        & (~low.contains("lorem ipsum"))
        & (n_kept >= min_kept_lines)
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        doc_ok.alias("keep_doc"),
        F.when(doc_ok, F.array_join(kept, "\n")).otherwise(F.lit("")).alias("text_clean"),
    )


def boilerplate_line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate line removal (CCNet / RefinedWeb style):
    any line occurring in more than ``max_docs`` DISTINCT documents is
    boilerplate and is removed from every document.

    Plan: explode to (doc, pos, line) -> one groupBy on xxhash64(line)
    counting distinct docs (map-side partial agg collapses hot
    boilerplate keys before the exchange) -> keep only keys OVER the
    threshold (the small side by construction) -> broadcast-eligible
    left anti join -> ordered reassembly grouped by the document key.

    Returns (id_col, n_lines, n_kept_lines, text_dedup) with line order
    preserved. Collision note: dropping by 64-bit hash can only remove a
    non-boilerplate line on an xxhash64 collision (~2^-64 per pair) —
    the standard trade the reference pipelines make.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    key = F.xxhash64("line")
    hot = (
        lines.groupBy(key.alias("line_key"))
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") > max_docs)
        .select("line_key")
    )
    kept = lines.join(
        F.broadcast(hot), key == hot["line_key"], "left_anti"
    )
    n_lines = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), "\n")).alias("n_lines")
    )
    out = (
        kept.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_kept_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("line")))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_dedup"),
        )
    )
    return (
        n_lines.join(out, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    cutoffs: tuple[float, float],
    num_col: str = "sum_freq",
    den_col: str = "n_ngrams",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020, §4.4):
    documents are bucketed by a language-model familiarity signal against
    FIXED calibration cutoffs — ``head`` (most familiar / lowest
    perplexity), ``middle``, ``tail``. CCNet computes the cutoffs ONCE on
    a small calibration corpus (Wikipedia) and then assigns buckets by
    plain threshold comparison, which is exactly why the pass scales:
    assignment is a shuffle-free projection, never a global sort/ntile
    (an ``ntile`` over 10^12 docs would funnel every row through one
    window partition).

    ``scored`` is the output of a corpus LM scorer (``ngram_lm_score`` /
    ``stupid_backoff_score``); the familiarity statistic is the exact
    rational ``num_col / den_col`` (corpus-frequency mass per gram).
    IEEE-754 division of two bigint-exact doubles is correctly rounded
    on every engine, so the comparison is cross-engine deterministic.
    Boundary rule: ``fam >= cutoffs[0]`` is head, ``>= cutoffs[1]`` is
    middle, else tail (cutoffs descending).
    """
    fam = F.col(num_col).cast("double") / F.col(den_col).cast("double")
    c1, c2 = float(cutoffs[0]), float(cutoffs[1])
    if not c1 >= c2:
        raise ValueError("cutoffs must be (head_min, middle_min) descending")
    return scored.select(
        id_col,
        num_col,
        den_col,
        fam.alias("familiarity"),
        F.when(fam >= F.lit(c1), F.lit("head"))
        .when(fam >= F.lit(c2), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def calibrate_cutoffs(
    scored: DataFrame,
    num_col: str = "sum_freq",
    den_col: str = "n_ngrams",
    fractions: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> tuple[float, float]:
    """Derive ``perplexity_buckets`` cutoffs from a CALIBRATION corpus —
    the small, trusted set CCNet uses (its Wikipedia sample), never the
    full corpus. Exact percentiles of the familiarity statistic at the
    requested fractions; the aggregate materializes the calibration
    set's values on the executors, which is safe precisely because the
    calibration corpus is bounded by construction (document the bound at
    call sites). Returns ``(head_min, middle_min)`` descending."""
    fam = F.col(num_col).cast("double") / F.col(den_col).cast("double")
    row = scored.agg(
        F.percentile(fam, F.lit(1.0 - float(fractions[0]))).alias("c1"),
        F.percentile(fam, F.lit(1.0 - float(fractions[1]))).alias("c2"),
    ).collect()[0]
    return float(row["c1"]), float(row["c2"])
