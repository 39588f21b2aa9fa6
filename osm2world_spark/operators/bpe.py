"""Distributed BPE tokenizer training + application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm; the training-data pipeline's tokenizer stage).

Spark-first shape:
- Training runs on the DISTINCT-WORD frequency table, not the corpus:
  a 100 TB corpus has a bounded vocabulary (~10^7 distinct words), so
  after ONE corpus-wide groupBy the iterative part touches only the
  small table. Each merge round is: adjacent-pair weights (explode +
  map-side-combining groupBy), a deterministic argmax (weight DESC,
  pair ASC), a one-row collect (the algorithm's inherent sync point —
  BPE is sequential in its merge choices), and a pure-Column fold that
  applies the merge to every word's symbol array. No Python touches
  per-word data.
- Application is a JOIN, not a scan-side loop: training already
  produced the final segmentation of every distinct word, so
  tokenizing the corpus = words -> broadcast/shuffle join against the
  (word, symbols) table. Out-of-vocabulary words (new corpus) fall
  back to character symbols plus the merge fold.

Determinism: ties on pair weight break lexicographically (a ASC,
b ASC), so the merge table is a pure function of the corpus.

End-of-word handling follows the paper: the last character of each
word carries the '</w>' marker, so 'low' and 'lower' share 'lo' but
not the final 'w'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count): the one corpus-wide pass. Whitespace
    words (space + newline separators), empties dropped."""
    flat = F.replace(F.col(text_col), F.lit("\n"), F.lit(" "))
    return (
        docs.select(F.explode(F.split(flat, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def initial_symbols(word: Column) -> Column:
    """Word -> character symbols, last character tagged with '</w>'."""
    n = F.length(word)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i == n, F.concat(word.substr(i, F.lit(1)), F.lit(EOW))
        ).otherwise(word.substr(i, F.lit(1))),
    )


def adjacent_pair_weights(words: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """(a, b, weight): adjacent symbol pairs weighted by word count.
    One explode + one aggregation; partial aggregation collapses the
    heavy pairs map-side before the exchange."""
    s = F.col(symbols_col)
    pairs = F.transform(
        F.filter(F.sequence(F.lit(1), F.greatest(F.size(s), F.lit(1))), lambda i: i < F.size(s)),
        lambda i: F.struct(
            F.element_at(s, i.cast("int")).alias("a"),
            F.element_at(s, (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        words.select(F.col("count"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("weight"))
    )


def apply_merge(symbols: Column, a, b) -> Column:
    """One greedy left-to-right merge pass of the pair (a, b) over a
    symbol array, as a pure Column fold (F.aggregate): the same
    left-fold every ANSI engine reproduces with list_reduce."""
    a, b = F.lit(a) if isinstance(a, str) else a, F.lit(b) if isinstance(b, str) else b
    merged = F.concat(a, b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (s == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def best_pair(pair_weights: DataFrame) -> DataFrame:
    """The deterministic argmax row: weight DESC, then (a, b) ASC."""
    return pair_weights.orderBy(
        F.col("weight").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(1)


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` BPE merges. Returns (merges in order, the final
    (word, count, symbols) table — the segmentation every in-vocabulary
    word joins against at apply time).

    Each round collects exactly ONE row (the argmax pair) — the
    sequential decision BPE is defined by; all per-word work stays
    distributed. The evolving word table is checkpointed via
    localCheckpoint every few rounds so the lineage (one fold per
    round) stays shallow."""
    words = word_counts(docs, text_col).select(
        "word", "count", initial_symbols(F.col("word")).alias("symbols")
    )
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        top = best_pair(adjacent_pair_weights(words)).collect()
        if not top or top[0]["weight"] < 2:
            break  # nothing left worth merging (paper stops at freq 1)
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            "word", "count", apply_merge(F.col("symbols"), a, b).alias("symbols")
        )
        if (r + 1) % 4 == 0:
            words = words.localCheckpoint(eager=False)
    return merges, words


def bpe_segment(
    docs: DataFrame,
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus against a trained BPE model: per-doc words
    join the (word, symbols) vocabulary (the apply-as-join path);
    out-of-vocabulary words fall back to character symbols + the merge
    fold (bounded expression depth: one fold per merge — callers with
    long merge tables should extend the vocab table instead, which is
    one groupBy over the new corpus's distinct words).
    Returns (id_col, pos, word, tokens)."""
    w = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.replace(F.col(text_col), F.lit("\n"), F.lit(" ")), " "),
                lambda t: t != "",
            )
        ).alias("pos", "word"),
    )
    out = w.join(vocab.select("word", "symbols"), "word", "left")
    fallback = F.col("word")
    fb = initial_symbols(fallback)
    for a, b in merges:
        fb = apply_merge(fb, a, b)
    return out.select(
        id_col, "pos", "word", F.coalesce(F.col("symbols"), fb).alias("tokens")
    )
