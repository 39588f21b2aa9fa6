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


def select_batch(candidates: list[tuple[str, str, int]], batch_k: int) -> list[tuple[str, str]]:
    """Greedy conflict-free batch selection over (a, b, weight)
    candidates already sorted by (weight DESC, a ASC, b ASC): take the
    next candidate iff its symbol set {a, b, a||b} is disjoint from the
    symbols AND merged strings of everything already taken. Pairwise
    disjointness makes the selected merges non-interacting — no merge
    can create, destroy, or retarget an occurrence of another — so one
    fold per merge applied in any order yields the same table as
    applying them as consecutive classic rounds.

    The deterministic pure-Python core of bpe_train_batched; exposed
    separately so the driver query and the DuckDB recursive-CTE oracle
    can check it value-for-value."""
    taken: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b, w in candidates:
        if len(taken) >= batch_k:
            break
        if w < 2:
            break
        if a in used or b in used or (a + b) in used:
            continue
        taken.append((a, b))
        used.update((a, b, a + b))
    return taken


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int,
    batch_k: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Batched BPE training: per round, collect the top candidate pairs
    (a bounded 4*batch_k-row collect), greedily select a conflict-free
    batch (select_batch), and apply ALL selected merges in one pass —
    so n_merges costs ~n_merges/batch_k Spark jobs instead of n_merges
    sequential jobs (the wall-clock fix for production tokenizers of
    32k-64k merges; the classic loop is one job per merge).

    batch_k=1 reproduces bpe_train exactly. For batch_k>1 the schedule
    is the standard distributed-BPE approximation: selected merges are
    mutually non-interacting (their observed weights are exact and the
    folds commute), but a merge can CREATE a pair whose weight exceeds
    a later batch member's, which the classic sequential schedule would
    have taken first. On natural-language corpora the divergence is
    rare and bounded by the batch (tests pin a corpus where the
    schedules agree and one where they deliberately diverge).
    """
    words = word_counts(docs, text_col).select(
        "word", "count", initial_symbols(F.col("word")).alias("symbols")
    )
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        top = (
            adjacent_pair_weights(words)
            .orderBy(F.col("weight").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(max(4 * want, 16))
            .collect()
        )
        batch = select_batch(
            [(r["a"], r["b"], r["weight"]) for r in top], want
        )
        if not batch:
            break
        merges.extend(batch)
        folded = F.col("symbols")
        for a, b in batch:
            folded = apply_merge(folded, a, b)
        words = words.select("word", "count", folded.alias("symbols"))
        rounds += 1
        if rounds % 4 == 0:
            words = words.localCheckpoint(eager=False)
    return merges, words
