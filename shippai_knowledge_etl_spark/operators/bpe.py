"""In-engine BPE tokenizer training (SURVEY.md §2.11 [EXT]).

Byte-pair-encoding vocabulary learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") as a
distributed computation:

  1. ``word_histogram`` — corpus → (word, freq). ONE wide shuffle;
     the result is vocabulary-sized (Heaps' law), orders of magnitude
     smaller than the corpus, and every later round touches only it.
     This mirrors the reference BPE recipe, which trains on the word
     histogram, never the raw corpus.
  2. ``bpe_train`` — N merge rounds over the (word, freq, syms)
     state. Per round: adjacent symbol pairs explode with their word
     frequencies → pair-count aggregate (map-side combined,
     vocabulary×avg-word-len rows into the shuffle) → 1-row argmax
     probe to the driver (same legitimate 1-row collect as the
     k-means/PageRank convergence probes) → merge applied to every
     word as ONE codegen'd ``regexp_replace`` over the space-joined
     symbols. Java regex replaceAll is greedy left-to-right and
     non-overlapping, which is exactly the reference merge semantics
     (pytest-pinned against a pure-Python reimplementation of the
     published algorithm, including the same-symbol 'a a a'→'aa a'
     case). ``localCheckpoint`` truncates lineage each round like the
     connected-components / k-means / PageRank operators.
  3. ``apply_merges`` — encoding as a chain of the same
     ``regexp_replace`` expressions in learned merge order: pure JVM,
     zero shuffle, usable on any engine-side column. At 100 TB the
     encode step is a narrow map over the corpus; training cost is
     N rounds × a vocabulary-sized shuffle, independent of corpus
     size after step 1.

Determinism: pair counts are exact integers; argmax ties break by
(count DESC, pair lexicographic ASC), so the learned merge table is a
pure function of the corpus — reproducible at any parallelism.
Tokens contain only letters/digits (tokenize) plus the literal
``</w>`` end-of-word marker, and patterns are \\Q..\\E-quoted, so no
regex-metacharacter escapes are needed beyond the quoting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.operators.textops import tokenize

END_OF_WORD = "</w>"


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the tokenized corpus — the single
    corpus-sized shuffle of the whole training pipeline."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_state(words: DataFrame) -> DataFrame:
    """word → space-joined character symbols + end-of-word marker,
    e.g. 'low' → 'l o w </w>'. Kept as ONE string column: the merge
    step is a regexp_replace over it, so arrays would only add
    split/join churn."""
    # split(word, "") yields one element per character with no empties
    # for non-empty words (tokenize never emits empty tokens), so no
    # filter lambda is needed — keeps the projection codegen'd
    chars = F.array_join(F.split(F.col("word"), ""), " ")
    return words.select(
        "word",
        "freq",
        F.concat(chars, F.lit(" " + END_OF_WORD)).alias("syms"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts. The split/slice/zip
    runs per vocabulary row (not per corpus row); the aggregate is
    map-side combined so the shuffle carries partial sums."""
    toks = F.split(F.col("syms"), " ")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
    )
    return (
        state.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def _merge_pattern(a: str, b: str) -> str:
    """Greedy left-to-right replace of the adjacent pair; zero-width
    boundary assertions so consecutive occurrences both match."""
    return f"(?<=^| )\\Q{a}\\E \\Q{b}\\E(?= |$)"


def bpe_train(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` merge rules from a (word, freq) histogram.
    Returns (ordered merge list, final symbolized vocabulary)."""
    state = _initial_state(words).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        state = state.select(
            "word",
            "freq",
            F.regexp_replace("syms", _merge_pattern(a, b), a + b).alias(
                "syms"
            ),
        )
        # Checkpoint every 8th round, not every round: the eager
        # materialization is a full extra job per merge, while the
        # un-truncated lineage is only a chain of ≤8 codegen'd
        # regexp_replace projections over the vocabulary-sized base —
        # the next round's argmax probe evaluates it in its own job
        # anyway (round-13 measurement: 2 jobs/round → 1 for 7 of 8
        # rounds; unlike shortest_paths' rejected sparse cadence, state
        # is referenced ONCE per round, so nothing recomputes twice).
        if i % 8 == 7:
            state = state.localCheckpoint()
    return merges, state


def apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode a space-joined symbol string with the learned merges, in
    order — a chain of codegen'd regexp_replace nodes, zero shuffle."""
    out = col
    for a, b in merges:
        out = F.regexp_replace(out, _merge_pattern(a, b), a + b)
    return out


def encode_words(
    df: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """word → BPE token array under the learned merges."""
    chars = F.array_join(F.split(F.col(word_col), ""), " ")
    syms = F.concat(chars, F.lit(" " + END_OF_WORD))
    return df.withColumn(
        "bpe_tokens", F.split(apply_merges(syms, merges), " ")
    )
