"""In-engine unigram-LM tokenizer training (SURVEY.md §2.11 [EXT]).

The SentencePiece unigram language model (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates") — the OTHER production subword
tokenizer, complementing ``operators/bpe.py``: BPE grows a vocabulary
bottom-up by merges; the unigram LM starts from an over-complete seed
vocabulary and prunes it down under a probabilistic model, segmenting
by maximum likelihood.

Distributed shape (the BPE discipline — corpus touched once, every
round touches only vocabulary-sized state):

  1. ``seed_vocabulary`` — frequency-weighted counts of ALL word
     substrings up to ``max_piece_len``, generated as codegen'd
     ``sequence``/``posexplode``/``substring`` expressions over the
     (word, freq) histogram (never the raw corpus; Heaps' law bounds
     the histogram). One substring-keyed shuffle with map-side partial
     sums; the seed keeps every single character (coverage guarantee)
     plus the top multi-character pieces by (count DESC, piece ASC)
     via TakeOrderedAndProject.
  2. ``unigram_train`` — fixed Viterbi-EM rounds (hard EM, the
     documented simplification of SentencePiece's expected-count EM;
     the E-step segments each distinct word by maximum likelihood
     under the current piece probabilities). The E-step is ONE
     Arrow ``mapInPandas`` pass over the histogram with the piece
     log-probs shipped in the closure (the vocabulary is
     driver-bounded by construction, the CCNet-LM 65,536-cell
     precedent); per-batch ``Counter`` pre-aggregation keeps the
     shuffle at vocabulary size. The M-step re-estimates
     add-one-smoothed probabilities and prunes back to
     ``vocab_size`` multi-char pieces (single chars are never pruned,
     preserving full coverage) — a driver-side fold over the bounded
     (piece, count) list.
  3. ``segment_words`` — encoding: each DISTINCT word is segmented
     once (vocabulary-sized UDF input), then the result joins back to
     the corpus — at 100 TB the encode cost is one broadcast-able
     word-level join, not a per-token Python call.

Determinism: E-step counts are exact integers (freq-weighted Viterbi
piece occurrences); probabilities derive from those integers in one
driver-side pass, and each word's Viterbi DP adds the same floats in
the same order at any parallelism — so training is a pure function of
the (histogram, vocab_size, n_iters) inputs, pytest-pinned against a
pure-Python reference implementation. Viterbi ties break toward the
SHORTEST final piece (strict ``>`` with piece length ascending), and
the degenerate no-path case cannot occur because single characters
always carry probability mass.

Floats make the gate rows-only (Viterbi is not SQL-expressible); the
invariants — golden parity, coverage, piece-count conservation,
repeat-identity — live in tests/test_unigram.py.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Maximum-likelihood segmentation of ``word`` under a unigram LM
    given piece log-probs. Pure Python on purpose: the SAME function
    runs inside the Arrow UDF, in the driver-side golden tests, and in
    any future encode path, so there is exactly one definition of the
    tie-break semantics."""
    n = len(word)
    neg = float("-inf")
    score = [0.0] + [neg] * n
    back = [-1] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_piece_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is None:
                continue
            s = score[i - ln] + lp
            if s > score[i]:
                score[i] = s
                back[i] = i - ln
    if score[n] == neg:  # unreachable when all chars are in vocab
        return list(word)
    pieces: list[str] = []
    j = n
    while j > 0:
        p = back[j]
        pieces.append(word[p:j])
        j = p
    pieces.reverse()
    return pieces


def seed_vocabulary(
    words: DataFrame, max_piece_len: int = 4, n_multi: int = 512
) -> DataFrame:
    """(piece, count) seed: every single character of the vocabulary
    plus the ``n_multi`` highest-frequency substrings of length
    2..``max_piece_len``, all counts frequency-weighted occurrence
    counts. Input is the (word, freq) histogram from
    ``bpe.word_histogram``."""
    starts = F.sequence(F.lit(1), F.length("word"))
    lens = F.sequence(
        F.lit(1),
        F.least(
            F.lit(max_piece_len), F.length("word") - F.col("i") + 1
        ),
    )
    subs = (
        words.select("word", "freq", F.explode(starts).alias("i"))
        .select("word", "freq", "i", F.explode(lens).alias("l"))
        .select(
            F.expr("substring(word, i, l)").alias("piece"),
            "freq",
        )
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("count"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(n_multi)
    )
    return chars.unionByName(multi)


def _log_probs(
    vocab: list[tuple[str, int]]
) -> dict[str, float]:
    """Add-one-smoothed log probabilities from integer (piece, count)
    pairs — one deterministic driver-side pass."""
    total = sum(c for _, c in vocab)
    denom = float(total + len(vocab))
    return {p: math.log((c + 1) / denom) for p, c in vocab}


def _estep_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """Viterbi piece counts over the histogram, freq-weighted: one
    Arrow pass, per-batch Counter pre-aggregation, then the
    vocabulary-keyed sum."""
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        acc: Counter[str] = Counter()
        for pdf in batches:
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in viterbi_segment(word, logp, max_piece_len):
                    acc[piece] += int(freq)
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "cnt": list(acc.values())}
            )

    return (
        words.select("word", "freq")
        .mapInPandas(run, schema)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("count"))
    )


def unigram_train(
    words: DataFrame,
    vocab_size: int = 256,
    n_iters: int = 2,
    max_piece_len: int = 4,
    seed_multi: int = 2048,
) -> list[tuple[str, int]]:
    """Learn a unigram-LM vocabulary from a (word, freq) histogram.
    Returns the final (piece, count) list sorted by
    (count DESC, piece ASC) — counts are the last E-step's exact
    integer Viterbi occurrence totals; pieces without surviving mass
    are pruned, single characters never are."""
    seed = [
        (r["piece"], r["count"])
        for r in seed_vocabulary(words, max_piece_len, seed_multi).collect()
    ]
    vocab = sorted(seed, key=lambda t: (-t[1], t[0]))
    for _ in range(n_iters):
        logp = _log_probs(vocab)
        counted = {
            r["piece"]: r["count"]
            for r in _estep_counts(words, logp, max_piece_len).collect()
        }
        chars = sorted(
            (
                (p, counted.get(p, 0))
                for p, _ in vocab
                if len(p) == 1
            ),
            key=lambda t: (-t[1], t[0]),
        )
        multi = sorted(
            (
                (p, c)
                for p, c in counted.items()
                if len(p) >= 2 and c > 0
            ),
            key=lambda t: (-t[1], t[0]),
        )[:vocab_size]
        vocab = sorted(chars + multi, key=lambda t: (-t[1], t[0]))
    return vocab


def segment_words(
    words: DataFrame,
    vocab: list[tuple[str, int]],
    max_piece_len: int = 4,
) -> DataFrame:
    """(word, n_pieces, pieces_concat) for every DISTINCT input word
    under the learned vocabulary — the vocabulary-sized encode table
    that then broadcast-joins back to the corpus (never a per-token
    Python call at corpus scale)."""
    logp = _log_probs(vocab)
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("n_pieces", T.LongType()),
            T.StructField("pieces_concat", T.StringType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            segs = [
                viterbi_segment(w, logp, max_piece_len)
                for w in pdf["word"]
            ]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [len(s) for s in segs],
                    "pieces_concat": [" ".join(s) for s in segs],
                }
            )

    return words.select("word").distinct().mapInPandas(run, schema)
