"""Unigram-LM tokenizer training invariants (operators/unigram_lm.py).

The driver gate records rows-only for the unigram queries (Viterbi is
not SQL-expressible), so correctness is pinned here: golden parity of
the full distributed training loop against an independent pure-Python
reimplementation of the algorithm (seed → Viterbi-EM → prune),
coverage, encode/train consistency, and repeat-identity.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


# --- independent reference implementation (no imports from the
# engine module beyond the public API under test) -------------------


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    neg = float("-inf")
    best = [(0.0, -1)] + [(neg, -1)] * n
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is None:
                continue
            s = best[i - ln][0] + lp
            if s > best[i][0]:
                best[i] = (s, i - ln)
    out, j = [], n
    while j > 0:
        p = best[j][1]
        out.append(word[p:j])
        j = p
    return out[::-1]


def _ref_train(hist, vocab_size, n_iters, max_len, seed_multi):
    counts = {}
    for word, freq in hist.items():
        for i in range(len(word)):
            for ln in range(1, min(max_len, len(word) - i) + 1):
                p = word[i : i + ln]
                counts[p] = counts.get(p, 0) + freq
    chars = [(p, c) for p, c in counts.items() if len(p) == 1]
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:seed_multi]
    vocab = sorted(chars + multi, key=lambda t: (-t[1], t[0]))
    for _ in range(n_iters):
        total = sum(c for _, c in vocab)
        denom = float(total + len(vocab))
        logp = {p: math.log((c + 1) / denom) for p, c in vocab}
        counted = {}
        for word, freq in hist.items():
            for piece in _ref_viterbi(word, logp, max_len):
                counted[piece] = counted.get(piece, 0) + freq
        cs = sorted(
            ((p, counted.get(p, 0)) for p, _ in vocab if len(p) == 1),
            key=lambda t: (-t[1], t[0]),
        )
        ms = sorted(
            ((p, c) for p, c in counted.items() if len(p) >= 2 and c > 0),
            key=lambda t: (-t[1], t[0]),
        )[:vocab_size]
        vocab = sorted(cs + ms, key=lambda t: (-t[1], t[0]))
    return vocab


_CORPUS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "low lower lowest",
    "new newer newest",
    "the fish swim low",
]


@pytest.fixture(scope="module")
def hist_df(spark):
    from shippai_knowledge_etl_spark.operators import bpe

    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    return bpe.word_histogram(df, "text").localCheckpoint()


def test_unigram_train_matches_reference(spark, hist_df):
    from shippai_knowledge_etl_spark.operators import unigram_lm

    hist = {r["word"]: r["freq"] for r in hist_df.collect()}
    got = unigram_lm.unigram_train(
        hist_df, vocab_size=24, n_iters=2, max_piece_len=4, seed_multi=64
    )
    want = _ref_train(hist, 24, 2, 4, 64)
    assert got == want


def test_unigram_vocab_covers_and_segments_every_word(spark, hist_df):
    from shippai_knowledge_etl_spark.operators import unigram_lm

    vocab = unigram_lm.unigram_train(
        hist_df, vocab_size=8, n_iters=2, seed_multi=16
    )
    pieces = {p for p, _ in vocab}
    words = [r["word"] for r in hist_df.collect()]
    assert {c for w in words for c in w} <= pieces  # char coverage
    logp = unigram_lm._log_probs(vocab)
    for w in words:
        seg = unigram_lm.viterbi_segment(w, logp, 4)
        assert "".join(seg) == w  # lossless round-trip


def test_unigram_estep_counts_conserve_pieces(spark, hist_df):
    """segment_words' per-word piece counts, freq-weighted, must equal
    the E-step totals the trainer derived its final counts from."""
    from shippai_knowledge_etl_spark.operators import unigram_lm

    vocab = unigram_lm.unigram_train(
        hist_df, vocab_size=24, n_iters=2, seed_multi=64
    )
    seg = unigram_lm.segment_words(hist_df, vocab)
    joined = hist_df.join(seg, "word")
    total_pieces = joined.agg(
        F.sum(F.col("freq") * F.col("n_pieces"))
    ).collect()[0][0]
    assert total_pieces == sum(c for _, c in vocab)


def test_unigram_train_repeat_identical(spark, hist_df):
    from shippai_knowledge_etl_spark.operators import unigram_lm

    a = unigram_lm.unigram_train(hist_df, vocab_size=16, n_iters=2)
    b = unigram_lm.unigram_train(hist_df, vocab_size=16, n_iters=2)
    assert a == b


def test_unigram_learns_frequent_subwords(spark, hist_df):
    """'the' dominates the toy corpus: the trained vocabulary must keep
    it as a multi-char piece and Viterbi must use it atomically."""
    from shippai_knowledge_etl_spark.operators import unigram_lm

    vocab = unigram_lm.unigram_train(
        hist_df, vocab_size=24, n_iters=2, seed_multi=64
    )
    pieces = {p for p, _ in vocab}
    assert "the" in pieces
    logp = unigram_lm._log_probs(vocab)
    assert unigram_lm.viterbi_segment("the", logp, 4) == ["the"]
