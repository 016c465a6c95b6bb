"""BPE training: golden parity against a pure-Python reimplementation
of the published algorithm (Sennrich et al. 2016, Algorithm 1), plus
determinism and encode-consistency invariants."""

from __future__ import annotations

import collections
import re

from shippai_knowledge_etl_spark.operators import bpe
from shippai_knowledge_etl_spark.tables import load


# -- reference implementation (paper pseudocode, driver-side) ----------


def _ref_pair_counts(vocab: dict[str, int]) -> collections.Counter:
    counts: collections.Counter = collections.Counter()
    for syms, freq in vocab.items():
        parts = syms.split()
        for a, b in zip(parts, parts[1:]):
            counts[(a, b)] += freq
    return counts


def _ref_merge(vocab: dict[str, int], pair: tuple[str, str]) -> dict[str, int]:
    pat = re.compile(
        r"(?<!\S)" + re.escape(pair[0] + " " + pair[1]) + r"(?!\S)"
    )
    return {pat.sub(pair[0] + pair[1], syms): f for syms, f in vocab.items()}


def ref_bpe(words: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab = {
        " ".join(list(w)) + " " + bpe.END_OF_WORD: f for w, f in words.items()
    }
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # max count, ties by pair lexicographic — same rule as the engine
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append(pair)
        vocab = _ref_merge(vocab, pair)
    return merges


# -- tests -------------------------------------------------------------

WORDS = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    merges, state = bpe.bpe_train(df, 8)
    assert merges == ref_bpe(WORDS, 8)
    # final state still covers every word with intact frequencies
    got = {r["word"]: r["freq"] for r in state.collect()}
    assert got == WORDS


def test_bpe_same_symbol_pair_is_greedy_left_to_right(spark):
    # 'aaaa' = 'a a a a </w>': pair (a,a) must merge to 'aa aa </w>',
    # not the overlapping 'a aa a' — the reference greedy semantics
    df = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
    merges, state = bpe.bpe_train(df, 1)
    assert merges == [("a", "a")]
    assert state.collect()[0]["syms"] == "aa aa " + bpe.END_OF_WORD


def test_bpe_encode_consistent_with_training_state(spark):
    # encoding the training words with the learned merges must
    # reproduce the final training state exactly
    df = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    merges, state = bpe.bpe_train(df, 8)
    enc = bpe.encode_words(df, "word", merges)
    got = {r["word"]: r["bpe_tokens"] for r in enc.collect()}
    want = {r["word"]: r["syms"].split(" ") for r in state.collect()}
    assert got == want
    # unseen word still encodes (falls back to finer segments)
    unseen = spark.createDataFrame([("lowly",)], "word string")
    toks = bpe.encode_words(unseen, "word", merges).collect()[0]["bpe_tokens"]
    assert "".join(toks).replace(bpe.END_OF_WORD, "") == "lowly"


def test_bpe_on_corpus_is_deterministic(spark, sf_dir):
    d = load(spark, sf_dir, "documents").limit(100)
    hist = bpe.word_histogram(d, "text")
    m1, _ = bpe.bpe_train(hist, 5)
    m2, _ = bpe.bpe_train(hist.repartition(7), 5)
    assert m1 == m2 and len(m1) == 5


def test_bpe_train_matches_reference_on_random_histograms(spark):
    """Property form of the golden: random small word histograms must
    produce the reference merge sequence exactly (pair counting, tie
    rule, and greedy merge semantics all in play)."""
    import random

    rng = random.Random(7)
    alphabet = "abc"
    for trial in range(6):
        words = {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 5))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(1, 8))
        }
        df = spark.createDataFrame(
            list(words.items()), "word string, freq long"
        )
        n = rng.randint(1, 6)
        merges, _ = bpe.bpe_train(df, n)
        assert merges == ref_bpe(words, n), (trial, words, n)


def test_bpe_encode_query_conserves_tokens(spark, sf_dir):
    """The rows-only ext_bpe_encode gate entry: per-source word counts
    must sum to the corpus total (encoding loses no words), every
    word yields at least one subword plus the end marker, and the
    output is reproducible."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.catalog import load_catalog
    from shippai_knowledge_etl_spark.operators.textops import tokenize

    fn = load_catalog()["ext_bpe_encode"].fn
    rows = fn(spark, sf_dir).collect()
    total_words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokenize(F.col("text"))))
        .count()
    )
    assert sum(r["n_words"] for r in rows) == total_words
    for r in rows:
        # every word encodes to at least one subword (fully-merged
        # words collapse symbol+marker into a single token)
        assert r["n_subwords"] >= r["n_words"] > 0
        assert r["subwords_per_word"] >= 1.0
    again = fn(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
