"""Hand-computed fixtures for the pairwise text-overlap evals
(queries/evals.py): clipped n-gram semantics, smoothing, brevity."""

import math

from pyspark.sql import functions as F


def _frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_rouge_bigram_clipped_counts(spark):
    """Pair (0, 1): candidate 'the cat sat on the mat the cat',
    reference 'the cat on the mat'. Candidate bigrams (7): the-cat x2,
    cat-sat, sat-on, on-the, the-mat, mat-the. Reference bigrams (4):
    the-cat, cat-on, on-the, the-mat. Clipped matches: the-cat
    min(2,1)=1, on-the 1, the-mat 1 → 3."""
    from shippai_knowledge_etl_spark.queries.evals import _pair_gram_stats

    d = _frame(
        spark,
        ["the cat sat on the mat the cat", "the cat on the mat"],
    )
    row = _pair_gram_stats(d, 2).collect()
    assert len(row) == 1 and row[0]["pair_id"] == 0
    assert (row[0]["ct"], row[0]["rt"], row[0]["m"]) == (7, 4, 3)
    # pair presence (the old `_pairs` inner-join contract, now carried
    # by the sentinel gram): an unpaired trailing candidate — and even
    # an EMPTY paired candidate — still forms exactly its own pairs
    d3 = _frame(spark, ["", "ref text", "cand no ref"])
    assert [
        r["pair_id"] for r in _pair_gram_stats(d3, 2).collect()
    ] == [0]


def test_rouge_query_f1_algebra(spark, sf_dir):
    """F1 column equals 2m/(ct+rt) of the integer columns it ships
    with — the single-division algebraic identity the oracle uses."""
    from shippai_knowledge_etl_spark.queries.evals import eval_rouge_bigram

    rows = eval_rouge_bigram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ct, rt, m = r["cand_bigrams"], r["ref_bigrams"], r["match_bigrams"]
        assert 0 <= m <= min(ct, rt)
        if ct + rt > 0:
            assert r["rouge2_f1"] == round(2.0 * m / (ct + rt), 6)
        if ct > 0:
            assert r["rouge2_precision"] == round(m / ct, 6)


def test_bleu_log_hand_computed(spark):
    """One pair, exact arithmetic: cand 3 tokens 'a b c', ref 4 tokens
    'a b b d'. Unigram matches: a 1, b min(1,2)=1 → 2; bigrams: cand
    {a-b, b-c}, ref {a-b, b-b, b-d} → match 1. p1=(2+1)/(3+1),
    p2=(1+1)/(2+1), bp=min(0, 1-4/3). x2 = 2*round(bp,6) +
    round(ln .75,6) + round(ln(2/3),6) — assembled in DECIMAL like the
    production select, which this drives directly via
    _bleu_log_frame (the round-9 ADVICE fix: the old form compared the
    hand expectation to a re-expression of itself)."""
    from decimal import Decimal

    from shippai_knowledge_etl_spark.queries.evals import (
        _bleu_log_frame,
        _pair_gram_stats,
    )

    d = _frame(spark, ["a b c", "a b b d"])
    s1 = _pair_gram_stats(d, 1).collect()[0]
    s2 = _pair_gram_stats(d, 2).collect()[0]
    assert (s1["ct"], s1["rt"], s1["m"]) == (3, 4, 2)
    assert (s2["ct"], s2["rt"], s2["m"]) == (2, 3, 1)
    row = _bleu_log_frame(d).collect()
    assert len(row) == 1 and row[0]["pair_id"] == 0
    assert (
        row[0]["cand_tokens"],
        row[0]["ref_tokens"],
        row[0]["match_unigrams"],
        row[0]["match_bigrams"],
    ) == (3, 4, 2, 1)
    # exact-decimal hand assembly of the round-then-DECIMAL sum: each
    # rounded term enters as DECIMAL(18,6), the brevity term doubled
    expected = float(
        2 * Decimal(str(round(min(0.0, 1.0 - 4 / 3), 6)))
        + Decimal(str(round(math.log(3 / 4), 6)))
        + Decimal(str(round(math.log(2 / 3), 6)))
    )
    assert row[0]["log_bleu2_x2"] == expected


def test_bleu_log_empty_candidate_guard(spark):
    """The brevity guard (cand_tokens > 0) on the production select:
    an empty candidate yields NULL log_bleu2_x2, not a division by
    zero (ANSI mode would raise) — the other half of the round-9
    ADVICE coverage gap."""
    from shippai_knowledge_etl_spark.queries.evals import _bleu_log_frame

    d = _frame(spark, ["", "a b"])
    row = _bleu_log_frame(d).collect()
    assert len(row) == 1 and row[0]["cand_tokens"] == 0
    assert row[0]["log_bleu2_x2"] is None
