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
    from shippai_knowledge_etl_spark.queries.evals import _clipped, _pairs

    d = _frame(
        spark,
        ["the cat sat on the mat the cat", "the cat on the mat"],
    )
    tot, match = _clipped(d, 2)
    totals = {r["doc_id"]: r["total"] for r in tot.collect()}
    assert totals == {0: 7, 1: 4}
    m = {r["pair_id"]: r["m"] for r in match.collect()}
    assert m == {0: 3}
    assert [r["pair_id"] for r in _pairs(d).collect()] == [0]


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
    round(ln .75,6) + round(ln(2/3),6)."""
    from shippai_knowledge_etl_spark.queries.evals import eval_bleu_log as q

    # drive the registered callable through a temp view-free path: the
    # query loads parquet, so instead rebuild its algebra inline via the
    # module helpers on an in-memory frame.
    from shippai_knowledge_etl_spark.queries.evals import _clipped, _pairs

    d = _frame(spark, ["a b c", "a b b d"])
    tot1, match1 = _clipped(d, 1)
    tot2, match2 = _clipped(d, 2)
    t1 = {r["doc_id"]: r["total"] for r in tot1.collect()}
    t2 = {r["doc_id"]: r["total"] for r in tot2.collect()}
    m1 = {r["pair_id"]: r["m"] for r in match1.collect()}
    m2 = {r["pair_id"]: r["m"] for r in match2.collect()}
    assert (t1, t2) == ({0: 3, 1: 4}, {0: 2, 1: 3})
    assert (m1, m2) == ({0: 2}, {0: 1})
    expected = (
        2 * round(min(0.0, 1.0 - 4 / 3), 6)
        + round(math.log(3 / 4), 6)
        + round(math.log(2 / 3), 6)
    )
    assert abs(expected - (2 * (1 - 4 / 3) + math.log(0.75) + math.log(2 / 3))) < 1e-5
