"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11 [EXT]).

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure built-in expressions over the
``documents`` table — whole-stage codegen'd, narrow maps except the
langid argmax (5 rows/doc window) — so they scale to 100 TB corpora
without a Python worker in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword heuristic.
# Deliberately small: the operator shape (tokenize → bucket-count →
# argmax) is what matters; swap in real frequency tables at production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "nicht"),
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

# BPE-ish pretokenizer: word runs OR single non-space symbols.
BPE_TOKEN_RE = r"[\p{L}\p{Nd}]+|[^\p{L}\p{Nd}\s]"


def marker_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Total occurrences of ``words`` in the token array, lambda-free:
    occurrences(w) == size(toks) - size(array_remove(toks, w)) —
    array_remove drops every copy, so the size delta counts them. A
    handful of codegen'd array passes beats one interpreted ``filter``
    lambda walk (see tokenize's docstring for why lambdas are avoided
    in per-row hot paths)."""
    sz = F.size(toks)
    out = F.lit(0)
    for w in words:
        out = out + (sz - F.size(F.array_remove(toks, w)))
    return out


def tokenize(col: Column) -> Column:
    """Lowercase, strip non-letter/digit runs to single spaces, split,
    drop blanks. Unicode classes so CJK/full-width text survives.

    Lambda-free on purpose: after the regex collapses separator runs
    and trim removes the edges, a single-space split can only produce
    an empty token for the empty/all-separator document — the CASE
    handles that one case, so no ``filter`` lambda is needed. HOF
    lambdas are CodegenFallback and their shared interpreter call sites
    degrade ~10x once a session has run many different lambdas (see
    dedup.shingle_structs); tokenize sits under every text query, so it
    must stay inside whole-stage codegen.
    """
    t = F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}\p{Nd}]+", " "))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_counts(col: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish regex token count)."""
    ws = F.size(tokenize(col))
    bpe = F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))
    return ws, bpe


def quality_metrics(col: Column) -> dict[str, Column]:
    """Heuristic quality signals: length, punctuation density, stopword
    ratio, mean token length. Ratios are double divisions of exact ints
    (deterministic at any parallelism)."""
    toks = tokenize(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\p{L}\p{Nd}\s]"), 0))
    n_stop = marker_hits(toks, LANG_MARKERS["en"])
    # total token chars == length of the separator-less concat: the
    # lambda-free form of aggregate(toks, 0, acc + length(x))
    total_tok_len = F.length(F.concat_ws("", toks))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)).cast("double"),
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)).cast("double"),
        "avg_token_len": total_tok_len
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
    }


def langid_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Long-format language scores: one row per (doc, lang) with the
    marker-hit count. Relational on purpose — argmax is then a window,
    and the 5× row expansion is trivial next to the text itself."""
    toks = tokenize(F.col(text_col))
    scores = F.array(
        *[
            F.struct(
                F.lit(lang).alias("lang"),
                marker_hits(toks, words).alias("score"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    return df.select(F.col(id_col), F.explode(scores).alias("s")).select(
        id_col, "s.lang", "s.score"
    )


def langid_predict(scores: DataFrame, id_col: str) -> DataFrame:
    """argmax(score) with alphabetical tie-break — deterministic."""
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "score")
    )


def fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: md5 over normalized tokens."""
    return F.md5(F.concat_ws(" ", tokenize(col)))


def window_fingerprints(col: Column, window: int = 8, stride: int = 4) -> Column:
    """Rolling-window fingerprints (near-dup building block): md5 of
    each token window of ``window`` tokens every ``stride`` tokens."""
    toks = tokenize(col)
    n_windows = F.greatest(
        F.lit(1),
        (F.floor((F.size(toks) - window) / stride) + 1).cast("int"),
    )
    return F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * stride + 1, window))),
    )
