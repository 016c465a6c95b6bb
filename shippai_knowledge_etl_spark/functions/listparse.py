"""Fold-style list parsing: F3–F6 of SURVEY.md §2.3.

The reference parses the 知識化 (knowledge) field in three formats
(src/extract.py:149-180): bullet lines (``・item``), numbered lines
(ASCII or full-width digits + ``．``/``.``), or a single plain item.
Continuation lines merge into the previous item with NO separator
(``items[-1] += line`` / ``"".join(current)``); a continuation before
any item is dropped.

Spark-first form: the stateful fold is the canonical higher-order
``aggregate`` use case (SURVEY §7.4 item 2) — a pure expression, no
UDF, so it stays inside codegen and scales as a narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from shippai_knowledge_etl_spark.functions.scalar import trim_ws

# Numbered-line marker: ASCII and full-width digits, ASCII or full-width
# dot (src/extract.py:158,165). Java regex handles the full-width class.
NUM_MARKER = r"^[0-9０-９]+[．.]\s*"

_EMPTY = "CAST(array() AS ARRAY<STRING>)"


def _append(acc: Column, item: Column) -> Column:
    return F.concat(acc, F.array(item))


def _merge_last(acc: Column, line: Column) -> Column:
    """items[-1] += line — replace the last element, no separator."""
    return F.concat(
        F.slice(acc, 1, F.size(acc) - 1),
        F.array(F.concat(F.element_at(acc, -1), line)),
    )


def _nonblank_lines(col: Column) -> Column:
    return F.filter(
        F.transform(F.split(col, "\n"), trim_ws), lambda x: x != ""
    )


def parse_bullet_list(col: Column) -> Column:
    """F3: lines starting ``・`` open an item (marker stripped); other
    lines merge into the previous item (src/extract.py:151-157)."""
    return F.aggregate(
        _nonblank_lines(col),
        F.expr(_EMPTY),
        lambda acc, x: F.when(
            x.startswith("・"), _append(acc, trim_ws(F.substring(x, 2, 1 << 30)))
        )
        .when(F.size(acc) > 0, _merge_last(acc, x))
        .otherwise(acc),
    )


def parse_numbered_list(col: Column) -> Column:
    """F4: ``^N．``/``^N.`` (ASCII or full-width) opens an item with the
    marker stripped; continuations merge (src/extract.py:158-174)."""
    return F.aggregate(
        _nonblank_lines(col),
        F.expr(_EMPTY),
        lambda acc, x: F.when(
            x.rlike(NUM_MARKER), _append(acc, F.regexp_replace(x, NUM_MARKER, ""))
        )
        .when(F.size(acc) > 0, _merge_last(acc, x))
        .otherwise(acc),
    )


def parse_single_item(col: Column) -> Column:
    """F5: non-empty text → one-element array, else empty
    (src/extract.py:175-180)."""
    t = trim_ws(col)
    return F.when(t != "", F.array(t)).otherwise(F.expr(_EMPTY))


def parse_knowledge(col: Column) -> Column:
    """F6: format dispatch mirroring src/extract.py:149-177 —
    ``・`` anywhere → bullets; else multiline numbered marker → numbered;
    else plain single item; null/empty → []."""
    text = trim_ws(F.coalesce(col, F.lit("")))
    return (
        F.when(text.contains("・"), parse_bullet_list(text))
        .when(text.rlike("(?m)" + NUM_MARKER), parse_numbered_list(text))
        .otherwise(parse_single_item(text))
    )
