"""As-of join, merge-asof form (SURVEY.md §2.6 scale path).

``j6_asof_latest_order`` (queries/relational.py) demonstrates the
expression form: equi-join on the key then a per-left-row window keeps
the latest match. That plan materializes every (event, earlier-order)
candidate before the window prunes it — fine when matches-per-row are
few, quadratic-ish when one key has deep history.

This module is the O(nL + nR) alternative the round-1 review named as
the 100 TB upgrade: cogroup both sides on the key (one shuffle each,
same as the join) and run a sorted two-pointer merge per key via
``pandas.merge_asof`` inside ``applyInPandas``-over-cogroup. Arrow
moves the batches; pandas does the linear merge; no candidate set is
ever materialized. Semantics are pinned to the window form by sharing
its DuckDB oracle (ties on the right timestamp resolve to the highest
order key in both forms).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def merge_asof_latest(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    id_left: str,
    id_right: str,
    out_col: str,
) -> DataFrame:
    """For each left row, the right row with the greatest
    (ts_right, id_right) such that ts_right <= ts_left; left rows with
    no match are dropped (inner as-of)."""

    def merge(key, l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_left: pd.Series(dtype="int64"),
                              out_col: pd.Series(dtype="int64")})
        if l_pdf.empty or r_pdf.empty:
            return empty
        l_sorted = l_pdf.sort_values(ts_left, kind="mergesort")
        # stable sort: ties on ts_right leave the highest id LAST, which
        # is the row merge_asof(backward) picks — matching the window
        # form's ORDER BY ts DESC, id DESC ... rn = 1
        r_sorted = r_pdf.sort_values([ts_right, id_right], kind="mergesort")
        m = pd.merge_asof(
            l_sorted,
            r_sorted[[ts_right, id_right]],
            left_on=ts_left,
            right_on=ts_right,
            direction="backward",
        )
        m = m.dropna(subset=[id_right])
        if m.empty:
            return empty
        return pd.DataFrame(
            {id_left: m[id_left].astype("int64"),
             out_col: m[id_right].astype("int64")}
        )

    out_schema = f"{id_left} long, {out_col} long"
    return (
        left.groupBy(key_left)
        .cogroup(right.groupBy(key_right))
        .applyInPandas(merge, out_schema)
    )
