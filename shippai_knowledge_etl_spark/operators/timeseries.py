"""[EXT] Time-series downsampling: largest-triangle-three-buckets.

LTTB (Steinarsson 2013) is the canonical visualization downsampler:
keep the first and last points, split the rest into equal buckets,
and from each bucket keep the point forming the largest triangle with
the PREVIOUSLY selected point and the next bucket's centroid — so
peaks and reversals survive where uniform sampling flattens them.

The selection is sequential WITHIN a series (each pick depends on the
previous one) but series are independent, so the right Spark shape is
``applyInPandas`` grouped by the series key — the sanctioned Python
path for genuinely per-key-sequential logic (SURVEY §2's grouped-map
exemplars). Per-task memory is one series; nothing global.

Determinism: pure float arithmetic over the same ordered points in a
single Python process per series; ties (equal areas) break to the
EARLIEST point explicitly, so repeated runs and partitionings give
identical output. No SQL analog exists (the recurrence is not
relational) → the registered demo is rows-only with golden pytests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

LTTB_SCHEMA = "user_id long, t long, x double, kept_rank int"


def _lttb(ts, xs, k):
    """Indices kept by LTTB for one ordered series (pure Python, the
    golden-testable kernel). k >= 3; returns all indices if n <= k."""
    n = len(ts)
    if n <= k:
        return list(range(n))
    kept = [0]
    # bucket boundaries over the interior points [1, n-1)
    inner = n - 2
    buckets = k - 2
    for b in range(buckets):
        lo = 1 + (b * inner) // buckets
        hi = 1 + ((b + 1) * inner) // buckets
        # next bucket's centroid (or the final point for the last bucket)
        nlo = 1 + ((b + 1) * inner) // buckets
        nhi = 1 + ((b + 2) * inner) // buckets if b + 1 < buckets else n - 1
        if nlo >= nhi:
            cx, cy = float(ts[n - 1]), float(xs[n - 1])
        else:
            cx = sum(float(ts[i]) for i in range(nlo, nhi)) / (nhi - nlo)
            cy = sum(float(xs[i]) for i in range(nlo, nhi)) / (nhi - nlo)
        ax, ay = float(ts[kept[-1]]), float(xs[kept[-1]])
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (ax - cx) * (float(xs[i]) - ay)
                - (ax - float(ts[i])) * (cy - ay)
            )
            if area > best_area:  # strict: ties keep the earliest
                best, best_area = i, area
        kept.append(best)
    kept.append(n - 1)
    return kept


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    k: int = 20,
) -> DataFrame:
    """Downsample each key's (t, x) series to at most ``k`` points via
    LTTB. Returns (user_id, t, x, kept_rank) — kept_rank is the
    point's position in the downsampled series (0-based), so consumers can
    re-sort cheaply. Series with <= k points pass through whole."""
    if k < 3:
        raise ValueError("k must be >= 3 (endpoints + one bucket)")

    def one_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values(["t", "x"]).reset_index(drop=True)
        idx = _lttb(pdf["t"].tolist(), pdf["x"].tolist(), k)
        out = pdf.iloc[idx].reset_index(drop=True)
        out["kept_rank"] = range(len(idx))
        return out[["user_id", "t", "x", "kept_rank"]]

    base = df.select(
        F.col(key_col).alias("user_id"),
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("double").alias("x"),
    )
    return base.groupBy("user_id").applyInPandas(one_group, LTTB_SCHEMA)
