"""[EXT] Data-layout operators: Z-order (Morton) interleaving.

Multi-dimensional clustering for scan locality — the primitive behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse/Iceberg z-ordering:
sorting rows by the bit-interleaved key places rows close in BOTH
dimensions close on disk, so min/max-pruned scans over either column
(or a rectangle of both) touch few files, where a lexicographic sort
gives locality only on its leading column.

Everything is integer bit math (shift/mask/or-as-add with
non-overlapping bit positions), bit-identical across engines and
partitionings, so the demo query is fully hash-checkable. The key is
built once per row by whole-stage-codegen expressions — no UDF, no
shuffle; the SORT the key enables is the usual repartitionByRange
write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton key: x occupies even bit positions, y odd —
    key = Σ_i ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1). Terms occupy
    disjoint bit positions, so fixed-order integer addition ≡ bitwise
    OR and the result is exact at any parallelism. 2·bits ≤ 62 keeps
    the key in a signed 64-bit long."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xs = x.cast("long")
    ys = y.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def zorder_key2_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB-side mirror of :func:`zorder_key2`: same term order,
    same disjoint-bit addition, spelled with DuckDB's shift operators."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def ffd_binpack(files: DataFrame, capacity: int) -> DataFrame:
    """First-fit-decreasing compaction planning (round 12): given a
    manifest of (part, fid, sz) small-file rows, assign each file a
    target bin per PARTITION — files sorted size-descending (fid
    ascending on ties), each placed into the LOWEST-index bin whose
    load + size stays within ``capacity``, else a new bin. The
    classic 11/9·OPT+1 heuristic (Johnson 1973) every lakehouse
    compaction service (Iceberg/Delta OPTIMIZE) runs per partition.

    Returns (part, fid, sz, bin) with bin 1-based in placement order.
    Oversized files (sz > capacity) open their own bin and nothing
    else joins it — the natural first-fit behavior, kept rather than
    special-cased.

    Scale shape: FFD is inherently sequential IN ITS FOLD, so the
    distribution axis is the partition — exactly how real table
    services shard the problem — via one grouped-map
    ``applyInPandas`` over part (the w35_holt_linear mechanism);
    per-partition manifests are file COUNTS (thousands), not data, so
    the per-group state is trivially bounded. The oracle replays the
    identical fold as a recursive CTE whose state is the per-bin load
    LIST (``layout_compaction_binpack``)."""
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["sz", "fid"], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        bins: list[int] = []
        for sz in pdf["sz"]:
            sz = int(sz)
            for j, ld in enumerate(loads):
                if ld + sz <= capacity:
                    loads[j] = ld + sz
                    bins.append(j + 1)
                    break
            else:
                loads.append(sz)
                bins.append(len(loads))
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return files.select("part", "fid", "sz").groupBy("part").applyInPandas(
        pack, "part long, fid long, sz long, bin long"
    )
