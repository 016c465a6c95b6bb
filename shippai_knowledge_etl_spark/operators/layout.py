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

from pyspark.sql import Column
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
