"""[EXT] Mergeable set/cardinality sketches: Bloom filter + HyperLogLog.

Beyond-reference engine components for the 100 TB curation pipeline
(same family as ``textops.countmin_sketch``): fixed-size summaries that
each partition builds locally and that merge associatively, so the only
thing that ever shuffles is the sketch, never the corpus.

- Bloom filter (Bloom 1970): "have we seen this URL/doc hash before?"
  membership for incremental crawls. Built as packed bit-words via
  ``bit_or`` aggregation (map-side partial = per-partition local bloom,
  reduce = word-wise OR merge — the textbook distributed construction).
  Probing broadcasts the filter (fixed 4096 words regardless of corpus
  size) and never shuffles the probe side beyond a per-key bool_and.
- HyperLogLog (Flajolet et al. 2007): re-aggregatable distinct counts.
  Registers are (group, reg, max_rank) rows — storing them per shard
  and max-merging later answers "distinct across any union of shards"
  without rescanning text, which approx_count_distinct (one-shot,
  opaque) cannot.

Both use salted-md5-derived hashes (the ``textops._cms_bucket``
discipline) so DuckDB replicates every bit exactly: even Bloom false
positives are deterministic and identical cross-engine, which is what
lets the driver hash-gate them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bloom geometry: 4 salted hashes into 2^16 bit positions, packed as
# 4096 words x 16 bits. For n distinct keys the false-positive rate is
# (1 - e^(-4n/65536))^4 — ~1.2e-5 at n=1000, ~2.4e-2 at n=8192.
# Callers with bigger key sets scale BLOOM_HEX (5 hex chars = 2^20
# bits, etc.); the construction below is geometry-independent.
BLOOM_K = 4
BLOOM_HEX = 4  # hex chars per position: 2^(4*BLOOM_HEX) bits total

def _bloom_pos(val: Column, j: int) -> Column:
    """Position j: first BLOOM_HEX hex chars of a salted md5."""
    return F.substring(F.md5(F.concat(val, F.lit(f":bf{j}"))), 1, BLOOM_HEX)


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    """Split a hex position into (word key, bit mask): the first
    BLOOM_HEX-1 chars address a 16-bit word, the last char the bit
    (conv hex->int here; strpos over '0123456789abcdef' minus one on
    the DuckDB side). power(2, bit) is exact in double for bit <= 15,
    identically in Spark and DuckDB."""
    word = F.substring(pos, 1, BLOOM_HEX - 1)
    bit = F.conv(F.substring(pos, BLOOM_HEX, 1), 16, 10).cast("int")
    mask = F.pow(F.lit(2.0), bit).cast("long")
    return word, mask


def _bloom_cells(val: Column) -> Column:
    """All K (word, mask) cells of a value, as one array column — the
    SINGLE definition both build and probe explode, so the geometry can
    never desynchronize between them (the DuckDB mirrors are
    queries/sketches.py _BF_WORD/_BF_MASK)."""
    cells = []
    for j in range(BLOOM_K):
        word, mask = _word_and_mask(_bloom_pos(val, j))
        cells.append(F.struct(word.alias("word"), mask.alias("mask")))
    return F.array(*cells)


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Build a Bloom filter over the values of ``col`` as a sparse
    (word, bits) table — at most 4096 rows at ANY corpus scale.

    Scale shape: explode each value into its K (word, mask) cells, then
    ``bit_or`` by word. HashAggregate partial-merges map-side, so each
    input partition reduces to <=4096 rows before the single sketch-
    sized shuffle; unioning two filters and re-running the same
    ``groupBy(word).agg(bit_or)`` IS the merge operation."""
    return (
        df.select(F.explode(_bloom_cells(F.col(col))).alias("c"))
        .groupBy(F.col("c.word").alias("word"))
        .agg(F.bit_or(F.col("c.mask")).alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame, probes: DataFrame, col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Probe the filter: ``might_contain`` is true iff all K bits are
    set. No false negatives ever (every inserted key set exactly these
    bits); false positives are bounded by the geometry and — because
    the hashes are salted md5 — bit-identical across engines.

    Plan: probe explodes to K rows, LEFT-joins the BROADCAST filter
    (absent word = all-zero word, hence the coalesce — an inner join
    would silently drop definitely-absent keys instead of answering
    false), and bool_and's back to one row per probe. The only shuffle
    is the final per-key regroup, which partial-aggregates map-side."""
    pr = probes.select(
        col, *carry, F.explode(_bloom_cells(F.col(col))).alias("c")
    ).select(
        col, *carry, F.col("c.word").alias("word"), F.col("c.mask").alias("mask")
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    return (
        pr.join(F.broadcast(bloom), ["word"], "left")
        .groupBy(col, *carry)
        .agg(F.bool_and(hit).alias("might_contain"))
    )


# HLL geometry: 256 registers (first 2 hex chars), rank from the next
# 13 hex chars (52 bits), capped at RANK_CAP so the scaled power-of-two
# summands stay exact in BIGINT: sum <= 256 * 2^40 = 2^48.
HLL_REG_HEX = 2
HLL_M = 256
RANK_CAP = 40


def hll_register_rows(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """Per (group, register) max-rank rows — the mergeable HLL state.

    rank = (# leading zero bits of the 52-bit hash suffix) + 1, derived
    from the hex string so Spark and DuckDB agree bit-for-bit: 4 bits
    per leading '0' char, plus 3/2/1/0 for a first nonzero char of
    1 / 2-3 / 4-7 / 8-f. Registers a group never hits simply have no
    row (treated as rank 0 downstream).

    Scale shape: groupBy(group, reg).max(rank) partial-aggregates
    map-side, so each partition contributes at most m=256 rows per
    group to the shuffle; re-running the same max-groupBy over a union
    of shard states IS the HLL merge."""
    h = F.md5(F.concat(F.col(col), F.lit(":hll")))
    reg = F.substring(h, 1, HLL_REG_HEX)
    suffix = F.substring(h, HLL_REG_HEX + 1, 13)
    nz = F.length(F.regexp_extract(suffix, "^(0*)", 1))
    first = F.substring(suffix, nz + 1, 1)
    sub = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(nz == 13, F.lit(53)).otherwise(nz * 4 + sub + 1)
    rank = F.least(rank, F.lit(RANK_CAP))
    return (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("rank"))
    )


def hll_summary(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse register rows to one exact-integer row per group:

    - ``hll_sum_scaled`` = sum over all m registers of 2^(RANK_CAP -
      rank) (absent register -> rank 0 -> 2^RANK_CAP), the denominator
      of the HLL estimate scaled to an exact BIGINT — power-of-two
      doubles cast exactly, and the sum fits in 2^48;
    - ``hll_zero_regs`` = # registers never hit (the linear-counting
      input).

    The float estimate alpha*m^2*2^RANK_CAP / sum_scaled (with
    small-range correction) is derived driver-side or in tests; the
    driver-gated columns stay integer so the cross-engine hash is
    exact regardless of float summation order."""
    present = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(RANK_CAP) - F.col("rank")).cast("long"))
        .alias("present_sum"),
    )
    zero = F.lit(HLL_M) - F.col("n_regs")
    scale = F.pow(F.lit(2.0), F.lit(RANK_CAP)).cast("long")
    return present.select(
        *group_cols,
        (F.col("present_sum") + zero * scale).alias("hll_sum_scaled"),
        zero.cast("int").alias("hll_zero_regs"),
    )


def hll_estimate(sum_scaled: int, zero_regs: int) -> float:
    """Driver-side estimate from the exact integer state (Flajolet et
    al. 2007): raw = alpha_m * m^2 / sum(2^-rank), with the linear-
    counting correction for the small range. Python, not a Column —
    the distributed part of HLL is the integer state above."""
    import math

    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m * (2**RANK_CAP) / sum_scaled
    if raw <= 2.5 * m and zero_regs > 0:
        return m * math.log(m / zero_regs)
    return raw


def bloom_word_values(bloom: DataFrame) -> list:
    """Densify a sparse (word, bits) Bloom into a 4096-long Python
    list (word w's bits at index conv(w,16,10)) — ONE bounded driver
    collect (<=4096 ints, the codebook class). The caller embeds it as
    a constant-folded array literal so probing is an O(1) element_at.

    Why this exact shape (two slower forms were measured and killed):
    a broadcast MapType column probed with element_at is a LINEAR scan
    of the 4096 entries per lookup (~78 s for sf0.1's 2.4M probes);
    a 16 KiB hex-string literal probed with dynamic-position substring
    is O(position) per call (UTF8String counts code points from the
    start — ~44 s). The folded array literal runs the same prefilter
    in ~1 s. Dense fixed-domain lookups want ARRAY literals."""
    rows = bloom.collect()
    words = [0] * (16 ** (BLOOM_HEX - 1))
    for r in rows:
        words[int(r["word"], 16)] = r["bits"]
    return words


def bloom_contains_array_expr(val: Column, words: list) -> Column:
    """Scan-side Bloom membership against the dense word array (see
    bloom_word_values): K salted md5 draws -> word index -> O(1)
    element_at into the constant-folded literal array -> mask test.
    Same geometry and bits as bloom_build/bloom_contains_expr: no
    false negatives ever, deterministic false positives. Lambda-free,
    fully codegen'd; the 4096-literal array folds to a single Literal
    at plan time, and it is built as ONE F.expr string — 4096
    individual F.lit() calls cost ~1 ms of py4j round-trip EACH
    (~8 s of driver time per plan, measured), a single 20 KiB SQL
    string parses in milliseconds."""
    arr = F.expr(
        "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
    )
    pred = None
    for j in range(BLOOM_K):
        pos_hex = _bloom_pos(val, j)
        word = F.substring(pos_hex, 1, BLOOM_HEX - 1)
        bit = F.conv(F.substring(pos_hex, BLOOM_HEX, 1), 16, 10).cast("int")
        mask = F.pow(F.lit(2.0), bit).cast("long")
        idx = F.conv(word, 16, 10).cast("int") + 1
        hit = (
            F.element_at(arr, idx).bitwiseAND(mask) == mask
        )
        pred = hit if pred is None else (pred & hit)
    return pred
