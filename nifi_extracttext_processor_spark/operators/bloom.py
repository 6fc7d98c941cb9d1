"""Bloom-filter join pruning — the hand-rolled runtime filter for
selective joins at scale: when only a small fraction of a 100 TB
fact table's keys exist in the dimension side, the shuffle join
still moves EVERY fact row to its hash partition before discovering
the misses. Building a Bloom filter over the dim keys (one bounded
aggregation) and filtering the fact side BEFORE the Exchange drops
the non-matching rows at scan time — the same idea as Spark's
AQE runtime row-group filters, expressed portably so it applies to
any join, any source, any Spark version.

Design:
  * bloom_build: k deterministic hash positions per key
    (xxhash64(key, seed=j) mod m; md5 variant for the oracle),
    union-distinct'ed and collected — the driver transfer is
    bounded by min(k·n, m) ints and the bitset by m/64 longs.
  * bloom_might_contain: a pure-Catalyst membership expression over
    the bitset as a LITERAL long-array (array_position-style literal
    plan, no UDF, no join) — each probe is k (shift, mask) word
    tests. m is plan-bounded: up to ~2^20 bits (16K longs) the
    literal is cheap; beyond that pass the bitset down as a
    broadcast join on the word index instead (not implemented —
    2^20 bits at k=7 holds ~10^5 keys at <1% fp, the dim-side
    regime this operator exists for).
  * bloom_prune_join: filter(bloom) → join. NO FALSE NEGATIVES —
    the pruned join returns exactly the plain join's rows (the
    driver-oracle property: the DuckDB twin is the PLAIN join);
    false positives only cost wasted shuffle rows, bounded by the
    standard (1 − e^{−kn/m})^k rate.

Determinism: positions are pure functions of (key, j); the bitset is
a set union — order-free; the md5 variant replays in DuckDB exactly.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_LITERAL_BITS = 1 << 21


def _positions(col: Column, m_bits: int, k: int,
               md5: bool) -> "list[Column]":
    out = []
    for j in range(k):
        if md5:
            h = F.conv(F.substring(
                F.md5(F.concat(col.cast("string"),
                               F.lit(f"#b{j}"))), 1, 8), 16, 10) \
                .cast("long")
        else:
            h = F.xxhash64(col.cast("string"), F.lit(j))
        out.append(F.pmod(h, F.lit(m_bits)))
    return out


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 7,
    md5: bool = False,
) -> "tuple[list[int], int, int, bool]":
    """Build the filter over df[col]'s distinct values. Returns
    (words, m_bits, k_hashes, md5) where words is the bitset as
    m_bits/64 unsigned 64-bit ints. One distinct aggregation; the
    driver receives at most min(k·n, m) position ints."""
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64, >= 64")
    if m_bits > _MAX_LITERAL_BITS:
        raise ValueError(
            f"m_bits {m_bits} exceeds the literal-plan ceiling "
            f"{_MAX_LITERAL_BITS}; shard the dim or raise k")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    pos = _positions(F.col(col), m_bits, k_hashes, md5)
    rows = (df.filter(F.col(col).isNotNull())
            .select(F.explode(F.array(*pos)).alias("p"))
            .distinct().collect())
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    return words, m_bits, k_hashes, md5


def bloom_might_contain(
    col: Column,
    bloom: "tuple[list[int], int, int, bool]",
) -> Column:
    """Pure-Catalyst membership probe (true ⇒ maybe present, false ⇒
    definitely absent). NULL keys probe false."""
    words, m_bits, k, md5 = bloom
    # literal long array; words stored unsigned, emitted as signed
    signed = [struct.unpack("<q", struct.pack("<Q", w))[0]
              for w in words]
    arr = F.array(*[F.lit(w) for w in signed])
    cond = None
    for p in _positions(col, m_bits, k, md5):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # bit_get takes a COLUMN position (shiftright would demand a
        # literal shift amount) and reads any bit incl. the sign bit
        c = F.bit_get(word, (p % 64).cast("int")) == 1
        cond = c if cond is None else (cond & c)
    return F.when(col.isNull(), F.lit(False)).otherwise(cond)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 17,
    k_hashes: int = 7,
    md5: bool = False,
) -> DataFrame:
    """join(fact ⋈ dim on `on`) with the fact side Bloom-pruned
    before the shuffle. Exactly equal to the plain join for inner
    and left_semi (no false negatives); other join types would
    change semantics and are rejected."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            "bloom pruning preserves only inner/left_semi joins")
    bloom = bloom_build(dim, on, m_bits=m_bits, k_hashes=k_hashes,
                        md5=md5)
    pruned = fact.filter(bloom_might_contain(F.col(on), bloom))
    return pruned.join(dim, on, how)


def bloom_positions_sql(value_expr: str, m_bits: int, k: int) -> str:
    """DuckDB expression list replaying the md5 position arithmetic
    (for bitset-level parity tests)."""
    return ", ".join(
        f"(('0x' || substr(md5(({value_expr})::VARCHAR || '#b{j}'),"
        f" 1, 8))::BIGINT % {m_bits} + {m_bits}) % {m_bits}"
        for j in range(k))
