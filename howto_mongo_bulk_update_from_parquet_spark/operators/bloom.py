"""Bloom-prefiltered semi join, built entirely from JVM-side
expressions (no Python in the probe's hot path).

The shape Spark's own runtime row-level filtering uses (its
BloomFilterAggregate/BloomFilterMightContain expressions are not
exposed to SQL/pyspark, so this is the public-API reconstruction):

  1. BUILD (distributed): k = `n_hashes` positions per key via
     `xxhash64(key, seed_i) pmod m`; positions fold into a bitset
     DISTRIBUTIVELY — map to (word, bit), `bit_or` per word — so the
     driver collects at most m/64 longs (a design CONSTANT, 32 KiB at
     m=2^18), never anything proportional to the build side.
  2. PROBE (codegen): the bitset ships as one array<long> literal;
     membership is `element_at(bits, word) & mask != 0` AND-ed over
     the k seeds — whole-stage-codegen arithmetic on the scan, before
     any exchange.
  3. VERIFY: an exact semi join on the survivors. Bloom false
     positives (rate ~(1 - e^(-kn/m))^k) only cost shuffle bytes;
     they can never add a wrong row, and false negatives are
     impossible — so the composed operator is EXACT and its oracle is
     the plain semi join.

At 100 TB this is the classic small-ish build side (too big to love
broadcasting the data, tiny as a bitset) pattern: the probe scan drops
(1 - selectivity - fp) of its rows before the join shuffle. Size m at
~14 bits/key for ~1% fp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_bits(keys: DataFrame, key_col: str, *, m_bits: int,
                     n_hashes: int) -> list[int]:
    """Distributed bloom build → dense list of m_bits/64 words."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = keys.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)])).alias("pos"))
    words = (pos.select((F.col("pos") / 64).cast("long").alias("word"),
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"),
                            (F.col("pos") % 64).cast("int")).alias("mask"))
             .groupBy("word").agg(F.bit_or("mask").alias("bits"))
             .collect())  # bounded by m_bits/64 rows — a constant
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r.word] = r.bits
    return dense


def might_contain(bits: list[int], key: Column, *, m_bits: int,
                  n_hashes: int) -> Column:
    """Codegen-able membership test against a built bitset."""
    # Unrolled AND over the k probes, NOT forall(transform(...)): the
    # higher-order-function form would reference the bitset literal
    # once instead of k times, but HOFs are codegen-fallback — the
    # unrolled form keeps the whole probe inside whole-stage codegen,
    # and k copies of a 32 KiB-at-2^18 constant in the task binary are
    # noise next to losing codegen on the scan filter (measured ~40%
    # slower via forall at sf0.1).
    blit = F.lit(bits)
    one = F.lit(1).cast("long")
    checks = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(blit, (pos / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


BITS_PER_KEY = 14          # ≈1% fp at k=5
_M_MIN, _M_MAX = 1 << 14, 1 << 24


def auto_m_bits(n_keys: int) -> int:
    """The sizing rule as code: next power of two ≥ 14 bits/key,
    clamped to [2^14, 2^24] (2 KiB – 2 MiB of driver/task state)."""
    want = max(1, n_keys) * BITS_PER_KEY
    m = _M_MIN
    while m < want and m < _M_MAX:
        m <<= 1
    return m


def bloom_semi_join(probe: DataFrame, keys: DataFrame, probe_col: str,
                    key_col: str, *, m_bits: int | None = None,
                    n_hashes: int = 5) -> DataFrame:
    """EXACT semi join with a bloom prefilter on the probe scan.

    m_bits=None auto-sizes from the build side's count — one cheap
    count job on the SMALL side buys a filter sized to ~1% fp instead
    of a guessed constant that degrades silently as the build grows.
    """
    if m_bits is None:
        m_bits = auto_m_bits(keys.count())
    bits = build_bloom_bits(keys, key_col, m_bits=m_bits,
                            n_hashes=n_hashes)
    pre = probe.filter(might_contain(bits, F.col(probe_col),
                                     m_bits=m_bits, n_hashes=n_hashes))
    return pre.join(keys.select(F.col(key_col).alias(probe_col)).distinct(),
                    on=probe_col, how="left_semi")
