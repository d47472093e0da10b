"""Bloom-prefiltered semi join, built entirely from JVM-side
expressions (no Python in the probe's hot path).

The shape Spark's own runtime row-level filtering uses (its
BloomFilterAggregate/BloomFilterMightContain expressions are not
exposed to SQL/pyspark, so this is the public-API reconstruction):

  1. BUILD (distributed): BLOCKED layout (r16) — each key selects
     ONE 64-bit word (`xxhash64(key, -1) mod m/64`) and k =
     `n_hashes` bits inside it (`xxhash64(key, i) mod 64`); the
     per-key masks fold DISTRIBUTIVELY (`bit_or` per word), so the
     driver collects at most m/64 longs (a design CONSTANT, 32 KiB
     at m=2^18), never anything proportional to the build side.
  2. PROBE (codegen): the bitset ships as ONE array<long> literal;
     membership is a single `element_at(bits, word) & mask == mask`
     — whole-stage-codegen arithmetic on the scan, before any
     exchange, one literal reference total (the classic k-position
     layout embedded the literal k times and measured slower than
     the unfiltered join at 2^18 bits).
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


def _word_and_mask(key: Column, *, m_bits: int,
                   n_hashes: int) -> tuple[Column, Column]:
    """The blocked-bloom placement shared by build and probe: ONE
    word per key (`xxhash64(key, -1) mod n_words`), `n_hashes` bits
    inside that word (`xxhash64(key, i) mod 64`). Build and probe
    must agree bit-for-bit, so the formulas live in one place."""
    word = F.pmod(F.xxhash64(key, F.lit(-1)), F.lit(m_bits // 64))
    one = F.lit(1).cast("long")
    mask = None
    for i in range(n_hashes):
        b = F.call_function(
            "shiftleft", one,
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(64)).cast("int"))
        mask = b if mask is None else mask.bitwiseOR(b)
    return word, mask


def build_bloom_bits(keys: DataFrame, key_col: str, *, m_bits: int,
                     n_hashes: int) -> list[int]:
    """Distributed bloom build → dense list of m_bits/64 words.

    BLOCKED layout (r16, the Putze/Sanders/Singler cache-line bloom):
    each key picks ONE 64-bit word and sets its k bits inside that
    word, instead of k independent positions across the whole bitset.
    The probe then needs a single `element_at` against a single
    array literal — the classic layout embedded the 4096-long literal
    once PER HASH in the plan (5 copies at 2^18 bits), which bloated
    the task binary past 1 MiB and measured 3-6× slower than the
    plain semi join it was supposed to beat (guide §1.2: fix the
    per-task work). Same no-false-negative guarantee; the fp rate for
    equal m is somewhat worse (bits cluster within words), which the
    exact verify join absorbs — sizing stays ~14 bits/key. Build is
    one row per key (no explode), map-side bit_or combined."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    word, mask = _word_and_mask(F.col(key_col), m_bits=m_bits,
                                n_hashes=n_hashes)
    words = (keys.select(word.alias("word"), mask.alias("mask"))
             .groupBy("word").agg(F.bit_or("mask").alias("bits"))
             .collect())  # bounded by m_bits/64 rows — a constant
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r.word] = r.bits
    return dense


def might_contain(bits: list[int], key: Column, *, m_bits: int,
                  n_hashes: int) -> Column:
    """Codegen-able membership test against a built blocked bitset:
    one `element_at` into the ONE array literal, one mask compare —
    all of a key's bits live in the same word by construction."""
    word, mask = _word_and_mask(key, m_bits=m_bits, n_hashes=n_hashes)
    got = F.element_at(F.lit(bits), word.cast("int") + 1)
    return got.bitwiseAND(mask) == mask


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
