"""Near-duplicate detection operators for large text corpora:
MinHash + LSH banding, SimHash, and shingling building blocks.

All hashing is engine-portable (md5-hex-prefix → bigint), so every
stage is deterministic and oracle-checkable — no JVM-specific hash
functions in the semantic path.

Scale notes (100 TB of documents):
- MinHash reduces each doc to `n_hashes` ints; LSH banding turns the
  O(N²) pair problem into a groupBy on (band, signature) — only bucket
  collisions become candidate pairs. Everything is shuffle-by-key; no
  cross join anywhere.
- Band count tunes recall/precision: P(candidate) = 1-(1-j^r)^b for
  Jaccard j, r rows/band, b bands.
- SimHash reduces a doc to one 60-bit int; near-dups differ in few
  bits. Bucket by bit-prefix for candidate generation at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _widen(df: DataFrame, key: str) -> DataFrame:
    """Spread the input across the cluster before a CPU-heavy map
    stage, keyed so downstream per-id aggregations reuse the layout.
    Unconditional: the shuffle moves only the raw rows — cheap next to
    hashing every shingle — and probing the current partition count
    would force a plan→RDD conversion just to sometimes skip it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, key)


def portable_hash64(col: Column, seed: Column | None = None) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB:
    first 15 hex chars of md5 → bigint. Used instead of xxhash64 so
    oracles can reproduce signatures exactly."""
    keyed = col if seed is None else F.concat(seed.cast("string"), F.lit(":"), col)
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-token shingles per document: (id, shingle).

    Tokenizes once into a named column first — inlining `split()` in
    the lambda makes codegen re-split the text for every element
    access (~3× shingle count), a 5× slowdown at corpus scale."""
    df = _widen(df, id_col)
    toks = df.select(id_col, F.split(F.col(text_col), " ").alias("__tk"))
    # size guard: sequence(0, size-n) on a doc with < n tokens would
    # generate a DESCENDING sequence (e.g. [0,-1]) → invalid indexes
    # under ANSI mode; short docs must yield zero shingles instead.
    expr = (f"CASE WHEN size(__tk) >= {n} THEN "
            f"transform(sequence(0, size(__tk) - {n}), "
            f"i -> concat_ws(' ', " +
            ", ".join(f"__tk[i+{j}]" for j in range(n)) +
            ")) ELSE array() END")
    # per-doc uniqueness comes from array_distinct; a post-explode
    # .distinct() would just re-shuffle rows that are already unique
    return toks.select(id_col, F.explode(F.array_distinct(F.expr(expr))).alias("shingle"))


MINHASH_PRIME = 2_147_483_647  # 2^31-1; keeps a*h+b inside 63 bits


def minhash_signatures(shingle_df: DataFrame, id_col: str,
                       n_hashes: int = 16) -> DataFrame:
    """(id, seed, minhash): classic MinHash — ONE base hash per shingle
    (md5-prefix → bigint, mod p) and `n_hashes` linear permutations
    h_i = ((2i+1)·h + i²+7) mod p. One md5 per shingle instead of one
    per (shingle, seed): 16× less hashing, same oracle-exact integer
    math in both engines."""
    base = (portable_hash64(F.col("shingle")) % MINHASH_PRIME).alias("h")
    hashed = shingle_df.select(id_col, base)
    # all permutations in ONE aggregation pass (no 16× row blowup /
    # shuffle), then unpivot the wide mins to (seed, minhash)
    mins = hashed.groupBy(id_col).agg(*[
        F.min(((2 * i + 1) * F.col("h") + i * i + 7) % MINHASH_PRIME).alias(f"mh_{i}")
        for i in range(n_hashes)])
    stack_expr = (f"stack({n_hashes}, " + ", ".join(
        f"CAST({i} AS INT), mh_{i}" for i in range(n_hashes)) + ") AS (seed, minhash)")
    return mins.selectExpr(id_col, stack_expr)


def lsh_bands(sig_df: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Fold signatures into per-band bucket keys: (id, band, band_sig)."""
    banded = sig_df.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    sig = F.transform(
        F.sort_array(F.collect_list(F.struct("seed", "minhash"))),
        lambda s: s["minhash"].cast("string"))
    return (banded.groupBy(id_col, "band")
            .agg(F.concat_ws("-", sig).alias("band_sig")))


def lsh_candidate_pairs(band_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing ≥1 band bucket. The join key
    is (band, band_sig) — bucket-local, never all-pairs."""
    a = band_df.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = band_df.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (a.join(b, ["band", "band_sig"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())


def minhash_near_dups(df: DataFrame, id_col: str, text_col: str, *,
                      shingle_n: int = 3, n_hashes: int = 16,
                      rows_per_band: int = 4) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidate pairs."""
    sh = shingles(df, id_col, text_col, shingle_n)
    sig = minhash_signatures(sh, id_col, n_hashes)
    bands = lsh_bands(sig, id_col, rows_per_band)
    return lsh_candidate_pairs(bands, id_col)


def simhash(df: DataFrame, id_col: str, text_col: str,
            n_bits: int = 60) -> DataFrame:
    """60-bit SimHash per document: each distinct token votes ±1 on
    every bit of its hash; the sign of each bit-sum forms the
    fingerprint. (id, simhash bigint).

    Computed per-partition with Arrow batches + numpy (zero shuffle —
    the relational formulation explodes rows 60× and shuffles them;
    this one touches each document once). All-integer math, so it is
    bit-identical to the SQL oracle."""
    import hashlib

    import numpy as np
    import pandas as pd

    def per_batch(batches):
        shifts = np.arange(n_bits, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for text in pdf[text_col]:
                toks = set(text.split(" "))
                hs = np.fromiter(
                    (int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                     for t in toks), dtype=np.int64, count=len(toks))
                bits = (hs[:, None] >> shifts) & 1          # (n_toks, n_bits)
                votes = (2 * bits - 1).sum(axis=0)
                out.append(int(((votes > 0).astype(np.int64) << shifts).sum()))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "simhash": out})

    # no repartition here: the per-doc numpy work is light enough that
    # shuffling rows to widen parallelism costs more than it buys
    return df.select(id_col, text_col).mapInPandas(
        per_batch, schema=f"{id_col} long, simhash long")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
