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


def portable_hash64(col: Column, seed: Column | None = None) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB:
    first 15 hex chars of md5 → bigint. Used instead of xxhash64 so
    oracles can reproduce signatures exactly."""
    keyed = col if seed is None else F.concat(seed.cast("string"), F.lit(":"), col)
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-token shingles per document: (id, shingle)."""
    expr = (f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
            f"i -> concat_ws(' ', " +
            ", ".join(f"split({text_col}, ' ')[i+{j}]" for j in range(n)) + "))")
    return (df.select(id_col, F.explode(F.array_distinct(F.expr(expr))).alias("shingle"))
              .distinct())


def minhash_signatures(shingle_df: DataFrame, id_col: str,
                       n_hashes: int = 16) -> DataFrame:
    """(id, seed, minhash): min over the doc's shingles of the seeded
    portable hash — `n_hashes` independent permutationapproximations."""
    spark = shingle_df.sparkSession
    seeds = F.broadcast(spark.range(n_hashes).select(F.col("id").cast("int").alias("seed")))
    return (shingle_df.crossJoin(seeds)
            .groupBy(id_col, "seed")
            .agg(F.min(portable_hash64(F.col("shingle"), F.col("seed"))).alias("minhash")))


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
    fingerprint. (id, simhash bigint)."""
    spark = df.sparkSession
    toks = (df.select(id_col, F.explode(F.array_distinct(
                F.split(F.col(text_col), " "))).alias("tok"))
              .distinct()
              .select(id_col, portable_hash64(F.col("tok")).alias("th")))
    bits = F.broadcast(spark.range(n_bits).select(F.col("id").cast("int").alias("b")))
    votes = (toks.crossJoin(bits)
             .groupBy(id_col, "b")
             .agg(F.sum(F.when(F.expr("(th >> b) & 1") == 1, 1)
                         .otherwise(-1)).alias("w")))
    return (votes.groupBy(id_col)
            .agg(F.sum(F.when(F.col("w") > 0,
                              F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
                        .otherwise(F.lit(0))).cast("long").alias("simhash")))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
