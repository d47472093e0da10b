"""Random-hyperplane (SimHash-for-vectors) LSH over the embeddings
table — the candidate-generation stage for cosine near-dup at scale
(complements the blocked exact sweep in operators/vector_blocks.py and
the MinHash text LSH in operators/dedup.py).

Hyperplane signs are derived from md5 parity (portable integer math,
same discipline as operators/dedup.portable_hash64), and every dot
product folds EXACT decimals, so bit signatures are engine-identical —
the whole pipeline stays oracle-checkable.

Scale notes (100 TB of vectors): each vector reduces to one 16-bit
bucket id in a single JVM-side projection pass (no shuffle, no Python);
candidate pairs then come from a groupBy/self-join on the bucket —
O(collisions), never all-pairs. P(same bucket) = (1 - θ/π)^16 for
angle θ, so near-identical vectors collide with high probability while
random pairs spread across 65k buckets.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

N_BITS = 16
DIM = 64


def _sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 parity — reproducible in any engine."""
    return 1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) % 2 else -1


SCALE = 1_000_000_000  # fixed-point: v → round(v·1e9) as long


def scaled_vec(vec: Column) -> Column:
    """Fixed-point form of the embedding: round(v·1e9) as BIGINT.
    Exact long arithmetic from here on — order-independent, overflow-
    safe (|v| ≤ 1 ⇒ |dot| ≤ 64·1e9 ≪ 2⁶³), and an order of magnitude
    faster than decimal folds (stays in whole-stage codegen). The
    rounded value is an exact integer-valued double (< 2⁵³), so the
    long cast is identical in both engines despite their different
    double→int cast rules."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * SCALE, 0).cast("long"))


def rhp_bucket_from_scaled(v: Column, n_bits: int = N_BITS,
                           dim: int = DIM) -> Column:
    """Bucket id: bit i = sign(v · h_i) for md5-derived hyperplane h_i,
    over the fixed-point vector (compute `scaled_vec` ONCE in a
    projection first — referencing the raw transform here would
    re-evaluate it per bit)."""
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        signs = F.array(*[F.lit(_sign(i, j)) for j in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


_RHP_BUCKETS_SQL = f"""
  WITH vals AS (
    SELECT vec_id,
           unnest(range(1, len(embedding) + 1)) AS j,
           embedding
    FROM embeddings
  ),
  prods AS (
    SELECT vec_id, i.i,
           CAST(ROUND(CAST(embedding[j] AS DOUBLE) * {SCALE}) AS BIGINT)
             * (CASE WHEN CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' || CAST(j - 1 AS VARCHAR)), 1, 1)) AS INT) % 2 = 1
                     THEN 1 ELSE -1 END) AS p
    FROM vals CROSS JOIN (SELECT unnest(range(0, {N_BITS})) AS i) i
  ),
  bits AS (
    SELECT vec_id, i, SUM(p) > 0 AS bit FROM prods GROUP BY vec_id, i
  )
  SELECT vec_id,
         CAST(SUM(CASE WHEN bit THEN CAST(POW(2, i) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id
"""

RHP_ORACLE = _RHP_BUCKETS_SQL


@register("q_rhp_lsh_buckets", RHP_ORACLE,
          "random-hyperplane LSH bucket per embedding: 16 md5-derived "
          "hyperplanes, exact fixed-point dot signs, zero-shuffle projection")
def q_rhp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
            .select("vec_id", rhp_bucket_from_scaled(F.col("__v")).alias("bucket")))


RHP_PAIRS_ORACLE = f"""
WITH buckets AS (
  SELECT * FROM ({_RHP_BUCKETS_SQL})
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


@register("q_rhp_lsh_pairs", RHP_PAIRS_ORACLE,
          "vector near-dup candidate pairs: self-join on the RHP bucket "
          "— O(bucket collisions), never all-pairs")
def q_rhp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    b = (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
         .select("vec_id", rhp_bucket_from_scaled(F.col("__v")).alias("bucket")))
    a = b.select(F.col("vec_id").alias("id_a"), "bucket")
    c = b.select(F.col("vec_id").alias("id_b"), "bucket")
    return (a.join(c, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "bucket"))
