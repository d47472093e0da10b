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
                           dim: int = DIM, offset: int = 0) -> Column:
    """Bucket id: bit i = sign(v · h_{offset+i}) for md5-derived
    hyperplane h, over the fixed-point vector (compute `scaled_vec`
    ONCE in a projection first — referencing the raw transform here
    would re-evaluate it per bit). `offset` selects a disjoint
    hyperplane family, so banded LSH (q_vector_lsh_verified) reuses
    this with offset = band * bits_per_band."""
    bucket = F.lit(0).cast("long")
    for i in range(n_bits):
        signs = F.array(*[F.lit(_sign(offset + i, j)) for j in range(dim)])
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


# --- banded RHP LSH → exact-cosine verify (the production path) --------

N_BANDS = 6
BITS_PER_BAND = 6
VERIFY_THRESHOLD = 0.45

_RHP_BANDS_SQL = f"""
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
    FROM vals CROSS JOIN (SELECT unnest(range(0, {N_BANDS * BITS_PER_BAND})) AS i) i
  ),
  bits AS (
    SELECT vec_id, i, SUM(p) > 0 AS bit FROM prods GROUP BY vec_id, i
  )
  SELECT vec_id, i // {BITS_PER_BAND} AS band,
         CAST(SUM(CASE WHEN bit THEN CAST(POW(2, i % {BITS_PER_BAND}) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id, i // {BITS_PER_BAND}
"""

VECTOR_LSH_VERIFIED_ORACLE = f"""
WITH bands AS (
  {_RHP_BANDS_SQL}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(va.ev, vb.ev), 6) AS cos_sim
FROM cand c
JOIN v va ON va.vec_id = c.id_a
JOIN v vb ON vb.vec_id = c.id_b
WHERE ROUND(list_cosine_similarity(va.ev, vb.ev), 6) >= {VERIFY_THRESHOLD}
"""


@register("q_vector_lsh_verified", VECTOR_LSH_VERIFIED_ORACLE,
          "PRODUCTION vector near-dup path: banded RHP-LSH candidate "
          "pairs, then exact cosine verified ONLY on candidates")
def q_vector_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for N×N embedding near-dup (100 TB of vectors):

    1. candidate generation — one zero-shuffle JVM projection reduces
       every vector to 6 band buckets of 6 hyperplane-sign bits each
       (disjoint md5-derived families via `offset`); a self-join on
       (band, bucket) + distinct yields O(collisions) candidate pairs,
       never N². Banding trades cost for recall exactly like MinHash
       bands: P(candidate) = 1 - (1 - (1-θ/π)^b)^L.
    2. verification — exact cosine computed only on the candidates.
       Norms are precomputed ONCE per vector (carried through the two
       hash-joins), so each candidate pair pays a single dot-product
       fold instead of three — at N vectors and C candidates that is
       N + C folds, not 3C.

    `operators/vector_blocks.cosine_all_pairs_blocked` (q_embedding_
    neardup) is the exactness VALIDATION BASELINE for this pipeline —
    the production default at scale is this query's shape, mirroring
    the text-side q_lsh_verified_pairs (plans/pipeline.py).
    """
    from .similarity import _as_double, dot

    e = load_table(spark, sf_dir, "embeddings")
    bucket_cols = [
        rhp_bucket_from_scaled(F.col("__v"), n_bits=BITS_PER_BAND,
                               offset=k * BITS_PER_BAND).alias(f"__b{k}")
        for k in range(N_BANDS)
    ]
    bands = (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
             .select("vec_id", *bucket_cols)
             .select("vec_id", F.explode(F.array(*[
                 F.struct(F.lit(k).cast("long").alias("band"),
                          F.col(f"__b{k}").alias("bucket"))
                 for k in range(N_BANDS)])).alias("bb"))
             .select("vec_id", "bb.band", "bb.bucket")
             # truncate lineage so the 36-hyperplane projection runs
             # ONCE and both sides of the self-join read the tiny
             # (vec_id, band, bucket) result; lazy (no job at
             # construction), GC-cleaned
             .localCheckpoint(eager=False))
    cand = (bands.select(F.col("vec_id").alias("id_a"), "band", "bucket")
            .join(bands.select(F.col("vec_id").alias("id_b"), "band", "bucket"),
                  ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    v = (e.select("vec_id", _as_double("embedding").alias("ev"))
         .select("vec_id", "ev",
                 F.sqrt(dot(F.col("ev"), F.col("ev"))).alias("nrm")))
    va = v.select(F.col("vec_id").alias("id_a"),
                  F.col("ev").alias("ev_a"), F.col("nrm").alias("nrm_a"))
    vb = v.select(F.col("vec_id").alias("id_b"),
                  F.col("ev").alias("ev_b"), F.col("nrm").alias("nrm_b"))
    sim = F.round(dot(F.col("ev_a"), F.col("ev_b"))
                  / (F.col("nrm_a") * F.col("nrm_b")), 6)
    return (cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= VERIFY_THRESHOLD))
