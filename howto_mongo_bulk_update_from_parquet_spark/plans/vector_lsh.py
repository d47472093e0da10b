"""Random-hyperplane (SimHash-for-vectors) LSH over the embeddings
table — the candidate-generation stage for cosine near-dup at scale
(complements the blocked exact sweep in operators/vector_blocks.py and
the MinHash text LSH in operators/dedup.py).

Hyperplane signs are derived from md5 parity (portable integer math,
same discipline as operators/dedup.portable_hash64), and every dot
product folds exact fixed-point int64, so bit signatures are
engine-identical — the whole pipeline stays oracle-checkable.

Scale notes (100 TB of vectors): each vector reduces to its bucket
id(s) in a single shuffle-free projection pass — the catalog path is
an Arrow-batched int64 matmul (`rhp_band_buckets_udf`: every
hyperplane dot product of a batch in one numpy op; no per-query
codegen, worker spin-up amortized across the session), with a pure
JVM expression fallback (`rhp_bucket_from_scaled`) producing
bit-identical buckets. Candidate pairs then come from a
groupBy/self-join on the bucket — O(collisions), never all-pairs.
P(same bucket) = (1 - θ/π)^16 for angle θ, so near-identical vectors
collide with high probability while random pairs spread across 65k
buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
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


def _sign_matrix(n_bits: int, dim: int, offset: int = 0) -> Column:
    """The n_bits × dim ±1 hyperplane matrix as ONE array<array<int>>
    literal — a single expression node, so analysis and codegen cost
    stay O(1) in n_bits (the previous unrolled form paid ~2.5 s of
    one-time whole-stage-codegen for 16-36 independent fold chains)."""
    return F.lit([[_sign(offset + i, j) for j in range(dim)]
                  for i in range(n_bits)])


def rhp_sign_bits(v: Column, n_bits: int = N_BITS,
                  dim: int = DIM, offset: int = 0) -> Column:
    """array<long> of 0/1: bit i = sign(v · h_{offset+i}) for the
    md5-derived hyperplane family, over the fixed-point vector
    (compute `scaled_vec` ONCE in a projection first). One compact
    transform-over-matrix expression; the inner lambdas reference only
    their own variables (PySpark names every lambda var x/y/z, so an
    outer lambda var used inside an inner lambda BODY would be
    shadowed — h and v appear only in argument position, which binds
    in the outer scope)."""
    return F.transform(
        _sign_matrix(n_bits, dim, offset),
        lambda h: F.when(
            F.aggregate(F.zip_with(v, h, lambda a, b: a * b),
                        F.lit(0).cast("long"), lambda a, b: a + b) > 0,
            F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")))


def _bit_weights(n_bits: int) -> Column:
    return F.array(*[F.lit(1 << b).cast("long") for b in range(n_bits)])


def rhp_bucket_from_scaled(v: Column, n_bits: int = N_BITS,
                           dim: int = DIM, offset: int = 0) -> Column:
    """Bucket id = Σ bit_i · 2^i over the sign bits. `offset` selects a
    disjoint hyperplane family, so banded LSH reuses this with
    offset = band * bits_per_band."""
    return F.aggregate(
        F.zip_with(rhp_sign_bits(v, n_bits, dim, offset),
                   _bit_weights(n_bits), lambda a, b: a * b),
        F.lit(0).cast("long"), lambda a, b: a + b)


def band_buckets_from_bits(bits: Column, n_bands: int,
                           bits_per_band: int) -> Column:
    """array<long> of per-band bucket ids from a projected sign-bits
    column: band k = Σ bits[k·bpb + b] · 2^b. `bits` must be a plain
    attribute (project rhp_sign_bits first) — it is referenced inside
    the per-band lambda body, and an attribute read is free to
    re-evaluate where a nested HOF chain would recompute every dot
    product once per band."""
    w = _bit_weights(bits_per_band)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda k: F.aggregate(
            F.zip_with(F.slice(bits, k * F.lit(bits_per_band) + 1,
                               bits_per_band),
                       w, lambda a, b: a * b),
            F.lit(0).cast("long"), lambda a, b: a + b))


def rhp_band_buckets_udf(n_bands: int, bits_per_band: int,
                         dim: int = DIM, offset: int = 0):
    """Arrow-batched signature generator: one int64 matmul per batch
    computes every hyperplane dot product at once — `(batch × dim) @
    (dim × total_bits)`, then a per-band weight fold. Exact: scaled
    vectors and ±1 hyperplanes are int64, |dot| ≤ 64·1e9 ≪ 2⁶³, so
    numpy matmul reproduces the JVM fold bit-for-bit (asserted against
    `rhp_bucket_from_scaled`, and by the DuckDB oracles).

    This is the catalog path: measured per-row cost matches the
    codegen'd unrolled JVM fold (~0.3 s / 2 k×64 vectors· 16 bits)
    while paying NO per-query whole-stage-codegen (the unrolled form
    compiled ~1-2.5 s of janino per query; the Python-worker spin-up
    this path needs is once per session and shared with every other
    pandas UDF in the catalog). The pure-expression helpers above
    remain the no-Python-workers fallback."""
    total = n_bands * bits_per_band
    hyper = np.array([[_sign(offset + i, j) for j in range(dim)]
                      for i in range(total)], dtype=np.int64).T
    weights = np.int64(1) << np.arange(bits_per_band, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def band_buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        scaled = np.stack(vs.to_numpy()).astype(np.int64, copy=False)
        bits = (scaled @ hyper > 0).astype(np.int64)
        bands = np.stack(
            [bits[:, k * bits_per_band:(k + 1) * bits_per_band] @ weights
             for k in range(n_bands)], axis=1)
        return pd.Series(list(bands))

    return band_buckets


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
    sig = rhp_band_buckets_udf(1, N_BITS)
    return (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
            .select("vec_id", sig(F.col("__v"))[0].alias("bucket")))


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
    sig = rhp_band_buckets_udf(1, N_BITS)
    b = (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
         .select("vec_id", sig(F.col("__v"))[0].alias("bucket"))
         # truncate lineage so the Arrow-batched projection runs ONCE:
         # the two join branches alias different columns, so their
         # exchanges aren't identical and Catalyst re-executes the UDF
         # per branch otherwise; lazy (no job at build time) — the tiny
         # (vec_id, bucket) result materializes with the join's own job
         .localCheckpoint(eager=False))
    a = b.select(F.col("vec_id").alias("id_a"), "bucket")
    c = b.select(F.col("vec_id").alias("id_b"), "bucket")
    return (a.join(c, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "bucket"))


# --- banded RHP LSH → exact-cosine verify (the production path) --------

N_BANDS = 6
BITS_PER_BAND = 6
VERIFY_THRESHOLD = 0.45

def rhp_bands_sql(n_bands: int = N_BANDS,
                  bits: int = BITS_PER_BAND) -> str:
    """The (vec_id, band, bucket) oracle CTE for the md5-derived RHP
    family at an arbitrary banding — callers tuning (n_bands, bits)
    per query (see the BITS_PER_BAND tuning note in incremental_vec)
    generate their oracle from the SAME deterministic hyperplanes the
    Spark UDF signs with."""
    return f"""
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
    FROM vals CROSS JOIN (SELECT unnest(range(0, {n_bands * bits})) AS i) i
  ),
  bits AS (
    SELECT vec_id, i, SUM(p) > 0 AS bit FROM prods GROUP BY vec_id, i
  )
  SELECT vec_id, i // {bits} AS band,
         CAST(SUM(CASE WHEN bit THEN CAST(POW(2, i % {bits}) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id, i // {bits}
"""


_RHP_BANDS_SQL = rhp_bands_sql()

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

    1. candidate generation — one shuffle-free Arrow-batched matmul
       reduces every vector to 6 band buckets of 6 hyperplane-sign
       bits each (disjoint md5-derived families); a self-join on
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
    sig = rhp_band_buckets_udf(N_BANDS, BITS_PER_BAND)
    bands = (e.select("vec_id", scaled_vec(F.col("embedding")).alias("__v"))
             # all 36 hyperplane dot products in ONE Arrow-batched
             # int64 matmul, folded to 6 band buckets — same exact
             # integer math as the JVM expression form
             .select("vec_id", F.posexplode(sig(F.col("__v")))
                     .alias("band", "bucket"))
             .select("vec_id", F.col("band").cast("long").alias("band"), "bucket")
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
