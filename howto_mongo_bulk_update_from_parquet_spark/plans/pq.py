"""Product quantization (the IVF-PQ compression stage): encode each
embedding as n_blocks codebook indices + reconstruction error.

At 100 TB this is how an ANN index fits in memory: 64 float32 dims
(256 B) become 4 code bytes per vector; search scans PQ codes with
per-block distance lookup tables and re-ranks survivors against the
raw vectors (the raw side stays on disk, touched only for the
shortlist). The encode pass below is the scale-dominant step — one
shuffle-free Arrow map with the codebook as broadcast driver state —
and reuses the exact-decimal distance contract, so the code
assignment is bit-identical in both engines (ties → lowest code).

Codebook shorthand: seed vectors vec_id < 16 sliced per block (real
training would run per-block k-means — q_kmeans_iter is that loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

N_BLOCKS = 4
N_CODES = 16

PQ_ORACLE = f"""
WITH vals AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS vd
  FROM embeddings
),
blocked AS (
  SELECT vec_id, CAST(pos // 16 AS BIGINT) AS blk, pos % 16 AS bpos, vd FROM vals
),
cb AS (
  SELECT vec_id AS code, CAST(pos // 16 AS BIGINT) AS blk, pos % 16 AS bpos, vd AS cd
  FROM vals WHERE vec_id < {N_CODES}
),
dist AS (
  SELECT b.vec_id, b.blk, c.code,
         SUM(CAST(ROUND((b.vd - c.cd) * (b.vd - c.cd), 12) AS DECIMAL(30,12))) AS d2
  FROM blocked b JOIN cb c ON b.blk = c.blk AND b.bpos = c.bpos
  GROUP BY b.vec_id, b.blk, c.code
),
best AS (
  SELECT vec_id, blk, code, d2 FROM (
    SELECT vec_id, blk, code, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id, blk ORDER BY d2, code) AS rn
    FROM dist) WHERE rn = 1
)
SELECT vec_id,
       MAX(CASE WHEN blk = 0 THEN code END) AS code0,
       MAX(CASE WHEN blk = 1 THEN code END) AS code1,
       MAX(CASE WHEN blk = 2 THEN code END) AS code2,
       MAX(CASE WHEN blk = 3 THEN code END) AS code3,
       CAST(SUM(d2) AS DOUBLE) AS recon_err
FROM best GROUP BY vec_id
"""


@register("q_pq_encode", PQ_ORACLE,
          "product-quantization encode: 4 sub-block nearest-codeword "
          "codes + exact reconstruction error (IVF-PQ compression pass)")
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vector_kernels import pq_encode
    from .kmeans import seed_centroids
    e = load_table(spark, sf_dir, "embeddings")
    return pq_encode(e, seed_centroids(e, N_CODES), N_BLOCKS)


PQ_SEARCH_ORACLE = f"""
WITH vals AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS vd
  FROM embeddings
),
blocked AS (
  SELECT vec_id, CAST(pos // 16 AS BIGINT) AS blk, pos % 16 AS bpos, vd FROM vals
),
cb AS (
  SELECT vec_id AS code, CAST(pos // 16 AS BIGINT) AS blk, pos % 16 AS bpos, vd AS cd
  FROM vals WHERE vec_id < {N_CODES}
),
dist AS (
  SELECT b.vec_id, b.blk, c.code,
         SUM(CAST(ROUND((b.vd - c.cd) * (b.vd - c.cd), 12) AS DECIMAL(30,12))) AS d2
  FROM blocked b JOIN cb c ON b.blk = c.blk AND b.bpos = c.bpos
  GROUP BY b.vec_id, b.blk, c.code
),
codes AS (
  SELECT vec_id, blk, code FROM (
    SELECT vec_id, blk, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, blk ORDER BY d2, code) AS rn
    FROM dist) WHERE rn = 1
),
adc AS (
  SELECT q.vec_id AS q_id, x.vec_id AS n_id, SUM(q.d2) AS adc_d2
  FROM dist q
  JOIN codes x ON x.blk = q.blk AND x.code = q.code
  WHERE q.vec_id >= 100 AND q.vec_id < 105 AND x.vec_id <> q.vec_id
  GROUP BY q.vec_id, x.vec_id
)
SELECT q_id, n_id, CAST(adc_d2 AS DOUBLE) AS adc_dist, rank FROM (
  SELECT q_id, n_id, adc_d2,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_d2, n_id) AS BIGINT) AS rank
  FROM adc)
WHERE rank <= 5
"""


@register("q_pq_search", PQ_SEARCH_ORACLE,
          "PQ asymmetric-distance search: per-query codeword lookup "
          "tables, exact int64 block distances, top-5 per query")
def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..operators.vector_kernels import pq_adc_search
    from .kmeans import seed_centroids
    e = load_table(spark, sf_dir, "embeddings")
    qs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
          for r in e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
                    .select("vec_id", "embedding").collect()]
    scored = pq_adc_search(e, seed_centroids(e, N_CODES), N_BLOCKS, qs)
    w = Window.partitionBy("q_id").orderBy("adc_scaled", "n_id")
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= 5)
                  .select("q_id", "n_id",
                          (F.col("adc_scaled") / 1e12).alias("adc_dist"),
                          "rank"))


# ---------------------------------------------------------------------------
# Scalar (int8) quantization — the other standard embedding
# compression next to PQ: per-dimension min/max over the corpus →
# 8-bit code per float, 4x smaller vectors. Bounds are min/max (order-
# independent, no float-sum hazard) over a posexplode that collapses
# map-side into 64 groups; they come back as a 64-row BROADCAST — the
# whole pipeline is scan → narrow explode → broadcast join → partial
# agg, no wide shuffle of exploded rows. Per-row code and
# reconstruction error are fixed IEEE expressions on doubles, so both
# engines agree bit-for-bit; the error mean crosses the engines
# through the usual decimal-sum bridge.
# ---------------------------------------------------------------------------

SQ_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
bounds AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim
),
coded AS (
  SELECT e.vec_id, e.label, e.dim, e.x, b.mn, b.mx,
         GREATEST(-128, LEAST(127,
           CAST(FLOOR((e.x - b.mn) / (b.mx - b.mn) * 255) AS BIGINT)
           - 128)) AS code
  FROM ex e JOIN bounds b ON e.dim = b.dim
)
SELECT label,
       COUNT(DISTINCT vec_id) AS n_vecs,
       CAST(SUM(code * dim) AS BIGINT) AS code_checksum,
       ROUND(CAST(SUM(CAST(ABS(x - (mn + (code + 128) / 255.0 * (mx - mn)))
                           AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
         AS mean_abs_err
FROM coded
GROUP BY label
"""


@register("q_sq_int8_quantize", SQ_ORACLE,
          "int8 scalar quantization of embeddings: per-dim min/max "
          "bounds (64-row broadcast), codegen floor-quantize + "
          "reconstruction error; decimal-bridged error mean per label")
def q_sq_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "xf")).select(
        "vec_id", "label", (F.col("pos") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"))
    bounds = ex.groupBy("dim").agg(F.min("x").alias("mn"),
                                   F.max("x").alias("mx"))
    coded = (ex.join(F.broadcast(bounds), "dim")
             .withColumn("code", F.greatest(F.lit(-128), F.least(
                 F.lit(127),
                 F.floor((F.col("x") - F.col("mn"))
                         / (F.col("mx") - F.col("mn")) * 255)
                 .cast("long") - 128))))
    recon = (F.col("mn") + (F.col("code") + 128) / F.lit(255.0)
             * (F.col("mx") - F.col("mn")))
    err = F.abs(F.col("x") - recon).cast("decimal(28,12)")
    # n_vecs as "count of dim-1 rows", NOT countDistinct(vec_id):
    # distinct forces an extra (label, vec_id) shuffle stage; every
    # vector contributes exactly one dim=1 row, so the count is the
    # same and the agg stays single-phase
    return (coded.groupBy("label")
            .agg(F.count(F.when(F.col("dim") == 1, 1)).alias("n_vecs"),
                 F.sum(F.col("code") * F.col("dim")).alias("code_checksum"),
                 F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6)
                  .alias("mean_abs_err")))
