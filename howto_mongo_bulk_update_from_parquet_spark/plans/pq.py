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
