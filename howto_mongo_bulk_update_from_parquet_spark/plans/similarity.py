"""Similarity search over the `embeddings` table (array<float>, dim 64).

Brute-force cosine top-k is the exactness baseline; the scale path is
bucketed search: assign vectors to coarse centroids (IVF shape) and
search within buckets — `q_ann_ivf_assign` demonstrates the assignment
stage. All vector math stays JVM-side via `zip_with`/`aggregate`
higher-order functions (no Python UDF in the hot path).

Cross-engine float discipline: dot products fold doubles in array
order in both engines, but we still round to 6 decimals before
ranking/threshold so a last-ulp divergence can't flip a hash.

Scale notes (100 TB): brute-force is O(Q·N) — fine for Q small; for
N×N near-dup, LSH bucketing (operators/dedup.py MinHash for text,
random-hyperplane for vectors) bounds candidate pairs. The knn query
broadcasts the query set so candidates never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


KNN_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q_id, n_id, ROUND(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM q JOIN c ON q_id <> n_id
)
SELECT q_id, n_id, cos_sim, rank
FROM (SELECT q_id, n_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
      FROM scored)
WHERE rank <= 5
"""


@register("q_knn_bruteforce", KNN_ORACLE,
          "exact top-5 cosine neighbors for 5 query vectors (broadcast "
          "queries × all candidates, JVM-side vector math)")
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = (e.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("q_id"), _as_double("embedding").alias("qv")))
    c = e.select(F.col("vec_id").alias("n_id"), _as_double("embedding").alias("cv"))
    scored = (c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
               .select("q_id", "n_id",
                       F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= 5))


NEARDUP_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id < 2000)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.ev, b.ev), 5) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.ev, b.ev), 5) >= 0.45
"""


@register("q_embedding_neardup", NEARDUP_ORACLE,
          "embedding near-duplicate pairs: cosine ≥ 0.45 via the blocked "
          "all-pairs operator (3 broadcastable blocks here — the N×N "
          "scale pattern, driver memory O(block) not O(N))")
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N×N near-dup through `cosine_all_pairs_blocked`: the outer loop
    broadcasts one ≤800×64 block at a time and streams the rest through
    a BLAS matmul per Arrow batch — never collects more than one block
    to the driver, so the same plan survives N ≫ broadcast budget.
    block_size=800 exercises a real multi-block run (3 blocks at
    sf0.01) rather than degenerating to one block.

    Rounded to 5 decimals so BLAS re-ordered summation can't diverge
    from the oracle's sequential fold.
    """
    from ..operators.vector_blocks import cosine_all_pairs_blocked

    e = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < 2000)
         .select("vec_id", "embedding"))
    return cosine_all_pairs_blocked(e, "vec_id", "embedding",
                                    threshold=0.45, block_size=800,
                                    round_digits=5)


CENTROID_ORACLE = """
WITH pos AS (
  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, embedding
  FROM embeddings
)
SELECT label, pos,
       CAST(SUM(CAST(ROUND(CAST(embedding[pos] AS DOUBLE), 9)
                     AS DECIMAL(18,9))) AS DOUBLE)
         / COUNT(*) AS centroid_val
FROM pos
GROUP BY label, pos
"""


@register("q_label_centroids", CENTROID_ORACLE,
          "per-label centroid (IVF build stage): posexplode + exact mean per dim")
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("label", F.posexplode("embedding").alias("pos0", "val"))
             .select("label", (F.col("pos0") + 1).cast("long").alias("pos"), "val")
             .groupBy("label", "pos")
             # float→double first (the engines round float→decimal
             # differently), then ROUND to 9 decimals BEFORE the
             # decimal cast on BOTH sides: a float32 widened to double
             # can land exactly on a 0.5e-9 tie, where Spark's
             # double→decimal cast rounds HALF_UP but DuckDB's rounds
             # HALF_EVEN (hit at sf0.1, label 8 dim 59). ROUND is
             # half-away-from-zero in both engines, so the tie breaks
             # identically and the decimal sum stays order-free exact.
             .agg((F.sum(F.round(F.col("val").cast("double"), 9)
                         .cast("decimal(18,9)")).cast("double")
                   / F.count(F.lit(1))).alias("centroid_val")))


IVF_ASSIGN_ORACLE = """
WITH cent AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
SELECT vec_id, c_id AS assigned_centroid, cos_sim
FROM (
  SELECT v.vec_id, cent.c_id,
         ROUND(list_cosine_similarity(v.ev, cent.cv), 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY ROUND(list_cosine_similarity(v.ev, cent.cv), 6) DESC, cent.c_id) AS rn
  FROM v CROSS JOIN cent
)
WHERE rn = 1
"""


@register("q_ann_ivf_assign", IVF_ASSIGN_ORACLE,
          "IVF coarse-quantizer assignment: nearest of 8 broadcast centroids per vector")
def q_ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cent = (e.filter(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("c_id"), _as_double("embedding").alias("cv")))
    v = e.select("vec_id", _as_double("embedding").alias("ev"))
    scored = (v.join(F.broadcast(cent))
               .select("vec_id", "c_id",
                       F.round(cosine(F.col("ev"), F.col("cv")), 6).alias("cos_sim")))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("vec_id", F.col("c_id").alias("assigned_centroid"), "cos_sim"))


# Cluster-balanced (diversity) sampling — the curation step after
# clustering: draw an equal quota from every region of embedding
# space so the sample is diverse instead of mode-dominated (the
# SemDeDup/cluster-sampling recipe for training data). Assignment
# reuses the IVF coarse quantizer above; the per-cluster draw is
# deterministic (md5-of-id order, reproducible across runs, engines,
# partitionings) and WINDOW-FREE on the Spark side via grouped_topk,
# so a skewed cluster never concentrates a full sort on one reducer.
CLUSTER_SAMPLE_K = 20

CLUSTER_SAMPLE_ORACLE = f"""
WITH cent AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
assign AS (
  SELECT vec_id, c_id AS cluster
  FROM (
    SELECT v.vec_id, cent.c_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND(list_cosine_similarity(v.ev, cent.cv), 6) DESC,
                                       cent.c_id) AS rn
    FROM v CROSS JOIN cent
  ) WHERE rn = 1
)
SELECT cluster, vec_id
FROM (
  SELECT cluster, vec_id,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
  FROM assign
) WHERE srn <= {CLUSTER_SAMPLE_K}
"""


@register("q_cluster_balanced_sample", CLUSTER_SAMPLE_ORACLE,
          "diversity sampling: IVF-assign every embedding to its "
          "nearest centroid, then a deterministic md5-order quota of "
          "20 per cluster via the window-free grouped_topk prune — "
          "equal coverage of embedding-space regions")
def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import grouped_topk
    e = load_table(spark, sf_dir, "embeddings")
    cent = (e.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("c_id"),
                    _as_double("embedding").alias("cv")))
    v = e.select("vec_id", _as_double("embedding").alias("ev"))
    scored = (v.join(F.broadcast(cent))
              .select("vec_id", "c_id",
                      F.round(cosine(F.col("ev"), F.col("cv")), 6)
                       .alias("cos_sim")))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(),
                                             F.col("c_id"))
    assign = (scored.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("vec_id", F.col("c_id").alias("cluster")))
    pick = assign.select(
        "cluster", "vec_id",
        F.md5(F.col("vec_id").cast("string")).alias("h"))
    return (grouped_topk(pick, ["cluster"], "h", CLUSTER_SAMPLE_K,
                         tie_cols=["vec_id"], ascending=True)
            .select("cluster", "vec_id"))
