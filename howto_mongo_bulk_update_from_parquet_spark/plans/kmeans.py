"""Lloyd's k-means (IVF coarse-quantizer training) — the iterative-
algorithm pattern in Spark: the driver loop composes one lazy DAG per
round (assign → recompute centroids), no data ever collected.

Exactness discipline that makes an ITERATIVE float algorithm fully
oracle-checkable: every distance is Σ round((v-c)², 12) summed as
DECIMAL (order-independent), every centroid is an exact decimal mean
cast to double. Both engines run identical IEEE double subtract/
multiply and identical decimal sums, so assignments match bit-for-bit
through BOTH rounds — ties broken by centroid id.

Scale notes: each round is one broadcast join (8×64 centroid cells)
+ one shuffle-by-(centroid,pos) aggregation over the exploded
vectors; rounds are O(diameter-free) fixed count. At 100 TB the
explode is the scan-dominant term — identical shape to
q_label_centroids, proven pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register

K = 8


def _cells(df: DataFrame, id_col: str, out_val: str) -> DataFrame:
    """(id, pos, value-as-double) cells of an embedding column. The
    explode + downstream partial aggregation inherit the SCAN's
    parallelism, which a single-row-group fixture file caps at one
    task — widen first (scale-adaptive no-op on multi-file layouts,
    guide §2.5)."""
    from ..operators.vector_kernels import widen_for_kernel
    return (widen_for_kernel(df.select(F.col(id_col), "embedding"))
            .select(F.col(id_col),
                    F.posexplode("embedding").alias("pos", "v"))
            .select(id_col, "pos", F.col("v").cast("double").alias(out_val)))


def _assign(vals: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector by exact-decimal squared L2."""
    term = (F.round((F.col("vd") - F.col("cd")) * (F.col("vd") - F.col("cd")),
                    12).cast("decimal(30,12)"))
    d = (vals.join(F.broadcast(cents), "pos")
         .groupBy("vec_id", "cid").agg(F.sum(term).alias("d2")))
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("vec_id", "cid"))


def _recompute(vals: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-(centroid, pos) exact decimal mean → double."""
    return (vals.join(assign, "vec_id")
            .groupBy("cid", "pos")
            # ROUND before the decimal cast: a float32-widened double
            # can land exactly on a 0.5e-9 tie, where Spark's cast
            # rounds HALF_UP but DuckDB's HALF_EVEN (the
            # q_label_centroids sf0.1 lesson); ROUND is half-away-
            # from-zero in both engines.
            .agg((F.sum(F.round(F.col("vd"), 9).cast("decimal(18,9)"))
                  .cast("double")
                  / F.count(F.lit(1))).alias("cd")))


KMEANS_ORACLE = f"""
WITH vals AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS vd
  FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cid, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS cd
  FROM embeddings WHERE vec_id < {K}
),
dist0 AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(ROUND((v.vd - c.cd) * (v.vd - c.cd), 12) AS DECIMAL(30,12))) AS d2
  FROM vals v JOIN cents0 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.cid
),
assign0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist0
  ) WHERE rn = 1
),
cents1 AS (
  SELECT a.cid, v.pos,
         CAST(SUM(CAST(ROUND(v.vd, 9) AS DECIMAL(18,9))) AS DOUBLE)
           / COUNT(*) AS cd
  FROM vals v JOIN assign0 a ON v.vec_id = a.vec_id
  GROUP BY a.cid, v.pos
),
dist1 AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(ROUND((v.vd - c.cd) * (v.vd - c.cd), 12) AS DECIMAL(30,12))) AS d2
  FROM vals v JOIN cents1 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.cid
)
SELECT vec_id, cid AS cluster FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM dist1
) WHERE rn = 1
"""


def seed_centroids(e: DataFrame, k: int = K) -> list[tuple[int, list[float]]]:
    """Driver-side seed centroids (vec_id < k), as (cid, dims) —
    K×dim doubles of driver state, the same shape MLlib's KMeans
    carries between Lloyd's rounds."""
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in e.filter(F.col("vec_id") < k)
                      .select("vec_id", "embedding").collect()]


def _collect_centroids(cent_cells: DataFrame) -> list[tuple[int, list[float]]]:
    """(cid, pos, cd) cells → driver-side [(cid, ordered dims)]."""
    by_cid: dict[int, dict[int, float]] = {}
    for r in cent_cells.collect():
        by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = float(r["cd"])
    return [(cid, [dims[p] for p in range(len(dims))])
            for cid, dims in sorted(by_cid.items())]


@register("q_kmeans_iter", KMEANS_ORACLE,
          "two Lloyd's k-means rounds (IVF training): assign → exact "
          "centroid means → reassign, bit-exact through both rounds")
def q_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's rounds with the Arrow assignment kernel: centroids are
    driver state (K×dim doubles, like MLlib KMeans), each assignment
    is ONE shuffle-free mapInPandas matmul with the exact-decimal
    rounding contract (operators/vector_kernels.py), and only the
    centroid recompute — an exact decimal mean — runs as an exploded
    aggregation (one shuffle of K×dim groups per round). The
    expression-form `_assign` stays as the no-Python fallback and the
    cross-check in tests/test_vector_kernels.py."""
    from ..operators.vector_kernels import assign_exact
    e = load_table(spark, sf_dir, "embeddings")
    assign = assign_exact(e, seed_centroids(e))          # round 1
    vals = _cells(e, "vec_id", "vd")
    cents = _collect_centroids(_recompute(vals, assign))
    assign = assign_exact(e, cents)                      # round 2
    return assign.select("vec_id", F.col("cid").alias("cluster"))
