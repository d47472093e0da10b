"""Fourth battery: sliding event-time windows, null-handling scalars,
and the full IVF search path (coarse assignment → bucket-restricted
probe → exact re-rank), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dec
from ..sources.parquet import load_table
from .catalog import register

# sliding 1h windows every 30min: each event lands in exactly 2
# epoch-aligned windows; the oracle reproduces Spark's window algebra.
SLIDING_ORACLE = """
WITH expanded AS (
  SELECT event_type, value,
         to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800)
           AS window_start
  FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k)
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY 1, 2
"""


@register("q_event_sliding", SLIDING_ORACLE,
          "sliding 1h/30min event-time windows (each event in 2 windows)")
def q_event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(dec("value", 18, 2)).cast("double").alias("sum_value"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n_events", "sum_value"))


NULLFUNC_ORACLE = """
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
       GREATEST(c_acctbal, 0.0) AS bal_floor0,
       LEAST(c_acctbal, 1000.0) AS bal_cap1k,
       CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_nvl,
       (c_acctbal IS NOT NULL AND c_acctbal > 0) AS is_positive
FROM customer
WHERE c_custkey < 200
"""


@register("q_null_funcs", NULLFUNC_ORACLE,
          "null-handling scalars: coalesce/nullif/greatest/least/nvl")
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER"))
         .alias("segment_masked"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1k"),
        F.when(bal.isNull(), -1.0).otherwise(bal).alias("bal_nvl"),
        (bal.isNotNull() & (bal > 0)).alias("is_positive"))


# Full IVF search with a TRAINED coarse quantizer: (1) centroids =
# per-label mean vectors (one k-means-style step — exact decimal means,
# reassembled into arrays), (2) every vector assigned to its nearest
# centroid, (3) each query probes its 2 nearest buckets (nprobe=2),
# (4) exact top-3 within the probed candidates. The oracle replicates
# every stage in SQL. With arbitrary centroids and nprobe=1 recall@3
# was 0.167; trained centroids + nprobe=2 lift it (see test).
IVF_SEARCH_ORACLE = """
WITH pos AS (
  SELECT label, unnest(range(1, len(embedding) + 1)) AS pos, embedding
  FROM embeddings
),
cmean AS (
  SELECT label, pos,
         CAST(SUM(CAST(ROUND(CAST(embedding[pos] AS DOUBLE), 9)
                       AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS cval
  FROM pos GROUP BY label, pos
),
cent AS (
  SELECT label AS c_id, list(cval ORDER BY pos) AS cv FROM cmean GROUP BY label
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
scored AS (
  SELECT v.vec_id, cent.c_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY ROUND(list_cosine_similarity(v.ev, cent.cv), 6) DESC,
                                     cent.c_id) AS rn
  FROM v CROSS JOIN cent
),
assign AS (SELECT vec_id, c_id AS bucket FROM scored WHERE rn = 1),
queries AS (SELECT vec_id AS q_id FROM embeddings WHERE vec_id >= 100 AND vec_id < 110),
probes AS (
  SELECT q.q_id, s.c_id AS bucket
  FROM queries q JOIN scored s ON s.vec_id = q.q_id AND s.rn <= 2
)
SELECT q_id, n_id, cos_sim, rank
FROM (
  SELECT p.q_id, c.vec_id AS n_id,
         ROUND(list_cosine_similarity(qv.ev, cv.ev), 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY p.q_id
                            ORDER BY ROUND(list_cosine_similarity(qv.ev, cv.ev), 6) DESC,
                                     c.vec_id) AS rank
  FROM probes p
  JOIN assign c ON c.bucket = p.bucket AND c.vec_id <> p.q_id
  JOIN v qv ON qv.vec_id = p.q_id
  JOIN v cv ON cv.vec_id = c.vec_id
)
WHERE rank <= 3
"""


@register("q_ann_ivf_search", IVF_SEARCH_ORACLE,
          "full IVF search: trained centroids (label means) → nprobe=2 "
          "bucket probe → exact top-3 (the ANN scale path)")
def q_ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with the Arrow scoring kernel: the trained coarse
    quantizer (exact per-label decimal means) is collected to the
    driver — n_labels×dim doubles, the same state MLlib carries —
    and every vector scores against all centroids in ONE matmul per
    Arrow batch (operators/vector_kernels.py::score_centroids)
    instead of K interpreted `aggregate` folds per row. The probe
    stage's exact re-rank keeps the JVM fold form (tiny candidate
    set)."""
    from .similarity import _as_double, cosine
    from ..operators.vector_kernels import score_centroids
    e = load_table(spark, sf_dir, "embeddings")
    # trained coarse quantizer: exact per-label mean per dimension
    cmean = (e.select("label", F.posexplode("embedding").alias("pos0", "val"))
              .groupBy("label", (F.col("pos0") + 1).alias("pos"))
              # ROUND before decimal cast — HALF_UP/HALF_EVEN tie
              # parity (see plans/similarity.py q_label_centroids)
              .agg((F.sum(F.round(F.col("val").cast("double"), 9)
                          .cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1))).alias("cval")))
    by_label: dict[int, dict[int, float]] = {}
    for r in cmean.collect():
        by_label.setdefault(int(r["label"]), {})[int(r["pos"])] = float(r["cval"])
    cents = [(cid, [dims[p] for p in range(1, len(dims) + 1)])
             for cid, dims in sorted(by_label.items())]
    v = e.select("vec_id", _as_double("embedding").alias("ev"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    scored = (score_centroids(e, cents, round_to=6)
               .withColumn("rn", F.row_number().over(w_assign)))
    assign = scored.filter(F.col("rn") == 1).select("vec_id", F.col("c_id").alias("bucket"))
    queries = (e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
                .select(F.col("vec_id").alias("q_id")))
    probes = (queries.join(scored.filter(F.col("rn") <= 2),
                           F.col("q_id") == F.col("vec_id"))
                     .select("q_id", F.col("c_id").alias("q_bucket")))
    ca = assign.alias("ca")
    qv = v.alias("qv")
    cv = v.alias("cv")
    probe = (probes.join(ca, (F.col("ca.bucket") == F.col("q_bucket"))
                         & (F.col("ca.vec_id") != F.col("q_id")))
             .join(F.broadcast(qv), F.col("qv.vec_id") == F.col("q_id"))
             .join(cv, F.col("cv.vec_id") == F.col("ca.vec_id"))
             .select("q_id", F.col("ca.vec_id").alias("n_id"),
                     F.round(cosine(F.col("qv.ev"), F.col("cv.ev")), 6).alias("cos_sim")))
    w_rank = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (probe.withColumn("rank", F.row_number().over(w_rank).cast("long"))
                 .filter(F.col("rank") <= 3))
