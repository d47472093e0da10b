"""End-to-end training-data pipeline compositions: the individual
catalog stages (dedup, quality, split, chunk, LSH) chained the way a
production corpus build runs them — proving the stages compose into
one lazy DAG with no driver-side handoffs between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import (lsh_bands, lsh_candidate_pairs,
                               minhash_signatures, portable_hash64, shingles)
from ..sources.parquet import load_table
from .catalog import register
from .lsh import _SHINGLES_SQL

# --- LSH candidates → exact-Jaccard verification -----------------------

# The production near-dup shape: LSH proposes candidate pairs
# (O(collisions)), exact Jaccard verifies ONLY those pairs — the
# quadratic exact join never happens. Compare q_ngram_jaccard, which is
# the all-pairs exactness baseline bounded to a small id range.
LSH_VERIFIED_ORACLE = f"""
WITH shingles AS ({_SHINGLES_SQL}),
seeds AS (SELECT unnest(range(0, 16)) AS seed),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
  FROM shingles
),
sig AS (
  SELECT doc_id, CAST(seed AS INT) AS seed,
         MIN(((2 * seed + 1) * h + seed * seed + 7) % 2147483647) AS minhash
  FROM hashed CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
         string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY seed) AS band_sig
  FROM sig GROUP BY doc_id, CAST(seed // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.id_a
  JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.n + zb.n - i.n_inter) >= 0.5
"""


@register("q_lsh_verified_pairs", LSH_VERIFIED_ORACLE,
          "near-dup pipeline: LSH candidates verified by exact Jaccard "
          "computed ONLY on candidate pairs (never all-pairs)")
def q_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", 3).localCheckpoint(eager=False)  # feeds 4 branches: cut lineage once
    sig = minhash_signatures(sh, "doc_id", 16)
    cand = lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (cand.join(sa, "id_a").join(sb, ["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    jac = (F.col("n_inter").cast("double")
           / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
    return (inter.join(za, "id_a").join(zb, "id_b")
            .filter(jac >= 0.5)
            .select("id_a", "id_b", F.round(jac, 6).alias("jaccard")))


# --- duplicate clustering (connected components) -----------------------

from .lsh import LSH_PAIRS_ORACLE  # noqa: E402 - oracle CTE reuse

# recursive transitive closure over the LSH candidate pairs, cluster =
# min reachable id — the SQL twin of iterative min-label propagation.
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({LSH_PAIRS_ORACLE})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster
FROM reach GROUP BY s
"""


@register("q_dedup_clusters", DEDUP_CLUSTERS_ORACLE,
          "near-dup clustering: connected components over LSH candidate "
          "pairs via iterative min-label propagation")
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", 3)
    sig = minhash_signatures(sh, "doc_id", 16)
    pairs = lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")
    return (connected_components(pairs, "id_a", "id_b")
            .select(F.col("node").alias("doc_id"), "cluster"))


# --- full corpus-build pipeline ----------------------------------------

PIPELINE_ORACLE = """
WITH deduped AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
),
kept AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok
  FROM deduped WHERE rn = 1
),
quality AS (SELECT * FROM kept WHERE n_tok >= 20),
assigned AS (
  SELECT doc_id, n_tok,
         CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM quality
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(ceil(n_tok / 30.0) AS BIGINT)) AS BIGINT) AS n_chunks
FROM assigned
GROUP BY split
"""


@register("q_training_pipeline", PIPELINE_ORACLE,
          "end-to-end corpus build: exact dedup → quality gate → "
          "deterministic split → chunk accounting, one lazy DAG")
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.size(F.split("text", " ")).alias("n_tok")))
    quality = kept.filter(F.col("n_tok") >= 20)
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val")
             .otherwise("test"))
    return (quality.select(split.alias("split"), "n_tok")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("total_tokens"),
                 F.sum(F.ceil(F.col("n_tok") / F.lit(30.0)).cast("long"))
                  .cast("long").alias("n_chunks")))


# --- sequence packing ---------------------------------------------------

PACK_BUDGET = 512   # tokens per training sequence

# Greedy sequential packing ("concat-then-chunk"): documents are laid
# end-to-end in deterministic (lang, doc_id) order and each doc is
# assigned to the sequence its FIRST token lands in —
# seq_id = (running_total_before_doc) div budget. One window per lang
# partition; no shuffle beyond the partitionBy.
DOC_PACKING_ORACLE = f"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_offset
  FROM t
)
SELECT lang,
       CAST(tok_offset // {PACK_BUDGET} AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
"""


@register("q_doc_packing", DOC_PACKING_ORACLE,
          "greedy sequential sequence packing: docs laid end-to-end per "
          "lang, assigned to the fixed-token-budget training sequence "
          "their first token lands in")
def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, the step between chunking and
    batching in a corpus build: concatenate documents in a
    deterministic order and cut every `PACK_BUDGET` tokens.

    Scale posture: ONE window per `lang` partition (the natural
    packing domain — sequences never mix languages), so the cumsum
    parallelizes across languages and the only shuffle is the
    partitionBy. At 100 TB with few giant languages, sub-partition
    first (e.g. by shard = hash(doc_id) % k) and run the same window
    per (lang, shard): packing quality is unaffected because sequence
    boundaries are per-domain by construction, and the prefix sum
    stays distributed instead of serializing one language onto one
    task."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = d.select("lang", "doc_id", n_tokens.alias("n_tokens"))
    offs = toks.withColumn(
        "offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (offs
            .withColumn("seq_id", F.expr(f"offset div {PACK_BUDGET}"))
            .groupBy("lang", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("seq_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))
