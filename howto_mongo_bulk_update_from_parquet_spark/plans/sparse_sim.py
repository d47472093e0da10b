"""Sparse TF-IDF cosine similarity via an inverted-index join — the
exact-weighted upgrade of q_ngram_jaccard's binary overlap, and the
standard "which docs are near-dups and HOW close" scorer when
embeddings aren't available.

Shape: postings (doc, shingle) → document frequency per shingle → an
idf weight per posting → pairs meet ONLY through shared shingles
(inverted-index self-join), never all-pairs. A df cutoff (df ≤ N/10)
drops boilerplate shingles before the join — at 100 TB that cutoff is
what bounds the per-shingle fan-out (a shingle appearing in f docs
contributes f·(f−1)/2 candidate pairs; the cutoff caps f).

Cross-engine exactness without transcendentals: idf is the LINEAR
form N/df — one IEEE divide, identical in both engines (ln-idf would
hinge on two libms rounding ln identically; N/df doesn't). Every
accumulated float (norms, dots) crosses the shuffle as
DECIMAL(38,12) per the repo's numeric discipline, so partial-agg
order can't move a bit; sqrt and the final divide are single
correctly-rounded IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles
from ..sources.parquet import load_table
from .catalog import register

MAX_DF_RATIO = 10   # keep shingle iff df * 10 <= n_docs
MIN_COSINE = 0.5

SPARSE_COSINE_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM sh),
df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
w AS (
  SELECT s.doc_id, s.shingle, CAST(n.n_docs AS DOUBLE) / df.df AS idf
  FROM sh s CROSS JOIN n JOIN df ON s.shingle = df.shingle
  WHERE df.df * {MAX_DF_RATIO} <= n.n_docs
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(SUM(CAST(idf * idf AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(CAST(a.idf * b.idf AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.id_a, d.id_b,
       ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON d.id_a = na.doc_id
JOIN norms nb ON d.id_b = nb.doc_id
WHERE d.dot / (na.nrm * nb.nrm) >= {MIN_COSINE}
"""


@register("q_sparse_cosine_pairs", SPARSE_COSINE_ORACLE,
          "TF-IDF cosine near-dup pairs via inverted-index join: "
          "df-cutoff bounds fan-out, linear idf (no transcendental), "
          "decimal-bridged dots/norms; cosine >= 0.5")
def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", 3)

    n = sh.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_ = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # the weighted postings feed THREE consumers (norms + both join
    # sides); cut the shingle/df/join lineage once instead of 3x
    w = (sh.join(df_, "shingle")
         .crossJoin(F.broadcast(n))
         .filter(F.col("df") * MAX_DF_RATIO <= F.col("n_docs"))
         .select("doc_id", "shingle",
                 (F.col("n_docs").cast("double") / F.col("df")).alias("idf"))
         .localCheckpoint(eager=False))

    dec = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    # norms feeds BOTH sides of the final join (na and nb): cut the
    # lineage so the O(docs) aggregate plans and executes once, not
    # twice (r16 trim, same discipline as `w` above)
    norms = (w.groupBy("doc_id")
             .agg(F.sqrt(F.sum(dec(F.col("idf") * F.col("idf")))
                         .cast("double")).alias("nrm"))
             .localCheckpoint(eager=False))

    a = w.select(F.col("doc_id").alias("id_a"), "shingle",
                 F.col("idf").alias("ia"))
    b = w.select(F.col("doc_id").alias("id_b"), "shingle",
                 F.col("idf").alias("ib"))
    dots = (a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(dec(F.col("ia") * F.col("ib")))
                 .cast("double").alias("dot")))

    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (dots
            .join(norms.select(F.col("doc_id").alias("id_a"),
                               F.col("nrm").alias("na")), "id_a")
            .join(norms.select(F.col("doc_id").alias("id_b"),
                               F.col("nrm").alias("nb")), "id_b")
            .filter(cos >= MIN_COSINE)
            .select("id_a", "id_b", F.round(cos, 6).alias("cosine")))


# ---------------------------------------------------------------------------
# BM25 retrieval scoring — the search-side consumer of the inverted
# index: score every document against a fixed term query and return
# the top 10. Per-(doc, term) the score is the standard
# Lucene-positive form  idf·tf/(tf + k1·(1−b+b·dl/avgdl))  with
# idf = ln(1 + (N−df+0.5)/(df+0.5)); the single ln per term rounds to
# 9 decimals and decimal-sums across the (≤3) query terms (the
# token-entropy discipline), and the ranking is orderBy+limit —
# TakeOrderedAndProject, per-partition heaps + driver merge, never a
# global sort. Only postings for the QUERY terms ever join: the scan
# filter on term keeps the join input at query-vocabulary size.
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "window", "merge")
BM25_K1, BM25_B = 1.2, 0.75

_terms_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_terms_sql}) GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                      + {BM25_B} * dl.dlen / s.avgdl)),
           9) AS DECIMAL(20,9)) AS term_score
  FROM tf
  JOIN df ON tf.tok = df.tok
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, ROUND(CAST(SUM(term_score) AS DOUBLE), 6) AS bm25
FROM scored GROUP BY doc_id
ORDER BY SUM(term_score) DESC, doc_id
LIMIT 10
"""


@register("q_bm25_topk", BM25_ORACLE,
          "BM25 top-10 retrieval for a fixed term query: postings "
          "filtered to query vocabulary, round-9 decimal-summed term "
          "scores, TakeOrderedAndProject ranking (no global sort)")
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    tf = (toks.filter(F.col("tok").isin(*BM25_TERMS))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + BM25_K1 * (1 - BM25_B
             + BM25_B * F.col("dlen") / F.col("avgdl")))
    term_score = (F.round(idf * F.col("tf") / denom, 9)
                  .cast("decimal(20,9)"))
    scored = (tf.join(F.broadcast(df_), "tok")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", term_score.alias("term_score")))
    agg = scored.groupBy("doc_id").agg(F.sum("term_score").alias("s"))
    return (agg.orderBy(F.col("s").desc(), "doc_id").limit(10)
            .select("doc_id", F.round(F.col("s").cast("double"), 6)
                    .alias("bm25")))
