"""Text-analysis + deduplication battery over the `documents` table
(north-star extensions: exact dedup, latest-per-key, n-gram Jaccard
near-dup, fingerprinting, token/quality/language stats).

Scale notes (100 TB of documents):
- exact dedup groups on md5(text) — a 16-byte shuffle key instead of
  the full text; count-based survivors avoid materializing text twice.
- n-gram Jaccard self-join explodes distinct shingles and joins on the
  shingle hash; at scale you'd pre-filter by doc length band and use
  MinHash-LSH (operators/dedup.py) so the join touches only bucket
  collisions, not all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


@register("q_dedup_exact", DEDUP_EXACT_ORACLE,
          "exact dedup via content fingerprint: one survivor per distinct text")
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5("text").alias("fp"))
             .agg(F.min("doc_id").alias("keep_id"),
                  F.count(F.lit(1)).alias("n_copies")))


DEDUP_LATEST_ORACLE = """
SELECT user_id, event_id, ts, value
FROM (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("q_dedup_latest", DEDUP_LATEST_ORACLE,
          "latest-per-key dedup (deterministic fix of the reference's "
          "unordered-bulk-write race, SURVEY §2.1 note 5)")
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (e.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("user_id", "event_id", "ts", "value"))


# 3-token shingles, distinct per doc, self-join on shingle → pairwise
# intersection counts; |A∪B| = |A|+|B|-|A∩B|; Jaccard ≥ 0.5 pairs.
NGRAM_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 1000
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
  FROM toks
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.n_common,
       sa.n_shingles AS n_a, sb.n_shingles AS n_b,
       CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_common) >= 0.5
"""


@register("q_ngram_jaccard", NGRAM_JACCARD_ORACLE,
          "near-duplicate pairs by exact 3-gram Jaccard (shingle self-join)")
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles as mk_shingles
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 1000)
    # tokenize-once helper: inlining split() in the transform lambda
    # makes codegen re-split the text per element (~3 splits per
    # shingle) — measured 3.3x on this query's shingle pipeline at
    # sf0.1 (1.86s inline vs 0.56s tokenize-once)
    shingles = mk_shingles(d.select("doc_id", "text"), "doc_id", "text")
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")))
    # sizes has one row per doc (scales with the corpus) → no hard
    # broadcast hint; AQE broadcasts while it fits.
    return (inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
                 .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
                 .select("doc_a", "doc_b", "n_common",
                         F.col("sa.n_shingles").alias("n_a"),
                         F.col("sb.n_shingles").alias("n_b"),
                         jac.alias("jaccard"))
                 .filter(F.col("jaccard") >= 0.5))


TOKEN_STATS_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
"""


@register("q_token_stats", TOKEN_STATS_ORACLE,
          "token counting + corpus stats per language")
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.split("text", " ")).cast("long")
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(n_tokens).alias("total_tokens"),
                  (F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double")
                   / F.count("n_chars")).alias("avg_chars"),
                  F.min("n_chars").alias("min_chars"),
                  F.max("n_chars").alias("max_chars")))


STOPWORDS = "'the', 'a', 'of', 'and', 'to', 'in', 'is'"

QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS type_token_ratio,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN ({STOPWORDS}))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
FROM documents
WHERE doc_id < 200
"""


@register("q_quality_score", QUALITY_ORACLE,
          "document quality signals: type/token ratio, stopword ratio, token length")
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(s.strip().strip("'")) for s in STOPWORDS.split(",")])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n_tokens).alias("type_token_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
         / n_tokens).alias("avg_token_len"))


# Deterministic heuristic language-ID: score against per-language marker
# word lists; highest hit-count wins, ties broken by marker order. (The
# corpus vocabulary is synthetic, so this demonstrates the operator
# shape — deterministic, SQL-checkable — not linguistic accuracy.)
LANG_ID_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of'))) AS en_hits,
         len(list_filter(string_split(text, ' '), t -> t IN ('data', 'table', 'row'))) AS dat_hits,
         len(list_filter(string_split(text, ' '), t -> t IN ('spark', 'query', 'join'))) AS sql_hits
  FROM documents
)
SELECT doc_id, lang,
       CASE
         WHEN en_hits >= dat_hits AND en_hits >= sql_hits THEN 'en-like'
         WHEN dat_hits >= sql_hits THEN 'data-like'
         ELSE 'sql-like'
       END AS guessed_register
FROM scored
"""


@register("q_lang_id", LANG_ID_ORACLE,
          "n-gram/marker-word language-ID heuristic (deterministic)")
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")

    def hits(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en, dat, sql = hits(["the", "a", "of"]), hits(["data", "table", "row"]), hits(["spark", "query", "join"])
    return d.select(
        "doc_id", "lang",
        F.when((en >= dat) & (en >= sql), "en-like")
         .when(dat >= sql, "data-like")
         .otherwise("sql-like").alias("guessed_register"))


FINGERPRINT_ORACLE = """
SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 8) AS fp_prefix
FROM documents
WHERE doc_id < 100
"""


@register("q_fingerprint", FINGERPRINT_ORACLE,
          "content fingerprinting (md5) for dedup keys / provenance")
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.md5("text").alias("fp"),
                    F.substring(F.md5("text"), 1, 8).alias("fp_prefix"))


WORD_FREQ_ORACLE = """
SELECT tok, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


@register("q_word_freq", WORD_FREQ_ORACLE,
          "corpus-wide top-20 token frequency (explode → count → top-k)")
def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (d.select(F.explode(F.split("text", " ")).alias("tok"))
             .filter(F.col("tok") != "")
             .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
             .orderBy(F.col("n").desc(), F.col("tok"))
             .limit(20))


# Deterministic dataset splitting: hash the stable id (not random!) so
# the split is reproducible across runs, engines, and re-partitioning —
# the property a training pipeline needs for leakage-free train/val/test.
SPLIT_ORACLE = """
WITH assigned AS (
  SELECT doc_id, lang,
         CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs
FROM assigned
GROUP BY split, lang
"""


@register("q_dataset_split", SPLIT_ORACLE,
          "deterministic 80/10/10 train/val/test split by id-hash bucket")
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64
    d = _docs(spark, sf_dir)
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    split = (F.when(bucket < 80, "train")
              .when(bucket < 90, "val")
              .otherwise("test"))
    return (d.select(split.alias("split"), "lang")
             .groupBy("split", "lang")
             .agg(F.count(F.lit(1)).alias("n_docs")))


# Document chunking: overlapping token windows (size 40, stride 30) —
# the standard context-window preprocessing step. Chunk starts are
# 0, 30, 60, … while start < n_tokens; each chunk takes up to 40 tokens.
CHUNK_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 300
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(tk) / 30.0) AS BIGINT))) AS chunk_idx,
         tk
  FROM toks
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(tk, CAST(chunk_idx * 30 + 1 AS BIGINT),
                                  CAST(chunk_idx * 30 + 40 AS BIGINT)), ' ') AS chunk_text,
       CAST(least(len(tk) - chunk_idx * 30, 40) AS BIGINT) AS chunk_tokens
FROM chunks
WHERE chunk_idx * 30 < len(tk)
"""


@register("q_doc_chunking", CHUNK_ORACLE,
          "overlapping token-window chunking (size 40, stride 30) for "
          "context-window preprocessing")
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    n = F.size("tk")
    chunked = (toks.select(
        "doc_id", "tk",
        F.explode(F.sequence(F.lit(0),
                             F.ceil(n / F.lit(30.0)).cast("long") - 1)).alias("chunk_idx"))
        .filter(F.col("chunk_idx") * 30 < F.size("tk")))
    return chunked.select(
        "doc_id", F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("tk", F.col("chunk_idx").cast("int") * 30 + 1, 40))
         .alias("chunk_text"),
        F.least(F.size("tk") - F.col("chunk_idx") * 30, F.lit(40))
         .cast("long").alias("chunk_tokens"))


# ---------------------------------------------------------------------------
# Containment dedup: n_common / min(|A|,|B|) catches SUBSUMED docs
# (a quote or excerpt expanded inside a longer doc) that symmetric
# Jaccard under-scores — the Lee-et-al-style complement to
# q_ngram_jaccard. The join key is the 60-bit shingle hash (8 bytes
# across the shuffle, never shingle text); the smaller side of each
# qualifying pair is flagged as the contained (droppable) doc.
# ---------------------------------------------------------------------------

CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 1000
), sh AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))), 1, 15)) AS BIGINT) AS h
  FROM toks
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(i.n_common AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS containment,
       CASE WHEN sa.n < sb.n THEN i.doc_a WHEN sb.n < sa.n THEN i.doc_b
            ELSE GREATEST(i.doc_a, i.doc_b) END AS contained_doc
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_common AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.7
"""


@register("q_containment_dedup", CONTAINMENT_ORACLE,
          "containment near-dup: n_common/min(|A|,|B|) >= 0.7 over "
          "hashed shingles; flags the subsumed (smaller) doc")
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64, shingles as mk_shingles
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 1000)
    sh = (mk_shingles(d, "doc_id", "text")
          .select("doc_id", portable_hash64(F.col("shingle")).alias("h"))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.h") == F.col("b.h"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    cont = F.col("n_common").cast("double") / F.least("n_a", "n_b")
    contained = (F.when(F.col("n_a") < F.col("n_b"), F.col("doc_a"))
                  .when(F.col("n_b") < F.col("n_a"), F.col("doc_b"))
                  .otherwise(F.greatest("doc_a", "doc_b")))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .filter(cont >= 0.7)
            .select("doc_a", "doc_b", "n_common", "n_a", "n_b",
                    F.round(cont, 6).alias("containment"),
                    contained.alias("contained_doc")))
