"""Corpus statistics for curation: per-document token entropy (the
Gopher-style "gibberish / repetition" signal the repetition-ratio
query complements) and TF-IDF top terms (the classic salience score a
mixture or retrieval stage keys on).

Cross-engine float discipline for logarithms: a sum of doubles is
order-dependent, so every per-token entropy term is rounded to 9
decimals and summed as DECIMAL (order-independent, both engines
agree); single-multiplication scores (tf·idf) need no decimal pass —
one IEEE multiply is order-free — and the final ROUND(…, 6) absorbs
any last-ulp difference between the engines' log implementations.

Scale notes (100 TB): both queries are explode → groupBy(key)
pipelines — map-side combinable, shuffle bounded by distinct
(doc, token) pairs, no joins except TF-IDF's token-keyed df join
(token vocabulary ≪ corpus; AQE broadcasts when it fits). The
doc-frequency side never carries text beyond the token itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register


ENTROPY_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < 300
), counts AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
), terms AS (
  SELECT doc_id, c,
         CAST(ROUND(c * log2(CAST(c AS DOUBLE)), 9) AS DECIMAL(20,9)) AS t
  FROM counts
), agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(t) AS DOUBLE) AS s
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n AS n_tokens,
       ROUND(log2(CAST(n AS DOUBLE)) - s / n, 6) AS token_entropy
FROM agg
"""


@register("q_token_entropy", ENTROPY_ORACLE,
          "per-document token Shannon entropy (H = log2 n - sum(c*log2 c)/n "
          "with decimal-summed terms), the gibberish/repetition signal")
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    term = (F.round(F.col("c") * F.log2(F.col("c").cast("double")), 9)
            .cast("decimal(20,9)"))
    agg = (counts.groupBy("doc_id")
           .agg(F.sum("c").cast("long").alias("n"),
                F.sum(term).cast("double").alias("s")))
    return agg.select(
        "doc_id", F.col("n").alias("n_tokens"),
        F.round(F.log2(F.col("n").cast("double")) - F.col("s") / F.col("n"), 6)
         .alias("token_entropy"))


TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         ROUND(t.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN df d ON t.tok = d.tok
)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rnk
      FROM scored)
WHERE rnk <= 3
"""


@register("q_tfidf_top_terms", TFIDF_ORACLE,
          "TF-IDF top-3 terms per document: corpus df join + windowed "
          "top-k (salience scoring for mixtures/retrieval)")
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # driver scalar, like the oracle's (SELECT n_docs)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = (toks.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    scored = (tf.join(df, "tok")
              .select("doc_id", "tok", "tf", "df",
                      F.round(F.col("tf") * F.log(F.lit(float(n_docs))
                                                  / F.col("df")), 6)
                       .alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
                  .filter(F.col("rnk") <= 3)
                  .select("doc_id", "tok", F.col("tf").cast("long").alias("tf"),
                          F.col("df").cast("long").alias("df"), "tfidf", "rnk"))


# ---------------------------------------------------------------------------
# Source-overlap matrix: pairwise distinct-shingle overlap between
# corpus sources — the "which feeds duplicate each other" report a
# curation pipeline runs before setting mixture weights. Shingles
# dedup to (source, hash) FIRST, so the pair join's input is bounded
# by vocabulary x sources, not corpus size, and only 8-byte hashes
# cross the shuffle.
# ---------------------------------------------------------------------------

SOURCE_OVERLAP_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), sh AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))), 1, 15)) AS BIGINT) AS h
  FROM toks
), sizes AS (
  SELECT source, COUNT(*) AS n FROM sh GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared,
       sa.n AS n_a, sb.n AS n_b,
       ROUND(CAST(COUNT(*) AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS overlap
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
JOIN sizes sa ON sa.source = a.source JOIN sizes sb ON sb.source = b.source
GROUP BY a.source, b.source, sa.n, sb.n
"""


@register("q_source_overlap", SOURCE_OVERLAP_ORACLE,
          "pairwise source shingle-overlap matrix (per-source distinct "
          "hashed shingles, bounded by vocabulary x sources)")
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import portable_hash64, shingles as mk_shingles
    d = load_table(spark, sf_dir, "documents")
    # the hashed-shingle set feeds FOUR plan branches (sizes + both
    # pair sides + the final joins) — cut the tokenize/hash/distinct
    # lineage once; the set is vocabulary×sources-bounded
    sh = (mk_shingles(d.select(F.col("source").alias("doc_id"), "text"),
                      "doc_id", "text")
          .select(F.col("doc_id").alias("source"),
                  portable_hash64(F.col("shingle")).alias("h"))
          .distinct()
          .localCheckpoint(eager=False))
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (a.join(b, ["h"]).filter(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .join(sa, "source_a").join(sb, "source_b")
             .select("source_a", "source_b", "n_shared", "n_a", "n_b",
                     F.round(F.col("n_shared").cast("double")
                             / F.least("n_a", "n_b"), 6).alias("overlap")))


# ---------------------------------------------------------------------------
# Bigram language-model scoring — the n-gram perplexity proxy every
# corpus-quality pipeline runs (KenLM-style, MLE without smoothing:
# the model is trained on the same corpus it scores, so every bigram
# has count ≥ 1 and no backoff is needed). Per-doc average bigram
# log-probability: avg over positions of log2(c(w1,w2) / c(w1,·)).
#
# Same log discipline as q_token_entropy: each per-bigram term is ONE
# division + ONE log2, rounded to 9 decimals, decimal-summed — engine-
# identical. Scale: two token-keyed aggregations (vocabulary-sized,
# map-side combinable) + two vocabulary-keyed joins back to the
# per-doc bigram stream; AQE broadcasts the count sides when they fit.
# ---------------------------------------------------------------------------

BIGRAM_LM_ORACLE = """
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS b
  FROM tk
),
c12 AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
c1 AS (
  SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS c FROM bg GROUP BY w1
),
terms AS (
  SELECT bg.doc_id,
         CAST(ROUND(log2(CAST(c12.c AS DOUBLE) / c1.c), 9)
              AS DECIMAL(20,9)) AS lp
  FROM bg
  JOIN c12 ON bg.b = c12.b
  JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w1
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM terms GROUP BY doc_id
"""


@register("q_bigram_lm_score", BIGRAM_LM_ORACLE,
          "per-doc avg bigram log-prob (MLE corpus LM, perplexity "
          "proxy): vocabulary-keyed count joins, round-9 decimal-"
          "summed log terms")
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    tk = (d.filter(F.size(t) >= 2)
          .select("doc_id", t.alias("t")))
    z = F.arrays_zip(F.slice("t", 1, F.size("t") - 1),
                     F.slice("t", 2, F.size("t") - 1))
    bg = tk.select(
        "doc_id",
        F.explode(F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"])))
         .alias("b")).localCheckpoint(eager=False)
    # the bigram stream feeds the c12 count AND the scoring join —
    # checkpoint cuts the scan+split+explode to one execution (r16;
    # the before-plan ran it 3×). c1 derives from c12 (count of
    # bigrams starting with w1 = Σ c12 over that prefix — exact), so
    # the unigram pass runs over the vocabulary-sized counts, not the
    # full stream.
    c12 = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (c12.groupBy(F.split_part(F.col("b"), F.lit(" "), F.lit(1))
               .alias("w1"))
          .agg(F.sum("c12").alias("c1")))
    term = (F.round(F.log2(F.col("c12").cast("double") / F.col("c1")), 9)
            .cast("decimal(20,9)"))
    joined = (bg.join(c12, "b")
              .withColumn("w1", F.split_part(F.col("b"), F.lit(" "), F.lit(1)))
              .join(c1, "w1"))
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_logprob")))


# ---------------------------------------------------------------------------
# Keyword-in-context (KWIC): every occurrence of a query term with a
# ±3-token window — the inspection view a corpus-QA pass renders for
# spot checks. Positions come from one posexplode; the context is an
# array slice around the hit (no joins back — the token array rides
# along), so the whole query is scan → explode → filter → slice.
# Slice bounds clamp at the document edges identically in both
# engines (explicit GREATEST/LEAST arithmetic, 1-based positions).
# ---------------------------------------------------------------------------

KWIC_TERM = "vector"

KWIC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
hits AS (
  SELECT doc_id, tk,
         unnest(list_transform(range(1, len(tk) + 1),
                               i -> CASE WHEN tk[i] = '{KWIC_TERM}'
                                         THEN i END)) AS pos
  FROM toks
)
SELECT doc_id, pos,
       array_to_string(tk[GREATEST(1, pos - 3):LEAST(len(tk), pos + 3)],
                       ' ') AS context
FROM hits WHERE pos IS NOT NULL
"""


@register("q_kwic_context", KWIC_ORACLE,
          "keyword-in-context: one posexplode finds term positions, "
          "clamped array slices render the +-3-token window; "
          "scan-local, no joins")
def q_kwic_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    hits = (toks.select("doc_id", "tk",
                        F.posexplode("tk").alias("pos0", "tok"))
            .filter(F.col("tok") == KWIC_TERM)
            .select("doc_id", "tk", (F.col("pos0") + 1).alias("pos")))
    start = F.greatest(F.lit(1), F.col("pos") - 3)
    stop = F.least(F.size("tk"), F.col("pos") + 3)
    return hits.select(
        "doc_id", "pos",
        F.array_join(F.slice("tk", start, stop - start + 1), " ")
         .alias("context"))


# ---------------------------------------------------------------------------
# Per-document unigram entropy — the information-density quality
# signal (low-entropy docs are boilerplate/repetition; the Shannon
# complement of q_repetition_ratio's n-gram dup ratio). Per doc:
# H = Σ (c/n)·log2(n/c) over its word distribution. Transcendental
# discipline: each term rounds to 9 decimals and crosses the agg as
# DECIMAL(20,9), so partial-aggregation order can't move a bit and
# both engines' log2 evaluate on identical doubles. The per-doc
# groupBy keys on doc_id (high cardinality — shuffles distribute
# evenly at any scale).
# ---------------------------------------------------------------------------

DOC_ENTROPY_ORACLE = """
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
), wc AS (
  SELECT doc_id, lang, w, COUNT(*) AS c FROM words WHERE w <> ''
  GROUP BY doc_id, lang, w
), tot AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY doc_id
), terms AS (
  SELECT wc.doc_id, wc.lang,
         CAST(ROUND((CAST(c AS DOUBLE) / n)
                    * log2(CAST(n AS DOUBLE) / c), 9)
              AS DECIMAL(20,9)) AS t
  FROM wc JOIN tot ON wc.doc_id = tot.doc_id
), dh AS (
  SELECT doc_id, lang, SUM(t) AS h FROM terms GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(MIN(h) AS DOUBLE), 6) AS min_entropy,
       ROUND(CAST(MAX(h) AS DOUBLE), 6) AS max_entropy,
       ROUND(CAST(SUM(h) AS DOUBLE) / COUNT(*), 6) AS avg_entropy
FROM dh GROUP BY lang
"""


@register("q_doc_entropy", DOC_ENTROPY_ORACLE,
          "per-document unigram Shannon entropy, aggregated per "
          "language (min/max/avg): round-9 decimal-summed log2 terms, "
          "doc_id-keyed shuffles only")
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = (d.select("doc_id", "lang",
                      F.explode(F.split("text", " ")).alias("w"))
             .filter(F.col("w") != ""))
    wc = (words.groupBy("doc_id", "lang", "w")
          .agg(F.count(F.lit(1)).alias("c")))
    tot = wc.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    term = F.round(
        (F.col("c").cast("double") / F.col("n"))
        * F.log2(F.col("n").cast("double") / F.col("c")), 9) \
        .cast("decimal(20,9)")
    dh = (wc.join(tot, "doc_id")
          .groupBy("doc_id", "lang")
          .agg(F.sum(term).alias("h")))
    return (dh.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.round(F.min("h").cast("double"), 6).alias("min_entropy"),
                 F.round(F.max("h").cast("double"), 6).alias("max_entropy"),
                 F.round(F.sum("h").cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_entropy")))
