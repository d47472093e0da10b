"""Exact substring-level deduplication: corpus-wide duplicated
k-token spans (the Spark-first re-expression of suffix-array exact
dedup from "Deduplicating Training Data Makes Language Models
Better", Lee et al. 2022).

Doc-level dedup (q_dedup_exact / MinHash-LSH) misses the dominant
duplication mode in web-scale training corpora: long VERBATIM
passages embedded in otherwise-distinct documents (boilerplate,
licenses, quoted articles). The suffix-array approach of the paper is
inherently single-machine; the distributed equivalent is the rolling
k-gram window:

1. tokenize once, slide a k-token window over every document
   (positions are 0-based token offsets);
2. a window is DUPLICATED if its k-gram occurs more than once in the
   whole corpus (cross-document or repeated within one document —
   the paper's "appears more than once" criterion);
3. per document, merge overlapping/touching duplicated windows into
   maximal spans (gaps-and-islands on window starts: fixed window
   length makes "next_start - prev_start > K" the exact island
   break);
4. `q_dup_token_ratio` folds the spans back per document — the
   fraction of tokens covered by corpus-duplicated spans is the
   standard curation drop/trim signal.

Scale posture (100 TB):
- the shuffle key is a 32-hex md5 of the k-gram, never the k-gram
  text: ONE gram pass — the global occurrence count is a window
  count over the hash partition (`count(*) over (partition by h)`,
  r15: replaced the groupBy + semi-join double pass for a measured
  ~2x cut), so each gram is shuffled once and duplicated grams are
  filtered in place (no driver collect, no broadcast of an
  unbounded set).
- spans are per-document windows (partitionBy doc_id) — bounded by
  document length, no global window anywhere.
- maximal spans are disjoint by construction, so the per-doc ratio
  is a plain sum, not an interval-overlap computation.

Reference parity: the reference pipeline has no analytics surface;
this extends the mandated LLM-curation battery (SURVEY.md §2
dedup row) alongside q_dedup_exact / q_minhash_lsh_pairs
(`operators/dedup.py`), which it complements at a finer granularity.

Cross-engine exactness: both engines group on md5 of the
space-joined k-gram (portable), positions are 0-based in both
(DuckDB's 1-based list index is shifted), every count/extent is CAST
to BIGINT, and the ratio is ONE division of two exact integers —
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register

K = 8  # window length in tokens (the paper uses 50 BPE tokens on
#        web text; the synthetic docs are ~50 tokens, so 8 keeps the
#        cross-doc duplicate structure visible at every SF)

_SPANS_SQL = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, u.pos AS pos, u.h AS h
  FROM toks, UNNEST(list_transform(range(1, len(tk) - {K} + 2),
       i -> struct_pack(pos := i - 1,
                        h := md5(array_to_string(tk[i : i + {K} - 1], ' '))))) AS t(u)
),
dup AS (
  SELECT h FROM grams GROUP BY h HAVING COUNT(*) > 1
),
dw AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)
),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {K}
              THEN 1 ELSE 0 END AS is_brk
  FROM dw
),
isl AS (
  SELECT doc_id, pos,
         SUM(is_brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + {K} - 1 AS BIGINT) AS span_end,
         CAST(MAX(pos) - MIN(pos) + {K} AS BIGINT) AS span_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_windows
  FROM isl GROUP BY doc_id, island
)
"""

DUP_SPANS_ORACLE = f"""
WITH {_SPANS_SQL}
SELECT doc_id, span_start, span_end, span_tokens, n_windows FROM spans
"""

DUP_RATIO_ORACLE = f"""
WITH {_SPANS_SQL},
per_doc AS (
  SELECT doc_id,
         CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(len(t.tk) AS BIGINT) AS n_tokens,
       p.dup_tokens,
       p.n_spans,
       CAST(p.dup_tokens AS DOUBLE) / len(t.tk) AS dup_ratio
FROM per_doc p JOIN toks t ON p.doc_id = t.doc_id
"""

DEDUP_TRIM_ORACLE = f"""
WITH {_SPANS_SQL},
cov AS (
  SELECT doc_id, UNNEST(range(span_start, span_end + 1)) AS pos
  FROM spans
),
tokpos AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok
  FROM toks, UNNEST(list_transform(range(1, len(tk) + 1),
       i -> struct_pack(pos := i - 1, tok := tk[i]))) AS t(u)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM cov c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS kept_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS trimmed_text
FROM kept GROUP BY doc_id
"""


def gram_windows(docs: DataFrame, k: int = K):
    """Rolling k-token windows of each document as (doc_id, pos, h)
    plus the tokenized frame. tokenize-once + slice per window:
    O(n_tokens * k) work, the inherent cost of the rolling window;
    the md5 leaves the shuffle at 16 bytes per window."""
    toks = docs.select("doc_id", F.split("text", " ").alias("tk"))
    grams = (toks.filter(F.size("tk") >= k)
                 .select("doc_id",
                         F.posexplode(F.transform(
                             F.sequence(F.lit(0), F.size("tk") - k),
                             lambda i: F.md5(F.concat_ws(
                                 " ", F.slice("tk", i + 1, k)))))
                          .alias("pos", "h")))
    return grams, toks


def merge_spans(dw: DataFrame, k: int, *extra_aggs):
    """Gaps-and-islands merge of duplicated windows (doc_id, pos[,
    flags]) into maximal per-document spans. Fixed window length makes
    "start gap > k" the exact island break; all windows are
    doc-partitioned — bounded by document length."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (dw.withColumn(
               "is_brk",
               F.when(F.col("pos") - F.lag("pos").over(w) > k, 1)
                .otherwise(0))
             .withColumn("island", F.sum("is_brk").over(w)))
    return (isl.groupBy("doc_id", "island")
               .agg(F.min("pos").cast("bigint").alias("span_start"),
                    (F.max("pos") + k - 1).cast("bigint")
                    .alias("span_end"),
                    (F.max("pos") - F.min("pos") + k).cast("bigint")
                    .alias("span_tokens"),
                    F.count(F.lit(1)).alias("n_windows"),
                    *extra_aggs))


def dup_spans_frame(docs: DataFrame, k: int = K):
    """(doc_id, island) → maximal duplicated span, plus the tokenized
    frame for downstream per-doc folds. `docs` needs (doc_id, text).

    The duplicated-window filter is a COUNT over a hash-partitioned
    window (`count(*) over (partition by h) > 1`), not the
    groupBy-count + semi-join form (r15, verdict item 8): the semi
    join recomputes the gram explosion on its probe side — the
    single most expensive stage — and shuffles it by h anyway, so
    the window form does strictly less work (one gram pass + one
    shuffle vs two passes + two shuffles) with the SAME skew
    exposure (both co-locate each gram hash on one partition;
    hyper-duplicated boilerplate spills, never breaks). Measured at
    the x100 scale fixture, one session, 2 reps each: semi 64–72 s,
    window 32.4/32.7 s (~2x). md5 stays the gram key: xxhash64 over
    the token-slice ARRAY measured SLOWER than md5 over the joined
    string (39 s vs 26 s gram-emit) and the oracle hashes md5 —
    the dup SET is hash-agnostic, so parity is structural."""
    grams, toks = gram_windows(docs, k)
    wh = Window.partitionBy("h")
    dw = (grams.withColumn("n", F.count(F.lit(1)).over(wh))
               .filter(F.col("n") > 1)
               .select("doc_id", "pos"))
    spans = merge_spans(dw, k)
    return spans, toks


def trim_dup_spans(docs: DataFrame, k: int = K) -> DataFrame:
    """Remove every token covered by a corpus-duplicated span and
    rebuild the document — the paper's actual output (a deduplicated
    corpus), applied on top of `dup_spans_frame`.

    Scale shape: spans are disjoint, so exploding each span to its
    covered positions emits at most one row per duplicated token
    (bounded by corpus size, same as tokenization), and the cut is a
    plain (doc_id, pos) anti equi-join — no per-doc range join, no
    interval logic in the hot path. The rebuild is a per-doc
    sort+join bounded by document length. Docs trimmed to zero
    tokens drop out (both engines agree)."""
    spans, toks = dup_spans_frame(docs, k=k)
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"))
    tokpos = toks.select(
        "doc_id", F.posexplode("tk").alias("pos", "tok"))
    kept = tokpos.join(covered, ["doc_id", "pos"], "left_anti")
    return (kept.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("kept_tokens"),
                     F.array_join(
                         F.transform(
                             F.array_sort(F.collect_list(
                                 F.struct("pos", "tok"))),
                             lambda s: s["tok"]),
                         " ").alias("trimmed_text")))


def _dup_spans(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    return dup_spans_frame(docs)


@register("q_dup_spans", DUP_SPANS_ORACLE,
          "corpus-wide duplicated k-token spans (exact substring dedup, "
          "Lee et al. 2022): rolling-hash windows, global count, "
          "gaps-and-islands merge to maximal spans")
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans, _ = _dup_spans(spark, sf_dir)
    return spans.select("doc_id", "span_start", "span_end",
                        "span_tokens", "n_windows")


@register("q_dedup_trim", DEDUP_TRIM_ORACLE,
          "apply exact substring dedup: cut every corpus-duplicated "
          "span and rebuild the document (the Lee et al. 2022 trimmed "
          "corpus) — disjoint spans explode to (doc,pos) and the cut "
          "is one anti equi-join")
def q_dedup_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return trim_dup_spans(docs)


@register("q_dup_token_ratio", DUP_RATIO_ORACLE,
          "per-document fraction of tokens covered by corpus-duplicated "
          "spans — the curation drop/trim signal on top of q_dup_spans")
def q_dup_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans, toks = _dup_spans(spark, sf_dir)
    per_doc = (spans.groupBy("doc_id")
                    .agg(F.sum("span_tokens").cast("bigint")
                          .alias("dup_tokens"),
                         F.count(F.lit(1)).alias("n_spans")))
    sizes = toks.select("doc_id", F.size("tk").cast("bigint").alias("n_tokens"))
    return (per_doc.join(sizes, "doc_id")
                   .select("doc_id", "n_tokens", "dup_tokens", "n_spans",
                           (F.col("dup_tokens").cast("double")
                            / F.col("n_tokens")).alias("dup_ratio")))
