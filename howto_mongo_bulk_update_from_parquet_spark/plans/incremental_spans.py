"""Incremental (cross-batch) substring-level dedup.

The span-level twin of `incremental_dedup`: at 100 TB you never
re-tokenize the corpus when a crawl batch arrives. The history is
represented by its persisted k-gram hash index — one 16-byte md5 per
distinct window, stored bucketed by the hash — and each arriving
batch is tokenized and hashed ONCE. A batch window is duplicated if

- its k-gram already exists in the history index (``idx_windows``
  counts these per span), or
- it occurs more than once within the batch itself (the batch is its
  own corpus, same criterion as `dup_spans`).

Duplicated windows then merge into maximal per-document spans
(gaps-and-islands, doc-partitioned) exactly as in `q_dup_spans`; the
``idx_windows`` column says how much of each span is history-caused
vs batch-internal — the signal that decides "trim against history"
vs "pick one copy within the batch".

Catalog form: documents with ``doc_id % 3 <> 0`` are the indexed
history, the rest the new batch (the `q_incremental_dedup` split), so
the DuckDB oracle replays both corpus states from one table. The
production arrival loop persists the index through the keyed-table
sink via `gram_index_rows` (h is the merge key) — exercised by
`tests/test_incremental_spans.py`; the helper stays sink-import-free
so this query's attestation closure is purely relational.

Scale posture: the index probe is a bucket-local semi join on h (only
the batch side shuffles when the index is bucket-stored); the
batch-internal count is one map-side-combinable groupBy of the
BATCH's windows only; history cost is zero per arrival. Nothing is
all-pairs and no window is wider than one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register
from .dup_spans import K, gram_windows, merge_spans

_GRAMS_SQL = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, u.pos AS pos, u.h AS h
  FROM toks, UNNEST(list_transform(range(1, len(tk) - {K} + 2),
       i -> struct_pack(pos := i - 1,
                        h := md5(array_to_string(tk[i : i + {K} - 1], ' '))))) AS t(u)
)
"""

INCREMENTAL_SPANS_ORACLE = f"""
WITH {_GRAMS_SQL},
newg AS (SELECT * FROM grams WHERE doc_id % 3 = 0),
idx  AS (SELECT DISTINCT h FROM grams WHERE doc_id % 3 <> 0),
bc   AS (SELECT h, COUNT(*) AS n FROM newg GROUP BY h),
dw AS (
  SELECT g.doc_id, g.pos,
         CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END AS is_idx
  FROM newg g
  LEFT JOIN idx i ON g.h = i.h
  JOIN bc ON g.h = bc.h
  WHERE i.h IS NOT NULL OR bc.n > 1
),
brk AS (
  SELECT doc_id, pos, is_idx,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {K}
              THEN 1 ELSE 0 END AS is_brk
  FROM dw
),
isl AS (
  SELECT doc_id, pos, is_idx,
         SUM(is_brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {K} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {K} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(is_idx) AS BIGINT) AS idx_windows
FROM isl GROUP BY doc_id, island
"""


def gram_index_rows(docs: DataFrame, k: int = K) -> DataFrame:
    """Distinct k-gram index rows for a batch: (h, rep_id, n) with the
    smallest contributing doc as representative. `h` is the single
    merge key a keyed store needs, so an arrival loop maintains the
    index incrementally (probe the batch, upsert the retained docs'
    rows — history is never re-hashed). Sink-agnostic by design."""
    return gram_index_rows_from_grams(gram_windows(docs, k)[0])


def gram_index_rows_from_grams(grams: DataFrame) -> DataFrame:
    """`gram_index_rows` over an ALREADY-COMPUTED (doc_id, pos, h)
    window frame — an arrival loop that just probed the batch folds
    it into the index without re-tokenizing/re-hashing (the batch is
    hashed ONCE, as the module contract says)."""
    return (grams.groupBy("h")
                 .agg(F.min("doc_id").alias("rep_id"),
                      F.count(F.lit(1)).alias("n")))


def _gram_hit_flag(grams: DataFrame, gram_index: DataFrame,
                   flag: str) -> DataFrame:
    """LEFT-join one index frame onto the batch windows, marking hits
    in `flag` (self-hits excluded when rep_id rides along)."""
    if "rep_id" in gram_index.columns:
        return (grams.join(
            gram_index.select("h", F.col("rep_id").alias("__rep")),
            "h", "left")
            .withColumn(flag,
                        F.when(F.col("__rep").isNotNull()
                               & (F.col("__rep") != F.col("doc_id")),
                               F.lit(1)))
            .drop("__rep"))
    return grams.join(
        gram_index.select("h").distinct().withColumn(flag, F.lit(1)),
        "h", "left")


def incremental_dup_spans(new_docs: DataFrame, gram_index: DataFrame,
                          k: int = K,
                          new_grams: DataFrame | None = None,
                          pending_gram_index: DataFrame | None = None
                          ) -> DataFrame:
    """Maximal duplicated spans of a new batch against a persisted
    k-gram index. ``gram_index`` needs only column h — exactly what
    the store holds; pass it pre-deduplicated (or bucket-stored) so
    the probe shuffles the batch side only. When it also carries
    ``rep_id``, an index hit whose representative IS the probing
    document is ignored — so a batch replayed after its grams were
    folded in (streaming foreachBatch retry) reports the same spans
    as the first run instead of flagging every window as history-dup.
    Returns one row per span with idx_windows = how many of its
    windows hit history.

    ``pending_gram_index`` is the LSM tail (same posture as
    `incremental_near_dup_flags`): the committed base probes through
    its bucketed scan, the small pending tail probes as a separate
    join, and a window counts as a history hit if EITHER matched."""
    grams = (new_grams if new_grams is not None
             else gram_windows(new_docs, k)[0])
    idx_flag = _gram_hit_flag(grams, gram_index, "__idx")
    if pending_gram_index is not None:
        idx_flag = _gram_hit_flag(idx_flag, pending_gram_index, "__idx2")
        idx_flag = (idx_flag.withColumn(
            "__idx", F.when((F.col("__idx") == 1)
                            | (F.col("__idx2") == 1), F.lit(1)))
            .drop("__idx2"))
    bc = grams.groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
    dw = (idx_flag.join(bc, "h")
          .filter((F.col("__idx") == 1) | (F.col("__n") > 1))
          .select("doc_id", "pos",
                  F.coalesce(F.col("__idx"), F.lit(0)).alias("is_idx")))
    return merge_spans(
        dw, k, F.sum("is_idx").cast("bigint").alias("idx_windows"))


@register("q_incremental_dup_spans", INCREMENTAL_SPANS_ORACLE,
          "cross-batch substring dedup: new batch's k-gram windows "
          "probed against the history's persisted gram index + "
          "batch-internal repeat count, merged to maximal spans with "
          "history-vs-batch attribution")
def q_incremental_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    new_docs = d.filter(F.col("doc_id") % 3 == 0)
    history = d.filter(F.col("doc_id") % 3 != 0)
    index = gram_windows(history)[0].select("h").distinct()
    return (incremental_dup_spans(new_docs, index)
            .select("doc_id", "span_start", "span_end", "span_tokens",
                    "n_windows", "idx_windows"))
