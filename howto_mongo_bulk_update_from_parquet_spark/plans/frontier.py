"""Pareto-frontier curation: keep the documents no other document
beats on BOTH size (n_chars) and lexical diversity (distinct-token
ratio) — the skyline a data-curation pass uses to pick quality
exemplars without a scalar weighting.

Engine side is `operators/skyline.py` (per-partition prune → bounded
global merge — no global sort, no full collect); the oracle states the
same set declaratively via NOT EXISTS over the dominance predicate.
Both metrics derive from one space-tokenization, computed identically
in both engines; the diversity division is a single IEEE op on exact
integers, so the dominance comparisons agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skyline import skyline_2d
from ..sources.parquet import load_table
from .catalog import register

SKYLINE_ORACLE = """
WITH pts AS (
  SELECT doc_id, n_chars,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
)
SELECT p.doc_id, p.n_chars, ROUND(p.diversity, 6) AS diversity
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.n_chars >= p.n_chars AND q.diversity >= p.diversity
    AND (q.n_chars > p.n_chars OR q.diversity > p.diversity)
)
"""


@register("q_skyline_pareto", SKYLINE_ORACLE,
          "Pareto skyline over documents (maximize n_chars AND "
          "distinct-token ratio): per-partition prune then bounded "
          "global merge; oracle = NOT EXISTS dominance")
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pts = (d.filter(F.col("text").isNotNull() & (F.size(toks) > 0))
           .select("doc_id", "n_chars",
                   (F.size(F.array_distinct(toks)).cast("double")
                    / F.size(toks)).alias("diversity")))
    sky = skyline_2d(pts, "n_chars", "diversity")
    return sky.withColumn("diversity", F.round("diversity", 6))
