"""Multimodal metadata-extraction query: documents → binary assets →
mapInPandas decode-stub → typed metadata. The oracle reproduces the
deterministic pseudo-metadata arithmetic from byte lengths (UTF-8 text
⇒ octet_length), proving the Spark-side binary plumbing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_blob, extract_media_meta
from ..sources.parquet import load_table
from .catalog import register

MULTIMODAL_ORACLE = """
SELECT doc_id AS asset_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(16 + octet_length(encode(text)) % 1024 AS BIGINT) AS width,
       CAST(16 + (octet_length(encode(text)) * 7) % 1024 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 24
                 ELSE 1 END AS BIGINT) AS n_frames
FROM documents
"""


@register("q_multimodal_meta", MULTIMODAL_ORACLE,
          "binary asset column → Arrow-batched metadata extraction (decode stub)")
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return extract_media_meta(attach_blob(d, "doc_id", "text"), fake=True)


# resize geometry on the stubbed metadata: long side capped at 256,
# aspect preserved, never upscaled. The oracle repeats the width/height
# derivation then the same IEEE double scale+floor arithmetic.
RESIZE_ORACLE = """
WITH meta AS (
  SELECT doc_id AS asset_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         CAST(16 + octet_length(encode(text)) % 1024 AS BIGINT) AS width,
         CAST(16 + (octet_length(encode(text)) * 7) % 1024 AS BIGINT) AS height
  FROM documents
)
SELECT asset_id, kind, width, height,
       CAST(FLOOR(width * (CASE WHEN GREATEST(width, height) > 256
                                THEN 256.0 / GREATEST(width, height)
                                ELSE 1.0 END)) AS BIGINT) AS new_width,
       CAST(FLOOR(height * (CASE WHEN GREATEST(width, height) > 256
                                 THEN 256.0 / GREATEST(width, height)
                                 ELSE 1.0 END)) AS BIGINT) AS new_height
FROM meta WHERE kind IN ('image', 'video')
"""


@register("q_resize_plan", RESIZE_ORACLE,
          "multimodal resize stage: aspect-preserving geometry (long "
          "side ≤ 256) over Arrow batches — the pixel resample's slot")
def q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_plan
    d = load_table(spark, sf_dir, "documents")
    meta = extract_media_meta(attach_blob(d, "doc_id", "text"), fake=True)
    return resize_plan(meta, max_side=256)


# Byte-level features are exact integers, so the oracle can reproduce
# them from the UTF-8 text (pure-ASCII fixture ⇒ ascii(char) == byte).
FEATURES_ORACLE = """
WITH b AS (
  SELECT doc_id, ascii(substr(text, i.i, 1)) AS byte
  FROM documents
  CROSS JOIN LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) i
  WHERE length(text) > 0
)
SELECT doc_id AS asset_id,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       CAST(COUNT(DISTINCT byte) AS BIGINT) AS n_distinct_bytes,
       CAST(SUM(byte) AS BIGINT) AS sum_bytes,
       CAST(MIN(byte) AS BIGINT) AS min_byte,
       CAST(MAX(byte) AS BIGINT) AS max_byte
FROM b GROUP BY doc_id
"""


@register("q_feature_extract", FEATURES_ORACLE,
          "REAL multimodal feature extraction: per-asset byte statistics "
          "via numpy over Arrow batches (the embedding-encoder pipeline "
          "shape, executable end-to-end — no decode stub)")
def q_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import extract_byte_features
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return extract_byte_features(attach_blob(d, "doc_id", "text"))
