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
