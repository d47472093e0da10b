"""MinHash-LSH and SimHash near-dup queries — each stage of the
operators/dedup.py pipeline exposed with a full DuckDB oracle (the
portable md5-prefix hash makes signatures engine-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (lsh_bands, lsh_candidate_pairs,
                               minhash_signatures, shingles, simhash)
from ..sources.parquet import load_table
from .catalog import register

_SHINGLES_SQL = """
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
"""

MINHASH_ORACLE = f"""
WITH shingles AS ({_SHINGLES_SQL}),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
  FROM shingles
),
seeds AS (SELECT unnest(range(0, 16)) AS seed)
SELECT doc_id, CAST(seed AS INT) AS seed,
       MIN(((2 * seed + 1) * h + seed * seed + 7) % 2147483647) AS minhash
FROM hashed CROSS JOIN seeds
GROUP BY doc_id, seed
"""


@register("q_minhash_signatures", MINHASH_ORACLE,
          "MinHash signatures (16 seeded permutations over 3-gram shingles)")
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_signatures(shingles(d, "doc_id", "text", 3), "doc_id", 16)


LSH_PAIRS_ORACLE = f"""
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
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id
"""


@register("q_minhash_lsh_pairs", LSH_PAIRS_ORACLE,
          "LSH candidate pairs: 4 bands × 4 rows — bucket-join, no cross join")
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles(d, "doc_id", "text", 3), "doc_id", 16)
    return lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")


SIMHASH_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS th FROM toks),
bitsrc AS (SELECT unnest(range(0, 60)) AS b),
votes AS (
  SELECT doc_id, b, SUM(CASE WHEN (th >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM h CROSS JOIN bitsrc GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


@register("q_simhash", SIMHASH_ORACLE,
          "60-bit SimHash fingerprints (per-token ±1 bit votes)")
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", 60)
