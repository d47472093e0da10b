"""Sixth battery: TPC-H Q14/Q19 shapes (CASE-gated join aggregation,
disjunctive multi-range join predicates), BPE-ish regex tokenization,
and the full multimodal frame-sampling chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    return dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")


# --- TPC-H Q14 shape: promo revenue share per ship month ----------------

Q14_ORACLE = """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS total_revenue,
       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1
"""


@register("q_tpch_q14_promo", Q14_ORACLE,
          "TPC-H Q14 shape: promo revenue share per month — broadcast "
          "dim join + CASE-gated exact decimal aggregation")
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", dp).otherwise(
        F.lit(0).cast("decimal(14,4)"))
    # part scales with SF → no hard broadcast hint (AQE decides).
    out = (li.join(p, li.l_partkey == p.p_partkey)
           .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
           .agg(F.sum(promo).cast("double").alias("promo_revenue"),
                F.sum(dp).cast("double").alias("total_revenue")))
    return out.select(
        "ship_month", "promo_revenue", "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"),
                6).alias("promo_pct"))


# --- TPC-H Q19 shape: disjunctive multi-range predicates ----------------

Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 40)
"""


@register("q_tpch_q19_disjunctive", Q19_ORACLE,
          "TPC-H Q19 shape: OR-of-ANDs join predicates — Catalyst "
          "factors the common join key and pushes per-side conjuncts")
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # part scales with SF → no hard broadcast hint (AQE decides).
    j = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30)
           & q.between(10, 20))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(20, 50)
           & (q >= 40)))
    return (j.filter(cond)
            .agg(F.sum(_disc_price()).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


# --- BPE-ish regex tokenization ----------------------------------------

# the split reference tokenizers use: letter runs | digit runs | single
# non-alnum glyph. Simple character classes keep Java regex (Spark) and
# RE2-ish (DuckDB) semantics identical.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

TOKEN_REGEX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE}') AS tk FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tk)) AS BIGINT) AS n_unique,
       CAST(list_max(list_transform(tk, t -> len(t))) AS BIGINT) AS max_tok_len,
       ROUND(CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) / len(tk), 6) AS avg_tok_len
FROM toks
WHERE len(tk) > 0
"""


@register("q_token_regex", TOKEN_REGEX_ORACLE,
          "BPE-ish regex tokenization: letter/digit/punct token counts "
          "per document, all JVM-side (regexp_extract_all + array HOFs)")
def q_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)").alias("tk"))
    lens = F.transform(F.col("tk"), lambda t: F.length(t))
    return (toks.filter(F.size("tk") > 0)
            .select(
                "doc_id",
                F.size("tk").cast("long").alias("n_tokens"),
                F.size(F.array_distinct("tk")).cast("long").alias("n_unique"),
                F.array_max(lens).cast("long").alias("max_tok_len"),
                F.round(F.aggregate(lens, F.lit(0).cast("long"),
                                    lambda a, x: a + x).cast("double")
                        / F.size("tk"), 6).alias("avg_tok_len")))


# --- multimodal frame sampling (full chain) ----------------------------

FRAME_SAMPLE_ORACLE = """
WITH meta AS (
  SELECT doc_id AS asset_id,
         1 + octet_length(encode(text)) % 24 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT asset_id, CAST(unnest(range(0, n_frames, 6)) AS BIGINT) AS frame_idx
FROM meta
"""


@register("q_frame_sample", FRAME_SAMPLE_ORACLE,
          "multimodal chain: blob → Arrow decode stub → video frame "
          "sampling (every 6th frame) as sequence+explode")
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_blob, extract_media_meta, sample_frames
    d = load_table(spark, sf_dir, "documents")
    meta = extract_media_meta(attach_blob(d, "doc_id", "text"), fake=True)
    return sample_frames(meta, every_nth=6).withColumn(
        "frame_idx", F.col("frame_idx").cast("long"))
