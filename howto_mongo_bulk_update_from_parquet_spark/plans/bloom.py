"""Bloom-prefiltered semi join as a catalog query: urgent-order
revenue from lineitem, where the probe scan is pre-filtered by a
2^18-bit bloom over the urgent orderkeys before the exact semi join.

The bloom can only ADD false positives ahead of an exact verify join,
so the composed result is identical to the plain semi join — which is
exactly what the oracle states. See operators/bloom.py for the
build/probe/verify contract and the m ≈ 14 bits/key sizing rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_semi_join
from ..sources.parquet import load_table
from .catalog import register

BLOOM_SEMI_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


@register("q_bloom_semi_join", BLOOM_SEMI_ORACLE,
          "bloom-prefiltered exact semi join: 2^18-bit filter over "
          "urgent orderkeys drops probe rows at the scan (codegen, no "
          "Python), exact semi join verifies; oracle = plain semi join")
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    # fixed 2^18 (auto-sizing would pick 2^19 at sf0.1 for a fp-rate
    # gain this exact-verified query doesn't need at literal cost)
    hits = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey",
                           m_bits=1 << 18)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (hits.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(price * disc).cast("double").alias("revenue")))
