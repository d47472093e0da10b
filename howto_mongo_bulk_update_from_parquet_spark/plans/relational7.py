"""Seventh battery: correlated LATERAL subquery (per-row top-k) and
null-safe equality join (`<=>` / IS NOT DISTINCT FROM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

LATERAL_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_custkey < 100
"""


@register("q_lateral_topk", LATERAL_ORACLE,
          "correlated LATERAL subquery: top-2 orders per customer — "
          "Catalyst decorrelates to a ranked join, no per-row re-scan")
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(LATERAL_ORACLE)


# NULL never equals NULL under plain `=` — two customers with a NULLed
# segment would silently drop from an equi-join. Null-safe equality
# (`<=>`) groups them together; the oracle spells the ANSI form.
NULL_SAFE_ORACLE = """
WITH c AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
  FROM customer WHERE c_custkey < 200
)
SELECT COALESCE(a.seg, '<null>') AS seg, COUNT(*) AS n_pairs
FROM c a JOIN c b
  ON a.seg IS NOT DISTINCT FROM b.seg AND a.c_custkey < b.c_custkey
GROUP BY 1
"""


@register("q_null_safe_join", NULL_SAFE_ORACLE,
          "null-safe equality join (<=>): NULL keys match each other "
          "instead of silently dropping")
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") < 200)
         .select("c_custkey",
                 F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")))
    a = c.select(F.col("c_custkey").alias("k_a"), F.col("seg").alias("seg_a"))
    b = c.select(F.col("c_custkey").alias("k_b"), F.col("seg").alias("seg_b"))
    return (a.join(b, a.seg_a.eqNullSafe(b.seg_b) & (a.k_a < b.k_b))
            .groupBy(F.coalesce("seg_a", F.lit("<null>")).alias("seg"))
            .agg(F.count(F.lit(1)).alias("n_pairs")))
