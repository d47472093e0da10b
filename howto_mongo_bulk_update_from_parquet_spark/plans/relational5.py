"""Fifth battery: HAVING, IN / NOT IN with null semantics, and a
string-normalization pipeline (regexp_replace / trim / pad / initcap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


HAVING_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15 AND SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
"""


@register("q_having", HAVING_ORACLE,
          "post-aggregation HAVING filter on count and exact sum")
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(dec("o_totalprice", 18, 2)).alias("_sum"))
             .filter((F.col("n_orders") >= 15) & (F.col("_sum") > 1000000))
             .select("o_custkey", "n_orders",
                     F.col("_sum").cast("double").alias("total_spent")))


# NOT IN over a subquery with possible NULLs is the classic SQL trap:
# if the subquery yields any NULL, NOT IN returns no rows. The engine
# must reproduce ANSI three-valued logic, not the intuitive set
# difference. (The subquery here is null-free so rows DO come back;
# the semantics still route through null-aware anti join in Spark.)
NOT_IN_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
  AND c_custkey IN (SELECT o_custkey FROM orders)
"""


@register("q_in_not_in", NOT_IN_ORACLE,
          "IN + NOT IN subqueries (null-aware anti join semantics)")
def q_in_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    return c.sparkSession.sql(NOT_IN_ORACLE)


STRNORM_ORACLE = """
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS type_sentence,
       split_part(p_type, ' ', 1) AS type_first_word,
       repeat(p_brand, 2) AS brand_twice
FROM part
WHERE p_partkey < 150
"""


@register("q_string_normalize", STRNORM_ORACLE,
          "string normalization: regexp_replace/trim/lpad/case-fold/split_part/repeat")
def q_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat(F.upper(F.substring("p_type", 1, 1)),
                 F.lower(F.expr("substring(p_type, 2)"))).alias("type_sentence"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"))


NTILE_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       ntile(4) OVER w AS price_quartile,
       ROUND(percent_rank() OVER w, 8) AS pct_rank,
       ROUND(cume_dist() OVER w, 8) AS cume,
       first_value(o_orderkey) OVER w AS cheapest_key,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@register("q_window_rank_dist", NTILE_ORACLE,
          "ranking-distribution windows: ntile/percent_rank/cume_dist/nth_value")
def q_window_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"))
