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
    """percent_rank/cume_dist/nth_value are definitionally whole-
    partition functions; the 3-value o_orderstatus key makes each
    partition ~n/3 rows in one task (allowlisted in the tiny-key
    window sweep — this query demos the function family, not a scale
    pattern; distribution POSITIONS at scale come from
    exact_grouped_percentile)."""
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


# TPC-H Q7 shape: bilateral shipping volume between two nation groups
Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
  AND n1.n_nationkey <> n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
"""


@register("q_tpch_q7_volume", Q7_ORACLE,
          "TPC-H Q7 shape: bilateral volume between nation pairs per year")
def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3) \
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3) \
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    vol = dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    # supplier/customer scale with SF → strategy left to AQE; only the
    # fixed ≤25-row nation sides keep hard broadcast hints.
    return (li.join(s, li.l_suppkey == s.s_suppkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
              .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
              .filter(F.col("n1_key") != F.col("n2_key"))
              .groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").cast("long").alias("l_year"))
              .agg(F.sum(vol).cast("double").alias("volume")))


# TPC-H Q10 shape: top customers by revenue from returned items
Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q_tpch_q10_returns", Q10_ORACLE,
          "TPC-H Q10 shape: top-20 customers by returned-item revenue")
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (c.join(o, c.c_custkey == o.o_custkey)
             .join(li, o.o_orderkey == li.l_orderkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("c_custkey", "c_name", "n_name")
             .agg(F.sum(rev).cast("double").alias("revenue"))
             .orderBy(F.col("revenue").desc(), "c_custkey")
             .limit(20))
