"""TPC-H battery III: Q8 (market share — conditional share of an
8-way join), Q13 (customer order-count distribution — LEFT JOIN into
a groupBy OF a groupBy, zero-order customers included), Q15 (top
supplier by windowed max over a derived revenue view), Q17
(small-quantity revenue loss — correlated per-part average as a
window). Together with batteries I/II this covers every TPC-H query
expressible over the fixture's columns (no partsupp → Q2/Q9/Q11/Q16/
Q20; no commitdate/receiptdate/shipmode → Q4-as-written/Q12/Q21; no
phone → Q22-as-written; Q4/Q22 shapes are adapted in battery II).

Exactness: money through exact decimal sums; quantities are integral
doubles (exact double sums); the Q8 share and Q17 threshold divisions
are single double ops in the same order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dec
from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    return dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")


Q8_ORACLE = """
WITH base AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2)) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
       COUNT(*) AS n_rows
FROM base GROUP BY o_year
"""


@register("q_tpch_q8_market_share", Q8_ORACLE,
          "TPC-H Q8: one nation's share of a region's part-type volume "
          "per year (8-way join, conditional decimal share)")
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _disc_price()
    base = (li.join(p, li.l_partkey == p.p_partkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
              .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
              .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
              .select(F.year("o_orderdate").cast("long").alias("o_year"),
                      vol.alias("volume"), "supp_nation"))
    zero = F.lit(0).cast("decimal(12,2)")
    return (base.groupBy("o_year")
            .agg(F.round(
                     F.sum(F.when(F.col("supp_nation") == "NATION_2",
                                  F.col("volume")).otherwise(zero)).cast("double")
                     / F.sum("volume").cast("double"), 6).alias("mkt_share"),
                 F.count(F.lit(1)).alias("n_rows")))


Q13_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
"""


@register("q_tpch_q13_order_dist", Q13_ORACLE,
          "TPC-H Q13: customer order-count distribution (LEFT JOIN "
          "keeps zero-order customers; groupBy of a groupBy)")
def q_tpch_q13_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q_tpch_q15_top_supplier", Q15_ORACLE,
          "TPC-H Q15: top supplier(s) by quarterly revenue — scalar "
          "MAX over a derived view, as an agg + broadcast semi filter")
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar `(SELECT MAX(total_revenue) FROM revenue)` is a full
    `agg(max)` (map-side partials, one-row result) broadcast back over
    the per-supplier view — the same scalar-subquery shape q_tpch_q17
    uses for its brand threshold. The r5 form was
    `Window.partitionBy()`, which moved the whole revenue view to ONE
    partition; at 100x supplier cardinality that is a straggler, while
    the agg+broadcast never concentrates more than a single row."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                         & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
               .groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(_disc_price()).cast("double").alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = (revenue.join(F.broadcast(mx))
           .filter(F.col("total_revenue") == F.col("mx")).drop("mx"))
    return (s.join(top, s.s_suppkey == top.supplier_no)
            .select("s_suppkey", "s_name", "total_revenue"))


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = (SELECT MIN(p_brand) FROM part)
  AND l.l_quantity < (SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@register("q_tpch_q17_small_quantity", Q17_ORACLE,
          "TPC-H Q17: revenue loss on below-avg-quantity lines — the "
          "correlated per-part average as a window aggregate")
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    brand = p.agg(F.min("p_brand").alias("b"))
    pb = p.join(F.broadcast(brand), p.p_brand == F.col("b")).select("p_partkey")
    # correlated scalar avg -> per-part window over the FULL lineitem
    # (the subquery ranges over all parts' lines, not just the brand's)
    w = Window.partitionBy("l_partkey")
    li2 = li.withColumn(
        "thresh", F.lit(0.2) * (F.sum("l_quantity").over(w)
                                / F.count(F.lit(1)).over(w)))
    return (li2.join(pb, li2.l_partkey == pb.p_partkey)
            .filter(F.col("l_quantity") < F.col("thresh"))
            .agg((F.sum(dec("l_extendedprice", 12, 2)).cast("double") / 7.0)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))
