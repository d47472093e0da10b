"""TPC-H battery II: the correlated-subquery / EXISTS / IN-subquery
classics (Q3, Q4, Q5, Q6, Q18, Q22 shapes) adapted to the fixture's
columns (no partsupp / commitdate / shipmode / phone, so Q2/Q12/Q21
as written are out of reach; Q4 and Q22 keep their subquery shape on
the columns that exist).

Exactness discipline: every money aggregate goes through the exact
decimal sum (functions/numeric.py::dec) before the final double cast;
quantities are integral doubles, so their double sums are exact.

Scale notes (100 TB):
- Q3/Q5/Q18 are the canonical shuffle-join + aggregation pipelines —
  Catalyst orders the joins, AQE picks broadcast vs shuffle per side
  at runtime, the ≤25-row nation/region dims keep hard broadcast
  hints, and every filter sits on the scan (PushedFilters).
- Q4/Q22's EXISTS / NOT EXISTS become LEFT SEMI / LEFT ANTI joins —
  no row multiplication, key-partitioned, skew-safe under AQE.
- Q18's IN (GROUP BY ... HAVING) is a semi join against a pre-
  aggregated key set: the aggregation is map-side combinable and the
  probe never widens.
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


Q3_ORACLE = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("q_tpch_q3_shipping", Q3_ORACLE,
          "TPC-H Q3: top-10 unshipped-order revenue for one market segment")
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .groupBy("l_orderkey", "o_orderdate")
              .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
              .select("l_orderkey", "revenue", "o_orderdate")
              .orderBy(F.col("revenue").desc(), "l_orderkey")
              .limit(10))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("q_tpch_q4_priority", Q4_ORACLE,
          "TPC-H Q4 shape: order counts by priority where EXISTS a "
          "line shipped 60+ days after order (correlated semi join)")
def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (o.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
                   & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
                   "left_semi"))
    return (late.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("order_count")))


Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@register("q_tpch_q5_local_volume", Q5_ORACLE,
          "TPC-H Q5: revenue per nation where customer and supplier "
          "share the nation, one region, two order years")
def q_tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(s, (li.l_suppkey == s.s_suppkey)
                    & (s.s_nationkey == c.c_nationkey))
              .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .groupBy("n_name")
              .agg(F.sum(_disc_price()).cast("double").alias("revenue")))


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
"""


@register("q_tpch_q6_forecast", Q6_ORACLE,
          "TPC-H Q6: forecast-revenue filter-aggregate (pure pushdown scan)")
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice", 12, 2) * F.col("l_discount").cast("decimal(8,2)")
    return (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                      & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
                      & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.06)
                      & (F.col("l_quantity") < 24))
              .agg(F.sum(rev).cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_items")))


Q18_ORACLE = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@register("q_tpch_q18_large_volume", Q18_ORACLE,
          "TPC-H Q18: large-volume orders via IN (GROUP BY ... HAVING) "
          "semi join (quantities are integral doubles — exact sums)")
def q_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
             .filter(F.col("q") > 150).select("l_orderkey"))
    return (o.join(big.withColumnRenamed("l_orderkey", "bk"),
                   F.col("o_orderkey") == F.col("bk"), "left_semi")
              .join(c, F.col("o_custkey") == F.col("c_custkey"))
              .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
              .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
              .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
              .limit(20))


Q22_ORACLE = """
SELECT n.n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                            / COUNT(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n.n_name
"""


@register("q_tpch_q22_idle_balance", Q22_ORACLE,
          "TPC-H Q22 shape: above-average-balance customers gone idle "
          "(scalar subquery + NOT EXISTS anti join), totals per nation")
def q_tpch_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    # scalar threshold: exact decimal sum -> double / count, the same
    # arithmetic order as the oracle's scalar subquery
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
                .agg((F.sum(dec("c_acctbal", 12, 2)).cast("double")
                      / F.count(F.lit(1))).alias("threshold")))
    recent = o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")).select("o_custkey")
    return (c.join(F.broadcast(avg_bal))
              .filter(F.col("c_acctbal") > F.col("threshold"))
              .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
              .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
              .groupBy("n_name")
              .agg(F.count(F.lit(1)).alias("numcust"),
                   F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal")))
