"""Third relational battery: array higher-order functions, map
functions, GROUPING SETS, correlated/scalar subqueries, date
arithmetic, and distinct-on semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- array higher-order functions over embeddings ----------------------

ARRAY_HOF_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)), 5) AS sq_norm,
       len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
       ROUND(list_max(embedding::DOUBLE[]), 6) AS max_val,
       ROUND(list_min(embedding::DOUBLE[]), 6) AS min_val,
       ROUND(list_sum(list_slice(embedding::DOUBLE[], 1, 8)), 6) AS head_sum
FROM embeddings
WHERE vec_id < 300
"""


@register("q_array_hof", ARRAY_HOF_ORACLE,
          "array higher-order functions: transform/filter/aggregate/slice")
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    ev = F.transform("embedding", lambda x: x.cast("double"))
    agg_sum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(agg_sum(F.transform(ev, lambda x: x * x)), 5).alias("sq_norm"),
        F.size(F.filter(ev, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(F.array_max(ev), 6).alias("max_val"),
        F.round(F.array_min(ev), 6).alias("min_val"),
        F.round(agg_sum(F.slice(ev, 1, 8)), 6).alias("head_sum"))


# --- map functions ------------------------------------------------------

MAP_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN k_val >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
  FROM events
)
GROUP BY event_type
"""


@register("q_map_funcs", MAP_ORACLE,
          "map construction + element access (props JSON → map<string,long>)")
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # parse JSON into a real MapType column, then access through map ops
    m = F.from_json("props", "map<string,bigint>")
    return (e.select("event_type", F.element_at(m, "k").alias("k_val"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(F.col("k_val") >= 50, 1).otherwise(0)).alias("n_high")))


# --- GROUPING SETS ------------------------------------------------------

GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("q_grouping_sets", GSETS_ORACLE,
          "explicit GROUPING SETS (neither rollup nor cube)")
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return o.sparkSession.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# --- correlated + scalar subqueries -------------------------------------

SUBQ_ORACLE = """
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'F')
"""


@register("q_subqueries", SUBQ_ORACLE,
          "correlated scalar subquery + EXISTS (decorrelated by Catalyst)")
def q_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c.createOrReplaceTempView("customer")
    o.createOrReplaceTempView("orders")
    return c.sparkSession.sql(SUBQ_ORACLE)


# --- date arithmetic -----------------------------------------------------

DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
       datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_ref,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS order_week,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(last_day(o_orderdate::DATE) AS TIMESTAMP) AS month_end
FROM orders
WHERE o_orderkey < 500
"""


@register("q_date_arith", DATE_ARITH_ORACLE,
          "date arithmetic: interval add, datediff, week trunc, last_day")
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), "o_orderdate")
         .cast("long").alias("days_to_ref"),
        F.date_trunc("week", "o_orderdate").alias("order_week"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"))


# --- distinct-on (arg-max rows) ------------------------------------------

DISTINCT_ON_ORACLE = """
SELECT c_nationkey, c_custkey AS top_custkey, CAST(c_acctbal AS DOUBLE) AS top_bal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


@register("q_distinct_on", DISTINCT_ON_ORACLE,
          "arg-max row per group (DISTINCT ON semantics)")
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
             .select("c_nationkey", F.col("c_custkey").alias("top_custkey"),
                     F.col("c_acctbal").cast("double").alias("top_bal")))
