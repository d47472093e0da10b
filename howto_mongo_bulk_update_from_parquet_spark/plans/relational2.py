"""Second relational battery: as-of join, exact percentiles,
moment-based statistics, pivot/unpivot, SQL-API entry, approximate
aggregates (rows-only — HLL sketches are engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..operators.asof import asof_join
from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- as-of join --------------------------------------------------------

ASOF_ORACLE = """
WITH r AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS last_order_price
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       r.o_orderkey AS last_order_key, r.last_order_price
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


@register("q_asof_join", ASOF_ORACLE,
          "as-of join (union+window construction): latest order at-or-before "
          "each event; oracle is DuckDB's native ASOF JOIN")
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders")
    # dedup right side to one row per (key, ts) so the as-of winner is
    # well-defined in both engines
    from pyspark.sql.window import Window
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    r = (o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
          .select("o_custkey", "o_orderdate",
                  F.col("o_orderkey").alias("last_order_key"),
                  F.col("o_totalprice").cast("double").alias("last_order_price")))
    return asof_join(e, r, left_key="user_id", right_key="o_custkey",
                     left_ts="ts", right_ts="o_orderdate",
                     payload=["last_order_key", "last_order_price"])


# --- exact percentiles -------------------------------------------------

PCT_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS q75,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_percentiles", PCT_ORACLE,
          "exact linear-interpolated percentiles per group")
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_quantity, 0.25)").alias("q25"),
                 F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
                 F.expr("percentile(l_quantity, 0.75)").alias("q75"),
                 F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price")))


# --- moment statistics from exact sums ---------------------------------
# var/stddev/corr computed from decimal-exact moments so both engines
# evaluate the same closed form on identical doubles (built-in stddev
# uses engine-specific streaming accumulation).

STATS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq2,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp2,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       sq / n AS mean_qty,
       ROUND((sq2 - sq * sq / n) / (n - 1), 6) AS var_qty,
       ROUND(SQRT((sq2 - sq * sq / n) / (n - 1)), 6) AS stddev_qty,
       ROUND((sqp - sq * sp / n)
         / SQRT((sq2 - sq * sq / n) * (sp2 - sp * sp / n)), 10) AS corr_qty_price
FROM m
"""


@register("q_stats_moments", STATS_ORACLE,
          "variance/stddev/correlation from exact decimal moments")
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity", 18, 6), dec("l_extendedprice", 12, 2)
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(q).cast("double").alias("sq"),
              F.sum(q * q).cast("double").alias("sq2"),
              F.sum(p).cast("double").alias("sp"),
              F.sum(p * p).cast("double").alias("sp2"),
              F.sum(q * p).cast("double").alias("sqp")))
    n, sq, sq2 = F.col("n"), F.col("sq"), F.col("sq2")
    sp, sp2, sqp = F.col("sp"), F.col("sp2"), F.col("sqp")
    return m.select(
        "l_returnflag", "n",
        (sq / n).alias("mean_qty"),
        # rounded: C++ FMA contraction shifts the last ulp vs the JVM
        F.round((sq2 - sq * sq / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sq2 - sq * sq / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((sqp - sq * sp / n)
                / F.sqrt((sq2 - sq * sq / n) * (sp2 - sp * sp / n)), 10).alias("corr_qty_price"))


# --- pivot / unpivot ---------------------------------------------------

PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_pivot", PIVOT_ORACLE, "pivot linestatus into columns")
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"])
           .agg(F.count(F.lit(1))))
    return p.select("l_returnflag",
                    F.coalesce(F.col("O"), F.lit(0)).alias("n_O"),
                    F.coalesce(F.col("F"), F.lit(0)).alias("n_F"))


UNPIVOT_ORACLE = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
"""


@register("q_unpivot", UNPIVOT_ORACLE, "unpivot (stack) wide columns to long")
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (metric, value)")


# --- SQL API (TPC-H Q3 shape) ------------------------------------------

Q3_SQL_SPARK = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("q_sql_api", Q3_SQL_SPARK,
          "SQL-API entry point (TPC-H Q3 shape) — same text runs on both engines")
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(Q3_SQL_SPARK)


# --- approximate aggregates (no oracle: sketches are engine-specific) ---


@register("q_approx_stats", None,
          "approx_count_distinct + approx percentile (HLL/KLL sketches; "
          "rows-only check by design)")
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                 F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
                 F.count(F.lit(1)).alias("n")))
