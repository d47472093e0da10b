"""Spark 4 SQL-surface capabilities the DataFrame API can't express:
recursive CTEs (WITH RECURSIVE, new in Spark 4) and SQL-body scalar
functions (CREATE FUNCTION ... RETURN expr). Both run the ENGINE side
through spark.sql over registered temp views — the rest of the
catalog already covers the declarative surface; these two are the
SQL-only entry points a reference user migrating dashboards would
hit first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from ..sources.parquet import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# Recursive CTE: generate a gap-free calendar spine and left-join the
# event stream onto it — the canonical "report every day, including
# the silent ones" fill pattern. The recursion is driver-bounded (30
# iterations over a 1-row frontier); the join against events is an
# ordinary equi-join on the truncated day. Spark 4 executes WITH
# RECURSIVE with a UnionLoop; recursion depth = days, not data size,
# so the shape is scale-independent.
# ---------------------------------------------------------------------------

CALENDAR_ORACLE = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
  WHERE d < DATE '2024-01-30'
)
SELECT d,
       CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))), 0)
            AS DOUBLE) AS sum_value
FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = days.d
GROUP BY d
"""

CALENDAR_SPARK_SQL = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '2024-01-01' AS d
  UNION ALL
  SELECT date_add(d, 1) FROM days WHERE d < DATE '2024-01-30'
)
SELECT d,
       COUNT(e.event_id) AS n_events,
       CAST(COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))),
                     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM days LEFT JOIN __sql_surface_events e ON CAST(e.ts AS DATE) = days.d
GROUP BY d
"""


@register("q_recursive_calendar", CALENDAR_ORACLE,
          "recursive CTE calendar spine (WITH RECURSIVE, Spark 4) "
          "left-joined onto events: gap-free daily counts/sums, "
          "silent days included as zeros")
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("__sql_surface_events")
    return spark.sql(CALENDAR_SPARK_SQL)


# ---------------------------------------------------------------------------
# SQL-body scalar function: CREATE TEMPORARY FUNCTION ... RETURN expr
# (Spark 4). The function body is pure relational expression — it
# inlines into the plan at analysis time, so it whole-stage-codegens
# exactly like the written-out expression (NOT a UDF boundary). The
# oracle states the same logic inline; parity proves the inlining is
# semantics-preserving.
# ---------------------------------------------------------------------------

SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax), 9) AS DECIMAL(24,9)))
                  AS DOUBLE), 2) AS charged,
       CAST(COUNT(CASE WHEN l_discount >= 0.05 THEN 1 END) AS BIGINT)
         AS n_deep_discount
FROM lineitem GROUP BY l_returnflag
"""


@register("q_sql_scalar_function", SQL_UDF_ORACLE,
          "CREATE TEMPORARY FUNCTION with a SQL expression body "
          "(Spark 4): inlines into codegen — not a UDF boundary; "
          "oracle states the expression inline")
def q_sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__sql_surface_lineitem")
    # the true product has ≤6 decimal digits (2+2+2), so rounding the
    # double at 9 decimals can never sit on a tie — the cross-engine
    # HALF_UP/HALF_EVEN divergence that rounding at 4 hits is
    # structurally impossible (the repo's transcendental discipline)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION charged_amount(
            price DOUBLE, discount DOUBLE, tax DOUBLE)
        RETURNS DECIMAL(24,9)
        RETURN CAST(ROUND(price * (1 - discount) * (1 + tax), 9)
                    AS DECIMAL(24,9))
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION is_deep_discount(d DOUBLE)
        RETURNS BOOLEAN RETURN d >= 0.05
    """)
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               ROUND(CAST(SUM(charged_amount(l_extendedprice,
                                             l_discount, l_tax))
                          AS DOUBLE), 2) AS charged,
               COUNT(CASE WHEN is_deep_discount(l_discount) THEN 1 END)
                 AS n_deep_discount
        FROM __sql_surface_lineitem GROUP BY l_returnflag
    """)
