"""Data-quality battery: column profiling and referential-integrity
checks — the validation pass a pipeline runs before trusting a drop of
new data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

PROFILE_ORACLE = """
SELECT 'l_orderkey' AS col,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT(l_orderkey) AS n_nulls,
       COUNT(DISTINCT l_orderkey) AS n_distinct,
       CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
       COUNT(DISTINCT l_returnflag),
       MIN(l_returnflag), MAX(l_returnflag)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
       COUNT(DISTINCT l_shipdate),
       CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
FROM lineitem
"""


@register("q_profile_columns", PROFILE_ORACLE,
          "column profiling: rows/nulls/distinct/min/max per column in "
          "ONE scan (all profiles are aggregates of the same pass)")
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str, fmt=None):
        to_s = fmt or (lambda c: c.cast("string"))
        return F.struct(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            to_s(F.min(col)).alias("min_val"),
            to_s(F.max(col)).alias("max_val"))

    ts_fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    one = li.agg(profile("l_orderkey").alias("p1"),
                 profile("l_returnflag").alias("p2"),
                 profile("l_shipdate", ts_fmt).alias("p3"))
    return (one.select(F.explode(F.array("p1", "p2", "p3")).alias("p"))
            .select("p.*"))


FK_ORACLE = """
SELECT 'lineitem->orders' AS fk,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders->customer',
       COUNT(*),
       COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
"""


@register("q_fk_orphans", FK_ORACLE,
          "referential-integrity check: orphan counts across two FK "
          "edges (broadcast the parent key sets)")
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    a = (li.join(F.broadcast(o.select("o_orderkey")),
                 li.l_orderkey == F.col("o_orderkey"), "left")
         .agg(F.lit("lineitem->orders").alias("fk"),
              F.count(F.lit(1)).alias("n_rows"),
              F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_orphans")))
    b = (o.select("o_custkey").join(F.broadcast(c),
                                    F.col("o_custkey") == F.col("c_custkey"),
                                    "left")
         .agg(F.lit("orders->customer").alias("fk"),
              F.count(F.lit(1)).alias("n_rows"),
              F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_orphans")))
    return a.unionByName(b)
