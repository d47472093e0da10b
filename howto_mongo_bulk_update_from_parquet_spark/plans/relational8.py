"""Eighth battery: GROUPING() metadata, window value functions
(first/last/nth), and deterministic stratified sampling.
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


# GROUPING() disambiguates "NULL because rolled up" from "NULL in the
# data" — the only reliable way to consume ROLLUP output downstream.
GROUPING_ID_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS rf,
       COALESCE(l_linestatus, '<all>') AS ls,
       GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("q_grouping_id", GROUPING_ID_ORACLE,
          "GROUPING() metadata over ROLLUP: tell rolled-up NULLs from "
          "data NULLs")
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg((F.grouping("l_returnflag")
                  + F.lit(2) * F.grouping("l_linestatus")).cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
                    "gid", "n"))


WINDOW_VALUE_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
       CAST(last_value(o_totalprice) OVER w AS DOUBLE) AS last_price,
       CAST(nth_value(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("q_window_value_funcs", WINDOW_VALUE_ORACLE,
          "first/last/nth value over a full-partition frame (the "
          "default current-row frame would silently truncate last_value)")
def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"))


# Stratified sampling a training corpus: exactly `n` docs per language,
# chosen by ordering on an id-hash — deterministic across runs, engines
# and partitionings (rand()-based sampling is none of those).
STRATIFIED_ORACLE = """
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 50
"""


@register("q_stratified_sample", STRATIFIED_ORACLE,
          "deterministic stratified sample: 50 docs per language by "
          "id-hash order (reproducible, unlike rand())")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning by the 3-value lang key sorts ~n/3 rows per
    reducer (allowlisted in the tiny-key window sweep): with k=50 per
    stratum the window form is the clearest oracle-exact statement.
    At scale, per-stratum top-k wants the per-partition-heap shape
    (q_weighted_sample) or a rank-bracket refinement."""
    d = _t(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 50).select("lang", "doc_id"))

@register("q_stratified_sample_scalable", STRATIFIED_ORACLE,
          "the window-FREE twin of q_stratified_sample: identical "
          "deterministic 50-per-language sample via the two-stage "
          "grouped_topk prune — no per-stratum reducer sort, bounded "
          "task state at any corpus size")
def q_stratified_sample_scalable(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Same oracle as q_stratified_sample — the point: with a
    3-value stratum key over a 100 TB corpus, the row_number window
    concentrates ~n/3 rows on one reducer, while grouped_topk keeps
    only 50 rows per stratum per Arrow batch (stage 1, zero
    exchange) and re-ranks <= partitions x 50 rows per stratum
    (stage 2). The md5-of-id order makes the sample deterministic
    across runs, engines, and partitionings."""
    from ..operators.topk import grouped_topk
    d = (_t(spark, sf_dir, "documents")
         .select("lang", "doc_id",
                 F.md5(F.col("doc_id").cast("string")).alias("h")))
    return (grouped_topk(d, ["lang"], "h", 50, tie_cols=["doc_id"],
                         ascending=True)
            .select("lang", "doc_id"))


# FULL OUTER: both unmatched sides survive with nulls — the merge-
# reconciliation shape (also the internal join of keyed_upsert,
# operators/merge.py; here as a first-class relational query).
FULL_OUTER_ORACLE = """
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_mktsegment,
       o.n_orders
FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 750) c
FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
                 FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
"""


@register("q_join_full_outer", FULL_OUTER_ORACLE,
          "FULL OUTER join: customers without orders AND order-keys "
          "outside the customer slice both survive with nulls")
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (_t(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") <= 750)
         .select("c_custkey", "c_mktsegment"))
    o = (_t(spark, sf_dir, "orders")
         .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders")))
    return (c.join(o, c.c_custkey == o.o_custkey, "full_outer")
            .select(F.coalesce("c_custkey", "o_custkey").alias("custkey"),
                    "c_mktsegment", "n_orders"))
