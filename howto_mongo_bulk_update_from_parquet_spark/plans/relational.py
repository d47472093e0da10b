"""Relational operator battery (SURVEY §2.2): scans, projections,
filters, joins (inner/left/semi/anti/broadcast/range), aggregations
(multi-agg, distinct, rollup, cube), windows (top-k, running, lag),
sort/limit, set ops, scalar functions (string/date/math/JSON/case).

Every query is DataFrame-API on the Spark side and carries a DuckDB
oracle. Aggregates of doubles go through the decimal-exact helpers in
functions/numeric.py so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import davg, dec, dsum
from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q1: pricing summary (flagship; TPC-H Q1 shape) -------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE,
          "TPC-H Q1 pricing summary: scan→filter→groupBy→8 aggregates")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1) + F.col("l_tax")).cast("decimal(8,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(dsum("l_quantity").alias("sum_qty"),
               dsum("l_extendedprice").alias("sum_base_price"),
               F.sum(disc_price).cast("double").alias("sum_disc_price"),
               F.sum(charge).cast("double").alias("sum_charge"),
               davg("l_quantity").alias("avg_qty"),
               davg("l_extendedprice").alias("avg_price"),
               davg("l_discount").alias("avg_disc"),
               F.count(F.lit(1)).alias("count_order"))
    )


# --- filter + projection pushdown (TPC-H Q6 shape) --------------------

Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q_filter_project", Q6_ORACLE,
          "predicate+projection pushdown: revenue from discounted lineitems")
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
                  & F.col("l_discount").between(0.05, 0.07)
                  & (F.col("l_quantity") < 24))
          .agg((F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 8, 2)))
               .cast("double").alias("revenue"),
               F.count(F.lit(1)).alias("n_rows"))
    )


# --- multi-way join with broadcast dims (TPC-H Q5 shape) --------------

Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_regionkey <= 1
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q_join_multiway", Q5_ORACLE,
          "5-way star join, small dims broadcast, local-supplier predicate")
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_regionkey") <= 1)
    # Only fixed-cardinality dims (nation ≤ 25, region ≤ 5 rows) get a
    # hard broadcast hint. customer/supplier scale with SF, so their
    # join strategy is left to AQE: broadcast while they fit, shuffle
    # join past the threshold — a hard hint would OOM at 100×.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, (li.l_suppkey == s.s_suppkey)
                & (s.s_nationkey == c.c_nationkey))
          .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    return (joined.groupBy("n_name")
            .agg(F.sum(revenue).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lineitems")))


# --- outer / semi / anti joins ----------------------------------------

LEFT_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


@register("q_join_left", LEFT_ORACLE,
          "left outer join + per-customer aggregate (nulls for order-less customers)")
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .groupBy("c_custkey", "c_mktsegment")
             .agg(F.count("o_orderkey").alias("n_orders"),
                  F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("total_spent")))


SEMI_ANTI_ORACLE = """
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN has_order THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
       CAST(SUM(CASE WHEN has_order THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
FROM (
  SELECT c.c_mktsegment,
         EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
  FROM customer c
)
GROUP BY c_mktsegment
"""


@register("q_join_semi_anti", SEMI_ANTI_ORACLE,
          "left-semi + left-anti joins: customers with/without orders per segment")
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_with_orders")))
    anti = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_without_orders")))
    return (semi.join(anti, "c_mktsegment", "full_outer")
                .select("c_mktsegment",
                        F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
                        F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders")))


RANGE_ORACLE = """
SELECT p.p_brand,
       COUNT(*) AS n_close_qty,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
           AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
GROUP BY p.p_brand
"""


@register("q_join_range", RANGE_ORACLE,
          "equi + non-equi (range) join predicate: quantity within ±5 of part size")
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = ((li.l_partkey == p.p_partkey)
            & (li.l_quantity >= p.p_size - 5)
            & (li.l_quantity <= p.p_size + 5))
    # The equi half (l_partkey = p_partkey) keys the join; the range
    # predicate rides along as a join filter, so this never degrades to
    # a cartesian. part scales with SF → no hard broadcast hint (AQE
    # broadcasts while it fits).
    return (li.join(p, cond)
              .groupBy("p_brand")
              .agg(F.count(F.lit(1)).alias("n_close_qty"),
                   dsum("l_quantity").alias("sum_qty")))


# --- aggregation variants ---------------------------------------------

DISTINCT_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
FROM customer
GROUP BY c_mktsegment
"""


@register("q_agg_distinct", DISTINCT_ORACLE,
          "count-distinct + min/max/sum multi-aggregate per segment")
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  F.countDistinct("c_nationkey").alias("n_nations"),
                  F.sum(dec("c_acctbal", 18, 2)).cast("double").alias("sum_bal"),
                  F.min("c_acctbal").cast("double").alias("min_bal"),
                  F.max("c_acctbal").cast("double").alias("max_bal")))


ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("q_rollup", ROLLUP_ORACLE,
          "ROLLUP hierarchy totals with GROUPING() disambiguation")
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
             .agg(F.grouping("o_orderstatus").cast("long").alias("g_status"),
                  F.grouping("o_orderpriority").cast("long").alias("g_prio"),
                  F.count(F.lit(1)).alias("n_orders"),
                  F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("sum_price"))
             .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio",
                     "n_orders", "sum_price"))


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf, CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q_cube", CUBE_ORACLE, "CUBE over two dimensions")
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
              .agg(F.grouping("l_returnflag").cast("long").alias("g_rf"),
                   F.grouping("l_linestatus").cast("long").alias("g_ls"),
                   F.count(F.lit(1)).alias("n_rows"))
              .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n_rows"))


# --- window functions --------------------------------------------------

TOPK_ORACLE = """
SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("q_window_topk", TOPK_ORACLE,
          "top-3 orders per priority via row_number window")
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-filter windows push the row_number through a per-group
    sort: with the 5-value o_orderpriority key that is ~n/5 rows per
    reducer (allowlisted in the tiny-key window sweep as the
    canonical window-top-k demo). The scale-safe top-k-per-tiny-group
    shape is q_weighted_sample's TakeOrderedAndProject form."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w).cast("long"))
             .filter(F.col("rn") <= 3)
             .select("o_orderpriority", "o_orderkey",
                     F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn"))


RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@register("q_window_running", RUNNING_ORACLE,
          "running per-customer spend (cumulative window frame)")
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(dec("o_totalprice", 18, 2))
         .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         .cast("double").alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"))


LAG_ORACLE = """
SELECT user_id, event_id, value,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


@register("q_window_lag", LAG_ORACLE, "lag/lead navigation over event streams")
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"))


# --- sort / limit -------------------------------------------------------

TOP10_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("q_orderby_limit", TOP10_ORACLE,
          "global top-10 by price (deterministic tie-break)")
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
             .limit(10)
             .select("o_orderkey", "o_custkey",
                     F.col("o_totalprice").cast("double").alias("o_totalprice")))


# --- set operations ------------------------------------------------------

SETOPS_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register("q_setops", SETOPS_ORACLE,
          "INTERSECT / EXCEPT set semantics on customer keys")
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.intersect(op).exceptAll(p.distinct())


UNION_ORACLE = """
SELECT key_type, COUNT(*) AS n
FROM (
  SELECT 'cust' AS key_type, c_custkey AS k FROM customer WHERE c_acctbal > 0
  UNION ALL
  SELECT 'supp' AS key_type, s_suppkey AS k FROM supplier
)
GROUP BY key_type
"""


@register("q_union", UNION_ORACLE, "UNION ALL of heterogeneous sources")
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    u = (c.filter(F.col("c_acctbal") > 0)
          .select(F.lit("cust").alias("key_type"), F.col("c_custkey").alias("k"))
          .unionByName(
              s.select(F.lit("supp").alias("key_type"), F.col("s_suppkey").alias("k"))))
    return u.groupBy("key_type").agg(F.count(F.lit(1)).alias("n"))


# --- scalar functions ----------------------------------------------------

STRING_ORACLE = """
SELECT p_partkey,
       LOWER(p_name) AS lower_name,
       LENGTH(p_name) AS name_len,
       SUBSTR(p_name, 1, 5) AS name_head,
       CONCAT(p_brand, '#', p_type) AS brand_type,
       REPLACE(p_type, ' ', '_') AS type_snake,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
FROM part
WHERE p_partkey < 100
"""


@register("q_string_funcs", STRING_ORACLE,
          "string scalar functions: lower/length/substr/concat/replace/regexp")
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"))


DATE_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(quarter FROM o_orderdate) AS order_quarter,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3
"""


@register("q_date_funcs", DATE_ORACLE,
          "date_trunc / extract-based calendar aggregation")
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (o.select(F.date_trunc("month", "o_orderdate").alias("order_month"),
                     F.year("o_orderdate").cast("long").alias("order_year"),
                     F.quarter("o_orderdate").cast("long").alias("order_quarter"))
             .groupBy("order_month", "order_year", "order_quarter")
             .agg(F.count(F.lit(1)).alias("n_orders")))


MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       SQRT(l_quantity) AS qty_sqrt,
       ABS(l_discount - l_tax) AS disc_tax_gap,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       CAST(l_orderkey % 13 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_orderkey < 300
"""


@register("q_math_funcs", MATH_ORACLE,
          "math scalars: sqrt/abs/floor/ceil/modulo (IEEE-exact set)")
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        (F.col("l_orderkey") % 13).cast("long").alias("key_mod"))


CASE_ORACLE = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(SUM(CASE WHEN o_totalprice < 200000 AND o_totalprice >= 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
       CAST(SUM(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM orders
GROUP BY o_orderstatus
"""


@register("q_case_agg", CASE_ORACLE,
          "conditional (CASE WHEN) pivot-style aggregation")
def q_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return (o.groupBy("o_orderstatus")
             .agg(F.sum(F.when(price >= 200000, 1).otherwise(0)).alias("n_big"),
                  F.sum(F.when((price < 200000) & (price >= 50000), 1).otherwise(0)).alias("n_mid"),
                  F.sum(F.when(price < 50000, 1).otherwise(0)).alias("n_small")))


JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
FROM events
GROUP BY event_type
"""


@register("q_json_funcs", JSON_ORACLE,
          "JSON extraction from the events.props payload column")
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # parse once per row (get_json_object would re-parse per reference)
    k = F.element_at(F.from_json("props", "map<string,bigint>"), "k")
    return (e.select("event_type", k.alias("k"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("k").alias("sum_k"),
                  F.countDistinct("k").alias("n_distinct_k")))


# ---------------------------------------------------------------------------
# VARIANT (Spark 4's open semi-structured type): parse the events
# `props` JSON once into a binary variant and shred typed fields out
# of it — the modern replacement for per-access get_json_object
# string re-parsing (the variant parses once, field access is a
# byte-offset read; at 100 TB that's the difference between one parse
# per row and one per extraction).
# ---------------------------------------------------------------------------

VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type
"""


@register("q_variant_shred", VARIANT_ORACLE,
          "VARIANT semi-structured type: parse_json once, typed "
          "variant_get field shredding, integer-exact aggregates")
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


@register("q_grouped_topk", TOPK_ORACLE,
          "top-3 orders per priority via the scale-safe two-stage "
          "prune (operators/topk.py): per-batch local top-k with zero "
          "exchange, bounded per-group re-rank — no window, no "
          "per-group full sort; same oracle as q_window_topk")
def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-free twin q_window_topk's docstring points to: the
    identical result through mapInPandas batch pruning + a bounded
    applyInPandas re-rank, so the 5-value priority key never
    concentrates a ~n/5-row sort on one reducer."""
    from ..operators.topk import grouped_topk
    o = (_t(spark, sf_dir, "orders")
         .select("o_orderpriority", "o_orderkey",
                 F.col("o_totalprice").cast("double").alias("o_totalprice")))
    return grouped_topk(o, ["o_orderpriority"], "o_totalprice", 3,
                        tie_cols=["o_orderkey"])
