"""TPC-H battery IV: the seven query SHAPES batteries I-III could not
take as-written because the fixture has no partsupp table and no
commitdate/receiptdate/shipmode columns (see relational10.py's
docstring). Each is the canonical TPC-H plan shape ADAPTED onto the
columns that exist, so the engine demonstrably covers all 22 shapes:

  Q2  min-cost supplier per part   correlated-min + equality join back
  Q9  profit by nation and year    multi-join + exact decimal net
  Q11 value concentration          HAVING vs scalar-subquery threshold
  Q12 lateness x priority          CASE-bucketed two-way counts
  Q16 supplier-part counts         NOT IN exclusion + COUNT(DISTINCT)
  Q20 excess shipments             nested aggregate + semi join
  Q21 sole-late supplier           exists/not-exists on one fact scan

Adaptation dictionary (applied consistently):
  ps_supplycost       -> MIN(l_extendedprice / l_quantity) per
                         (part, supplier) observed in lineitem
  ps_availqty/value   -> shipped quantity / extended price from lineitem
  l_receiptdate late  -> l_shipdate > o_orderdate + 60 days
  supplier complaints -> s_acctbal < 0

Exactness: money stays in exact decimals until one final CAST AS
DOUBLE on both engines; unit-cost division is a single double op with
identical operands; day arithmetic on DATE-cast timestamps; every
count/sum of ints CAST to BIGINT in the oracle (DuckDB HUGEINT ->
float64 dtype hazard).

Scale notes: part/supplier/nation broadcast everywhere (dims);
lineitem is scanned once per query and aggregated map-side before any
join on derived aggregates; the Q21 exists/not-exists pair collapses
into ONE per-(order, supplier) aggregation + one per-order
aggregation instead of three correlated fact scans.
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
    return (dec("l_extendedprice", 12, 2)
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))


# ---------------------------------------------------------------------------
# Q2: for every LARGE part of size >= 40, which supplier offers the
# lowest observed unit cost, and what does that supplier look like?
# The TPC-H shape is the correlated MIN subquery (ps_supplycost =
# (SELECT MIN ...)); here the per-(part, supplier) offer table is
# derived from lineitem first, then the per-part minimum joins back
# on VALUE EQUALITY — both engines compute the same double division
# on the same operands, so the equality is exact.
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, MIN(unit_cost) AS best_cost
  FROM offers GROUP BY l_partkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       o.unit_cost
FROM part p
JOIN best b ON b.l_partkey = p.p_partkey
JOIN offers o ON o.l_partkey = p.p_partkey AND o.unit_cost = b.best_cost
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'LARGE' AND p.p_size >= 40
"""


@register("q_tpch_q2_min_cost_supplier", Q2_ORACLE,
          "TPC-H Q2 shape: minimum-cost supplier per part via a "
          "derived offer table, per-part correlated MIN, and an "
          "exact value-equality join back (ties keep all suppliers)")
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_type") == "LARGE") & (F.col("p_size") >= 40)))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    # Per-part aggregates are independent across parts, so the part
    # filter commutes with the offer aggregation: semi-join the fact
    # to the ~|filtered parts| broadcast BEFORE grouping, and the
    # aggregation touches only qualifying parts (the oracle's
    # unfiltered CTE + later join is the same result, more work).
    keep = li.join(F.broadcast(p.select("p_partkey")),
                   li.l_partkey == F.col("p_partkey"), "left_semi")
    offers = (keep.groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_cost")))
    best = (offers.groupBy("l_partkey")
            .agg(F.min("unit_cost").alias("best_cost"))
            .withColumnRenamed("l_partkey", "b_partkey"))
    return (offers
            .join(best, (offers.l_partkey == F.col("b_partkey"))
                  & (offers.unit_cost == F.col("best_cost")))
            .join(F.broadcast(p), offers.l_partkey == p.p_partkey)
            .join(F.broadcast(s), offers.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_name", "unit_cost"))


# ---------------------------------------------------------------------------
# Q9: profit by supplier nation and order year over 'bolt' parts.
# profit = discounted revenue - retail cost of the shipped quantity
# (the fixture's stand-in for ps_supplycost * l_quantity). Every term
# stays in exact decimal until the final CAST AS DOUBLE.
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l.l_discount AS DECIMAL(8,2))
                - CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(l.l_quantity AS DECIMAL(12,2)))
            AS DOUBLE) AS sum_profit,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
"""


@register("q_tpch_q9_profit", Q9_ORACLE,
          "TPC-H Q9 shape: profit by supplier nation and order year "
          "(4-way fact-dim join, exact decimal revenue minus cost, "
          "part-name LIKE filter pushed to the broadcast dim)")
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%bolt%")))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (_disc_price()
              - dec("p_retailprice", 12, 2)
              * F.col("l_quantity").cast("decimal(12,2)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("long").alias("o_year"),
                    amount.alias("amount"))
            .groupBy("nation", "o_year")
            .agg(F.sum("amount").cast("double").alias("sum_profit"),
                 F.count(F.lit(1)).alias("n_rows")))


# ---------------------------------------------------------------------------
# Q11: which parts concentrate the inventory value of a nation bloc?
# value(part) = exact decimal sum of extended price shipped by
# suppliers in nations 0-4; keep parts whose value exceeds a fixed
# fraction of the bloc total — the scalar-subquery HAVING shape. The
# bloc total is a 1-row broadcast, not a second fact scan per group.
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH bloc AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey BETWEEN 0 AND 4
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM bloc
WHERE CAST(value_dec AS DOUBLE)
      > 0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM bloc)
"""


@register("q_tpch_q11_value_concentration", Q11_ORACLE,
          "TPC-H Q11 shape: per-part value among a nation bloc's "
          "suppliers, HAVING a scalar-subquery fraction-of-total "
          "threshold (one aggregation reused for rows and total)")
def q_tpch_q11_value_concentration(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = (_t(spark, sf_dir, "supplier")
         .filter(F.col("s_nationkey").between(0, 4)))
    bloc = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("l_partkey")
            .agg(F.sum(dec("l_extendedprice", 12, 2)).alias("value_dec"))
            # one aggregation feeds both the rows and the total —
            # cut lineage so the fact scan runs once, not twice
            .localCheckpoint(eager=False))
    total = bloc.agg(F.sum("value_dec").cast("double").alias("total"))
    return (bloc.crossJoin(F.broadcast(total))
            .filter(F.col("value_dec").cast("double")
                    > F.lit(0.001) * F.col("total"))
            .select("l_partkey",
                    F.col("value_dec").cast("double").alias("part_value")))


# ---------------------------------------------------------------------------
# Q12: does slow shipping hit high-priority orders? Lineitems bucket
# by ship delay (days from order date, DATE arithmetic in both
# engines); per bucket count high- vs low-priority order lines — the
# CASE-sum two-way count shape.
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT CASE WHEN d < 0 THEN 'early' WHEN d <= 30 THEN 'ontime'
            WHEN d <= 90 THEN 'late' ELSE 'very_late' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
GROUP BY 1
"""


@register("q_tpch_q12_latency_priority", Q12_ORACLE,
          "TPC-H Q12 shape: ship-delay buckets x order priority "
          "(CASE-bucketed two-way counts over one fact-orders join)")
def q_tpch_q12_latency_priority(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    d = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (F.when(d < 0, "early").when(d <= 30, "ontime")
              .when(d <= 90, "late").otherwise("very_late"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select(bucket.alias("ship_bucket"), high.alias("high"))
            .groupBy("ship_bucket")
            .agg(F.sum(F.when(F.col("high"), 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(F.col("high"), 0).otherwise(1))
                 .alias("low_line_count")))


# ---------------------------------------------------------------------------
# Q16: how many suppliers can deliver each (brand, type, size) combo,
# excluding a denylist (suppliers with negative balance — the
# fixture's stand-in for complaint comments)? The NOT IN + COUNT
# (DISTINCT) shape; the denylist is a broadcast anti join, never a
# per-row subquery.
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q_tpch_q16_supplier_counts", Q16_ORACLE,
          "TPC-H Q16 shape: distinct-supplier counts per part "
          "attribute combo with a NOT IN supplier denylist "
          "(broadcast anti join + COUNT DISTINCT)")
def q_tpch_q16_supplier_counts(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)))
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey,
                    "left_anti")
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


# ---------------------------------------------------------------------------
# Q20: which suppliers shipped an outsized share of a 'small' part's
# volume in 1997? Per (supplier, part): 1997 quantity vs all-time
# quantity, qualifying when the year exceeds half of a non-trivial (>= 60
# units) total; a supplier
# appears once if ANY part qualifies — the nested-aggregate + semi
# join shape (the original's double-nested IN).
# ---------------------------------------------------------------------------

Q20_ORACLE = """
WITH per_pair AS (
  SELECT l.l_suppkey, l.l_partkey,
         SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l.l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l.l_quantity ELSE 0 END) AS qty_1997,
         SUM(l.l_quantity) AS qty_total
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
  GROUP BY l.l_suppkey, l.l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
JOIN per_pair pp ON pp.l_suppkey = s.s_suppkey
WHERE pp.qty_1997 > 0.5 * pp.qty_total AND pp.qty_total >= 60
"""


@register("q_tpch_q20_excess_stock", Q20_ORACLE,
          "TPC-H Q20 shape: suppliers whose 1997 share of a small-"
          "part's shipped quantity exceeds half (nested per-pair "
          "aggregate, threshold filter, semi join to supplier)")
def q_tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("small%")).select("p_partkey"))
    s = _t(spark, sf_dir, "supplier")
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) \
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    per_pair = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
                .groupBy("l_suppkey", "l_partkey")
                .agg(F.sum(F.when(in_1997, F.col("l_quantity"))
                           .otherwise(F.lit(0.0))).alias("qty_1997"),
                     F.sum("l_quantity").alias("qty_total")))
    hot = (per_pair
           .filter((F.col("qty_1997") > F.lit(0.5) * F.col("qty_total"))
                   & (F.col("qty_total") >= 60))
           .select("l_suppkey").distinct())
    return (s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name", "s_acctbal"))


# ---------------------------------------------------------------------------
# Q21: the sole-late-supplier shape. A supplier "kept an order
# waiting" when it was the ONLY late supplier (any line shipped > 60
# days after the order date) on a multi-supplier order. The
# original's EXISTS (another supplier) + NOT EXISTS (another late
# supplier) pair collapses into one per-(order, supplier) aggregate
# and one per-order aggregate: same semantics, one fact scan, no
# correlated re-scans.
# ---------------------------------------------------------------------------

Q21_ORACLE = """
WITH pair AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) > 60
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
  FROM pair GROUP BY l_orderkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pair p
JOIN per_order po ON po.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.is_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
GROUP BY s.s_name
"""


@register("q_tpch_q21_waiting_supplier", Q21_ORACLE,
          "TPC-H Q21 shape: suppliers who were the ONLY late supplier "
          "on finished multi-supplier orders — exists/not-exists "
          "collapsed into per-pair + per-order aggregates over one "
          "fact scan")
def q_tpch_q21_waiting_supplier(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    s = _t(spark, sf_dir, "supplier")
    late = (F.datediff(F.to_date("l_shipdate"),
                       F.to_date("o_orderdate")) > 60)
    pair = (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
            # pair feeds both the per-order rollup and the final join
            .localCheckpoint(eager=False))
    per_order = (pair.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum("is_late").alias("n_late")))
    return (pair.filter(F.col("is_late") == 1)
            .join(per_order.filter((F.col("n_supp") >= 2)
                                   & (F.col("n_late") == 1)),
                  "l_orderkey")
            .join(F.broadcast(s), pair.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))
