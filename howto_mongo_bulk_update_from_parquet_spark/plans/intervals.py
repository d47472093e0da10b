"""Gaps-and-islands interval algebra: merge each customer's
overlapping order-activity windows into maximal islands.

Every warehouse needs this shape (uptime stitching, coverage audits,
contiguous-session construction) and it is the canonical test of
KEY-PARTITIONED window discipline: all windows here are
`partitionBy(custkey)`, so at 100 TB the sort is per-customer within a
hash partition — there is no global ordering anywhere in the plan, and
AQE picks the shuffle width. Contrast with the single-partition global
windows the repo bans (see VERDICT r5 / plans/curation.py history).

Semantics (classic gaps-and-islands, both engines express it
identically): each order opens a 7-day activity interval
[o_orderdate, o_orderdate + 6 days]. Per customer, intervals sorted by
start; an interval starts a NEW island iff its start is strictly after
the running maximum end of all earlier intervals ("earlier" by
(start, end, orderkey) to break ties deterministically). Output is one
row per customer: how many islands, total distinct covered days, and
the widest single island — the numbers a coverage dashboard wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

GAPS_ISLANDS_ORACLE = """
WITH iv AS (
  SELECT o_custkey AS custkey, o_orderkey AS ok,
         CAST(o_orderdate AS DATE) AS s, CAST(o_orderdate AS DATE) + 6 AS e
  FROM orders
),
flagged AS (
  SELECT custkey, s, e, ok,
         CASE WHEN s > MAX(e) OVER (PARTITION BY custkey
                                    ORDER BY s, e, ok
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
grouped AS (
  SELECT custkey, s, e,
         SUM(new_island) OVER (PARTITION BY custkey ORDER BY s, e, ok
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
  FROM flagged
),
islands AS (
  SELECT custkey, island, MIN(s) AS island_start, MAX(e) AS island_end
  FROM grouped GROUP BY custkey, island
)
SELECT custkey,
       COUNT(*) AS n_islands,
       CAST(SUM(date_diff('day', island_start, island_end) + 1)
            AS BIGINT) AS covered_days,
       MAX(date_diff('day', island_start, island_end) + 1) AS widest_days
FROM islands
GROUP BY custkey
"""


@register("q_gaps_islands", GAPS_ISLANDS_ORACLE,
          "gaps-and-islands: merge overlapping 7-day order windows per "
          "customer via running-max-end flag; per-customer island "
          "count, covered days, widest island — all windows "
          "key-partitioned (no global sort)")
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("ok"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), 6).alias("e"))

    # ROWS UNBOUNDED PRECEDING..1 PRECEDING running max of interval end:
    # NULL for the first interval of a customer → new_island = 0 there
    # (matches the oracle: CASE s > NULL is false), and the running SUM
    # starts islands at 0. Window is partitioned by custkey — the sort
    # is per-key inside a hash partition, never global.
    order_cols = [F.col("s"), F.col("e"), F.col("ok")]
    w_prev = (Window.partitionBy("custkey").orderBy(*order_cols)
              .rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(w_prev), F.lit(1)).otherwise(F.lit(0)))

    # Fully deterministic tie-break (s, e, ok) in BOTH engines: with
    # duplicate (s, e) rows the ROWS-frame running sum is order-
    # sensitive, and an engine-dependent tie order would shift which
    # island a duplicate attaches to.
    w_run = (Window.partitionBy("custkey").orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grouped = flagged.withColumn("island", F.sum("new_island").over(w_run))

    islands = (grouped.groupBy("custkey", "island")
               .agg(F.min("s").alias("island_start"),
                    F.max("e").alias("island_end")))
    span = F.datediff("island_end", "island_start") + F.lit(1)
    return (islands.groupBy("custkey")
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum(span).alias("covered_days"),
                 F.max(span).alias("widest_days")))


# ---------------------------------------------------------------------------
# Max concurrency (sweep line), the other half of interval algebra:
# how many of a customer's 7-day order windows are open at once, at
# the worst moment. Each interval contributes (+1 at start, −1 at
# end+1 day); the running sum over the customer's event stream peaks
# at the answer. Ordering (t, delta, ok) is fully deterministic and
# sorts closes (−1) before opens (+1) at the same t, so back-to-back
# intervals don't count as overlapping. Window remains PARTITIONED BY
# custkey — a GLOBAL sweep line would be the banned global-ordered
# window; per-key concurrency needs only the per-key sort.
# ---------------------------------------------------------------------------

MAX_CONCURRENCY_ORACLE = """
WITH ev AS (
  SELECT o_custkey AS custkey, o_orderkey AS ok,
         CAST(o_orderdate AS DATE) AS t, 1 AS delta
  FROM orders
  UNION ALL
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) + 7, -1
  FROM orders
),
run AS (
  SELECT custkey,
         SUM(delta) OVER (PARTITION BY custkey ORDER BY t, delta, ok
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS open_now
  FROM ev
)
SELECT custkey, CAST(MAX(open_now) AS BIGINT) AS max_open
FROM run GROUP BY custkey
"""


@register("q_max_concurrency", MAX_CONCURRENCY_ORACLE,
          "per-customer max overlapping 7-day order windows via a "
          "key-partitioned sweep line (+1/-1 events, running-sum "
          "peak); closes sort before opens at equal time")
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    opens = o.select(F.col("o_custkey").alias("custkey"),
                     F.col("o_orderkey").alias("ok"),
                     F.to_date("o_orderdate").alias("t"),
                     F.lit(1).alias("delta"))
    closes = o.select(F.col("o_custkey").alias("custkey"),
                      F.col("o_orderkey").alias("ok"),
                      F.date_add(F.to_date("o_orderdate"), 7).alias("t"),
                      F.lit(-1).alias("delta"))
    ev = opens.unionAll(closes)
    w = (Window.partitionBy("custkey").orderBy("t", "delta", "ok")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = ev.withColumn("open_now", F.sum("delta").over(w))
    return (run.groupBy("custkey")
            .agg(F.max("open_now").alias("max_open")))


# ---------------------------------------------------------------------------
# Business-day lead time (order → ship): count of non-weekend days
# strictly after the order date up to and including the ship date,
# per order priority — restricted to a 1-in-20 orderkey slice so the
# oracle's day-by-day enumeration stays cheap. The two sides are
# DELIBERATELY different algorithms: Spark computes the CLOSED FORM
# (full-weeks × 5 + an unrolled partial-week tail over the ISO start
# weekday — scan-local arithmetic, the shape a 100 TB run needs),
# while DuckDB enumerates every day and tests each one. Each engine
# also uses its own dayofweek convention (Spark Sunday=1, DuckDB
# Sunday=0) normalized to ISO Monday=1 — the documented cross-engine
# calendar gotcha, exercised on both sides of the gate.
# ---------------------------------------------------------------------------

BUSINESS_DAYS_ORACLE = """
WITH spans AS (
  SELECT o.o_orderpriority AS priority,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(l.l_shipdate AS DATE) AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
    AND o.o_orderkey % 20 = 0
),
days AS (
  SELECT priority, unnest(generate_series(d0 + 1, d1, INTERVAL 1 DAY)) AS d
  FROM spans
),
biz AS (
  SELECT priority,
         COUNT(CASE WHEN dayofweek(d) NOT IN (6, 0) THEN 1 END) AS n_biz,
         COUNT(*) AS n_days
  FROM days GROUP BY priority
)
SELECT priority, n_biz, n_days,
       ROUND(CAST(n_biz AS DOUBLE) / n_days, 6) AS biz_fraction
FROM biz
"""


@register("q_business_days", BUSINESS_DAYS_ORACLE,
          "business-day lead time per priority: Spark computes the "
          "closed form (full weeks + unrolled partial-week tail on "
          "the ISO start weekday), the oracle enumerates days — two "
          "algorithms, two dayofweek conventions, one answer")
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (o.filter(F.col("o_orderkey") % 20 == 0)
             .join(li, li.l_orderkey == o.o_orderkey)
             .select(F.col("o_orderpriority").alias("priority"),
                     F.to_date("o_orderdate").alias("d0"),
                     F.to_date("l_shipdate").alias("d1"))
             .filter(F.col("d1") > F.col("d0")))
    # window [d0+1 .. d1]: n days starting at ISO weekday w of d0+1
    n = F.datediff("d1", "d0")                       # = d1 - (d0+1) + 1
    # Spark dayofweek: Sunday=1..Saturday=7 → ISO Monday=1..Sunday=7
    w = (F.dayofweek(F.date_add("d0", 1)) + 5) % 7 + 1
    r = n % 7
    # business days in the partial tail: weekdays w..w+r-1 (mod),
    # counting those with ISO index ≤ 5 — unrolled over i = 0..5
    tail = sum(
        F.when((F.lit(i) < r) & (((w - 1 + i) % 7) < 5), 1).otherwise(0)
        for i in range(6))
    n_biz_row = (n - r) / 7 * 5 + tail               # exact integers
    biz = (spans.select("priority", n.alias("n_days_row"),
                        n_biz_row.cast("long").alias("n_biz_row"))
           .groupBy("priority")
           .agg(F.sum("n_biz_row").alias("n_biz"),
                F.sum("n_days_row").alias("n_days")))
    return biz.select(
        "priority", "n_biz", "n_days",
        F.round(F.col("n_biz").cast("double") / F.col("n_days"), 6)
         .alias("biz_fraction"))


# ---------------------------------------------------------------------------
# Running distinct count — "how many distinct event types has this
# user touched as of each event". Neither engine supports
# COUNT(DISTINCT) OVER a running frame; the portable form is the
# first-occurrence flag (rank 1 within (user, type) by time) run-
# summed over the user's timeline. Both windows are key-partitioned;
# the tie order (ts, event_id) is total, so the running values match
# row-for-row across engines.
# ---------------------------------------------------------------------------

RUNNING_DISTINCT_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_of_type
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_of_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW)
            AS BIGINT) AS distinct_types_so_far
FROM flagged
"""


@register("q_running_distinct", RUNNING_DISTINCT_ORACLE,
          "running distinct event types per user: first-occurrence "
          "flag (rank-1 within user+type) + key-partitioned running "
          "sum — the portable COUNT(DISTINCT) OVER")
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W
    e = load_table(spark, sf_dir, "events")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id", "event_id", "ts",
        F.when(F.row_number().over(w_type) == 1, 1).otherwise(0)
         .alias("first_of_type"))
    w_run = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    return flagged.select(
        "user_id", "event_id",
        F.sum("first_of_type").over(w_run).alias("distinct_types_so_far"))


# ---------------------------------------------------------------------------
# Last-touch attribution: every purchase credits the user's most
# recent PRIOR click — the carry-forward idiom (`last(..., ignore
# nulls)` over an unbounded-preceding frame) that powers marketing
# attribution, as-of enrichment, and forward-fill alike. The window
# is key-partitioned per user with a total (ts, event_id) order; the
# attributed value crosses the final aggregate as DECIMAL.
# ---------------------------------------------------------------------------

ATTRIBUTION_ORACLE = """
WITH tl AS (
  SELECT user_id, event_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_id
  FROM events
)
SELECT CASE WHEN last_click_id IS NULL THEN 'organic'
            ELSE 'click_attributed' END AS bucket,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
FROM tl WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("q_last_touch_attribution", ATTRIBUTION_ORACLE,
          "last-touch attribution: carry-forward last(click, ignore "
          "nulls) over an unbounded-preceding frame per user; "
          "purchases split organic vs click-attributed")
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    tl = e.withColumn(
        "last_click_id",
        F.last(F.when(F.col("event_type") == "click", F.col("event_id")),
               ignorenulls=True).over(w))
    bucket = F.when(F.col("last_click_id").isNull(), "organic") \
        .otherwise("click_attributed")
    return (tl.filter(F.col("event_type") == "purchase")
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                  .cast("double").alias("attributed_value")))


# ---------------------------------------------------------------------------
# Share-of-parent rollup: each nation's revenue as a share of its
# region — the hierarchical contribution report. Two grouped
# aggregates (nation level, region level re-aggregated FROM the
# nation level, never a second scan) joined back via broadcast; the
# decimal revenue discipline keeps both levels and the ratio exact.
# ---------------------------------------------------------------------------

SHARE_OF_PARENT_ORACLE = """
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - l.l_discount AS DECIMAL(8,2))) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
reg AS (SELECT region, SUM(rev) AS region_rev FROM nat GROUP BY region)
SELECT n.region, n.nation,
       CAST(n.rev AS DOUBLE) AS revenue,
       ROUND(CAST(n.rev AS DOUBLE) / CAST(g.region_rev AS DOUBLE), 6)
         AS share_of_region
FROM nat n JOIN reg g ON n.region = g.region
"""


@register("q_share_of_parent", SHARE_OF_PARENT_ORACLE,
          "hierarchical contribution: nation revenue share within "
          "region — parent level re-aggregates the child level (one "
          "scan), broadcast join back, exact decimal ratio")
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)"))
    nat = (li.join(s, li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg(F.sum(rev).alias("rev"))
           .localCheckpoint(eager=False))  # feeds parent + result
    reg = nat.groupBy("region").agg(F.sum("rev").alias("region_rev"))
    return (nat.join(F.broadcast(reg), "region")
            .select("region", "nation",
                    F.col("rev").cast("double").alias("revenue"),
                    F.round(F.col("rev").cast("double")
                            / F.col("region_rev").cast("double"), 6)
                     .alias("share_of_region")))
