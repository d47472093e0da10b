"""Event-time analytics over the `events` table: tumbling windows and
sessionization in batch form (DuckDB-checkable); the Structured
Streaming equivalents live in streaming/jobs.py and are registered as
rows-only queries (no SQL oracle for streaming state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dec
from ..sources.parquet import load_table
from .catalog import register

TUMBLING_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("q_event_tumbling", TUMBLING_ORACLE,
          "tumbling 1-hour event-time windows (batch form of the streaming agg)")
def q_event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(dec("value", 18, 2)).cast("double").alias("sum_value"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n_events", "sum_value"))


SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM seq
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_seq
"""


@register("q_sessionize", SESSION_ORACLE,
          "sessionization: 30-min inactivity gap via lag + cumulative sum")
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.floor(F.unix_micros("ts") / 1_000_000).cast("long")
    gap = secs - F.lag(secs).over(w)
    sessioned = (e.withColumn("new_sess", F.when(gap > 1800, 1).otherwise(0))
                  .withColumn("session_seq",
                              F.sum("new_sess").over(
                                  w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (sessioned.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


# --- cascading rollup (hypertable continuous-aggregate pattern) --------

# At 100 TB you never rescan raw events for coarser resolutions: the
# daily rollup aggregates the HOURLY result (24× smaller), monthly
# aggregates daily. Decimal sums are associative, so re-aggregation is
# exact and the cascade equals a direct group-by at every level.
ROLLUP_CASCADE_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS sv
  FROM events GROUP BY 1
),
daily AS (
  SELECT date_trunc('day', bucket) AS bucket,
         CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(sv) AS sv
  FROM hourly GROUP BY 1
),
monthly AS (
  SELECT date_trunc('month', bucket) AS bucket,
         CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(sv) AS sv
  FROM daily GROUP BY 1
)
SELECT 'hour' AS level, CAST(bucket AS TIMESTAMP) AS bucket_start,
       n_events, CAST(sv AS DOUBLE) AS sum_value FROM hourly
UNION ALL
SELECT 'day', CAST(bucket AS TIMESTAMP), n_events, CAST(sv AS DOUBLE) FROM daily
UNION ALL
SELECT 'month', CAST(bucket AS TIMESTAMP), n_events, CAST(sv AS DOUBLE) FROM monthly
"""


@register("q_rollup_cascade", ROLLUP_CASCADE_ORACLE,
          "continuous-aggregate cascade: hour -> day -> month, each "
          "level re-aggregating the previous (never rescanning raw)")
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # each level is lazily checkpointed: the union below references
    # hourly 3× and daily 2× (directly + through coarser levels), and
    # without lineage truncation Spark would rescan raw events once per
    # branch — exactly what the cascade exists to avoid
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"))
              .localCheckpoint(eager=False))
    daily = (hourly.groupBy(F.date_trunc("day", "bucket").alias("bucket"))
             .agg(F.sum("n_events").cast("long").alias("n_events"),
                  F.sum("sv").alias("sv"))
             .localCheckpoint(eager=False))
    monthly = (daily.groupBy(F.date_trunc("month", "bucket").alias("bucket"))
               .agg(F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("sv").alias("sv")))

    def lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("level"),
                         F.col("bucket").alias("bucket_start"),
                         "n_events", F.col("sv").cast("double").alias("sum_value"))

    return (lvl(hourly, "hour")
            .unionByName(lvl(daily, "day"))
            .unionByName(lvl(monthly, "month")))


# --- NTILE bucketing ----------------------------------------------------

# Decile assignment is the dataset-split / price-banding primitive.
# PARTITIONED ntile (per order-priority): each window sorts within its
# partition — no global single-partition sort, so the plan survives
# scale-up. (A GLOBAL ntile at 100 TB is the wrong tool: use
# percentile_approx cut-points broadcast into a range bucketizer.)
# (o_totalprice, o_orderkey) totally orders each partition, so tiles
# are deterministic across engines and partitionings.
NTILE_ORACLE = """
SELECT o_orderpriority, decile,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         NTILE(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY o_orderpriority, decile
"""


@register("q_ntile_buckets", NTILE_ORACLE,
          "NTILE(10) price deciles per order-priority with per-bucket "
          "stats (partitioned window — no global sort)")
def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE inherently ranks each partition in one task; partitioning
    by the 5-value o_orderpriority therefore assumes group sizes that
    fit a reducer (allowlisted in the tiny-key window sweep). For
    decile BOUNDARIES at scale, use
    operators.percentiles.exact_grouped_percentile instead."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey"))
    return (o.select("o_orderpriority", "o_totalprice",
                     F.ntile(10).over(w).alias("decile"))
            .groupBy("o_orderpriority", "decile")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_totalprice").cast("double").alias("min_price"),
                 F.max("o_totalprice").cast("double").alias("max_price")))
