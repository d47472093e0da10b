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
