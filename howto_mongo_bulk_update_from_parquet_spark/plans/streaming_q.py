"""Structured Streaming queries registered in the catalog. Both drive
the real streaming engine (file source → watermark → state store →
memory sink, availableNow) and still carry full DuckDB oracles: in
complete mode over the staged batch the final state equals the batch
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (stream_session_windows, stream_stream_join,
                              stream_tumbling_counts)
from .catalog import register

STREAM_TUMBLING_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("q_stream_tumbling", STREAM_TUMBLING_ORACLE,
          "Structured Streaming watermarked tumbling windows (memory sink, availableNow)")
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_tumbling_counts(spark, sf_dir)


# over the fully-staged batch the append-mode stream-stream join emits
# exactly the batch join's pair set (watermarks only bound STATE, they
# drop nothing when every row is on time relative to the final batch).
STREAM_STREAM_JOIN_ORACLE = """
SELECT v.user_id,
       v.event_id AS view_id, v.ts AS view_ts,
       b.event_id AS buy_id, b.ts AS buy_ts
FROM events v
JOIN events b
  ON b.user_id = v.user_id
 AND v.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
"""


@register("q_stream_stream_join", STREAM_STREAM_JOIN_ORACLE,
          "Structured Streaming stream-stream inner join: views joined "
          "to same-user purchases within 30 min (watermarked both "
          "sides, bounded state, append mode)")
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_join(spark, sf_dir)


# session_window merges an event into the previous session iff
# event_ts - last_ts < gap (µs-exact); session_end = last event + gap.
STREAM_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM seq
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_seq
"""


@register("q_stream_session_windows", STREAM_SESSION_ORACLE,
          "Structured Streaming session windows (30-min gap, state-store merge)")
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_session_windows(spark, sf_dir)
