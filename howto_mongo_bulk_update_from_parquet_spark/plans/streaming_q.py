"""Structured Streaming queries registered in the catalog. All drive
the real streaming engine (file source → watermark → state store →
memory sink, availableNow) in **append** output mode — the bounded-
state form a production deployment runs — and still carry full DuckDB
oracles: the availableNow final no-data batch advances the watermark
to max(event_time) - delay and flushes every watermark-closed window,
so each oracle is the batch aggregation restricted to the same
closed-window cutoff (verified value-exact against the engine at
sf0.001/0.01/0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.jobs import (stream_dedup_events, stream_session_windows,
                              stream_sliding_counts, stream_stream_join,
                              stream_stream_left_join, stream_tumbling_counts)
from .catalog import register

# Append mode emits a window when the final watermark (max ts - 10 min)
# passes the window end; the tail window containing max(ts) stays open
# in state and is not emitted, so the oracle excludes it too.
STREAM_TUMBLING_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""


@register("q_stream_tumbling", STREAM_TUMBLING_ORACLE,
          "Structured Streaming watermarked tumbling windows, append mode "
          "(bounded state, watermark-evicted; memory sink, availableNow)")
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_tumbling_counts(spark, sf_dir)


# sliding: each event belongs to span/slide = 2 windows; the same
# closed-window cutoff applies per window
STREAM_SLIDING_ORACLE = """
WITH w AS (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
         event_type, value
  FROM events
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM w
WHERE window_start + INTERVAL 2 HOUR
      <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""


@register("q_stream_sliding", STREAM_SLIDING_ORACLE,
          "Structured Streaming sliding windows (2h span / 1h slide), "
          "append mode — span/slide x tumbling state, watermark-evicted")
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sliding_counts(spark, sf_dir)


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


# Outer rows are watermark-gated: an unmatched view is emitted with
# NULLs only once the global watermark — min over both sides' maxima
# minus the 10-min delay — passes view_ts + 30 min (its state-expiry
# point). Matched pairs are emitted as they join, same as inner.
STREAM_STREAM_LEFT_ORACLE = """
WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
     b AS (SELECT user_id AS b_user, event_id AS buy_id, ts AS buy_ts
           FROM events WHERE event_type = 'purchase'),
     wm AS (SELECT LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'view'),
                         (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
                   - INTERVAL 10 MINUTE AS w)
SELECT v.user_id, v.view_id, v.view_ts, b.buy_id, b.buy_ts
FROM v JOIN b
  ON b.b_user = v.user_id
 AND b.buy_ts >= v.view_ts AND b.buy_ts <= v.view_ts + INTERVAL 30 MINUTE
UNION ALL
SELECT v.user_id, v.view_id, v.view_ts,
       CAST(NULL AS BIGINT) AS buy_id, CAST(NULL AS TIMESTAMP) AS buy_ts
FROM v, wm
WHERE NOT EXISTS (
        SELECT 1 FROM b
        WHERE b.b_user = v.user_id
          AND b.buy_ts >= v.view_ts
          AND b.buy_ts <= v.view_ts + INTERVAL 30 MINUTE)
  AND v.view_ts + INTERVAL 30 MINUTE < wm.w
"""


@register("q_stream_stream_left", STREAM_STREAM_LEFT_ORACLE,
          "Structured Streaming stream-stream LEFT OUTER join: views "
          "with their 30-min purchase or NULLs once the watermark "
          "expires the row (bounded state, append mode)")
def q_stream_stream_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_left_join(spark, sf_dir)


# The engine is delivered every event TWICE (at-least-once emulation);
# exactly-once dedup must recover the original set, row-identical.
STREAM_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value
FROM events
"""


@register("q_stream_dedup", STREAM_DEDUP_ORACLE,
          "Structured Streaming exactly-once ingestion dedup: "
          "dropDuplicatesWithinWatermark over a doubled (at-least-once) "
          "delivery — per-key state evicted at the watermark, so dedup "
          "state is bounded by delay x rate, not the key universe")
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_dedup_events(spark, sf_dir)


# session_window merges an event into the previous session iff
# event_ts - last_ts < gap (µs-exact); session_end = last event + gap.
# Append mode emits a session once the watermark passes its end, so
# the oracle keeps only sessions with end <= max(ts) - 10 min.
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
HAVING MAX(ts) + INTERVAL 30 MINUTE
       <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
"""


@register("q_stream_session_windows", STREAM_SESSION_ORACLE,
          "Structured Streaming session windows, append mode (30-min "
          "gap, state-store merge, watermark-evicted)")
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_session_windows(spark, sf_dir)


# stream-static: the join itself is stateless (static side re-planned
# each micro-batch, broadcast); only the windowed agg holds state, so
# the oracle is the batch join + the same closed-window cutoff.
STREAM_STATIC_ORACLE = """
SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS window_start,
       c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE date_trunc('hour', e.ts) + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) FROM events) - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""


@register("q_stream_static_enrich", STREAM_STATIC_ORACLE,
          "Structured Streaming stream-static broadcast enrichment join "
          "+ watermarked tumbling counts per market segment, append mode")
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_static_enrich
    return stream_static_enrich(spark, sf_dir)


# foreachBatch partials are additive, so the re-aggregated sink equals
# the global GROUP BY regardless of micro-batch splits — full oracle.
STREAM_FOREACH_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events GROUP BY user_id
"""


@register("q_stream_foreach_upsert", STREAM_FOREACH_ORACLE,
          "Structured Streaming foreachBatch sink: per-batch additive "
          "partial aggregates written through the batch writer, "
          "re-aggregated to the exact global GROUP BY (integer cents)")
def q_stream_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_foreach_batch_upsert
    return stream_foreach_batch_upsert(spark, sf_dir)
