"""Time-series resample + gap-fill over the `events` stream table —
the alignment pass a training pipeline runs before feature extraction
(irregular event times → a dense per-entity daily grid with
forward-filled values).

Shape: per-user daily aggregate → per-user calendar densification
(`sequence` + `explode` generates exactly the missing grid rows, no
cross join against a global calendar) → forward fill via
`last(ignorenulls)` over an unbounded-preceding frame.

Scale notes (100 TB of events): the daily aggregates are map-side
combinable, so the shuffles move day-counts, not events; densification
multiplies rows only by the per-user day-span (bounded, independent of
event volume). At fixture scale the plan is: one Exchange on user_id
for the grid, daily broadcast into the left join, and the forward-fill
Window reusing the grid's user_id partitioning — zero extra Exchange
for the fill (verified via explain; past the broadcast threshold AQE
swaps the join to shuffle and the window re-partitions on user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet import load_table
from .catalog import register

# exact double sums via decimal, engine-portable (functions/numeric
# discipline); value is bounded (< 1000) so DECIMAL(18,6) never
# overflows at any SF
RESAMPLE_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE user_id < 50 AND ts IS NOT NULL
  GROUP BY user_id, date_trunc('day', ts)
),
spans AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
  FROM spans
)
SELECT g.user_id, g.day,
       d.v IS NULL AS filled,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
"""


@register("q_time_resample", RESAMPLE_ORACLE,
          "time-series resample: per-user daily grid densified with "
          "sequence+explode, gaps forward-filled via last(ignorenulls)")
def q_time_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (e.filter((F.col("user_id") < 50) & F.col("ts").isNotNull())
             .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                  .cast("double").alias("v")))
    grid = (daily.groupBy("user_id")
            .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
            .select("user_id", F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")))
    w = (Window.partitionBy("user_id").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(daily, ["user_id", "day"], "left")
            .select("user_id", "day",
                    F.col("v").isNull().alias("filled"),
                    F.last("v", ignorenulls=True).over(w).alias("v_ffill")))
