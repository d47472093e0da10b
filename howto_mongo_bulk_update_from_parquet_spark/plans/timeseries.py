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


# ---------------------------------------------------------------------------
# Linear interpolation across grid gaps — the numeric companion to
# q_time_resample's forward fill (ML feature pipelines interpolate
# continuous signals, ffill categorical state). Built on the sparse
# purchase series so real gaps exist at every SF (825 of 1366 grid
# days at sf0.01 are gaps). Both neighbors come from two frame-bounded
# window passes (preceding / following), each carrying (value, day)
# pairs; the interpolation itself is one fixed IEEE expression tree on
# scalars, identical in both engines, rounded to 6 at the end.
# Edge policy: before the first known point → backfill, after the
# last → forward fill.
# ---------------------------------------------------------------------------

INTERP_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
  FROM events
  WHERE user_id < 50 AND ts IS NOT NULL AND event_type = 'purchase'
  GROUP BY 1, 2
),
spans AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
  FROM spans
),
g AS (
  SELECT g.user_id, g.day, d.v,
         last_value(d.v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER w_prev AS pd,
         first_value(d.v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER w_next AS nd
  FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
  WINDOW
    w_prev AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, v IS NULL AS filled,
       CASE WHEN v IS NOT NULL THEN ROUND(v, 6)
            WHEN pv IS NULL THEN ROUND(nv, 6)
            WHEN nv IS NULL THEN ROUND(pv, 6)
            ELSE ROUND(pv + (nv - pv)
                       * (CAST(date_diff('day', pd, day) AS DOUBLE)
                          / date_diff('day', pd, nd)), 6)
       END AS v_interp
FROM g
"""


@register("q_time_interpolate", INTERP_ORACLE,
          "time-series linear interpolation across grid gaps "
          "(two frame-bounded window passes; bfill/ffill at the edges)")
def q_time_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (e.filter((F.col("user_id") < 50) & F.col("ts").isNotNull()
                      & (F.col("event_type") == "purchase"))
             .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                  .cast("double").alias("v")))
    grid = (daily.groupBy("user_id")
            .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
            .select("user_id", F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")))
    w_prev = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_next = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    g = (grid.join(daily, ["user_id", "day"], "left")
         .select("user_id", "day", "v",
                 F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
                 F.last(known_day, ignorenulls=True).over(w_prev).alias("pd"),
                 F.first("v", ignorenulls=True).over(w_next).alias("nv"),
                 F.first(known_day, ignorenulls=True).over(w_next).alias("nd")))
    frac = (F.datediff("day", "pd").cast("double")
            / F.datediff("nd", "pd"))
    interp = (F.when(F.col("v").isNotNull(), F.round(F.col("v"), 6))
              .when(F.col("pv").isNull(), F.round(F.col("nv"), 6))
              .when(F.col("nv").isNull(), F.round(F.col("pv"), 6))
              .otherwise(F.round(F.col("pv")
                                 + (F.col("nv") - F.col("pv")) * frac, 6)))
    return g.select("user_id", "day",
                    F.col("v").isNull().alias("filled"),
                    interp.alias("v_interp"))


# ---------------------------------------------------------------------------
# Change-point scoring on the per-type daily series: for every day,
# |mean(next 7 days) − mean(prev 7 days)| — the sliding two-sample
# mean-shift score whose peaks localize level changes. Both frames
# are RANGE windows over the day number (value-based, so missing days
# shrink the window instead of sliding over phantom rows), partitioned
# by event_type — never global. Daily sums cross as DECIMAL; the two
# means and their difference are fixed IEEE ops over exact sums.
# ---------------------------------------------------------------------------

CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dnum,
         SUM(CAST(value AS DECIMAL(18,6))) AS day_sum
  FROM events GROUP BY 1, 2, 3
),
scored AS (
  SELECT event_type, day,
         SUM(day_sum) OVER w_prev AS s_prev,
         COUNT(*) OVER w_prev AS n_prev,
         SUM(day_sum) OVER w_next AS s_next,
         COUNT(*) OVER w_next AS n_next
  FROM daily
  WINDOW w_prev AS (PARTITION BY event_type ORDER BY dnum
                    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING),
         w_next AS (PARTITION BY event_type ORDER BY dnum
                    RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
)
SELECT event_type, day, n_prev, n_next,
       ROUND(ABS(CAST(s_next AS DOUBLE) / n_next
                 - CAST(s_prev AS DOUBLE) / n_prev), 6) AS shift_score
FROM scored
WHERE n_prev >= 3 AND n_next >= 3
"""


@register("q_changepoint_score", CHANGEPOINT_ORACLE,
          "two-sample mean-shift change-point score per day: RANGE "
          "frames over day number (7 back / 7 forward), partitioned "
          "by event_type; decimal daily sums, fixed-float means")
def q_changepoint_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type",
                       F.to_date("ts").alias("day"),
                       F.datediff(F.to_date("ts"),
                                  F.lit("2024-01-01").cast("date"))
                        .alias("dnum"))
             .agg(F.sum(F.col("value").cast("decimal(18,6)"))
                  .alias("day_sum")))
    w_prev = (Window.partitionBy("event_type").orderBy("dnum")
              .rangeBetween(-7, -1))
    w_next = (Window.partitionBy("event_type").orderBy("dnum")
              .rangeBetween(1, 7))
    scored = daily.select(
        "event_type", "day",
        F.sum("day_sum").over(w_prev).alias("s_prev"),
        F.count(F.lit(1)).over(w_prev).alias("n_prev"),
        F.sum("day_sum").over(w_next).alias("s_next"),
        F.count(F.lit(1)).over(w_next).alias("n_next"))
    return (scored.filter((F.col("n_prev") >= 3) & (F.col("n_next") >= 3))
            .select("event_type", "day", "n_prev", "n_next",
                    F.round(F.abs(
                        F.col("s_next").cast("double") / F.col("n_next")
                        - F.col("s_prev").cast("double") / F.col("n_prev")),
                        6).alias("shift_score")))


# ---------------------------------------------------------------------------
# Exponentially-decayed moving average (EWMA-style smoothing), the
# classic time-series feature a recursive definition makes hard to
# distribute: dma_t = sum_j w_j * x_{t-j} / sum_j w_j over the last K
# observations, w_j = alpha * (1 - alpha)^j. Truncating at K lags IS
# the defined semantics (w_15 ~ 0.003 at alpha=0.25), which turns the
# unbounded recursion into a BOUNDED per-row expression: K lag()
# columns over a key-partitioned window — no sequential state, no
# iteration, identical shape at any history length.
#
# Exactness — the hard-won version: a first draft multiplied doubles
# and ROUND(x, 9)-ed each term, and the engines split on EXACT ties
# (a 2-decimal value times a dyadic weight can land precisely on
# 0.5e-9, where Spark's round is HALF_UP but DuckDB's nearbyint is
# HALF_EVEN). This version has NO double rounding anywhere: the
# 2-decimal values cast exactly to DECIMAL(12,2) (fixture invariant,
# asserted by the oracle gate at all SFs), weights are exact
# 9-decimal literals, each term is an EXACT decimal product
# (scale 11), and the fold is a BALANCED pairwise tree so Spark's
# decimal-precision growth stays at 24+log2(K)=28 digits instead of
# the 38-digit overflow a left fold reaches. Early rows (fewer than K
# lags) normalize by the sum of present weights (adjusted-EWMA
# convention). The final decimal->double casts and one division are
# bit-identical in both engines.
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25
EWMA_K = 16
_EWMA_W = [round(EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** j, 9)
           for j in range(EWMA_K)]


def _tree_sum(parts: list):
    """Balanced pairwise fold (works for str SQL snippets and Spark
    Columns alike): depth log2(n), so decimal precision grows by
    +log2(n) digits, not +n."""
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            a, b = parts[i], parts[i + 1]
            nxt.append(f"({a} + {b})" if isinstance(a, str) else (a + b))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _ewma_oracle() -> str:
    lags = ",\n         ".join(
        f"LAG(v, {j}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS v_{j}" for j in range(1, EWMA_K))
    terms = _tree_sum([
        f"CASE WHEN v_{j} IS NULL THEN CAST(0 AS DECIMAL(24,11)) "
        f"ELSE v_{j} * CAST({w!r} AS DECIMAL(11,9)) END"
        for j, w in enumerate(_EWMA_W)])
    wsum = _tree_sum([
        f"CASE WHEN v_{j} IS NULL THEN CAST(0 AS DECIMAL(11,9)) "
        f"ELSE CAST({w!r} AS DECIMAL(11,9)) END"
        for j, w in enumerate(_EWMA_W)])
    return f"""
WITH src AS (
  SELECT user_id, event_id, ts, CAST(value AS DECIMAL(12,2)) AS v
  FROM events WHERE value IS NOT NULL
),
lagged AS (
  SELECT user_id, event_id, v AS v_0,
         {lags}
  FROM src
)
SELECT user_id, event_id,
       CAST({terms} AS DOUBLE)
         / CAST({wsum} AS DOUBLE) AS dma
FROM lagged
"""


@register("q_ewma_smoothing", _ewma_oracle(),
          "exponentially-decayed moving average per user (alpha=0.25, "
          "K=16 lags): the recursive EWMA made distributable as a "
          "bounded lag-window expression, weight-adjusted at series "
          "start, exact-decimal balanced-tree fold")
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull())
         .select("user_id", "event_id", "ts",
                 F.col("value").cast("decimal(12,2)").alias("v")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id", "event_id",
        F.col("v").alias("v_0"),
        *[F.lag("v", j).over(w).alias(f"v_{j}")
          for j in range(1, EWMA_K)])
    term_zero = F.lit(0).cast("decimal(24,11)")
    w_zero = F.lit(0).cast("decimal(11,9)")
    terms = _tree_sum([
        F.when(F.col(f"v_{j}").isNull(), term_zero)
         .otherwise(F.col(f"v_{j}")
                    * F.lit(wj).cast("decimal(11,9)"))
        for j, wj in enumerate(_EWMA_W)])
    wsum = _tree_sum([
        F.when(F.col(f"v_{j}").isNull(), w_zero)
         .otherwise(F.lit(wj).cast("decimal(11,9)"))
        for j, wj in enumerate(_EWMA_W)])
    return lagged.select(
        "user_id", "event_id",
        (terms.cast("double") / wsum.cast("double")).alias("dma"))
