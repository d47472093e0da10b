"""Event-analytics battery: conversion funnel, retention cohorts, and
the dedup keep-one application — the product-analytics shapes an
events table exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Ordered funnel: a user converts at step N only if the steps happened
# in TIME ORDER (first view < first click < first purchase) — the
# min-timestamp comparison is what makes it a funnel, not three counts.
FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS step_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                  THEN 1 END) AS step_purchase
FROM firsts
"""


@register("q_event_funnel", FUNNEL_ORACLE,
          "ordered conversion funnel view→click→purchase: min-timestamp "
          "per step, strict time-order gating, one aggregation pass")
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")

    def first_of(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    firsts = (e.groupBy("user_id")
              .agg(first_of("view").alias("t_view"),
                   first_of("click").alias("t_click"),
                   first_of("purchase").alias("t_purchase")))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(F.when((F.col("t_purchase") > F.col("t_click"))
                       & (F.col("t_click") > F.col("t_view")), 1))
         .alias("step_purchase"))


# Retention cohorts: users grouped by first-seen week, counted in each
# later activity week — the (cohort, offset) matrix every growth
# dashboard draws. Weeks via date_trunc; offset in whole weeks.
RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.week) / 7 AS BIGINT) AS week_offset,
       COUNT(*) AS n_active
FROM activity a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


@register("q_retention_cohorts", RETENTION_ORACLE,
          "weekly retention cohorts: first-seen week × activity-week "
          "offset matrix (distinct user-weeks, two aggregations)")
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    first_seen = (e.groupBy("user_id")
                  .agg(F.date_trunc("week", F.min("ts")).alias("cohort")))
    activity = (e.select("user_id",
                         F.date_trunc("week", "ts").alias("week")).distinct())
    return (activity.join(first_seen, "user_id")
            .groupBy("cohort",
                     (F.datediff("week", "cohort") / 7).cast("long")
                      .alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_active")))


# The dedup PAYOFF: anti-join the corpus against non-representative
# cluster members — duplicates vanish, one exemplar per cluster stays.
KEEP_ONE_ORACLE = """
WITH RECURSIVE pairs AS (
  SELECT * FROM ({lsh_pairs})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
clusters AS (
  SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s
),
drop_list AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster)
SELECT lang, COUNT(*) AS n_docs
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
GROUP BY lang
"""


def _keep_one_oracle() -> str:
    from .lsh import LSH_PAIRS_ORACLE
    return KEEP_ONE_ORACLE.format(lsh_pairs=LSH_PAIRS_ORACLE)


@register("q_dedup_keep_one", None,  # oracle installed below (CTE reuse)
          "dedup applied: drop every near-dup cluster member except the "
          "min-id exemplar, count survivors per language")
def q_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (lsh_bands, lsh_candidate_pairs,
                                   minhash_signatures, shingles)
    from ..operators.graph import dedup_representatives
    d = _t(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", 3)
    sig = minhash_signatures(sh, "doc_id", 16)
    pairs = lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")
    drop = (dedup_representatives(pairs)
            .filter(~F.col("keep"))
            .select(F.col("node").alias("doc_id")))
    kept = d.join(drop, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def _install_keep_one_oracle() -> None:
    from .catalog import CATALOG, Query
    q = CATALOG["q_dedup_keep_one"]
    CATALOG["q_dedup_keep_one"] = Query(name=q.name, fn=q.fn,
                                        oracle=_keep_one_oracle(), doc=q.doc)


_install_keep_one_oracle()


# ---------------------------------------------------------------------------
# Exact pairwise Pearson correlation matrix over lineitem's numeric
# measures, in ONE aggregate pass: all moment sums (Sx, Sxx, Sxy) are
# DECIMAL (order-independent, engine-exact); the correlation formula
# itself is a fixed IEEE expression over those exact scalars, so both
# engines produce identical bits. Spark's built-in corr() is a
# float-accumulator (shuffle-order-dependent) — this is the oracle-
# disciplined form, and at 100 TB it is STILL one map-side-combined
# aggregation producing a single 15-number row, then driver-sized
# arithmetic.
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(28,6))) AS s_{c}")
        sums.append(f"SUM(CAST({c} AS DECIMAL(28,6))"
                    f" * CAST({c} AS DECIMAL(28,6))) AS q_{c}")
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b_ in _CORR_COLS[i + 1:]:
            sums.append(f"SUM(CAST({a} AS DECIMAL(28,6))"
                        f" * CAST({b_} AS DECIMAL(28,6))) AS p_{a}_{b_}")
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b_}' AS col_b, "
                f"ROUND((n * CAST(p_{a}_{b_} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b_} AS DOUBLE))"
                f" / sqrt((n * CAST(q_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
                f" * (n * CAST(q_{b_} AS DOUBLE)"
                f" - CAST(s_{b_} AS DOUBLE) * CAST(s_{b_} AS DOUBLE))), 6)"
                f" AS pearson_r FROM m")
    return ("WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
            + "\nUNION ALL\n".join(pairs))


@register("q_correlation_matrix", _corr_oracle(),
          "exact pairwise Pearson correlations over lineitem measures: "
          "one decimal-moment aggregate pass, fixed-float finish")
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    d = {c: F.col(c).cast("decimal(28,6)") for c in _CORR_COLS}
    for c in _CORR_COLS:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS)
             for b in _CORR_COLS[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(d[a] * d[b]).alias(f"p_{a}_{b}"))
    m = li.agg(*aggs)

    def r(a: str, b: str):
        n = F.col("n")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        qa, qb = F.col(f"q_{a}").cast("double"), F.col(f"q_{b}").cast("double")
        p = F.col(f"p_{a}_{b}").cast("double")
        return F.round((n * p - sa * sb)
                       / F.sqrt((n * qa - sa * sa) * (n * qb - sb * sb)), 6)

    # one explode over a struct array — NOT a 6-way union of selects
    # over `m`, which would plan six full scans of lineitem
    out = F.array(*[F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                             r(a, b).alias("pearson_r"))
                    for a, b in pairs])
    return m.select(F.explode(out).alias("x")).select("x.*")


# ---------------------------------------------------------------------------
# Incremental materialized-view refresh: the aggregate state is built
# from history (events before Jan 20), a delta batch (Jan 20 onward)
# is merged in WITHOUT rescanning history, and the oracle is the FULL
# RECOMPUTE over everything — the merge must be bit-identical to it.
# Decimal accumulators make that exact; at 100 TB the refresh scans
# one day's partition instead of the table.
# ---------------------------------------------------------------------------

INCREMENTAL_ORACLE = """
SELECT event_type,
       COUNT(value) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)
         AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


@register("q_incremental_rollup", INCREMENTAL_ORACLE,
          "incremental materialized-view refresh: base state + delta "
          "merge, oracle = full recompute (must match bit-for-bit)")
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (aggregate_state, merge_agg_state,
                                         read_view)
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    base = aggregate_state(e.filter(F.col("ts") < cutoff),
                           ["event_type"], "value")
    delta = aggregate_state(e.filter(~(F.col("ts") < cutoff)),
                            ["event_type"], "value")
    return read_view(merge_agg_state(base, delta, ["event_type"]))


# ---------------------------------------------------------------------------
# Grouped ordinary-least-squares regression (y = extendedprice on
# x = quantity, per returnflag) with the same exactness discipline as
# q_correlation_matrix: the per-group moment sums (n, Sx, Sy, Sxx,
# Sxy, Syy) accumulate in DECIMAL — order-independent, so shuffle
# nondeterminism can't move a bit — and slope/intercept/R² are a fixed
# IEEE expression over those exact scalars. The built-in regr_slope/
# regr_intercept/regr_r2 aggregates (Spark AND DuckDB both ship them)
# are float accumulators whose result depends on partition merge
# order; this form is what lets two engines agree bit-for-bit. At
# 100 TB it is still ONE map-side-combined aggregation producing six
# numbers per group.
# ---------------------------------------------------------------------------

REGRESSION_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(28,6))
             * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(28,6))
             * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))
             * CAST(l_extendedprice AS DECIMAL(28,6))) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
       ROUND(POW(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
             / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS r2
FROM m
"""


@register("q_regression_ols", REGRESSION_ORACLE,
          "grouped OLS fit (price on quantity per returnflag): decimal "
          "moment sums, fixed-float slope/intercept/R² finish — the "
          "order-independent form of regr_slope/regr_r2")
def q_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(28,6)")
    y = F.col("l_extendedprice").cast("decimal(28,6)")
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"),
              F.sum(y * y).alias("syy")))
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy          # n²·cov — shared numerator
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return m.select(
        "l_returnflag", "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(F.pow(cov_n, 2) / (var_x * var_y), 6).alias("r2"))
