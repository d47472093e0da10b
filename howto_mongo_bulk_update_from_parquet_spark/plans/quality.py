"""Data-quality battery: column profiling and referential-integrity
checks — the validation pass a pipeline runs before trusting a drop of
new data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

PROFILE_ORACLE = """
SELECT 'l_orderkey' AS col,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT(l_orderkey) AS n_nulls,
       COUNT(DISTINCT l_orderkey) AS n_distinct,
       CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
       COUNT(DISTINCT l_returnflag),
       MIN(l_returnflag), MAX(l_returnflag)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
       COUNT(DISTINCT l_shipdate),
       CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
FROM lineitem
"""


@register("q_profile_columns", PROFILE_ORACLE,
          "exact column profiling: rows/nulls/distinct/min/max, one "
          "column-pruned agg per column unioned (no multi-distinct Expand)")
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact profile. Deliberately ONE distinct aggregate per agg node:
    multiple exact countDistincts in a single aggregate trigger an
    Expand (k× row multiplication) — three independent single-column
    aggs, each scanning only its own column (parquet column pruning),
    are strictly cheaper and union to the same result. The scale
    default for profiling is `q_profile_approx` (HLL sketch, one pass,
    no Expand, no per-column exact distinct state)."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str, fmt=None):
        to_s = fmt or (lambda c: c.cast("string"))
        return li.select(col).agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            to_s(F.min(col)).alias("min_val"),
            to_s(F.max(col)).alias("max_val"))

    ts_fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    return (profile("l_orderkey")
            .unionByName(profile("l_returnflag"))
            .unionByName(profile("l_shipdate", ts_fmt)))


@register("q_profile_approx", None,
          "scale-path profiling: approx_count_distinct (HLL) per column "
          "in one pass — no Expand, bounded sketch state; rows-only "
          "driver check (sketch estimates are engine-specific), 5% "
          "accuracy pinned by tests/test_plans.py")
def q_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiling default: every column profiled in a SINGLE
    scan — HLL sketches merge map-side, so no Expand, no shuffle of raw
    values, state is O(columns × sketch) not O(distinct values). The
    exact twin (`q_profile_columns`) is the small-scale oracle."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str, fmt=None):
        to_s = fmt or (lambda c: c.cast("string"))
        return F.struct(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.approx_count_distinct(col, rsd=0.02).alias("n_distinct_approx"),
            to_s(F.min(col)).alias("min_val"),
            to_s(F.max(col)).alias("max_val"))

    ts_fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    one = li.agg(profile("l_orderkey").alias("p1"),
                 profile("l_returnflag").alias("p2"),
                 profile("l_shipdate", ts_fmt).alias("p3"))
    return (one.select(F.explode(F.array("p1", "p2", "p3")).alias("p"))
            .select("p.*"))


FK_ORACLE = """
SELECT 'lineitem->orders' AS fk,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders->customer',
       COUNT(*),
       COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
"""


@register("q_fk_orphans", FK_ORACLE,
          "referential-integrity check: orphan counts across two FK "
          "edges (key-pruned shuffle joins; AQE picks the strategy)")
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides of each FK edge scale with the data (orders and
    customer are fact-sized at 100 TB), so NO hard broadcast hint —
    the left joins shuffle on the pruned single-column key sets and
    AQE downgrades to broadcast only when a side actually fits. The
    map-side-combinable count aggregates reduce each edge to one row."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    a = (li.join(o.select("o_orderkey"),
                 li.l_orderkey == F.col("o_orderkey"), "left")
         .agg(F.lit("lineitem->orders").alias("fk"),
              F.count(F.lit(1)).alias("n_rows"),
              F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("n_orphans")))
    b = (o.select("o_custkey").join(c,
                                    F.col("o_custkey") == F.col("c_custkey"),
                                    "left")
         .agg(F.lit("orders->customer").alias("fk"),
              F.count(F.lit(1)).alias("n_rows"),
              F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("n_orphans")))
    return a.unionByName(b)


# --- within-document repetition (Gopher/C4-style quality signal) -------

# dup_ratio = 1 - distinct/total over ALL 3-gram occurrences in the
# doc. Computed entirely with array expressions on the row — no
# explode, no shuffle: the signal costs one projection pass however
# large the corpus, the cheapest possible shape for a per-doc filter
# that fronts a 100 TB quality gate.
REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3 THEN
           list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
         ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       ROUND(CASE WHEN len(grams) > 0
             THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
             ELSE 0.0 END, 6) AS dup_ratio
FROM g
"""


@register("q_repetition_ratio", REPETITION_ORACLE,
          "within-doc 3-gram repetition ratio (Gopher/C4-style quality "
          "filter) — pure array expressions, zero shuffle/explode")
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("__tk"))
    grams_expr = ("CASE WHEN size(__tk) >= 3 THEN "
                  "transform(sequence(0, size(__tk) - 3), "
                  "i -> concat_ws(' ', __tk[i], __tk[i+1], __tk[i+2])) "
                  "ELSE array() END")
    g = toks.select("doc_id", F.expr(grams_expr).alias("__g"))
    n_grams = F.size("__g").cast("long")
    n_distinct = F.size(F.array_distinct("__g")).cast("long")
    ratio = F.when(n_grams > 0,
                   F.round(F.lit(1.0) - n_distinct.cast("double") / n_grams, 6)
                   ).otherwise(F.lit(0.0))
    return g.select("doc_id", n_grams.alias("n_grams"),
                    n_distinct.alias("n_distinct"), ratio.alias("dup_ratio"))


# ---------------------------------------------------------------------------
# Winsorized trim: drop each group's bottom/top 5% by rank before
# aggregating — the outlier-robust statistics pass a cleaning pipeline
# runs before fitting thresholds. Bounds are INTEGER arithmetic on the
# group rank (no percentile interpolation), so both engines keep the
# identical row set; the trimmed mean is an exact decimal sum / count.
# ---------------------------------------------------------------------------

TRIM_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), kept AS (
  SELECT * FROM ranked WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100
)
SELECT l_returnflag, COUNT(*) AS n_kept,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price_trimmed,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS p05_price,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS p95_price
FROM kept GROUP BY l_returnflag
"""


@register("q_outlier_trim", TRIM_ORACLE,
          "winsorized trim: drop each group's rank-bottom/top 5% (integer "
          "bounds, no interpolation), exact trimmed mean + cut points")
def q_outlier_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE HAZARD (documented, by design): the per-row rank needs a
    per-group sort, and l_returnflag has ~3 distinct values — so this
    plan ranks ALL of lineitem in 3 reducer tasks. That is the exact
    skewed-key full shuffle operators/skew.py exists to avoid; it is
    acceptable ONLY for small/medium groups or as an oracle twin.
    The production form at 100 TB is q_winsorize_bounds below: exact
    order-statistic cut values via approx-percentile neighborhoods +
    local refinement, never a full per-group sort. The two differ
    only at tied boundary values (this form splits ties by row
    order; the bounds form trims by value, tie-inclusive)."""
    from pyspark.sql.window import Window
    from ..functions.numeric import dec
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag", "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    cut = F.expr("n * 5 DIV 100")
    kept = ranked.filter((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
    return (kept.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 (F.sum(dec("l_extendedprice", 12, 2)).cast("double")
                  / F.count(F.lit(1))).alias("avg_price_trimmed"),
                 F.min("l_extendedprice").cast("double").alias("p05_price"),
                 F.max("l_extendedprice").cast("double").alias("p95_price")))


# ---------------------------------------------------------------------------
# Scale-safe winsorization: the same 5%/95% trim as q_outlier_trim,
# but WITHOUT the per-group full sort (which lands all of lineitem on
# ~3 reducers — the documented hazard above). Semantics are value-
# inclusive: the cut values are the EXACT order statistics at ranks
# cut+1 and n-cut (deterministic regardless of tie order), and every
# row with lo <= v <= hi is kept. The plan:
#   pass 1  per-group n + approx-percentile brackets around each cut
#           (accuracy 1e-4 ⇒ the true order statistic provably lies
#           inside the [p±0.002] value bracket once n ≥ ~1100; groups
#           under 5000 rows take a whole-group bracket — tiny, exact)
#   pass 2  per-group count of rows strictly below each bracket
#   pass 3  rank ONLY the bracket rows (≤0.4% of the group at scale)
#           and read off the exact cut values at the local rank
#   pass 4  broadcast the 3-row bounds table, filter, aggregate
# Four map-side-combinable scans + KB-scale shuffles replace one
# full-table sort into 3 tasks. The oracle is the naive rank form.
# ---------------------------------------------------------------------------

WINSOR_ORACLE = """
WITH nt AS (
  SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn
  FROM lineitem
), bounds AS (
  SELECT r.l_returnflag,
         MIN(CASE WHEN rn = n * 5 // 100 + 1 THEN l_extendedprice END) AS lo,
         MIN(CASE WHEN rn = n - n * 5 // 100 THEN l_extendedprice END) AS hi
  FROM ranked r JOIN nt USING (l_returnflag)
  GROUP BY r.l_returnflag
)
SELECT l.l_returnflag,
       CAST(MIN(b.lo) AS DOUBLE) AS lo_cut,
       CAST(MIN(b.hi) AS DOUBLE) AS hi_cut,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         / COUNT(*) AS avg_price_winsor
FROM lineitem l JOIN bounds b USING (l_returnflag)
WHERE l.l_extendedprice >= b.lo AND l.l_extendedprice <= b.hi
GROUP BY l.l_returnflag
"""

_WINSOR_SMALL_N = 5000  # below this, bracket = whole group (still exact)


@register("q_winsorize_bounds", WINSOR_ORACLE,
          "scale-safe winsorization: exact 5%/95% order-statistic cut "
          "values via approx-percentile brackets + local refinement "
          "(no full per-group sort), value-inclusive trimmed mean")
def q_winsorize_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..functions.numeric import dec
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice"))
    v = F.col("l_extendedprice")

    # pass 1: per-group n + bracket values around both cuts. Spark's
    # percentile_approx (Greenwald-Khanna) at accuracy 10000 bounds
    # the returned value's rank within ±1e-4·n of the requested p, so
    # the [p-0.002, p+0.002] bracket contains the exact cut rank with
    # ≥0.0019·n-2 ranks of margin — positive from n≈1100; the
    # small-group fallback covers the rest with the whole group.
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(v, [0.048, 0.052, 0.948, 0.952],
                            10000).alias("ap"))
    nb = stats.select(
        "l_returnflag", "n", F.expr("n * 5 DIV 100").alias("cut"),
        F.col("ap")[0].alias("lo_a"), F.col("ap")[1].alias("lo_b"),
        F.col("ap")[2].alias("hi_a"), F.col("ap")[3].alias("hi_b"),
        (F.col("n") < _WINSOR_SMALL_N).alias("small"))
    # nb/below are n_groups-row frames consumed by several downstream
    # jobs — without the checkpoint every consumer re-executes the GK
    # sketch / anchor scan (the r16 before-plan shows the percentile
    # subtree planned 4×; guide §3.3)
    nb = nb.localCheckpoint(eager=False)
    j = li.join(F.broadcast(nb), "l_returnflag")

    # pass 2: strict-below counts anchor the brackets' global ranks
    # (when small, the bracket is the whole group and the anchor is 0)
    below = j.groupBy("l_returnflag").agg(
        F.sum(F.when((v < F.col("lo_a")) & ~F.col("small"), 1)
               .otherwise(0)).alias("n_lt_lo"),
        F.sum(F.when((v < F.col("hi_a")) & ~F.col("small"), 1)
               .otherwise(0)).alias("n_lt_hi")).localCheckpoint(eager=False)

    # pass 3 (r16: ONE ranking job for both cuts, was one window job
    # per cut): rank the union of both brackets once, with per-cut
    # CONDITIONAL running-sum ranks — sum(is_lo) over rows ≤ current
    # equals row_number among lo-bracket rows alone, so global rank =
    # conditional rank + strict-below anchor, exactly as before. The
    # value at the target rank stays deterministic under ties (equal
    # values are interchangeable at a rank boundary). One Sort+Window
    # and one bracket scan replace two (guide §2.4: operations keyed
    # the same way share one exchange).
    is_lo = F.col("small") | ((v >= F.col("lo_a")) & (v <= F.col("lo_b")))
    is_hi = F.col("small") | ((v >= F.col("hi_a")) & (v <= F.col("hi_b")))
    w_run = (Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
             .rowsBetween(Window.unboundedPreceding, 0))
    ranked = (j.filter(is_lo | is_hi)
              .withColumn("lrn_lo", F.sum(is_lo.cast("long")).over(w_run))
              .withColumn("lrn_hi", F.sum(is_hi.cast("long")).over(w_run))
              .join(F.broadcast(below), "l_returnflag"))
    bounds = ranked.groupBy("l_returnflag").agg(
        F.min(F.when(is_lo & (F.col("lrn_lo") + F.col("n_lt_lo")
                              == F.col("cut") + 1), v)).alias("lo_cut"),
        F.min(F.when(is_hi & (F.col("lrn_hi") + F.col("n_lt_hi")
                              == F.col("n") - F.col("cut")), v))
         .alias("hi_cut"))

    # pass 4: broadcast the per-group bounds, filter, aggregate
    return (li.join(F.broadcast(bounds), "l_returnflag")
            .filter((v >= F.col("lo_cut")) & (v <= F.col("hi_cut")))
            .groupBy("l_returnflag")
            .agg(F.min("lo_cut").cast("double").alias("lo_cut"),
                 F.min("hi_cut").cast("double").alias("hi_cut"),
                 F.count(F.lit(1)).alias("n_kept"),
                 (F.sum(dec("l_extendedprice", 12, 2)).cast("double")
                  / F.count(F.lit(1))).alias("avg_price_winsor")))


# ---------------------------------------------------------------------------
# Fixed-width histogram: the profiling binning pass (one scan, one
# map-side-combinable groupBy on the bin id). Bin edges are literals,
# the bin id is floor of one double division (identical IEEE op in
# both engines), and the top bin clamps the tail — no percentile
# estimation, no data-dependent edges.
# ---------------------------------------------------------------------------

HISTOGRAM_ORACLE = """
SELECT CAST(LEAST(FLOOR(l_extendedprice / 5000), 19) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
FROM lineitem GROUP BY 1
"""


@register("q_histogram", HISTOGRAM_ORACLE,
          "fixed-width histogram of l_extendedprice (20 bins, clamped "
          "tail): single-scan profiling binning")
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_id = F.least(F.floor(F.col("l_extendedprice") / 5000), F.lit(19))
    return (li.groupBy(bin_id.cast("long").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("l_extendedprice").cast("double").alias("lo"),
                 F.max("l_extendedprice").cast("double").alias("hi")))


# ---------------------------------------------------------------------------
# PII scrubbing: the redaction pass a corpus runs before training.
# The synthetic fixture carries no PII, so each doc deterministically
# gains one email and (on even ids) one phone number, then the scrub
# removes them — the catalog entry proves the full inject→detect→
# redact→verify loop with both engines running the identical regexes
# (patterns kept to the portable common subset of Java regex and
# RE2: character classes, counted repeats, no lookaround).
# ---------------------------------------------------------------------------

PII_ORACLE = """
WITH seeded AS (
  SELECT doc_id, lang,
         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         '@example.com' ||
         CASE WHEN doc_id % 2 = 0
              THEN ' or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                   || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS text
  FROM documents
), scrubbed AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))
           AS n_emails,
         len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
           AS n_phones,
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                          '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
  FROM seeded
)
SELECT lang,
       CAST(SUM(n_emails) AS BIGINT) AS n_emails,
       CAST(SUM(n_phones) AS BIGINT) AS n_phones,
       CAST(SUM(CASE WHEN regexp_matches(clean, '@|[0-9]{3}-[0-9]{3}-[0-9]{4}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_residual,
       CAST(SUM(len(clean)) AS BIGINT) AS total_clean_chars
FROM scrubbed GROUP BY lang
"""


@register("q_pii_scrub", PII_ORACLE,
          "PII scrubbing: inject deterministic emails/phones, redact "
          "with portable regexes, verify zero residual matches")
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    phone = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit(" or 555-"),
                 F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                 F.lit("-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    ).otherwise(F.lit(""))
    seeded = d.select(
        "doc_id", "lang",
        F.concat(F.col("text"), F.lit(" contact user"),
                 F.col("doc_id").cast("string"), F.lit("@example.com"),
                 phone).alias("text"))
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    phone_re = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    clean = F.regexp_replace(
        F.regexp_replace("text", email_re, "<EMAIL>"),
        phone_re, "<PHONE>")
    scrubbed = seeded.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0)))
         .alias("n_phones"),
        clean.alias("clean"))
    residual = (F.col("clean").rlike("@")
                | F.col("clean").rlike(phone_re)).cast("long")
    return (scrubbed.groupBy("lang")
            .agg(F.sum("n_emails").cast("long").alias("n_emails"),
                 F.sum("n_phones").cast("long").alias("n_phones"),
                 F.sum(residual).alias("n_residual"),
                 F.sum(F.length("clean")).cast("long")
                  .alias("total_clean_chars")))


# ---------------------------------------------------------------------------
# Robust outlier detection: per-group MAD (median absolute deviation)
# z-scores — the heavy-tail-safe alternative to the mean/stddev
# z-score (one contaminated decade of prices moves a mean; it barely
# moves a median). Two exact-median passes, each via
# operators.percentiles.exact_grouped_percentile: approx-percentile
# brackets + strict-below anchors + local refinement over bracket
# rows only — per-task state is bounded by the bracket width
# (~0.4% of a group), NOT the whole group, so the 3-value returnflag
# key never concentrates a full sort on 3 tasks (the holistic
# `percentile` aggregate it replaces did exactly that). The medians
# are exact interpolating percentiles (≡ DuckDB `quantile_cont`,
# same interpolation formula as Spark's own `percentile`), and the
# robust-z comparison is fixed IEEE arithmetic over identical
# doubles, so the flagged SET matches the oracle exactly.
# ---------------------------------------------------------------------------

MAD_ORACLE = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag
),
mad AS (
  SELECT l.l_returnflag,
         quantile_cont(ABS(l.l_extendedprice - m.med), 0.5) AS mad
  FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
  GROUP BY l.l_returnflag
)
SELECT l.l_returnflag,
       COUNT(*) AS n_rows,
       ROUND(MAX(m.med), 6) AS med,
       ROUND(MAX(d.mad), 6) AS mad,
       COUNT(CASE WHEN ABS(l.l_extendedprice - m.med)
                       > 3 * 1.4826 * d.mad THEN 1 END) AS n_outliers
FROM lineitem l
JOIN med m ON l.l_returnflag = m.l_returnflag
JOIN mad d ON l.l_returnflag = d.l_returnflag
GROUP BY l.l_returnflag
"""


@register("q_mad_outliers", MAD_ORACLE,
          "robust per-group outliers via MAD z-score: two exact-"
          "median passes (bracket-refined order statistics, bounded "
          "per-task state), flag |x-med| > 3*1.4826*MAD")
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import exact_grouped_percentile
    li = load_table(spark, sf_dir, "lineitem")
    # n_groups-row results consumed by several downstream jobs: the
    # MAD machinery scans its source ~3× and the final aggregate joins
    # both — without the checkpoint each of those re-executes the full
    # median bracket pipeline (the r16 before-plan shows the duplicated
    # subtree), turning 2 medians into ~7 (guide §3.3: materialize a
    # reused intermediate to truncate the plan)
    med = exact_grouped_percentile(
        li.select("l_returnflag", "l_extendedprice"),
        "l_returnflag", "l_extendedprice", [0.5],
        out_cols=["med"]).localCheckpoint(eager=False)
    with_med = li.join(F.broadcast(med), "l_returnflag")
    dev_src = with_med.select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"))
    mad = exact_grouped_percentile(dev_src, "l_returnflag", "adev",
                                   [0.5], out_cols=["mad"]) \
        .localCheckpoint(eager=False)
    dev = F.abs(F.col("l_extendedprice") - F.col("med"))
    return (with_med.join(F.broadcast(mad), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.max("med"), 6).alias("med"),
                 F.round(F.max("mad"), 6).alias("mad"),
                 F.count(F.when(dev > 3 * 1.4826 * F.col("mad"), 1))
                  .alias("n_outliers")))


# ---------------------------------------------------------------------------
# Distribution drift (PSI): the monitoring gate every training-data
# pipeline runs between a reference slice and a candidate slice.
# Reference = events before Jan 20, candidate = after. The reference
# slice's exact deciles (one holistic percentile aggregate → a 1-row
# broadcast of 9 boundaries) bucket BOTH slices; PSI is
# Σ (p_cand − p_ref)·ln(p_cand/p_ref) over the 10 buckets, where the
# per-bucket proportions are exact counts over exact boundaries. One
# ln per bucket, rounded to 9 decimals and decimal-summed (the
# transcendental discipline); everything else is integer counting and
# fixed IEEE division, so both engines produce identical bits.
# ---------------------------------------------------------------------------

DRIFT_ORACLE = """
WITH ref AS (
  SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-20'
),
cand AS (
  SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-20'
),
bounds AS (
  SELECT quantile_cont(value, 0.1) AS b1, quantile_cont(value, 0.2) AS b2,
         quantile_cont(value, 0.3) AS b3, quantile_cont(value, 0.4) AS b4,
         quantile_cont(value, 0.5) AS b5, quantile_cont(value, 0.6) AS b6,
         quantile_cont(value, 0.7) AS b7, quantile_cont(value, 0.8) AS b8,
         quantile_cont(value, 0.9) AS b9
  FROM ref
),
bucketed AS (
  SELECT 'ref' AS side, CASE
      WHEN value <= b1 THEN 1 WHEN value <= b2 THEN 2 WHEN value <= b3 THEN 3
      WHEN value <= b4 THEN 4 WHEN value <= b5 THEN 5 WHEN value <= b6 THEN 6
      WHEN value <= b7 THEN 7 WHEN value <= b8 THEN 8 WHEN value <= b9 THEN 9
      ELSE 10 END AS bucket
  FROM ref CROSS JOIN bounds
  UNION ALL
  SELECT 'cand', CASE
      WHEN value <= b1 THEN 1 WHEN value <= b2 THEN 2 WHEN value <= b3 THEN 3
      WHEN value <= b4 THEN 4 WHEN value <= b5 THEN 5 WHEN value <= b6 THEN 6
      WHEN value <= b7 THEN 7 WHEN value <= b8 THEN 8 WHEN value <= b9 THEN 9
      ELSE 10 END
  FROM cand CROSS JOIN bounds
),
props AS (
  SELECT bucket,
         CAST(COUNT(CASE WHEN side = 'ref' THEN 1 END) AS DOUBLE)
           / (SELECT COUNT(*) FROM ref) AS p_ref,
         CAST(COUNT(CASE WHEN side = 'cand' THEN 1 END) AS DOUBLE)
           / (SELECT COUNT(*) FROM cand) AS p_cand
  FROM bucketed GROUP BY bucket
)
SELECT bucket, ROUND(p_ref, 6) AS p_ref, ROUND(p_cand, 6) AS p_cand,
       ROUND(CAST(CAST(ROUND((p_cand - p_ref) * ln(p_cand / p_ref), 9)
                  AS DECIMAL(20,9)) AS DOUBLE), 6) AS psi_term
FROM props
"""


@register("q_distribution_drift", DRIFT_ORACLE,
          "PSI distribution drift between time slices: exact ref-"
          "slice deciles as a 1-row broadcast bucket both slices; "
          "per-bucket proportions + round-9 PSI terms")
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    ref = e.filter(F.col("ts") < cutoff).select("value")
    cand = e.filter(~(F.col("ts") < cutoff)).select("value")
    bounds = ref.agg(*[
        F.expr(f"percentile(value, {q/10})").alias(f"b{q}")
        for q in range(1, 10)])

    def bucket():
        c = F.when(F.col("value") <= F.col("b1"), 1)
        for i in range(2, 10):
            c = c.when(F.col("value") <= F.col(f"b{i}"), i)
        return c.otherwise(10)

    both = (ref.withColumn("side", F.lit("ref"))
            .unionAll(cand.withColumn("side", F.lit("cand")))
            .crossJoin(F.broadcast(bounds))
            .select("side", bucket().alias("bucket")))
    n_ref, n_cand = ref.count(), cand.count()
    props = (both.groupBy("bucket")
             .agg((F.count(F.when(F.col("side") == "ref", 1)).cast("double")
                   / n_ref).alias("p_ref"),
                  (F.count(F.when(F.col("side") == "cand", 1)).cast("double")
                   / n_cand).alias("p_cand")))
    psi = F.round((F.col("p_cand") - F.col("p_ref"))
                  * F.log(F.col("p_cand") / F.col("p_ref")), 9) \
        .cast("decimal(20,9)")
    return props.select("bucket",
                        F.round("p_ref", 6).alias("p_ref"),
                        F.round("p_cand", 6).alias("p_cand"),
                        F.round(psi.cast("double"), 6).alias("psi_term"))


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns — the feature-
# relevance screen (how much does knowing returnflag tell you about
# linestatus): MI = Σ p(x,y)·ln(p(x,y)·N² / (c(x)·c(y)·N)). All
# probabilities are exact integer counts over one grouped pass plus
# two broadcast marginals; the single ln per cell follows the round-9
# decimal discipline. Output per cell so the driver hash checks every
# term, not just the scalar.
# ---------------------------------------------------------------------------

MUTUAL_INFO_ORACLE = """
WITH joint AS (
  SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS cxy
  FROM lineitem GROUP BY 1, 2
),
mx AS (SELECT x, SUM(cxy) AS cx FROM joint GROUP BY x),
my AS (SELECT y, SUM(cxy) AS cy FROM joint GROUP BY y),
n AS (SELECT SUM(cxy) AS n FROM joint)
SELECT j.x, j.y, j.cxy,
       CAST(CAST(ROUND(
         (CAST(j.cxy AS DOUBLE) / n.n)
         * ln(CAST(j.cxy AS DOUBLE) * n.n
              / (CAST(mx.cx AS DOUBLE) * my.cy)), 9)
         AS DECIMAL(20,9)) AS DOUBLE) AS mi_term
FROM joint j
JOIN mx ON j.x = mx.x JOIN my ON j.y = my.y CROSS JOIN n
"""


@register("q_mutual_information", MUTUAL_INFO_ORACLE,
          "mutual information between returnflag and linestatus: one "
          "joint-count pass + broadcast marginals, round-9 ln terms "
          "emitted per cell")
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    joint = (li.groupBy(F.col("l_returnflag").alias("x"),
                        F.col("l_linestatus").alias("y"))
             .agg(F.count(F.lit(1)).alias("cxy"))
             .localCheckpoint(eager=False))  # feeds marginals + result
    mx = joint.groupBy("x").agg(F.sum("cxy").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("cxy").alias("cy"))
    n = joint.agg(F.sum("cxy").alias("n"))
    term = F.round(
        (F.col("cxy").cast("double") / F.col("n"))
        * F.log(F.col("cxy").cast("double") * F.col("n")
                / (F.col("cx").cast("double") * F.col("cy"))), 9) \
        .cast("decimal(20,9)")
    return (joint.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(n))
            .select("x", "y", "cxy",
                    term.cast("double").alias("mi_term")))


# ---------------------------------------------------------------------------
# Gini coefficient of supplier account balances per nation — the
# inequality/skew diagnostic (how concentrated is capacity within
# each nation). Exact rank formula G = Σ(2i − n − 1)·x_i / (n²·μ)
# over per-nation ascending ranks: the rank window is PARTITIONED BY
# nation (bounded groups, never global), balances shift to be
# non-negative per the standard min-shift convention, and the
# rank-weighted sum crosses the agg as DECIMAL so partial order can't
# move a bit. Degenerate all-equal groups define G = 0.
#
# GROUP-CARDINALITY ASSUMPTION: exact Gini inherently needs each
# value's within-group rank, so each of the 25 nation partitions
# sorts in one task — fine here because supplier is the DIMENSION-
# side table (≈n/25 rows per reducer at any SF). Do not lift this
# shape onto a fact table keyed by a handful of values; that is the
# q_outlier_trim hazard. A fact-scale exact Gini would anchor ranks
# with the bracket machinery in operators/percentiles.py.
# ---------------------------------------------------------------------------

GINI_ORACLE = """
WITH ranked AS (
  SELECT s_nationkey,
         s_acctbal - MIN(s_acctbal) OVER (PARTITION BY s_nationkey) AS x,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal, s_suppkey) AS i,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS n
  FROM supplier
),
agg AS (
  SELECT s_nationkey, MAX(n) AS n,
         SUM(CAST((2 * i - n - 1) AS DECIMAL(18,2))
             * CAST(ROUND(x, 2) AS DECIMAL(18,2))) AS num,
         SUM(CAST(ROUND(x, 2) AS DECIMAL(18,2))) AS tot
  FROM ranked GROUP BY s_nationkey
)
SELECT s_nationkey, n,
       CASE WHEN CAST(tot AS DOUBLE) = 0 THEN 0.0
            ELSE ROUND(CAST(num AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6)
       END AS gini
FROM agg
"""


@register("q_gini_by_group", GINI_ORACLE,
          "per-nation Gini of supplier balances: key-partitioned rank "
          "window, min-shifted values, decimal rank-weighted sum")
def q_gini_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    s = load_table(spark, sf_dir, "supplier")
    wp = Window.partitionBy("s_nationkey")
    wr = wp.orderBy("s_acctbal", "s_suppkey")
    ranked = s.select(
        "s_nationkey",
        (F.col("s_acctbal") - F.min("s_acctbal").over(wp)).alias("x"),
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"))
    xd = F.round(F.col("x"), 2).cast("decimal(18,2)")
    agg = (ranked.groupBy("s_nationkey")
           .agg(F.max("n").alias("n"),
                F.sum((2 * F.col("i") - F.col("n") - 1)
                      .cast("decimal(18,2)") * xd).alias("num"),
                F.sum(xd).alias("tot")))
    gini = F.when(F.col("tot").cast("double") == 0, F.lit(0.0)) \
        .otherwise(F.round(F.col("num").cast("double")
                           / (F.col("n").cast("double")
                              * F.col("tot").cast("double")), 6))
    return agg.select("s_nationkey", "n", gini.alias("gini"))


# ---------------------------------------------------------------------------
# Weighted median: the price point at which half the QUANTITY (not
# half the rows) has traded, per returnflag — the holistic aggregate
# procurement/pricing reports actually want. The oracle states the
# classic running-window form; the engine side refuses that plan (a
# running window partitioned by the 3-value returnflag sorts the
# whole table on 3 reducers) and instead uses
# operators.percentiles.grouped_weighted_median: approx price-bucket
# boundaries (tiny broadcast) → per-(group,bucket) exact weight sums
# → running sum over ≤32 rows/group finds the crossing bucket → the
# running-weight window runs over that ONE bucket's rows only.
# Integer quantities make every comparison exact, and the crossing
# VALUE is invariant to tie-break order among equal prices, so the
# bucketed refinement reproduces the oracle bit-for-bit.
# ---------------------------------------------------------------------------

WEIGHTED_MEDIAN_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS price,
         CAST(l_quantity AS BIGINT) AS qty,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_qty,
       ROUND(MIN(CASE WHEN 2 * cum >= tot THEN price END), 6)
         AS weighted_median_price
FROM w GROUP BY l_returnflag
"""


@register("q_weighted_median", WEIGHTED_MEDIAN_ORACLE,
          "quantity-weighted median price per returnflag: bucketed "
          "first-crossing refinement (bounded per-task state, no "
          "whole-group running window); exact integer weights")
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import grouped_weighted_median
    li = load_table(spark, sf_dir, "lineitem")
    med = grouped_weighted_median(li, "l_returnflag", "l_extendedprice",
                                  F.col("l_quantity"))
    return med.select(
        "l_returnflag", F.col("total_weight").alias("total_qty"),
        F.round("weighted_median", 6).alias("weighted_median_price"))


# ---------------------------------------------------------------------------
# Exact grouped quartiles — the direct catalog exposure of
# operators/percentiles.py::exact_grouped_percentile's multi-prob
# path (q_mad_outliers uses it twice at p=0.5; this query proves the
# general [0.25, 0.5, 0.75] form against DuckDB's quantile_cont).
# Each cut is an exact interpolating order statistic computed from an
# approx bracket + strict-below anchor + refinement over bracket rows
# only — per-task state is ~0.4% of a group, so the 5-value
# o_orderpriority key never concentrates a full sort. Both engines
# round to 6 decimals: the interpolation arithmetic
# ((hi-pos)·v_lo + (pos-lo)·v_hi vs DuckDB's v_lo + frac·(v_hi-v_lo))
# can differ in the last ulp.
# ---------------------------------------------------------------------------

EXACT_DECILES_ORACLE = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS q1,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS q2,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS q3
FROM orders GROUP BY o_orderpriority
"""


@register("q_exact_quartiles", EXACT_DECILES_ORACLE,
          "exact interpolating quartiles per order priority via the "
          "bracket-refine operator (multi-prob path): bounded "
          "per-task state, no holistic percentile aggregate")
def q_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import exact_grouped_percentile
    o = load_table(spark, sf_dir, "orders")
    cuts = exact_grouped_percentile(
        o.select("o_orderpriority", "o_totalprice"),
        "o_orderpriority", "o_totalprice", [0.25, 0.5, 0.75],
        out_cols=["q1", "q2", "q3"])
    return cuts.select("o_orderpriority",
                       F.round("q1", 6).alias("q1"),
                       F.round("q2", 6).alias("q2"),
                       F.round("q3", 6).alias("q3"))
