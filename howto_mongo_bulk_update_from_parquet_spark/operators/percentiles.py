"""Scale-safe EXACT grouped percentiles and weighted medians.

Spark's holistic aggregates (``percentile``, and the running-window
weighted-median idiom) buffer an entire group's values in one task:
grouped by a low-cardinality key (3 returnflags, 5 event types) that
is a full-table sort on 3 reducers — the skewed-key hazard this repo
documents on q_outlier_trim. This module generalizes the
approx-bracket + exact-refinement machinery proven in
``q_winsorize_bounds`` (plans/quality.py) into reusable operators:

- :func:`exact_grouped_percentile` — exact *interpolating* quantiles
  (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` semantics) per
  group, with per-task state bounded by the bracket width
  (~0.004·n_group + GK error) instead of the whole group.
- :func:`grouped_weighted_median` — the first value whose running
  WEIGHT reaches half the group total, refined inside one
  approx-quantile bucket (~n_group/n_buckets rows) instead of a
  running-sum window over the whole group.

Shared recipe (three bounded passes over the input, all
map-side-combinable aggregations plus windows over bracket/bucket
rows only):

1. one groupBy computes n (or total weight) and approx brackets
   (Greenwald–Khanna at accuracy 1e4 bounds rank error by 1e-4·n, so
   a ±0.002 probability bracket provably contains the target rank for
   n ≳ 1100; smaller groups fall back to a whole-group bracket —
   still exact, trivially bounded);
2. one groupBy anchors the bracket's global rank (strict-below
   count / below-bucket running weight);
3. rank/accumulate ONLY bracket rows (window partitioned by group,
   over ~0.4% of the group) and read the value at the exact target.

Ties are safe: equal values are interchangeable at a rank boundary
and the crossing value of a weighted median does not depend on
tie-break order among equal values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SMALL_N = 5000          # below this, bracket = whole group (still exact)
_BRACKET_EPS = 0.002     # probability half-width of the approx bracket
_GK_ACCURACY = 10000     # percentile_approx accuracy (rank err ≤ n/this)


def exact_grouped_percentile(df: DataFrame, group_col: str,
                             value_col: str, probs: list[float],
                             out_cols: list[str] | None = None,
                             small_n: int = _SMALL_N) -> DataFrame:
    """Exact interpolating percentiles per group, without holistic
    per-group state.

    Returns one row per group: (group_col, out_cols[i]...), where
    out_cols[i] is the exact continuous quantile at probs[i] —
    bit-matching Spark's ``percentile``: position = (n-1)·p,
    value = (ceil(pos)-pos)·v[floor(pos)] + (pos-floor(pos))·v[ceil(pos)]
    over the ascending 0-indexed order statistics.

    NULL values are ignored (matching Spark's ``percentile``, DuckDB's
    ``quantile_cont``, and ``percentile_approx``): they are filtered
    before n is counted, so the target position, the strict-below
    anchors, and the refinement ranks all agree with the built-ins. A
    group whose values are all NULL disappears from the output (the
    built-ins would return NULL for it).
    """
    if out_cols is None:
        out_cols = [f"p_{str(p).replace('.', '_')}" for p in probs]
    assert len(out_cols) == len(probs)
    v = F.col(value_col)
    src = df.select(group_col, value_col).filter(v.isNotNull())

    # pass 1: per-group n + a value bracket around every requested prob
    flat = []
    for p in probs:
        flat += [max(p - _BRACKET_EPS, 0.0), min(p + _BRACKET_EPS, 1.0)]
    stats_cols = [F.count(F.lit(1)).alias("n"),
                  F.percentile_approx(v, flat, _GK_ACCURACY).alias("ap")]
    stats = src.groupBy(group_col).agg(*stats_cols)
    sel = [F.col(group_col), F.col("n"),
           (F.col("n") < small_n).alias("small")]
    for i, p in enumerate(probs):
        # 0-indexed continuous position and its straddling ranks
        pos = (F.col("n") - 1).cast("double") * F.lit(float(p))
        sel += [F.col("ap")[2 * i].alias(f"br_lo_{i}"),
                F.col("ap")[2 * i + 1].alias(f"br_hi_{i}"),
                F.floor(pos).alias(f"rk_lo_{i}"),
                F.ceil(pos).alias(f"rk_hi_{i}"),
                pos.alias(f"pos_{i}")]
    # nb/below are n_groups-row frames consumed by several broadcast
    # builds — checkpoint cuts the lineage so the GK sketch and the
    # anchor scan each run ONCE, not once per downstream job
    nb = stats.select(*sel).localCheckpoint(eager=False)
    j = src.join(F.broadcast(nb), group_col)

    # pass 2: strict-below anchors (0 on the whole-group fallback path)
    anchor_aggs = [
        F.sum(F.when((v < F.col(f"br_lo_{i}")) & ~F.col("small"), 1)
              .otherwise(0)).alias(f"n_lt_{i}")
        for i in range(len(probs))]
    below = j.groupBy(group_col).agg(*anchor_aggs) \
        .localCheckpoint(eager=False)

    # pass 3: per prob, rank only bracket rows; global 0-indexed rank
    # = (local row_number - 1) + strict-below anchor. The window
    # partition holds only the bracket (or a <small_n whole group).
    out = None
    wv = Window.partitionBy(group_col).orderBy(value_col)
    for i in range(len(probs)):
        nbr = j.filter(F.col("small")
                       | ((v >= F.col(f"br_lo_{i}"))
                          & (v <= F.col(f"br_hi_{i}"))))
        r = (nbr.withColumn("lrn", F.row_number().over(wv))
             .join(F.broadcast(below), group_col))
        grk = F.col("lrn") - 1 + F.col(f"n_lt_{i}")
        hit = r.filter((grk == F.col(f"rk_lo_{i}"))
                       | (grk == F.col(f"rk_hi_{i}")))
        vals = (hit.groupBy(group_col).agg(
            F.min(F.when(grk == F.col(f"rk_lo_{i}"), v)).alias("v_lo"),
            F.min(F.when(grk == F.col(f"rk_hi_{i}"), v)).alias("v_hi"),
            F.first(f"rk_lo_{i}").alias("rk_lo"),
            F.first(f"rk_hi_{i}").alias("rk_hi"),
            F.first(f"pos_{i}").alias("pos")))
        # Spark Percentile.getPercentile interpolation, reproduced
        # exactly: same operand order, same IEEE ops
        val = F.when(
            F.col("rk_hi") == F.col("rk_lo"), F.col("v_lo")
        ).otherwise(
            (F.col("rk_hi").cast("double") - F.col("pos")) * F.col("v_lo")
            + (F.col("pos") - F.col("rk_lo").cast("double")) * F.col("v_hi"))
        piece = vals.select(group_col, val.alias(out_cols[i]))
        out = piece if out is None else out.join(piece, group_col)
    return out


def grouped_weighted_median(df: DataFrame, group_col: str,
                            value_col: str, weight_col,
                            n_buckets: int = 16) -> DataFrame:
    """Weighted median per group: the smallest value v such that the
    cumulative weight of rows with value ≤ v reaches half the group
    total — computed with per-task state bounded by one approx-
    quantile bucket, never a running window over the whole group.

    ``weight_col`` may be a name or a Column; it must be integral
    (cast to long) so every comparison is exact. Returns
    (group_col, total_weight, weighted_median) — weighted_median is
    the raw crossing value (no rounding; callers round for display).

    Plan shape: approx bucket boundaries per group (tiny broadcast) →
    codegen bucket id (unrolled comparisons — no higher-order
    function fallback) → per-(group, bucket) weight sums → running
    sum over ≤n_buckets rows per group → refine the crossing bucket's
    rows only. Value-tie pileups can inflate one bucket (boundaries
    are data values); the refinement window is then bounded by the
    largest tie class + bucket width, and correctness is unaffected.
    """
    w = (F.col(weight_col) if isinstance(weight_col, str)
         else weight_col).cast("long")
    v = F.col(value_col)
    src = df.select(group_col, value_col, w.alias("__w"))

    # boundary precision does NOT affect correctness (anchors come
    # from exact per-bucket weight sums; boundaries only balance the
    # buckets), so a cheap low-accuracy sketch suffices — accuracy
    # 10000 here cost ~3x the whole query at sf0.1
    qs = [i / n_buckets for i in range(1, n_buckets)]
    stats = (src.groupBy(group_col).agg(
        F.sum("__w").alias("tot"),
        F.percentile_approx(v, qs, 500).alias("bnd"))
        .localCheckpoint(eager=False))   # n_groups rows, reused 3×
    j = src.join(F.broadcast(stats), group_col)

    # bucket id: number of boundaries strictly below the value —
    # unrolled integer sum (codegen) rather than F.aggregate (fallback)
    bucket = F.lit(0)
    for i in range(n_buckets - 1):
        bucket = bucket + (v > F.col("bnd")[i]).cast("int")
    per_bucket = (j.groupBy(group_col, bucket.alias("__b"))
                  .agg(F.sum("__w").alias("wb"),
                       F.max("tot").alias("tot")))

    # running weight over ≤ n_buckets rows per group; the crossing
    # bucket is the first with 2·run ≥ tot, its anchor the weight
    # strictly below it
    wrun = (Window.partitionBy(group_col).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = per_bucket.withColumn("run", F.sum("wb").over(wrun))
    crossing = (runs.filter(2 * F.col("run") >= F.col("tot"))
                .groupBy(group_col)
                .agg(F.min_by(F.struct("__b", "run", "wb", "tot"),
                              "__b").alias("c"))
                .select(group_col, F.col("c.__b").alias("__bs"),
                        (F.col("c.run") - F.col("c.wb")).alias("anchor"),
                        F.col("c.tot").alias("__t"))
                .localCheckpoint(eager=False))

    # refine inside the crossing bucket only. The broadcast join is on
    # the plain group column with the bucket match as a FILTER — a
    # hash join keyed on the unrolled bucket expression made janino
    # compile the probe stage for ~8 s (one-time, but charged to every
    # fresh session); the filter form generates a fraction of the code
    # for the identical row set.
    ref = (j.join(F.broadcast(crossing), group_col)
           .filter(bucket == F.col("__bs")))
    wloc = (Window.partitionBy(group_col).orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.col("anchor") + F.sum("__w").over(wloc)
    med = (ref.withColumn("cum", cum)
           .filter(2 * F.col("cum") >= F.col("__t"))
           .groupBy(group_col)
           .agg(F.min(value_col).alias("weighted_median"),
                F.max("__t").alias("total_weight")))
    return med.select(group_col, "total_weight", "weighted_median")
