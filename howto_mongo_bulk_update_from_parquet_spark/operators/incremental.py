"""Incremental aggregate maintenance: merge a delta batch into a
persisted aggregate state instead of rescanning the base table — the
materialized-view refresh pattern that turns a 100 TB daily rollup
into a scan of yesterday's partition only.

State rows carry decomposable accumulators (count, decimal sum,
min, max); merging is a full-outer join on the group key + per-column
combination. Decimal sums make the merge EXACT: base ⊕ delta is
bit-identical to a full recompute regardless of how history was
sliced into batches (associativity proven by the property test and by
the catalog oracle, which IS the full recompute). Averages and other
derived measures are computed from the merged accumulators at read
time — never stored, so they stay consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(df: DataFrame, group_cols: list[str],
                    value_col: str) -> DataFrame:
    """Decomposable accumulators for `value_col` per group."""
    return (df.groupBy(*group_cols)
            .agg(F.count(value_col).alias("n"),
                 F.sum(F.col(value_col).cast("decimal(28,6)")).alias("s"),
                 F.min(value_col).alias("mn"),
                 F.max(value_col).alias("mx")))


def merge_agg_state(base: DataFrame, delta: DataFrame,
                    group_cols: list[str]) -> DataFrame:
    """base ⊕ delta — associative, commutative, null-safe on either
    side (a group new to the delta or absent from it passes through)."""
    b = base.select(*group_cols,
                    *[F.col(c).alias(f"b_{c}") for c in ("n", "s", "mn", "mx")])
    d = delta.select(*group_cols,
                     *[F.col(c).alias(f"d_{c}") for c in ("n", "s", "mn", "mx")])
    j = b.join(d, list(group_cols), "full_outer")
    zero_n = F.coalesce(F.col("b_n"), F.lit(0)) + F.coalesce(F.col("d_n"),
                                                             F.lit(0))
    s_sum = F.when(F.col("b_s").isNull(), F.col("d_s")) \
             .when(F.col("d_s").isNull(), F.col("b_s")) \
             .otherwise(F.col("b_s") + F.col("d_s"))
    return j.select(
        *group_cols,
        zero_n.alias("n"),
        s_sum.alias("s"),
        F.least("b_mn", "d_mn").alias("mn"),   # least/greatest skip NULLs
        F.greatest("b_mx", "d_mx").alias("mx"))


def read_view(state: DataFrame) -> DataFrame:
    """Derived measures from accumulators (avg computed, not stored)."""
    return state.select(
        *[c for c in state.columns if c not in ("n", "s", "mn", "mx")],
        F.col("n").alias("n_rows"),
        F.col("s").cast("double").alias("sum_value"),
        # double-divide the EXACT sum (not decimal division, whose
        # result scale differs between engines)
        (F.col("s").cast("double") / F.col("n")).alias("avg_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"))
