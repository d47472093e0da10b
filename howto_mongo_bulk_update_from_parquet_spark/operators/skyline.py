"""2-D Pareto skyline (maximize both metrics) as a two-stage
distributed prune.

Scale shape: a point dominated inside ONE partition is dominated
globally, so stage 1 runs the skyline kernel per input partition
(`spark_partition_id` group → applyInPandas, no shuffle of the full
table beyond the grouped-map exchange) and only the per-partition
frontiers — O(frontier size) each, typically O(log n) points for
continuously-distributed metrics — meet in stage 2 for the exact
global skyline. The full table is never sorted globally and never
collected; stage 2's single group is bounded by (n_partitions ×
per-partition frontier), not by the table.

Dominance (ties kept): a dominates b iff a.m1 >= b.m1 AND a.m2 >= b.m2
AND (a.m1 > b.m1 OR a.m2 > b.m2). Exact duplicates dominate nothing
and survive together — the oracle's NOT EXISTS uses the identical
predicate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skyline_kernel(pdf: pd.DataFrame, m1: str, m2: str) -> pd.DataFrame:
    """Exact 2-D maximal points of one pandas batch, vectorized.

    Kept iff m2 equals the max m2 of its own m1-class AND strictly
    exceeds the best m2 of every strictly-higher m1-class (an equal m2
    at higher m1 dominates). Duplicate (m1, m2) rows all survive.
    """
    if pdf.empty:
        return pdf
    gmax = pdf.groupby(m1)[m2].transform("max")
    cand = pdf[pdf[m2] == gmax]
    # class-level frontier: prefix max of class-max m2 over m1 DESC
    classes = (cand[[m1, m2]].drop_duplicates()
               .sort_values(m1, ascending=False))
    prefix = classes[m2].cummax().shift(1)  # best m2 at strictly higher m1
    keep_class = classes[m1][prefix.isna() | (classes[m2] > prefix)]
    return cand[cand[m1].isin(set(keep_class))]


def skyline_2d(df: DataFrame, m1: str, m2: str) -> DataFrame:
    """Exact global skyline of `df` maximizing columns (m1, m2)."""
    schema = df.schema

    def local(batches):
        for pdf in batches:
            if len(pdf):
                yield _skyline_kernel(pdf, m1, m2)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        return _skyline_kernel(pdf.drop(columns="__g"), m1, m2)

    # stage 1: per-BATCH prune via mapInPandas — ZERO exchange (a
    # groupBy(spark_partition_id) formulation would hash-shuffle the
    # whole table just to regroup rows where they already are; a
    # point dominated within any subset is dominated globally, so
    # pruning per Arrow batch is equally sound and stays on the scan)
    pruned = df.mapInPandas(local, schema)
    # stage 2: exact skyline of the small frontier union. The single
    # group is bounded by the summed per-batch frontiers, NOT the
    # table — this is the driver-merge step of every top-k-like op,
    # expressed executor-side.
    return (pruned.withColumn("__g", F.lit(0))
            .groupBy("__g").applyInPandas(final, schema))
