"""Scale-safe grouped top-k — the window-free twin of the
`row_number() <= k` idiom.

The window form sorts each group in one task: fine for bounded
groups, a reducer hot-spot when the group key has a handful of values
over a fact table (the tiny-key hazard the plan sweep polices). This
operator uses the skyline two-stage shape instead
(operators/skyline.py): a row outside its group's top-k within ANY
subset is outside the global top-k, so

  stage 1 — mapInPandas per Arrow batch keeps each group's local
  top-k: ZERO exchange, output bounded by groups-in-batch × k;
  stage 2 — applyInPandas per group re-ranks the surviving
  ≤ n_batches × k rows and emits ranks 1..k.

Per-task state is bounded by (batch groups × k) in stage 1 and
(input partitions × k) in stage 2 — cluster-shaped, not data-shaped.
Determinism: callers supply tie_cols that make the total order
unique; the kernel sorts (order_col, tie_cols) identically in both
stages.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_topk(df: DataFrame, group_cols: list[str], order_col: str,
                 k: int, tie_cols: list[str] | None = None,
                 ascending: bool = False,
                 rank_col: str = "rn") -> DataFrame:
    """Top-k rows per group by order_col (desc by default), with a
    1-based `rank_col` — equivalent to the row_number window filter,
    without any per-group full sort. Like the window idiom, ALL of
    df's columns survive (payload included) and a NULL group key is
    its own ranked partition (pandas `dropna=False`; Spark's groupBy
    keeps null keys natively)."""
    tie_cols = tie_cols or []
    src = df

    def _sort(pdf: pd.DataFrame) -> pd.DataFrame:
        """Spark's window order: ASC is NULLS FIRST, DESC is NULLS
        LAST — pandas puts NaN last regardless, so order NULLs need
        an explicit na_position. Ties always ascend (NULLS FIRST),
        which can differ from the order column's null placement, so
        sort ties first and re-sort stably on the order column."""
        if tie_cols:
            pdf = pdf.sort_values(tie_cols, ascending=True,
                                  na_position="first", kind="mergesort")
        return pdf.sort_values(
            order_col, ascending=ascending,
            na_position="first" if ascending else "last",
            kind="mergesort")

    def local(batches):
        for pdf in batches:
            if len(pdf):
                yield (_sort(pdf)
                       .groupby(group_cols, sort=False, dropna=False)
                       .head(k))

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _sort(pdf).head(k).reset_index(drop=True)
        out[rank_col] = range(1, len(out) + 1)
        return out

    out_schema = T.StructType(
        list(src.schema.fields) + [T.StructField(rank_col, T.LongType())])
    pruned = src.mapInPandas(local, src.schema)
    return pruned.groupBy(*group_cols).applyInPandas(final, out_schema)
