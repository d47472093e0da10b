"""Skew-mitigation operators: salted aggregation and salted broadcast
join. AQE's skew-join handles sort-merge skew automatically (enabled in
session.py); salting is the explicit tool for aggregation hot keys and
for cases where a single key exceeds one executor's memory.

The two-stage salted aggregation: rows get a random-but-deterministic
salt, partial-aggregate on (key, salt) — spreading a hot key over N
reducers — then final-aggregate on key. Results are identical to the
direct groupBy (verified by oracle in plans/scale_demo.py); only the
shuffle distribution changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, n_salts: int,
               partials: list[tuple[Column, str]],
               finals: Callable[[], list[Column]]) -> DataFrame:
    """Two-stage aggregation over a skewed key.

    `partials`: (aggregate expression, alias) pairs computed per
    (key, salt); `finals()`: columns combining the partial aliases to
    the final values (e.g. sum of partial sums, sum of partial counts).
    """
    salt = (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts)
    partial = (df.withColumn("__salt", salt)
                 .groupBy(key, "__salt")
                 .agg(*[expr.alias(name) for expr, name in partials]))
    return partial.groupBy(key).agg(*finals())


def salted_sum_count(df: DataFrame, key: str, value: Column,
                     n_salts: int = 16) -> DataFrame:
    """Common case: exact sum + count of a (possibly skewed) key."""
    return salted_agg(
        df, key, n_salts,
        partials=[(F.sum(value), "ps"), (F.count(F.lit(1)), "pc")],
        finals=lambda: [F.sum("ps").alias("sum_value"),
                        F.sum("pc").alias("n_rows")])
