"""Snapshot diff (CDC): what changed between two keyed snapshots —
inserted / deleted / updated keys with their before/after payloads.

Pairs with the keyed table's retained versions
(`read_keyed_table(path, version=N)`): diff any two committed
snapshots to produce a change feed after the fact, without having
captured one at write time.

Scale notes: one full-outer sort-merge join on the key — the same
shuffle the merge itself costs; change classification is pure
projection. Payload comparison is null-safe (`<=>`), so NULL→value
and value→NULL both classify as `updated`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_snapshots(old: DataFrame, new: DataFrame, key: str,
                   payload: list[str] | None = None) -> DataFrame:
    """(key, change, <col>_old, <col>_new ...) for keys that differ.

    change ∈ {'inserted', 'deleted', 'updated'}; unchanged keys are
    dropped. Columns present in only one snapshot are compared as NULL
    on the missing side (schema evolution shows up as `updated`)."""
    payload = payload or sorted(
        (set(old.columns) | set(new.columns)) - {key})

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(key).alias(f"__k_{tag}")]
        for c in payload:
            cols.append((F.col(c) if c in df.columns
                         else F.lit(None)).alias(f"{c}_{tag}"))
        return df.select(*cols)

    j = side(old, "old").join(side(new, "new"),
                              F.col("__k_old") == F.col("__k_new"),
                              "full_outer")
    any_changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new")) for c in payload])
    change = (F.when(F.col("__k_old").isNull(), "inserted")
              .when(F.col("__k_new").isNull(), "deleted")
              .when(any_changed, "updated"))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(F.coalesce("__k_old", "__k_new").alias(key), "change",
                    *[c for p in payload
                      for c in (f"{p}_old", f"{p}_new")]))
