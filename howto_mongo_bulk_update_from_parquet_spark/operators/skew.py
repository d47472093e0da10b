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


def salted_join(big: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16, salt_on: Column | None = None) -> DataFrame:
    """Skew-safe equi-join of a big fact side against a small-but-not-
    broadcastable dim: the fact side gets a deterministic salt, the dim
    side is replicated once per salt, and the join key becomes
    (key, salt) — a hot key's rows spread over `n_salts` reducers
    instead of landing on one. Row-identical to the plain join (the
    salt never reaches the output); only shuffle distribution changes.

    `salt_on` picks the salting expression. The default is a
    ROW-POSITION salt (`crc32(monotonically_increasing_id())`, the
    same spread salted_agg uses), NOT a content hash: a content hash
    maps fully-duplicated fact rows — the common shape of hot-key
    skew — all to ONE salt, putting the hot key right back on a
    single reducer, and it fails outright on un-hashable column types
    (MapType). The position salt spreads duplicates uniformly and is
    output-safe because the salt never reaches the result (join
    output is row-identical for ANY salt assignment).
    The dim replication multiplies the dim by n_salts — the technique
    only pays when |dim| × n_salts ≪ |big|, the usual regime for a
    medium dim over the broadcast threshold."""
    spark = big.sparkSession
    salt = (salt_on if salt_on is not None
            else F.crc32(F.monotonically_increasing_id().cast("string"))
            % n_salts)
    fact = big.withColumn("__salt", salt.cast("int"))
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    dim_r = dim.crossJoin(salts)
    # SHUFFLE_HASH pins the shuffle path (the scenario salting exists
    # for); without it a tiny test dim would auto-broadcast and the
    # salted shape would never see an exchange.
    out = fact.join(dim_r.hint("SHUFFLE_HASH"), [key, "__salt"])
    return out.drop("__salt")
