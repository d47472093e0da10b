"""SCD Type-2 history maintenance: apply a source batch to a keyed
history table, closing the current row and opening a new version for
every key whose payload changed — full audit trail, point-in-time
reconstructable.

History schema: key, payload..., valid_from, valid_to (NULL = open),
is_current. The `effective` timestamp is an explicit parameter (a
deterministic domain clock), never the wall clock — replays must
produce identical history.

Scale notes: ONE full-outer join between current rows and the source
(closed rows are untouched and union in unchanged), all-projection
classification — the same single-shuffle shape as the plain merge.
Null-safe (`<=>`) payload comparison so NULL↔value transitions
version correctly.
"""

from __future__ import annotations

import datetime
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(history: DataFrame, source: DataFrame, key: str,
               payload: list[str], *,
               effective: datetime.datetime) -> DataFrame:
    """New history: untouched closed rows + closed-out superseded
    versions + still-current unchanged rows + fresh versions for
    changed/new keys."""
    closed = history.filter(~F.col("is_current"))
    cur = history.filter(F.col("is_current"))

    s = source.select(F.col(key).alias("__sk"),
                      *[F.col(c).alias(f"__s_{c}") for c in payload])
    j = cur.join(s, F.col(key) == F.col("__sk"), "full_outer")
    differs = reduce(lambda a, b: a | b,
                     [~F.col(c).eqNullSafe(F.col(f"__s_{c}")) for c in payload])
    eff = F.lit(effective).cast("timestamp")

    # current rows that survive untouched (key absent from source, or
    # payload identical)
    keep = (j.filter(F.col(key).isNotNull()
                     & (F.col("__sk").isNull() | ~differs))
            .select(*history.columns))
    # current rows superseded by a changed source payload: close them
    close = (j.filter(F.col(key).isNotNull() & F.col("__sk").isNotNull()
                      & differs)
             .select(*[F.col(c) for c in history.columns
                       if c not in ("valid_to", "is_current")],
                     eff.alias("valid_to"), F.lit(False).alias("is_current"))
             .select(*history.columns))
    # fresh versions: changed keys + brand-new keys
    fresh = (j.filter(F.col("__sk").isNotNull()
                      & (F.col(key).isNull() | differs))
             .select(F.col("__sk").alias(key),
                     *[F.col(f"__s_{c}").alias(c) for c in payload],
                     eff.alias("valid_from"),
                     F.lit(None).cast("timestamp").alias("valid_to"),
                     F.lit(True).alias("is_current"))
             .select(*history.columns))
    return closed.unionByName(keep).unionByName(close).unionByName(fresh)


def scd2_init(source: DataFrame, key: str, payload: list[str], *,
              effective: datetime.datetime) -> DataFrame:
    """Bootstrap a history table from the first source batch."""
    return source.select(
        key, *payload,
        F.lit(effective).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"))


def scd2_as_of(history: DataFrame, ts: datetime.datetime) -> DataFrame:
    """Point-in-time snapshot: the version valid at `ts`."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t)
                          & (F.col("valid_to").isNull()
                             | (F.col("valid_to") > t)))
