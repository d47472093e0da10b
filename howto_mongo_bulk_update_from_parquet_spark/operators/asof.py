"""As-of (point-in-time) join — Spark has no native operator; this
implements the scalable union+window construction.

Semantics (matching DuckDB's `ASOF JOIN` with `l.ts >= r.ts`): for
each left row, attach the payload of the right row with the same key
and the greatest timestamp ≤ the left timestamp.

Why union+window instead of `pd.merge_asof` per group: one shuffle on
the key, no Python in the path, no per-group memory blowup on skewed
keys — the window's running `last(ignorenulls)` streams each partition
once. At 100 TB this is a single sort-merge pass; a Pandas grouped-map
would materialize whole keys in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, *, left_key: str,
              right_key: str, left_ts: str, right_ts: str,
              payload: list[str],
              right_tiebreak: str | None = None) -> DataFrame:
    """Left as-of join: all left columns + `payload` columns from the
    most recent right row at-or-before the left row's timestamp.

    `right_tiebreak`: when multiple right rows share (key, ts), the one
    with the greatest tiebreak value wins (deterministic).
    """
    from pyspark.sql import types as T

    lcols = left.columns
    # The payload travels as ONE struct so the matched right row
    # supplies every payload value together — per-column
    # last(ignorenulls) would let a legitimately-NULL payload field
    # fall back to a stale older right row (DuckDB ASOF divergence).
    p_type = T.StructType([right.schema[p] for p in payload])
    # marker orders right rows (0) before left rows (1) at equal ts so
    # an exactly-simultaneous right row is visible to the left row (≤).
    l_tagged = left.select(
        F.col(left_key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__m"),
        F.lit(None).cast("long").alias("__tb"),
        *lcols,
        F.lit(None).cast(p_type).alias("__p"))
    r_tagged = right.select(
        F.col(right_key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__m"),
        (F.col(right_tiebreak).cast("long") if right_tiebreak
         else F.lit(0).cast("long")).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*payload).alias("__p"))
    u = l_tagged.unionByName(r_tagged)
    w = (Window.partitionBy("__k")
         .orderBy("__ts", "__m", "__tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *lcols, "__m",
        F.last("__p", ignorenulls=True).over(w).alias("__p"))
    return (filled.filter(F.col("__m") == 1)
            .select(*lcols, *[F.col("__p")[p].alias(p) for p in payload]))
