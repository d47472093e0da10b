"""Keyed bulk-upsert (MERGE) operator — the reference's core semantics.

Reference behavior being reproduced (/root/reference/src/func/mongo.py:28-79,
SURVEY §2.1 U1-U4 + semantic notes 1-6):

1. Key-match is equality on a single column, value taken verbatim
   (mongo.py:50,59).
2. NULL payload fields are skipped, never written (mongo.py:62): an
   update never erases an existing target value with NULL, and a fresh
   insert of a row with NULL features leaves those fields NULL.
3. Rows with NULL/missing key are dropped, not errored (mongo.py:50-53).
4. Every written row gets an `updatedAt` timestamp (mongo.py:64-66).
5. The reference executes unordered bulk writes (ordered=False,
   mongo.py:139), so duplicate keys within one input race
   nondeterministically. This engine makes the result deterministic:
   latest-per-key dedup *before* the merge (documented divergence).
6. Untouched target rows pass through unchanged.

Spark-first design: the keyed mutable collection becomes a full-outer
join + per-column `coalesce(source, target)` — one shuffle on the key,
no driver-side row handling, MERGE-equivalent semantics without needing
Delta on the classpath. The reference's asyncio fan-out (mongo.py:166-269)
disappears: each partition's write is an executor task and Spark's
scheduler overlaps all of them.

Scale notes (100 TB): the join shuffles both sides on the key — at
scale, bucket the target table by the key (`write.bucketBy(n, key)`) so
repeated upsert rounds co-locate without re-shuffling the target; skewed
keys are handled by AQE skew-join (enabled in session.py). If the
source is small relative to the target (typical CDC), this full-outer
join is still the right shape — broadcast is unsafe for full-outer, but
AQE converts the source side to a shuffle-hash join automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prepare_source(source: DataFrame, key: str,
                   order_by: list[str] | None = None) -> DataFrame:
    """Normalize an upsert source: drop NULL-key rows (reference note 3)
    and deduplicate to latest-per-key (reference note 5, made
    deterministic). `order_by` columns break ties; highest wins. With no
    `order_by`, an arbitrary-but-deterministic row wins via the key
    ordering of remaining columns."""
    src = source.filter(F.col(key).isNotNull())
    tie_breakers = order_by or [c for c in source.columns if c != key]
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc_nulls_last() for c in tie_breakers])
    return (src.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1)
               .drop("__rn"))


def keyed_upsert(target: DataFrame, source: DataFrame, key: str,
                 payload: list[str] | None = None, *,
                 dedup_order_by: list[str] | None = None,
                 updated_at_col: str | None = "updatedAt",
                 observation=None,
                 source_prepared: bool = False) -> DataFrame:
    """MERGE `source` into `target` on `key` with the reference's
    null-skip upsert semantics. Returns the post-merge target.

    Equivalent SQL (the oracle form):
        SELECT coalesce(s.key, t.key) AS key,
               coalesce(s.c, t.c) AS c, ...   -- per payload column
        FROM target t FULL OUTER JOIN source s ON t.key = s.key

    `source_prepared=True` asserts the caller already ran
    `prepare_source` on `source` (r17, guide §2.4): CHECK-constrained
    writes prepare once to host the violation Observation, and
    re-preparing planned the dedup window twice.
    """
    payload = payload or [c for c in source.columns if c != key]
    src = source if source_prepared \
        else prepare_source(source, key, dedup_order_by)

    # Columns only in the target (e.g. a pre-existing updatedAt) pass through.
    target_only = [c for c in target.columns if c != key and c not in payload]

    t = target.alias("t")
    s = src.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")

    if observation is not None:
        # write-result counts, the reference's BulkWriteResult surface
        # (/root/reference/src/func/mongo.py:140-145) — collected via
        # the Observation API at zero extra passes: metrics ride the
        # merge action itself.
        joined = joined.observe(
            observation,
            F.count(F.when(F.col(f"s.{key}").isNotNull()
                           & F.col(f"t.{key}").isNotNull(), 1)).alias("n_matched"),
            F.count(F.when(F.col(f"s.{key}").isNotNull()
                           & F.col(f"t.{key}").isNull(), 1)).alias("n_upserted"),
            F.count(F.when(F.col(f"s.{key}").isNull(), 1)).alias("n_untouched"))

    out_cols = [F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)]
    for c in payload:
        if c in target.columns:
            # null-skip: source NULL preserves the target value (note 2)
            out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"s.{c}").alias(c))
    for c in target_only:
        if updated_at_col and c == updated_at_col:
            continue
        out_cols.append(F.col(f"t.{c}").alias(c))
    if updated_at_col:
        # written rows (source present) get a fresh timestamp (note 4);
        # untouched rows keep their old one if the target had the column.
        old = (F.col(f"t.{updated_at_col}")
               if updated_at_col in target.columns else F.lit(None).cast("timestamp"))
        out_cols.append(
            F.when(F.col(f"s.{key}").isNotNull(), F.current_timestamp())
             .otherwise(old).alias(updated_at_col))
    return joined.select(*out_cols)
