"""Synthetic data generator (reference G1 —
/root/reference/src/cli/generate_data.py:55-68).

The reference loops numpy batches on the driver (uuid ids + uniform
[0,1) features) and writes one file per batch. Here it's a single
distributed `spark.range` job: no driver-side row materialization, so
the same code generates 10k rows or 10B rows. Seeded `rand()` replaces
the reference's unseeded RNG so runs are reproducible (SURVEY §2.1 G1);
ids are deterministic `id-%012d` strings by default (uuid() is
available but non-reproducible across runs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def generate_pipeline_data(spark: SparkSession, n_rows: int, *,
                           seed: int = 42, n_features: int = 4,
                           null_fraction: float = 0.0,
                           deterministic_ids: bool = True,
                           n_partitions: int | None = None) -> DataFrame:
    """Generate the reference pipeline table: key column + nullable
    feature columns + non-null score. `null_fraction` injects NULLs into
    feature columns to exercise the merge null-skip semantics."""
    df = spark.range(n_rows, numPartitions=n_partitions)
    _id = (F.format_string("id-%012d", F.col("id")) if deterministic_ids
           else F.expr("uuid()"))
    cols = [_id.alias("_id")]
    for i in range(1, n_features + 1):
        feature = F.rand(seed + i)
        if null_fraction > 0:
            feature = F.when(F.rand(seed + 100 + i) < null_fraction, None).otherwise(feature)
        cols.append(feature.alias(f"feature_{i}"))
    cols.append(F.rand(seed).alias("score"))
    return df.select(*cols)


def _binomial_bounds(n: int, p: float, z: float = 5.0) -> tuple[int, int]:
    """[lo, hi] acceptance interval for a Binomial(n, p) count at z
    standard deviations — wide enough (z=5 ⇒ false-alarm ~6e-7) that a
    fixed-seed run can never flake, tight enough that a mis-set
    null_fraction (0.5 vs 0.1 at n=2000 is ~22σ out) always fails."""
    if p <= 0:
        return 0, 0
    mu = n * p
    sd = math.sqrt(n * p * (1 - p))
    return max(0, math.floor(mu - z * sd)), min(n, math.ceil(mu + z * sd))


def generation_contract(df: DataFrame, n_rows: int, *,
                        null_fraction: float,
                        nullable_cols: list[str]) -> DataFrame:
    """Per-row boolean flags attesting the generator's contract from
    the REAL data (so a broken generator fails the oracle, not just
    the row count): `ids_unique` — no `_id` collides; `null_counts_ok`
    — each nullable column's observed NULL count sits inside the
    binomial acceptance interval of `null_fraction`. The global NULL
    counts come from one `agg` (map-side partials) whose one-row
    result is broadcast back over the frame — never a global window,
    so the gate itself scales with the generator. `ids_unique` stays
    a per-key window (partitioned by `_id`, maximal spread)."""
    lo, hi = _binomial_bounds(n_rows, null_fraction)
    per_id = F.count(F.lit(1)).over(Window.partitionBy("_id"))
    flagged = df.withColumn("ids_unique", per_id == 1)
    if not nullable_cols:
        return flagged.withColumn("null_counts_ok", F.lit(True))
    scalars = df.agg(*[F.sum(F.col(c).isNull().cast("long")).alias(f"__nc_{i}")
                       for i, c in enumerate(nullable_cols)])
    nulls_ok = None
    for i in range(len(nullable_cols)):
        cnt = F.col(f"__nc_{i}")
        ok = (cnt >= lo) & (cnt <= hi)
        nulls_ok = ok if nulls_ok is None else nulls_ok & ok
    return (flagged.join(F.broadcast(scalars))
            .withColumn("null_counts_ok", nulls_ok)
            .drop(*[f"__nc_{i}" for i in range(len(nullable_cols))]))
