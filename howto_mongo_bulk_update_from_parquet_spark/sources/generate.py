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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
