"""Engine-internal keyed table: a parquet-backed mutable collection
with MERGE/upsert writes — the no-external-dependency stand-in for the
reference's MongoDB collection.

Two write paths:
- `upsert_into_keyed_table`: merge + full rewrite (simple, one shuffle;
  right when updates touch a large fraction of keys).
- `append_delta` + `read_merged` + `compact`: log-structured base+delta
  scheme for *frequent small* updates at 100 TB — each round appends a
  tiny delta file set; reads merge on the fly (newest version wins per
  key, null-skip per column); `compact` folds deltas back into the
  base. This is the LSM pattern table formats (Delta/Iceberg) provide;
  the jars aren't present here so the engine carries its own minimal
  form with identical merge semantics.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..operators.merge import keyed_upsert, prepare_source


def upsert_into_keyed_table(spark: SparkSession, source: DataFrame, *,
                            path: str, key: str,
                            payload: list[str] | None = None,
                            dedup_order_by: list[str] | None = None,
                            updated_at_col: str | None = "updatedAt",
                            n_files: int | None = None,
                            return_counts: bool = False):
    """MERGE `source` into the keyed parquet table at `path` (created on
    first write). Returns the post-merge table DataFrame, or
    ``(df, counts)`` with the reference-style write-result counts
    (n_matched / n_upserted / n_untouched) when ``return_counts``."""
    from pyspark.sql import Observation
    schema_cols = source.columns if payload is None else [key, *payload]
    if os.path.exists(path):
        target = spark.read.parquet(path)
    else:
        fields = [source.schema[c] for c in schema_cols]
        if updated_at_col:
            fields.append(T.StructField(updated_at_col, T.TimestampType()))
        target = spark.createDataFrame([], T.StructType(fields))
    obs = Observation("merge_counts") if return_counts else None
    merged = keyed_upsert(target, source, key, payload,
                          dedup_order_by=dedup_order_by,
                          updated_at_col=updated_at_col,
                          observation=obs)
    out = merged.repartition(n_files) if n_files else merged
    # write to a temp dir then swap: the merge reads the live table, so
    # an in-place overwrite would race its own scan
    tmp = f"{path}__tmp_write"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    result = spark.read.parquet(path)
    if return_counts:
        return result, obs.get
    return result


# --- log-structured base + delta ---------------------------------------

_BASE = "base"
_DELTA_RE = re.compile(r"^delta_(\d{5})$")


def _delta_versions(path: str) -> list[int]:
    if not os.path.exists(path):
        return []
    return sorted(int(m.group(1)) for d in os.listdir(path)
                  if (m := _DELTA_RE.match(d)))


def append_delta(spark: SparkSession, source: DataFrame, *, path: str,
                 key: str, dedup_order_by: list[str] | None = None) -> int:
    """Append one upsert round as a delta file set (no base rewrite).
    Returns the delta version number. The source is normalized first
    (null-key drop + latest-per-key, reference notes 3/5)."""
    src = prepare_source(source, key, dedup_order_by)
    version = (_delta_versions(path) or [0])[-1] + 1
    src.write.mode("overwrite").parquet(os.path.join(path, f"delta_{version:05d}"))
    return version


def read_merged(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Merge-on-read view: base (version 0) + all deltas, newest
    version wins per key with per-column null-skip — `first(col,
    ignorenulls)` in descending version order reproduces the upsert
    chain exactly."""
    base_path = os.path.join(path, _BASE)
    parts = []
    if os.path.exists(base_path):
        parts.append(spark.read.parquet(base_path).withColumn("__v", F.lit(0)))
    for v in _delta_versions(path):
        parts.append(spark.read.parquet(os.path.join(path, f"delta_{v:05d}"))
                     .withColumn("__v", F.lit(v)))
    if not parts:
        raise FileNotFoundError(f"no base or deltas under {path}")
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p, allowMissingColumns=True)
    cols = [c for c in allv.columns if c not in (key, "__v")]
    w = Window.partitionBy(key).orderBy(F.col("__v").desc())
    # full-partition frame: the default ORDER BY frame ends at the
    # current row, which would hide older non-null values from the
    # newest row — exactly the null-skip lookback we need
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    merged = allv.select(
        key, "__v",
        *[F.first(c, ignorenulls=True).over(w_full).alias(c) for c in cols],
        F.row_number().over(w).alias("__rn"))
    return merged.filter(F.col("__rn") == 1).drop("__rn", "__v")


def compact(spark: SparkSession, path: str, key: str,
            n_files: int | None = None) -> DataFrame:
    """Fold all deltas into a new base and remove them. Readers between
    the base swap and delta removal see duplicates of already-applied
    rows — harmless here because re-applying a delta over its own
    result is idempotent (same winner per key)."""
    import shutil
    merged = read_merged(spark, path, key)
    if n_files:
        merged = merged.repartition(n_files)
    tmp = os.path.join(path, "__compact_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(os.path.join(path, _BASE))
    shutil.rmtree(tmp, ignore_errors=True)
    for v in _delta_versions(path):
        shutil.rmtree(os.path.join(path, f"delta_{v:05d}"), ignore_errors=True)
    return spark.read.parquet(os.path.join(path, _BASE))
