"""Engine-internal keyed table: a parquet-backed mutable collection
with MERGE/upsert writes — the no-external-dependency stand-in for the
reference's MongoDB collection.

Scale notes: the table is just a parquet directory; each upsert round
rewrites it via the merge operator (shuffle on the key). For frequent
small updates at 100 TB you'd layer a log-structured scheme (base +
delta files, compaction) or use a table format (Delta/Iceberg — jars
not present here); the merge semantics stay identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.merge import keyed_upsert


def upsert_into_keyed_table(spark: SparkSession, source: DataFrame, *,
                            path: str, key: str,
                            payload: list[str] | None = None,
                            dedup_order_by: list[str] | None = None,
                            updated_at_col: str | None = "updatedAt",
                            n_files: int | None = None) -> DataFrame:
    """MERGE `source` into the keyed parquet table at `path` (created on
    first write). Returns the post-merge table DataFrame."""
    schema_cols = source.columns if payload is None else [key, *payload]
    if os.path.exists(path):
        target = spark.read.parquet(path)
    else:
        fields = [source.schema[c] for c in schema_cols]
        if updated_at_col:
            fields.append(T.StructField(updated_at_col, T.TimestampType()))
        target = spark.createDataFrame([], T.StructType(fields))
    merged = keyed_upsert(target, source, key, payload,
                          dedup_order_by=dedup_order_by,
                          updated_at_col=updated_at_col)
    out = merged.repartition(n_files) if n_files else merged
    # write to a temp dir then swap: the merge reads the live table, so
    # an in-place overwrite would race its own scan
    tmp = f"{path}__tmp_write"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
