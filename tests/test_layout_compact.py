"""Small-file compaction: file count shrinks to the byte-derived
target, content survives exactly, the swap is atomic-by-rename; plus
corrupt-file resilience via ignoreCorruptFiles."""

import os

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sinks.layout import compact_small_files


def _checksum(df):
    return df.agg(F.sum(F.col("id") * 31 + F.col("v"))
                  .alias("c")).collect()[0].c


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = f"{tmp_path}/t"
    df = spark.range(50_000).select("id", (F.col("id") % 97).alias("v"))
    df.repartition(40).write.parquet(path)   # 40 tiny files
    before = _checksum(spark.read.parquet(path))
    n_small = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_small == 40

    stats = compact_small_files(spark, path, target_bytes=200 * 1024)
    assert stats["files_before"] == 40
    # ~600KB of data at 200KB target → a small handful of files
    assert 1 <= stats["files_after"] <= 6
    assert stats["files_after"] < n_small
    after_df = spark.read.parquet(path)
    assert after_df.count() == 50_000
    assert _checksum(after_df) == before
    # no leftover temp/old dirs
    assert not os.path.exists(f"{path}.__compact_tmp")
    assert not os.path.exists(f"{path}.__compact_old")


def test_corrupt_file_skipped_with_ignore_conf(spark, tmp_path):
    path = f"{tmp_path}/t"
    spark.range(1000).write.parquet(path)
    # plant a corrupt "parquet" file among the real ones
    with open(f"{path}/part-corrupt.parquet", "wb") as fh:
        fh.write(b"PAR1 this is not really parquet")
    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        n = spark.read.parquet(path).count()
        assert n == 1000          # corrupt member skipped, rest intact
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)


def test_partitioned_dataset_is_refused(spark, tmp_path):
    """Hive-layout input must be rejected, not silently flattened
    (which would break partition pruning for every downstream reader
    and size the rewrite from 0 bytes)."""
    import pytest
    path = f"{tmp_path}/t"
    (spark.range(1000).select("id", (F.col("id") % 3).alias("k"))
     .write.partitionBy("k").parquet(path))
    with pytest.raises(ValueError, match="partitioned dataset"):
        compact_small_files(spark, path)
    # untouched
    assert spark.read.parquet(path).count() == 1000


def test_recover_compaction_mid_swap(spark, tmp_path):
    """Simulate a crash between the two renames: path missing, both
    copies beside it. Recovery must restore the complete compacted
    copy and clean up."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.layout import (
        recover_compaction)
    path = f"{tmp_path}/t"
    df = spark.range(5000).select("id", (F.col("id") % 7).alias("v"))
    df.repartition(10).write.parquet(path)
    want = _checksum(spark.read.parquet(path))
    # fabricate the mid-swap state
    df.repartition(2).write.parquet(f"{path}.__compact_tmp")
    os.rename(path, f"{path}.__compact_old")
    assert recover_compaction(path) == "tmp"
    assert _checksum(spark.read.parquet(path)) == want
    assert not os.path.exists(f"{path}.__compact_old")
    # idempotent when healthy
    assert recover_compaction(path) is None


def test_recover_compaction_incomplete_tmp_restores_original(spark, tmp_path):
    from howto_mongo_bulk_update_from_parquet_spark.sinks.layout import (
        recover_compaction)
    path = f"{tmp_path}/t"
    df = spark.range(500).select("id", (F.col("id") % 7).alias("v"))
    df.write.parquet(path)
    want = _checksum(spark.read.parquet(path))
    os.makedirs(f"{path}.__compact_tmp")      # no _SUCCESS: incomplete
    os.rename(path, f"{path}.__compact_old")
    assert recover_compaction(path) == "old"
    assert _checksum(spark.read.parquet(path)) == want
    assert not os.path.exists(f"{path}.__compact_tmp")
