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
