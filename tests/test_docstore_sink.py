"""Custom Python DataSource WRITER: commit publishes all-or-nothing,
abort leaves nothing visible, task rows land exactly once."""

import os

import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sources.docstore_sink import (
    read_committed, register_docstore)


@pytest.fixture(scope="module")
def ds(spark):
    register_docstore(spark)
    return spark


def test_write_commit_and_read_back(ds, tmp_path):
    out = f"{tmp_path}/store"
    df = ds.range(100).select(
        F.col("id").alias("_id"), (F.col("id") % 5).alias("grp")) \
        .repartition(6)
    df.write.format("docstore").option("path", out).mode("append").save()
    assert os.path.exists(f"{out}/_DOCSTORE_COMMITTED")
    docs = read_committed(out)
    assert sorted(d["_id"] for d in docs) == list(range(100))
    # staging fully cleaned after publish
    assert not os.path.exists(f"{out}/_staging")


def test_failed_write_publishes_nothing(ds, tmp_path):
    out = f"{tmp_path}/store"

    @F.udf("long")
    def boom(x):
        if x == 37:
            raise RuntimeError("induced task failure")
        return x

    df = ds.range(100).select(boom(F.col("id")).alias("_id")).repartition(4)
    with pytest.raises(Exception):
        df.write.format("docstore").option("path", out) \
          .mode("append").save()
    # abort ran: no manifest, nothing readable, no staging leftovers
    assert not os.path.exists(f"{out}/_DOCSTORE_COMMITTED")
    assert not os.path.exists(f"{out}/_staging")
    with pytest.raises(FileNotFoundError):
        read_committed(out)


def test_manifest_counts_every_partition_once(ds, tmp_path):
    out = f"{tmp_path}/store"
    ds.range(1000).select(F.col("id").alias("_id")) \
        .repartition(13).write.format("docstore") \
        .option("path", out).mode("append").save()
    import json
    with open(f"{out}/_DOCSTORE_COMMITTED") as fh:
        man = json.load(fh)
    assert man["n_rows"] == 1000
    assert len(man["members"]) == 13
    assert len(set(man["members"])) == 13


def test_second_append_merges_manifest(ds, tmp_path):
    out = f"{tmp_path}/store"
    for lo, hi in [(0, 100), (100, 250)]:
        ds.range(lo, hi).select(F.col("id").alias("_id")) \
            .repartition(3).write.format("docstore") \
            .option("path", out).mode("append").save()
    docs = read_committed(out)
    assert sorted(d["_id"] for d in docs) == list(range(250))
