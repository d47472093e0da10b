"""The committed-dir parquet schema memo (r16 optimization): repeated
reads of immutable base_v*/delta_* directories skip footer schema
inference, and the listing fingerprint protects against the one way a
memo entry could lie — a directory deleted and re-created with
different files at the same path."""

import os

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    _PQ_SCHEMA_MEMO, append_delta, read_merged, upsert_into_keyed_table)


def _mk_table(spark, path):
    src = spark.createDataFrame(
        [("a", 1.0, "x"), ("b", 2.0, "y")],
        "_id string, v double, tag string")
    upsert_into_keyed_table(spark, src, path=path, key="_id",
                            updated_at_col=None)
    append_delta(spark,
                 spark.createDataFrame([("a", 5.0, None)],
                                       "_id string, v double, tag string"),
                 path=path, key="_id")


def test_memo_reads_equal_fresh_reads(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    _mk_table(spark, path)
    first = {r["_id"]: r.asDict() for r in
             read_merged(spark, path, "_id").collect()}
    # the base dir and the delta dir are memoized now
    memo_dirs = [k[0][0] for k in _PQ_SCHEMA_MEMO
                 if k[0] and k[0][0].startswith(path)]
    assert any("base_v" in d for d in memo_dirs)
    assert any("delta_" in d for d in memo_dirs)
    # second read goes through the memo (explicit schema, no
    # inference) and must be identical
    second = {r["_id"]: r.asDict() for r in
              read_merged(spark, path, "_id").collect()}
    assert first == second
    assert second["a"]["v"] == 5.0 and second["a"]["tag"] == "x"


def test_fingerprint_detects_recreated_dir(spark, tmp_path):
    """Out-of-band damage: a committed delta dir replaced wholesale
    with different files (new schema) at the same path must be read
    with ITS schema, not the memoized one."""
    path = os.path.join(str(tmp_path), "t")
    _mk_table(spark, path)
    read_merged(spark, path, "_id").collect()          # populate memo
    ddir = os.path.join(path, "delta_00001")
    import shutil
    shutil.rmtree(ddir)
    (spark.createDataFrame([("a", 7.0, "zz", 9)],
                           "_id string, v double, tag string, extra int")
     .coalesce(1).write.parquet(ddir))
    got = {r["_id"]: r.asDict() for r in
           read_merged(spark, path, "_id").collect()}
    assert "extra" in got["a"] and got["a"]["extra"] == 9
    assert got["a"]["v"] == 7.0 and got["a"]["tag"] == "zz"


def test_memo_is_schema_only_not_results(spark, tmp_path):
    """New deltas (new dirs) appear in the very next read — nothing
    about the memo caches rows or snapshot composition."""
    path = os.path.join(str(tmp_path), "t")
    _mk_table(spark, path)
    read_merged(spark, path, "_id").collect()
    append_delta(spark,
                 spark.createDataFrame([("b", None, "y9")],
                                       "_id string, v double, tag string"),
                 path=path, key="_id")
    got = {r["_id"]: r.asDict() for r in
           read_merged(spark, path, "_id").collect()}
    assert got["b"]["tag"] == "y9" and got["b"]["v"] == 2.0
