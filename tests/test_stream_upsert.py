"""Streaming keyed upsert: arriving files drain into the keyed table
with exactly the batch-merge result; re-running the drained stream is
a no-op (checkpoint + idempotent merge)."""

import os

from howto_mongo_bulk_update_from_parquet_spark.schemas import PIPELINE_SCHEMA
from howto_mongo_bulk_update_from_parquet_spark.sources.generate import generate_pipeline_data
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import read_keyed_table
from howto_mongo_bulk_update_from_parquet_spark.streaming.upsert import stream_upsert_parquet


def test_stream_upsert_drains_and_is_exactly_once(spark, tmp_path):
    landing = os.path.join(str(tmp_path), "landing")
    table = os.path.join(str(tmp_path), "table")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(landing)

    r1 = generate_pipeline_data(spark, 300, seed=1)
    r1.coalesce(1).write.parquet(os.path.join(landing, "f1"))
    stream_upsert_parquet(spark, os.path.join(landing, "*"),
                          schema=PIPELINE_SCHEMA, table_path=table,
                          key="_id", checkpoint=ckpt)
    t1 = read_keyed_table(spark, table)
    assert t1.count() == 300
    v1 = {r["_id"]: r["score"] for r in t1.collect()}

    # second file arrives: overlapping ids with new scores
    r2 = generate_pipeline_data(spark, 100, seed=2)
    r2.coalesce(1).write.parquet(os.path.join(landing, "f2"))
    stream_upsert_parquet(spark, os.path.join(landing, "*"),
                          schema=PIPELINE_SCHEMA, table_path=table,
                          key="_id", checkpoint=ckpt)
    t2 = read_keyed_table(spark, table)
    assert t2.count() == 300                       # ids overlap, no growth
    v2 = {r["_id"]: r["score"] for r in t2.collect()}
    changed = [k for k in v1 if v1[k] != v2[k]]
    assert len(changed) == 100                     # exactly the new file's keys

    # drained stream re-run: checkpoint says nothing new → table unchanged
    stream_upsert_parquet(spark, os.path.join(landing, "*"),
                          schema=PIPELINE_SCHEMA, table_path=table,
                          key="_id", checkpoint=ckpt)
    v3 = {r["_id"]: r["score"] for r in read_keyed_table(spark, table).collect()}
    assert v3 == v2


def test_table_format_stubs_raise_cleanly(spark):
    import pytest
    from howto_mongo_bulk_update_from_parquet_spark.sinks.table_formats import (
        delta_available, iceberg_available, merge_into_delta,
        merge_into_iceberg)
    assert delta_available(spark) is False         # jars absent here
    assert iceberg_available(spark) is False
    src = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    with pytest.raises(NotImplementedError, match="Delta Lake jars"):
        merge_into_delta(spark, src, table_path="/tmp/nope", key="_id")
    with pytest.raises(NotImplementedError, match="Iceberg jars"):
        merge_into_iceberg(spark, src, table="cat.db.nope", key="_id")


def test_merge_sql_null_skip_shape():
    from howto_mongo_bulk_update_from_parquet_spark.sinks.table_formats import build_merge_sql
    sql = build_merge_sql("cat.db.t", "_id", ["f1", "f2"])
    # every payload column goes through coalesce(source, target) — the
    # reference's never-clobber-with-null rule — and updatedAt is
    # stamped on both branches
    assert "t.f1 = coalesce(s.f1, t.f1)" in sql
    assert "t.f2 = coalesce(s.f2, t.f2)" in sql
    assert "ON t._id = s._id" in sql
    assert "t.updatedAt = current_timestamp()" in sql
    assert "INSERT (_id, f1, f2, updatedAt)" in sql
    assert "VALUES (s._id, s.f1, s.f2, current_timestamp())" in sql
    assert "MERGE INTO cat.db.t t" in sql


def test_stream_upsert_reconciles_against_landing_snapshot(spark, tmp_path):
    """End-to-end pipeline verification: land parquet batches → stream
    them through foreachBatch upserts → prove with the reconciliation
    checksum that the keyed table holds exactly the latest-per-key view
    of everything landed (the check the reference pipeline never ran)."""
    import os
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from howto_mongo_bulk_update_from_parquet_spark.operators.merge import prepare_source
    from howto_mongo_bulk_update_from_parquet_spark.operators.reconcile import checksum_diff
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import read_keyed_table
    from howto_mongo_bulk_update_from_parquet_spark.streaming.upsert import stream_upsert_parquet

    schema = T.StructType([T.StructField("_id", T.StringType()),
                           T.StructField("v", T.DoubleType()),
                           T.StructField("batch", T.LongType())])
    land = os.path.join(str(tmp_path), "land")
    table = os.path.join(str(tmp_path), "table")
    ck = os.path.join(str(tmp_path), "ck")
    os.makedirs(land)
    for b in range(3):  # overlapping keys across batches: upsert wins
        (spark.createDataFrame(
            [(f"k{i}", float(b * 100 + i), b) for i in range(b * 5, b * 5 + 20)],
            schema).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(land, f"b{b}")))
    for b in range(3):
        stream_upsert_parquet(spark, os.path.join(land, f"b{b}"),
                              schema=schema, table_path=table, key="_id",
                              checkpoint=os.path.join(ck, str(b)))
    landed = spark.read.schema(schema).parquet(
        *[os.path.join(land, f"b{b}") for b in range(3)])
    expected = prepare_source(landed, "_id", order_by=["batch"])
    sink = read_keyed_table(spark, table)
    bucket = F.pmod(F.crc32(F.col("_id")), F.lit(8)).alias("bucket")
    diffs = checksum_diff(expected.withColumn("bucket", bucket),
                          sink.withColumn("bucket", bucket),
                          ["bucket"], cols=["_id", "v"])
    assert diffs.count() == 0
    assert sink.count() == 30  # keys k0..k29
