"""Round-trips through csv/json/orc with explicit schemas, and the
bucketed co-located join (no Exchange in the join plan)."""

import os

import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.schemas import PIPELINE_SCHEMA
from howto_mongo_bulk_update_from_parquet_spark.sources.generate import generate_pipeline_data
from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_any, write_any


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_round_trip(spark, tmp_path, fmt):
    path = os.path.join(str(tmp_path), fmt)
    df = generate_pipeline_data(spark, 300, seed=5, null_fraction=0.2)
    write_any(df, path, fmt)
    back = load_any(spark, path, fmt, PIPELINE_SCHEMA)
    assert back.count() == 300
    # file sources may relax nullability; names and types must hold
    assert [(f.name, f.dataType) for f in back.schema.fields] \
        == [(f.name, f.dataType) for f in PIPELINE_SCHEMA.fields]
    if fmt in ("json", "orc"):    # csv loses float precision by design
        assert df.exceptAll(back).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # bucketBy co-locates both sides on the key: the sort-merge join
    # plan must contain no Exchange (the 100 TB repeated-join pattern).
    # warehouse.dir is static -> tables land in ./spark-warehouse; dropped below.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = generate_pipeline_data(spark, 2000, seed=1).withColumnRenamed("score", "score_l")
    right = generate_pipeline_data(spark, 2000, seed=2).withColumnRenamed("score", "score_r")
    left.write.bucketBy(8, "_id").sortBy("_id").mode("overwrite").saveAsTable("t_left")
    right.write.bucketBy(8, "_id").sortBy("_id").mode("overwrite").saveAsTable("t_right")
    joined = spark.table("t_left").join(spark.table("t_right"), "_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert joined.count() == 2000
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")
