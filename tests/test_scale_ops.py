"""Tests for skew-salted aggregation and the stateful streaming op."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.skew import salted_sum_count

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        "k string, v double")
    salted = {r.k: (r.sum_value, r.n_rows)
              for r in salted_sum_count(df, "k", F.col("v").cast("decimal(18,6)"), 8)
              .select("k", F.col("sum_value").cast("double").alias("sum_value"), "n_rows")
              .collect()}
    plain = {r.k: (float(r.s), r.n) for r in
             df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain


def test_salted_partial_stage_spreads_key(spark):
    # the partial stage must produce multiple rows for a hot key
    from howto_mongo_bulk_update_from_parquet_spark.operators.skew import salted_agg
    df = spark.createDataFrame([("hot", 1.0)] * 500, "k string, v double")
    partial_rows = (df.withColumn("__salt",
                                  (F.crc32(F.monotonically_increasing_id().cast("string")) % 8))
                    .groupBy("k", "__salt").count().count())
    assert partial_rows > 1


def test_stream_first_seen_matches_batch(spark):
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
    from howto_mongo_bulk_update_from_parquet_spark.streaming.stateful import stream_first_seen
    from pyspark.sql.window import Window
    streamed = (stream_first_seen(spark, SF)
                .orderBy("user_id", "event_type").toPandas())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    batch = (load_table(spark, SF, "events")
             .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
             .select("user_id", "event_type",
                     F.col("event_id").alias("first_event_id"),
                     F.col("ts").alias("first_ts"))
             .orderBy("user_id", "event_type").toPandas())
    assert streamed.reset_index(drop=True).equals(batch.reset_index(drop=True))
