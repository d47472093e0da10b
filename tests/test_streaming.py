"""Tests for Structured Streaming jobs: the streaming results must
equal their batch counterparts over the same staged input."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
from howto_mongo_bulk_update_from_parquet_spark.streaming.jobs import (
    stream_session_windows, stream_tumbling_counts)

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    streamed = (stream_tumbling_counts(spark, SF)
                .orderBy("window_start", "event_type").toPandas())
    batch = (load_table(spark, SF, "events")
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
             .select(F.col("w.start").alias("window_start"), "event_type",
                     "n_events", "sum_value")
             .orderBy("window_start", "event_type").toPandas())
    assert streamed.equals(batch)


def test_stream_sessions_respect_gap(spark):
    out = stream_session_windows(spark, SF).toPandas()
    assert len(out) > 0
    # session length = end - start ≥ the 30-min gap tail
    dur = (out.session_end - out.session_start).dt.total_seconds()
    assert (dur >= 1800).all()
    # sessions of one user never overlap
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (g.session_start.shift(-1)[:-1].to_numpy()
                >= g.session_end[:-1].to_numpy()).all()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics across a checkpointed restart: run 1 sets
    the watermark to 12:20; run 2 carries a 00:00 row that is older
    than the recovered watermark and must be dropped (its window never
    reaches the sink), while the now-finalized 12:00 window emits.

    (Within a single availableNow run the batch plan is computed up
    front, so the watermark only takes effect at the NEXT planning —
    hence the two-run shape; file sink because memory sinks can't
    recover from a checkpoint.)"""
    import os
    from pyspark.sql import functions as F, types as T
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("v", T.LongType())])
    stage = os.path.join(str(tmp_path), "wm_in")
    ckpt = os.path.join(str(tmp_path), "wm_ckpt")
    out = os.path.join(str(tmp_path), "wm_out")
    os.makedirs(stage)

    def write(rows, name):
        (spark.createDataFrame(rows, "ts string, v long")
         .select(F.col("ts").cast("timestamp"), "v")
         .coalesce(1).write.parquet(os.path.join(stage, name)))

    def run():
        stream = spark.readStream.schema(schema).parquet(os.path.join(stage, "*"))
        agg = (stream.withWatermark("ts", "10 minutes")
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.sum("v").alias("total"))
               .select(F.col("w.start").alias("ws"), "total"))
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted((r.ws, r.total) for r in spark.read.parquet(out).collect())

    write([("2024-01-01 12:00:00", 1), ("2024-01-01 12:30:00", 2)], "f1")
    assert run() == []                        # nothing finalized yet
    write([("2024-01-01 00:00:00", 99), ("2024-01-01 14:05:00", 3)], "f2")
    result = run()
    hours = [ws.hour for ws, _ in result]
    assert 0 not in hours                     # late row dropped
    assert result == [(result[0][0], 3)] and result[0][0].hour == 12
