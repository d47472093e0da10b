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
