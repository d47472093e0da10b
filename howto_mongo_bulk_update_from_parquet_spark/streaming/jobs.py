"""Structured Streaming jobs over the events stream: watermarked
tumbling-window aggregation and session windows.

Locally these run file-source → memory-sink with `availableNow`, which
drives the streaming engine (incremental planner, state store,
watermark tracking) to completion over the staged files — the same
query runs unchanged against Kafka by swapping the source.

Scale notes: both catalog jobs below run in `complete` output mode so
the batch-equality oracle sees every window — in complete mode the
watermark neither drops late rows nor evicts state. Switch to
append/update mode for bounded state in production (the append-mode
late-row drop is exercised in tests/test_streaming.py). Each
micro-batch's window aggregation is a keyed state-store update
partitioned by (window, key) — adding executors scales state
linearly. The parquet staging dance below exists only because the
test tables put every table in one directory; a real deployment points
readStream at its own path/topic.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@contextmanager
def scoped_state_partitions(spark: SparkSession, n: int = 8):
    """Streaming state lives in one store per shuffle partition (×4 for
    a stream-stream join), and a streaming query's state partitioning
    is fixed at its first run — size it to the stream's key
    cardinality, not the session's batch-shuffle width. Safe to scope:
    the wrapped query runs to completion inside the block (awaitTermination),
    then the session conf is restored for batch plans."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

_RAW_EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),          # nanos (see sources/parquet.py)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _stage_events_stream(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """Stage events.parquet into its own dir and open it as a stream."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = os.path.join(tempfile.gettempdir(),
                         f"howto_mongo_bulk_update_from_parquet_spark_stream_{uuid.uuid4().hex[:8]}")
    os.makedirs(stage, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(stage, "events.parquet"))
    stream = (spark.readStream.schema(_RAW_EVENTS).parquet(stage)
              .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    return stream, stage


def _run_to_memory(agg: DataFrame, mode: str, stage: str) -> DataFrame:
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode(mode).format("memory").queryName(name)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return agg.sparkSession.table(name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows: count + exact sum per
    (window, event_type). Complete mode over the staged batch ⇒ the
    result equals the batch aggregation (q_event_tumbling's oracle)."""
    events, stage = _stage_events_stream(spark, sf_dir)
    agg = (events.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "complete", stage)
    return out.select(F.col("w.start").alias("window_start"), "event_type",
                      "n_events", "sum_value")


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-bounded stream-stream INNER join: each `view` joined
    to the same user's `purchase` events landing within the following
    30 minutes — the attribution-join shape.

    Both sides carry watermarks and the join condition bounds buy_ts to
    a finite window after view_ts, so the state store can expire a view
    row once the purchase-side watermark passes view_ts + 30 min —
    state stays bounded by (watermark delay + join window) × arrival
    rate, never by stream length. Append mode (the only mode
    stream-stream inner joins support) emits each matched pair exactly
    once. Two independent file sources over the same staged directory
    keep this a true two-stream join rather than a self-join."""
    views_src, stage = _stage_events_stream(spark, sf_dir)
    buys_src = (spark.readStream.schema(_RAW_EVENTS).parquet(stage)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    views = (views_src.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "10 minutes"))
    buys = (buys_src.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("user_id"),
                    F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", "10 minutes"))
    joined = (views.join(
        buys,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("interval 30 minutes")),
        "inner")
        .select("user_id", "view_id", "view_ts", "buy_id", "buy_ts"))
    with scoped_state_partitions(spark):
        return _run_to_memory(joined, "append", stage)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap — the streaming
    counterpart of the batch lag+cumsum sessionization."""
    events, stage = _stage_events_stream(spark, sf_dir)
    agg = (events.withWatermark("ts", "10 minutes")
           .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "complete", stage)
    return out.select("user_id", F.col("sw.start").alias("session_start"),
                      F.col("sw.end").alias("session_end"), "n_events")
