"""Structured Streaming jobs over the events stream: watermarked
tumbling-window aggregation and session windows.

Locally these run file-source → memory-sink with `availableNow`, which
drives the streaming engine (incremental planner, state store,
watermark tracking) to completion over the staged files — the same
query runs unchanged against Kafka by swapping the source.

Scale notes: every catalog job below runs in `append` output mode —
the scale-safe form. The watermark finalizes a window once it passes
the window end, the state store evicts it, and it is emitted exactly
once; state is bounded by (watermark delay + window span) × arrival
rate, never by stream length. The oracles are therefore restricted to
watermark-closed windows: under `availableNow` the engine runs a
final no-data micro-batch after the last data batch, advancing the
watermark to max(event_time) - delay and flushing every window whose
end precedes it (verified empirically: emitted set == batch windows
with end <= max_ts - delay, value-exact). Each micro-batch's window
aggregation is a keyed state-store update partitioned by (window,
key) — adding executors scales state linearly. The parquet staging
dance below exists only because the test tables put every table in
one directory; a real deployment points readStream at its own
path/topic.
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


# Conf/env channels for the streaming state width (explicit arg wins).
STATE_PARTITIONS_CONF = "spark.bulkUpdate.stream.statePartitions"
STATE_PARTITIONS_ENV = "BULK_UPDATE_STREAM_STATE_PARTITIONS"
DEFAULT_STATE_PARTITIONS = 8


def resolve_state_partitions(spark: SparkSession, n: int | None = None) -> int:
    """Resolve the streaming state width: explicit per-job `n` >
    session conf `spark.bulkUpdate.stream.statePartitions` > env
    `BULK_UPDATE_STREAM_STATE_PARTITIONS` > 8 (right for the test
    fixture's key cardinality).

    Sizing rule: state lives in one store per shuffle partition (×4
    stores for a stream-stream join), so pick
    n ≈ distinct_keys / target_keys_per_store — enough partitions
    that one store's keyed state fits executor memory, and no more
    (each store adds per-batch snapshot/commit overhead). At 100×,
    also switch the store engine to RocksDB
    (`spark.sql.streaming.stateStore.providerClass` =
    `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
    so per-store state spills to local disk instead of the JVM heap."""
    if n is not None:
        return n
    conf_val = spark.conf.get(STATE_PARTITIONS_CONF, None)
    if conf_val:
        return int(conf_val)
    env_val = os.environ.get(STATE_PARTITIONS_ENV)
    if env_val:
        return int(env_val)
    return DEFAULT_STATE_PARTITIONS


@contextmanager
def scoped_state_partitions(spark: SparkSession, n: int | None = None):
    """Streaming state lives in one store per shuffle partition, and a
    streaming query's state partitioning is fixed at its first run —
    size it to the stream's key cardinality (see
    resolve_state_partitions for the sizing rule and channels), not
    the session's batch-shuffle width. Safe to scope: the wrapped
    query runs to completion inside the block (awaitTermination),
    then the session conf is restored for batch plans."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(resolve_state_partitions(spark, n)))
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


def _open_events_stream(spark: SparkSession, stage: str,
                        **reader_options) -> DataFrame:
    """Open a staged events dir as a stream, handling both `ts` units
    the fixture has shipped (TIMESTAMP(NANOS) → raw-int64 read + exact
    ns→µs division; TIMESTAMP(MICROS) → native read). Same detection
    as the batch loader (sources/parquet.py::events_ts_is_nanos).
    Extra reader options (e.g. maxFilesPerTrigger) pass through."""
    from ..sources.parquet import events_ts_is_nanos
    if events_ts_is_nanos(stage):   # dir-aware: probes first member
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(_RAW_EVENTS)
        for k, v in reader_options.items():
            reader = reader.option(k, v)
        return (reader.parquet(stage)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    from ..schemas import TESTDATA_SCHEMAS
    reader = spark.readStream.schema(TESTDATA_SCHEMAS["events"])
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    return reader.parquet(stage)


def _stage_events_stream(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """Stage events.parquet into its own dir and open it as a stream.

    The source may be a single file (raw fixture) or a directory
    dataset (the bench's multi-file staged copy): members are
    FLATTENED into the stream dir — the file stream source does not
    recurse into subdirectories."""
    import glob
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stage = os.path.join(tempfile.gettempdir(),
                         f"howto_mongo_bulk_update_from_parquet_spark_stream_{uuid.uuid4().hex[:8]}")
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    members = (sorted(glob.glob(os.path.join(src, "*.parquet")))
               if os.path.isdir(src) else [src])
    for i, p in enumerate(members):
        shutil.copy(p, os.path.join(stage, f"events_{i:05d}.parquet"))
    return _open_events_stream(spark, stage), stage


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
    (window, event_type), append output mode — each window is emitted
    exactly once when the watermark passes its end and its state is
    evicted, so state stays bounded by the windows still open within
    the watermark delay. The final availableNow no-data batch flushes
    every window except those still open past max_ts - 10min; the
    oracle applies the same closed-window cutoff."""
    events, stage = _stage_events_stream(spark, sf_dir)
    agg = (events.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "append", stage)
    return out.select(F.col("w.start").alias("window_start"), "event_type",
                      "n_events", "sum_value")


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 2-hour windows sliding every hour: each event lands
    in TWO open windows, so sliding state is (span/slide)× the
    tumbling case — the watermark still evicts each window exactly
    once at window_end + delay, keeping state bounded by the windows
    open within (delay + span). Append mode; oracle applies the same
    closed-window cutoff."""
    events, stage = _stage_events_stream(spark, sf_dir)
    agg = (events.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "append", stage)
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
    buys_src = _open_events_stream(spark, stage)
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


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (`dropDuplicatesWithinWatermark`)
    over an at-least-once source: the staged events file is delivered
    TWICE (the duplicate-delivery shape of Kafka/at-least-once
    ingestion) and each event_id must come out exactly once.

    This is the exactly-once document-ingestion primitive a training
    pipeline puts in front of every downstream operator. Plain
    `dropDuplicates` in a stream keys state on the whole key universe
    forever; the within-watermark form evicts a key's state once the
    watermark passes its event time, so state is bounded by
    (watermark delay) × arrival rate — the only dedup shape that
    survives an unbounded stream. The guarantee is correspondingly
    scoped: a duplicate is dropped iff it arrives within the delay of
    its first occurrence (here both deliveries land in one availableNow
    batch; redeliveries beyond the delay are a dead-letter concern,
    not a state-size concern)."""
    import glob
    events, stage = _stage_events_stream(spark, sf_dir)
    for p in sorted(glob.glob(os.path.join(stage, "events_*.parquet"))):
        shutil.copy(p, os.path.join(
            stage, f"redelivered_{os.path.basename(p)}"))
    deduped = (events.withWatermark("ts", "10 minutes")
               .dropDuplicatesWithinWatermark(["event_id"])
               .select("event_id", "ts", "user_id", "event_type", "value"))
    with scoped_state_partitions(spark):
        return _run_to_memory(deduped, "append", stage)


def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-bounded stream-stream LEFT OUTER join: every `view`
    with the same user's `purchase` events landing within the
    following 30 minutes, or NULLs when none arrive — the attribution
    shape including un-converted views.

    Outer emission is watermark-driven: a buffered view row is held in
    state only until the global watermark (min over both sides'
    event-time maxima, minus the 10-min delay) passes view_ts + 30 min
    — at that point no qualifying purchase can still arrive, the row
    is evicted, and it is emitted with NULL purchase columns iff it
    never matched. State therefore stays bounded by (delay + join
    window) × arrival rate. The availableNow final no-data batch
    flushes every expirable row; the oracle applies the identical
    cutoff (unmatched views need view_ts + 30min < min(max view_ts,
    max buy_ts) - 10min — verified value-exact against the engine)."""
    views_src, stage = _stage_events_stream(spark, sf_dir)
    buys_src = _open_events_stream(spark, stage)
    views = (views_src.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "10 minutes"))
    buys = (buys_src.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", "10 minutes"))
    joined = (views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr("interval 30 minutes")),
        "left_outer")
        .select(F.col("v_user").alias("user_id"), "view_id", "view_ts",
                "buy_id", "buy_ts"))
    with scoped_state_partitions(spark):
        return _run_to_memory(joined, "append", stage)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap — the streaming
    counterpart of the batch lag+cumsum sessionization. Append output
    mode: a session is emitted exactly once when the watermark passes
    its end (last event + gap) and its state is evicted; the oracle
    applies the same closed-session cutoff (end <= max_ts - 10min)."""
    events, stage = _stage_events_stream(spark, sf_dir)
    agg = (events.withWatermark("ts", "10 minutes")
           .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
           .agg(F.count(F.lit(1)).alias("n_events")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "append", stage)
    return out.select("user_id", F.col("sw.start").alias("session_start"),
                      F.col("sw.end").alias("session_end"), "n_events")


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension, then watermarked tumbling counts per market segment.

    The static side holds NO state — every micro-batch's plan joins
    the batch against the dimension afresh (so a dim updated between
    batches is picked up), and the broadcast hint keeps it a map-side
    hash join: the stream never shuffles for the enrichment, only for
    the windowed aggregation. This is the standard "enrich with a
    slowly-changing dim" deployment shape; at 100 TB/day the dim
    broadcast is per-executor-once, not per-row. Append output mode
    with the same closed-window eviction contract as the other jobs.
    """
    events, stage = _stage_events_stream(spark, sf_dir)
    from ..sources.parquet import load_table
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    enriched = (events.withWatermark("ts", "10 minutes")
                .join(F.broadcast(dim), "user_id"))
    agg = (enriched
           .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("sum_value")))
    with scoped_state_partitions(spark):
        out = _run_to_memory(agg, "append", stage)
    return out.select(F.col("w.start").alias("window_start"), "c_mktsegment",
                      "n_events", "sum_value")


def stream_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink integration: each micro-batch flows RAW into
    the batch writer, which aggregates THAT batch and appends the
    per-batch partial to the sink (the pattern that connects
    Structured Streaming to any batch-only sink — keyed tables, JDBC,
    Mongo). Aggregating inside foreachBatch — not upstream — is the
    load-bearing choice: a streaming groupBy in update mode would
    emit CUMULATIVE per-key state each batch, and appending cumulative
    rows double-counts across batches. Per-batch partials are ADDITIVE
    (count + integer-cents sum), so the final re-aggregation over the
    sink equals the global batch GROUP BY no matter how the engine
    split the micro-batches — the oracle checks exactly that, and
    maxFilesPerTrigger=1 forces one batch per staged file so the
    multi-batch path actually runs (32 batches under the bench's
    multifile layout). Cents are computed JVM-side before the write,
    so no rounding ever happens in the sink."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import glob
    stage = os.path.join(tempfile.gettempdir(),
                         f"howto_mongo_bulk_update_from_parquet_spark_stream_{uuid.uuid4().hex[:8]}")
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    members = (sorted(glob.glob(os.path.join(src, "*.parquet")))
               if os.path.isdir(src) else [src])
    for i, p in enumerate(members):
        shutil.copy(p, os.path.join(stage, f"events_{i:05d}.parquet"))
    events = _open_events_stream(spark, stage, maxFilesPerTrigger=1)

    sink = os.path.join(stage, "__fb_sink")
    cents = F.round(F.col("value") * 100).cast("long")
    raw = events.select("user_id", cents.alias("cents"))

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        (batch_df.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
         .write.mode("append").parquet(sink))

    q = (raw.writeStream.foreachBatch(write_batch)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
        out = (spark.read.parquet(sink)
               .groupBy("user_id")
               .agg(F.sum("n").cast("long").alias("n_events"),
                    F.sum("c").cast("long").alias("total_cents"))
               .localCheckpoint())   # materialize before the stage dies
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out
