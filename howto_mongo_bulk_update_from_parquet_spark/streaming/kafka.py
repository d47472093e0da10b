"""Kafka stream source — the production source the file-staged
streaming jobs swap to (their transformations are source-agnostic,
proven by tests/test_streaming.py::test_rate_source_windowed_counts).

The spark-sql-kafka jars are not on this environment's classpath, so
the reader is gated the same way as sinks/table_formats.py: building
the options is pure logic (tested), `.load()` requires the package
`org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>` at submit time.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:  # noqa: BLE001
        return False


def kafka_reader_options(bootstrap: str, topic: str, *,
                         starting: str = "latest",
                         max_offsets_per_trigger: int | None = None) -> dict[str, str]:
    """The option set a Kafka events stream needs; separated from the
    reader so it is testable without the jars."""
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting,
        # fail loudly on data loss by default — silent gaps are worse
        "failOnDataLoss": "true",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_events_stream_kafka(spark: SparkSession, bootstrap: str, topic: str,
                             schema: T.StructType, *,
                             starting: str = "latest",
                             max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Events as a Kafka stream: JSON values parsed against the
    explicit schema (never inferred), event time from the payload (not
    the broker timestamp — watermarks need the domain clock)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            "Kafka connector jars not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>, "
            "or stage files and use the parquet streaming source")
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
            bootstrap, topic, starting=starting,
            max_offsets_per_trigger=max_offsets_per_trigger).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return (raw.select(F.from_json(F.col("value").cast("string"),
                                   schema).alias("j"))
            .select("j.*"))


def event_to_kafka_json(df: DataFrame, key_col: str) -> DataFrame:
    """Writer-side twin: (key, value) JSON frame for `format("kafka")`."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(F.col(key_col).cast("string").alias("key"),
                     payload.alias("value"))


def to_kafka_json_dict(row: dict) -> str:
    """Deterministic JSON encoding helper (tests)."""
    return json.dumps(row, sort_keys=True, default=str)
