"""Kafka source plumbing (jars absent here): option builder, writer
frame shape, classpath gate, and the CLI catalog listing."""

import pytest

from howto_mongo_bulk_update_from_parquet_spark.streaming.kafka import (
    event_to_kafka_json, kafka_available, kafka_reader_options,
    read_events_stream_kafka)


def test_reader_options_shape():
    opts = kafka_reader_options("b1:9092,b2:9092", "events",
                                starting="earliest",
                                max_offsets_per_trigger=50_000)
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "50000",
    }
    assert "maxOffsetsPerTrigger" not in kafka_reader_options("b", "t")


def test_kafka_gate_raises_cleanly(spark):
    from howto_mongo_bulk_update_from_parquet_spark.schemas import TESTDATA_SCHEMAS
    assert kafka_available(spark) is False     # jars absent here
    with pytest.raises(NotImplementedError, match="Kafka connector jars"):
        read_events_stream_kafka(spark, "b:9092", "events",
                                 TESTDATA_SCHEMAS["events"])


def test_event_to_kafka_json_frame(spark):
    df = spark.createDataFrame([(1, "click", 2.5)],
                               "event_id long, event_type string, value double")
    out = event_to_kafka_json(df, "event_id").first()
    assert out.key == "1"
    import json
    payload = json.loads(out.value)
    assert payload == {"event_id": 1, "event_type": "click", "value": 2.5}


def test_cli_query_list(capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "[oracle]" in out
    assert "q_approx_stats" in out and "[rows-only]" in out
    assert len(out.splitlines()) >= 80
