"""Structured logging: JSON-lines shape, timing, error channel, and
the CLI's query/upsert records."""

import io
import json
import os

import pytest

from howto_mongo_bulk_update_from_parquet_spark.observability import StructuredLog


def test_event_record_shape():
    buf = io.StringIO()
    log = StructuredLog(stream=buf)
    rec = log.event("write_complete", table="t", n_matched=3)
    line = json.loads(buf.getvalue())
    assert line == rec
    assert line["event"] == "write_complete"
    assert line["component"] == "howto_mongo_bulk_update_from_parquet_spark"
    assert line["table"] == "t" and line["n_matched"] == 3
    assert "ts" in line


def test_timed_emits_duration_and_body_fields():
    buf = io.StringIO()
    with StructuredLog(stream=buf).timed("step", stage="s1") as rec:
        rec["rows"] = 42
    line = json.loads(buf.getvalue())
    assert line["event"] == "step"
    assert line["stage"] == "s1" and line["rows"] == 42
    assert isinstance(line["duration_s"], float) and line["duration_s"] >= 0


def test_timed_error_channel_reraises():
    buf = io.StringIO()
    with pytest.raises(ValueError):
        with StructuredLog(stream=buf).timed("step"):
            raise ValueError("boom")
    line = json.loads(buf.getvalue())
    assert line["event"] == "step_error"
    assert "boom" in line["error"]


def test_cli_query_emits_structured_timing(spark, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    assert main(["query", "--name", "q_filter_project",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    records = [json.loads(ln) for ln in out.splitlines()
               if ln.startswith("{")]
    q = [r for r in records if r["event"] == "query_complete"]
    assert len(q) == 1
    assert q[0]["query"] == "q_filter_project"
    assert q[0]["rows"] >= 0
    assert q[0]["duration_s"] > 0


def test_cli_upsert_emits_structured_counts(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    data = os.path.join(str(tmp_path), "data")
    table = os.path.join(str(tmp_path), "table")
    assert main(["generate", "--path", data, "--n-rows", "100",
                 "--n-files", "1"]) == 0
    assert main(["upsert", "--path", data, "--table", table]) == 0
    out = capsys.readouterr().out
    recs = [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]
    u = [r for r in recs if r["event"] == "upsert_complete"]
    assert len(u) == 1
    assert u[0]["rows"] == 100
    assert u[0]["n_upserted"] == 100 and u[0]["n_matched"] == 0
    assert u[0]["duration_s"] > 0
