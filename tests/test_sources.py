"""Tests for sources: schema-explicit scan, nanos-timestamp handling,
seeded generator, parquet round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.schemas import PIPELINE_SCHEMA, TESTDATA_SCHEMAS
from howto_mongo_bulk_update_from_parquet_spark.sources.generate import generate_pipeline_data
from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table, write_parquet

SF = "/root/testdata/sf0.001"


def test_load_table_schema_is_declared_not_inferred(spark):
    df = load_table(spark, SF, "lineitem")
    assert df.schema == TESTDATA_SCHEMAS["lineitem"]


def test_events_nanos_ts_matches_duckdb(spark):
    import duckdb
    df = load_table(spark, SF, "events").orderBy("event_id").limit(5)
    got = [(r.event_id, r.ts) for r in df.collect()]
    want = duckdb.sql(
        f"SELECT event_id, ts FROM read_parquet('{SF}/events.parquet') "
        "ORDER BY event_id LIMIT 5").fetchall()
    assert got == want


def test_generator_deterministic_and_bounded(spark):
    a = generate_pipeline_data(spark, 500, seed=7, null_fraction=0.2)
    b = generate_pipeline_data(spark, 500, seed=7, null_fraction=0.2)
    assert a.schema == PIPELINE_SCHEMA or [f.name for f in a.schema.fields] == [f.name for f in PIPELINE_SCHEMA.fields]
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb)
    assert pa["_id"].iloc[0] == "id-000000000000"
    assert pa["_id"].is_unique
    assert pa["score"].between(0, 1).all()
    assert pa["feature_1"].isna().any()          # nulls injected
    assert pa["feature_1"].dropna().between(0, 1).all()


def test_generation_contract_discriminates(spark):
    """The q_generate oracle flags are computed from the real data, so
    they must actually discriminate: a generator run with a WRONG
    null_fraction (seeded mutation) or duplicated ids flips them to
    False; the honest run keeps them all True."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sources.generate import (
        generation_contract)

    feats = [f"feature_{i}" for i in range(1, 5)]
    good = generation_contract(
        generate_pipeline_data(spark, 2000, seed=42, null_fraction=0.1),
        2000, null_fraction=0.1, nullable_cols=feats).toPandas()
    assert good["ids_unique"].all() and good["null_counts_ok"].all()
    # mutation 1: generator wired to 0.5 while the contract claims 0.1
    # (~22σ outside the binomial acceptance interval) — must fail
    mutated = generation_contract(
        generate_pipeline_data(spark, 2000, seed=42, null_fraction=0.5),
        2000, null_fraction=0.1, nullable_cols=feats).toPandas()
    assert not mutated["null_counts_ok"].any()
    # mutation 2: id collision — constant ids must flip ids_unique
    dup = generate_pipeline_data(spark, 100, seed=42) \
        .withColumn("_id", F.lit("id-dup"))
    flagged = generation_contract(dup, 100, null_fraction=0.0,
                                  nullable_cols=feats).toPandas()
    assert not flagged["ids_unique"].any()


def test_generator_different_seed_differs(spark):
    a = generate_pipeline_data(spark, 100, seed=1).toPandas()
    b = generate_pipeline_data(spark, 100, seed=2).toPandas()
    assert not a["score"].equals(b["score"])


def test_parquet_round_trip(spark, tmp_path):
    out = os.path.join(str(tmp_path), "pipe")
    df = generate_pipeline_data(spark, 1000, seed=42, null_fraction=0.1)
    write_parquet(df, out, n_files=4)
    back = spark.read.schema(PIPELINE_SCHEMA).parquet(out)
    assert back.count() == 1000
    assert len(back.inputFiles()) == 4
    # content identical (order-insensitive)
    assert (df.exceptAll(back).count() == 0 and back.exceptAll(df).count() == 0)


def test_filter_pushdown_reaches_scan(spark):
    df = (load_table(spark, SF, "lineitem")
          .filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_partitioned_layout_prunes_at_scan(spark, tmp_path):
    """The 100 TB layout story: a table written partitionBy(col) must
    let an equality filter prune whole directories — PartitionFilters
    in the scan and only the matching partition's files read."""
    out = os.path.join(str(tmp_path), "by_flag")
    df = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    write_parquet(df, out, partition_by=["l_returnflag"])

    scan = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the filter lands in PartitionFilters (directory pruning), not in
    # PushedFilters (row-group filtering) — whole partitions are skipped
    # at planning time. (inputFiles() lists the unpruned relation, so
    # the plan text is the observable.)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert "(l_returnflag" in plan.split("PartitionFilters")[1][:120]
    # layout on disk is one directory per value
    assert any(d.startswith("l_returnflag=R") for d in os.listdir(out))
    # values survive the partitioned round trip
    want = df.filter(F.col("l_returnflag") == "R").count()
    assert scan.count() == want > 0


def test_permissive_json_keeps_corrupt_records(spark, tmp_path):
    # reference note 6: bad input degrades to log-and-continue, never
    # aborts the job (/root/reference/src/func/parquet.py:40-42). Spark
    # equivalent: PERMISSIVE mode + _corrupt_record column.
    import os
    from pyspark.sql import types as T
    p = os.path.join(str(tmp_path), "mixed.json")
    with open(p, "w") as fh:
        fh.write('{"_id": "a", "score": 0.5}\n')
        fh.write('this is not json at all\n')
        fh.write('{"_id": "b", "score": 0.7}\n')
    schema = T.StructType([
        T.StructField("_id", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (spark.read.schema(schema).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record").json(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["_id"] for r in good} == {"a", "b"}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def _events_rows():
    import datetime as dt
    return {
        "event_id": [0, 1],
        "ts": [dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
               dt.datetime(2024, 6, 15, 12, 30, 45, 654321)],
        "user_id": [10, 20],
        "event_type": ["view", "purchase"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }


def _write_events(dirpath, unit):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table(_events_rows())
    t = t.set_column(1, "ts", t["ts"].cast(pa.timestamp(unit), safe=False))
    pq.write_table(t, str(dirpath / "events.parquet"))


def test_events_loader_handles_all_parquet_ts_units(spark, tmp_path):
    """The driver has regenerated events.ts with a different parquet
    time unit between rounds (ns in r1-r4, µs in r5). Chaos-cover the
    WHOLE unit space: s / ms / µs / ns arrow columns (parquet stores
    s as ms — pyarrow coerces on write), asserting the loader lands
    every variant in the same sane timestamp range [2020, 2030) with
    sub-second precision truncated to the stored unit."""
    import datetime as dt

    rows = _events_rows()
    truncated = {
        "s": [t.replace(microsecond=0) for t in rows["ts"]],
        "ms": [t.replace(microsecond=t.microsecond // 1000 * 1000)
               for t in rows["ts"]],
        "us": rows["ts"],
        "ns": rows["ts"],
    }
    for unit in ("s", "ms", "us", "ns"):
        d = tmp_path / f"{unit}_dir"
        d.mkdir()
        _write_events(d, unit)
        got = {(r.event_id, r.ts) for r in
               load_table(spark, str(d), "events").collect()}
        want = {(0, truncated[unit][0]), (1, truncated[unit][1])}
        assert got == want, unit
        assert all(dt.datetime(2020, 1, 1) <= ts < dt.datetime(2030, 1, 1)
                   for _, ts in got), unit


def test_events_ts_unit_probe_survives_in_place_regeneration(spark, tmp_path):
    """The unit probe caches per (path, mtime): regenerating the SAME
    file with a different unit — which the driver has actually done —
    must re-probe, not serve the stale verdict."""
    import os
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        events_ts_is_nanos)
    p = tmp_path / "events.parquet"
    _write_events(tmp_path, "us")
    assert events_ts_is_nanos(str(p)) is False
    _write_events(tmp_path, "ns")
    os.utime(str(p), (1, 1))          # force a distinct mtime
    assert events_ts_is_nanos(str(p)) is True
    # absent path: expected fallthrough, not an exception
    assert events_ts_is_nanos(str(tmp_path / "nope.parquet")) is False


def test_binary_file_source_reads_opaque_media(spark, tmp_path):
    """Multimodal raw-bytes layer: binaryFile rows carry the exact
    file content; pathGlobFilter prunes at listing time."""
    from howto_mongo_bulk_update_from_parquet_spark.sources.binary import load_binary_files
    (tmp_path / "a.png").write_bytes(b"\x89PNG-fake-a")
    (tmp_path / "b.png").write_bytes(b"\x89PNG-fake-bb")
    (tmp_path / "skip.txt").write_bytes(b"not media")
    df = load_binary_files(spark, str(tmp_path), glob="*.png")
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content))
            for r in df.collect()}
    assert rows == {"a.png": (11, b"\x89PNG-fake-a"),
                    "b.png": (12, b"\x89PNG-fake-bb")}
