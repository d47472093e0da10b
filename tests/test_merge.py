"""Unit tests for the keyed bulk-upsert operator — the reference's
semantic contract (SURVEY §2.1 notes 1-6; /root/reference/src/func/mongo.py:28-79):

1. key-equality match, 2. null payload skipped (never clobbers),
3. null-key rows dropped, 4. updatedAt stamped on written rows,
5. duplicate source keys → deterministic latest-per-key,
6. untouched target rows pass through.
"""

import pytest
from pyspark.sql import Row

from howto_mongo_bulk_update_from_parquet_spark.operators.merge import keyed_upsert, prepare_source


def _target(spark):
    return spark.createDataFrame([
        Row(_id="a", f1=1.0, f2=10.0, score=0.5),
        Row(_id="b", f1=2.0, f2=20.0, score=0.6),
        Row(_id="c", f1=3.0, f2=30.0, score=0.7),
    ])


def _rows(df):
    return {r["_id"]: r.asDict() for r in df.collect()}


def test_update_overwrites_non_null_fields(spark):
    src = spark.createDataFrame([Row(_id="a", f1=100.0, f2=200.0, score=0.9)])
    out = _rows(keyed_upsert(_target(spark), src, "_id", updated_at_col=None))
    assert out["a"] == {"_id": "a", "f1": 100.0, "f2": 200.0, "score": 0.9}


def test_null_payload_preserves_target_value(spark):
    # reference mongo.py:62 — None fields are skipped from $set
    src = spark.createDataFrame([("a", None, 999.0, None)],
                                "_id string, f1 double, f2 double, score double")
    out = _rows(keyed_upsert(_target(spark), src, "_id", updated_at_col=None))
    assert out["a"]["f1"] == 1.0      # preserved, not nulled
    assert out["a"]["f2"] == 999.0    # updated
    assert out["a"]["score"] == 0.5   # preserved


def test_fresh_insert_keeps_nulls_absent(spark):
    # a new key with null features inserts with those fields null
    src = spark.createDataFrame([("z", None, 7.0, 0.1)],
                                "_id string, f1 double, f2 double, score double")
    out = _rows(keyed_upsert(_target(spark), src, "_id", updated_at_col=None))
    assert out["z"]["f1"] is None
    assert out["z"]["f2"] == 7.0
    assert len(out) == 4


def test_null_key_rows_dropped(spark):
    # reference mongo.py:50-53 — row dropped, job continues
    src = spark.createDataFrame([(None, 5.0, 5.0, 5.0), ("b", 22.0, None, None)],
                                "_id string, f1 double, f2 double, score double")
    out = _rows(keyed_upsert(_target(spark), src, "_id", updated_at_col=None))
    assert len(out) == 3              # no phantom row
    assert out["b"]["f1"] == 22.0


def test_duplicate_keys_latest_wins_deterministically(spark):
    # reference leaves this racy (ordered=False); we order by tie-breaker
    src = spark.createDataFrame([
        Row(_id="a", ver=1, f1=111.0),
        Row(_id="a", ver=3, f1=333.0),
        Row(_id="a", ver=2, f1=222.0),
    ])
    out = _rows(keyed_upsert(_target(spark), src, "_id",
                             payload=["f1"], dedup_order_by=["ver"],
                             updated_at_col=None))
    assert out["a"]["f1"] == 333.0


def test_untouched_rows_pass_through(spark):
    src = spark.createDataFrame([("a", 100.0, None, None)],
                                "_id string, f1 double, f2 double, score double")
    out = _rows(keyed_upsert(_target(spark), src, "_id", updated_at_col=None))
    assert out["b"] == {"_id": "b", "f1": 2.0, "f2": 20.0, "score": 0.6}
    assert out["c"] == {"_id": "c", "f1": 3.0, "f2": 30.0, "score": 0.7}


def test_updated_at_stamped_only_on_written_rows(spark):
    src = spark.createDataFrame([("a", 100.0, None, None)],
                                "_id string, f1 double, f2 double, score double")
    out = _rows(keyed_upsert(_target(spark), src, "_id"))
    assert out["a"]["updatedAt"] is not None    # written → stamped
    assert out["b"]["updatedAt"] is None        # untouched, target had no col


def test_updated_at_preserved_for_untouched_when_target_has_col(spark):
    import datetime
    old = datetime.datetime(2020, 1, 1)
    tgt = spark.createDataFrame([Row(_id="a", f1=1.0, updatedAt=old),
                                 Row(_id="b", f1=2.0, updatedAt=old)])
    src = spark.createDataFrame([Row(_id="a", f1=9.0)])
    out = _rows(keyed_upsert(tgt, src, "_id", payload=["f1"]))
    assert out["b"]["updatedAt"] == old
    assert out["a"]["updatedAt"] != old


def test_prepare_source_drops_null_keys_and_dedups(spark):
    src = spark.createDataFrame([(None, 1), ("x", 1), ("x", 9), ("y", 2)],
                                "k string, v int")
    rows = {r["k"]: r["v"] for r in prepare_source(src, "k", ["v"]).collect()}
    assert rows == {"x": 9, "y": 2}


def test_payload_subset_leaves_other_columns(spark):
    # only f1 in payload: f2/score must not change even when source has them
    src = spark.createDataFrame([Row(_id="a", f1=100.0, f2=888.0, score=0.0)])
    out = _rows(keyed_upsert(_target(spark), src, "_id", payload=["f1"],
                             updated_at_col=None))
    assert out["a"]["f1"] == 100.0
    assert out["a"]["f2"] == 10.0
    assert out["a"]["score"] == 0.5
