"""Snapshot diff (CDC) — incl. diffing two retained keyed-table
versions via time travel."""

import os

from howto_mongo_bulk_update_from_parquet_spark.operators.diff import diff_snapshots
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    read_keyed_table, upsert_into_keyed_table)


def test_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [("a", 1.0, "x"), ("b", 2.0, "y"), ("c", None, "z"), ("d", 4.0, "w")],
        "_id string, v double, tag string")
    new = spark.createDataFrame(
        [("a", 1.0, "x"),            # unchanged → dropped
         ("b", 9.0, "y"),            # updated (value)
         ("c", 3.0, "z"),            # updated (NULL → value, null-safe)
         ("e", 5.0, "q")],           # inserted; d deleted
        "_id string, v double, tag string")
    got = {r["_id"]: r for r in diff_snapshots(old, new, "_id").collect()}
    assert set(got) == {"b", "c", "d", "e"}
    assert got["b"]["change"] == "updated" and got["b"]["v_old"] == 2.0 \
        and got["b"]["v_new"] == 9.0
    assert got["c"]["change"] == "updated" and got["c"]["v_old"] is None
    assert got["d"]["change"] == "deleted" and got["d"]["v_new"] is None
    assert got["e"]["change"] == "inserted" and got["e"]["v_old"] is None


def test_diff_handles_schema_evolution(spark):
    old = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    new = spark.createDataFrame([("a", 1.0, "fresh")],
                                "_id string, v double, note string")
    rows = diff_snapshots(old, new, "_id").collect()
    assert len(rows) == 1
    assert rows[0]["change"] == "updated"
    assert rows[0]["note_old"] is None and rows[0]["note_new"] == "fresh"


def test_diff_of_retained_keyed_table_versions(spark, tmp_path):
    path = os.path.join(str(tmp_path), "cdc")
    r1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r1, path=path, key="_id")
    r2 = spark.createDataFrame([("a", 7.0), ("c", 3.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r2, path=path, key="_id",
                            retain_versions=2)
    d = diff_snapshots(read_keyed_table(spark, path, version=1),
                       read_keyed_table(spark, path, version=2),
                       "_id", payload=["v"])
    got = {r["_id"]: (r["change"], r["v_old"], r["v_new"]) for r in d.collect()}
    # merge semantics: a updated, c inserted, b untouched (not in diff)
    assert got == {"a": ("updated", 1.0, 7.0), "c": ("inserted", None, 3.0)}
