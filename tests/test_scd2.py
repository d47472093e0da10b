"""SCD2 history: versioning on change, no-op on no-change, point-in-
time reconstruction."""

import datetime

from howto_mongo_bulk_update_from_parquet_spark.operators.scd2 import (
    scd2_apply, scd2_as_of, scd2_init)

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)


def _hist(df):
    return {(r["_id"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
            for r in df.collect()}


def test_scd2_versions_on_change_only(spark):
    s0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "_id string, v double")
    h = scd2_init(s0, "_id", ["v"], effective=T0)

    # round 1: a changes, b unchanged, c appears
    s1 = spark.createDataFrame([("a", 9.0), ("b", 2.0), ("c", 3.0)],
                               "_id string, v double")
    h = scd2_apply(h, s1, "_id", ["v"], effective=T1)
    got = _hist(h)
    assert got[("a", T0)] == (1.0, T1, False)       # closed
    assert got[("a", T1)] == (9.0, None, True)      # new version
    assert got[("b", T0)] == (2.0, None, True)      # untouched
    assert got[("c", T1)] == (3.0, None, True)      # inserted
    assert len(got) == 4

    # round 2: only b changes — a/c history untouched
    s2 = spark.createDataFrame([("b", 5.0)], "_id string, v double")
    h = scd2_apply(h, s2, "_id", ["v"], effective=T2)
    got = _hist(h)
    assert got[("b", T0)] == (2.0, T2, False)
    assert got[("b", T2)] == (5.0, None, True)
    assert got[("a", T1)] == (9.0, None, True)
    assert got[("c", T1)] == (3.0, None, True)      # absent-from-source kept
    assert len(got) == 5                            # a×2, b×2, c×1


def test_scd2_null_transitions_version(spark):
    h = scd2_init(spark.createDataFrame([("a", None)], "_id string, v double"),
                  "_id", ["v"], effective=T0)
    h = scd2_apply(h, spark.createDataFrame([("a", 1.0)], "_id string, v double"),
                   "_id", ["v"], effective=T1)
    got = _hist(h)
    assert got[("a", T0)] == (None, T1, False)      # NULL -> value versions
    assert got[("a", T1)] == (1.0, None, True)


def test_scd2_point_in_time(spark):
    h = scd2_init(spark.createDataFrame([("a", 1.0)], "_id string, v double"),
                  "_id", ["v"], effective=T0)
    h = scd2_apply(h, spark.createDataFrame([("a", 2.0)], "_id string, v double"),
                   "_id", ["v"], effective=T2)
    mid = datetime.datetime(2024, 1, 15)
    assert scd2_as_of(h, mid).first()["v"] == 1.0
    assert scd2_as_of(h, T2).first()["v"] == 2.0    # boundary: new version
    assert scd2_as_of(h, datetime.datetime(2023, 1, 1)).count() == 0
