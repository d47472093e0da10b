"""As-of join semantics: the matched right row supplies ALL payload
columns together, including its legitimately-NULL fields (DuckDB ASOF
JOIN semantics — no per-column fallback to older right rows)."""

from howto_mongo_bulk_update_from_parquet_spark.operators.asof import asof_join


def test_asof_null_payload_not_backfilled(spark):
    left = spark.createDataFrame([("k", 10), ("k", 3), ("z", 10)],
                                 "key string, lts long")
    right = spark.createDataFrame(
        [("k", 1, 1.0, "x"), ("k", 5, None, "y")],
        "key string, rts long, a double, b string")
    out = {(r.key, r.lts): (r.a, r.b)
           for r in asof_join(left, right, left_key="key", right_key="key",
                              left_ts="lts", right_ts="rts",
                              payload=["a", "b"]).collect()}
    # ts=10 matches the ts=5 right row: a is NULL there and must STAY
    # NULL (not backfill 1.0 from the older ts=1 row)
    assert out[("k", 10)] == (None, "y")
    assert out[("k", 3)] == (1.0, "x")
    # no right match at all → all payload NULL
    assert out[("z", 10)] == (None, None)


def test_asof_equal_ts_visible_and_tiebreak(spark):
    left = spark.createDataFrame([("k", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k", 5, 1.0, 100), ("k", 5, 2.0, 200)],
        "key string, rts long, a double, tb long")
    r = asof_join(left, right, left_key="key", right_key="key",
                  left_ts="lts", right_ts="rts", payload=["a"],
                  right_tiebreak="tb").first()
    # simultaneous right row is visible (<=); greatest tiebreak wins
    assert r.a == 2.0
