"""Bucketed keyed-table base (r9 verdict item 3): the base is written
`bucketBy(n, key)` and later rounds read it through an external
bucketed table, so the merge's full-outer join has NO Exchange on the
base side — repeated upsert rounds stop re-shuffling the full table."""

import os

from howto_mongo_bulk_update_from_parquet_spark.operators.merge import keyed_upsert
from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    append_delta, compact, current_base_version, delete_from_keyed_table,
    read_keyed_table, read_merged, table_meta, upsert_into_keyed_table)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _bucket_files(path, version):
    d = os.path.join(path, f"base_v{version:05d}")
    return [f for f in os.listdir(d)
            if f.startswith("part-") and f.endswith(".parquet")]


def test_bucketed_base_roundtrips_and_inherits(spark, tmp_path):
    p = str(tmp_path / "bkt")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                            path=p, key="k", updated_at_col=None, buckets=4)
    meta = table_meta(spark, p)
    assert meta["buckets"] == "4" and meta["bucket_key"] == "k"
    # bucketed file names carry the bucket id (_NNNNN before .c000)
    assert any("_0000" in f for f in _bucket_files(p, 1))
    # round 2: bucketing inherited without re-passing the parameter
    out = upsert_into_keyed_table(spark, _df(spark, [(2, "b2"), (3, "c")]),
                                  path=p, key="k", updated_at_col=None)
    assert {r.k: r.v for r in out.collect()} == {1: "a", 2: "b2", 3: "c"}
    assert table_meta(spark, p)["buckets"] == "4"
    assert any("_0000" in f for f in _bucket_files(p, 2))
    # plain readers are unaffected — bucket files are ordinary parquet
    assert read_keyed_table(spark, p).count() == 3
    # explicit buckets=0 un-buckets the table
    upsert_into_keyed_table(spark, _df(spark, [(4, "d")]),
                            path=p, key="k", updated_at_col=None, buckets=0)
    assert "buckets" not in table_meta(spark, p)


def test_bucketed_merge_plan_has_no_base_exchange(spark, tmp_path):
    """The plan pin: in the round-2 merge join, the base scan's bucket
    partitioning satisfies the join distribution — exactly ONE
    Exchange in the plan (the source side), and the scan reports its
    selected buckets. Two consecutive rounds are checked so the
    property holds from bucketed base to bucketed base."""
    p = str(tmp_path / "plan")
    # sizing rule under test AND documented on upsert_into_keyed_table:
    # the planner keeps the bucketed scan only while the bucket count
    # is >= the join's shuffle parallelism — with fewer buckets it
    # re-shuffles the base UP and the bucketing buys nothing. Pin the
    # session parallelism to the bucket count (tests elsewhere in the
    # suite legitimately run with other values).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                                path=p, key="k", updated_at_col=None,
                                buckets=8)
        for rnd in (2, 3):
            version = current_base_version(spark, p)
            assert version == rnd - 1
            target = kt._read_base_bucketed(spark, p, version, "k", 8)
            merged = keyed_upsert(target, _df(spark, [(rnd, "x")]), "k",
                                  updated_at_col=None)
            plan = merged._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
            # the base is the join's FIRST child: its subtree lines carry
            # the ':' tree prefix — none of them may be an Exchange (the
            # bucketed scan already satisfies the join distribution);
            # every Exchange in the plan belongs to the source subtree
            base_subtree = [ln for ln in plan.splitlines()
                            if ln.lstrip().startswith(":")]
            assert any("Bucketed: true" in ln for ln in base_subtree)
            assert not any("Exchange" in ln for ln in base_subtree)
            # and the real write-path round produces the same content as
            # the reference merge semantics
            out = upsert_into_keyed_table(spark, _df(spark, [(rnd, "x")]),
                                          path=p, key="k",
                                          updated_at_col=None)
            assert {r.k for r in out.collect()} == set(range(1, rnd + 1))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_bucketing_survives_compact_and_delete(spark, tmp_path):
    p = str(tmp_path / "surv")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                            path=p, key="k", updated_at_col=None, buckets=4)
    append_delta(spark, _df(spark, [(3, "c")]), path=p, key="k")
    compact(spark, p, "k")
    assert table_meta(spark, p)["buckets"] == "4"
    assert any("_0000" in f
               for f in _bucket_files(p, current_base_version(spark, p)))
    out = delete_from_keyed_table(
        spark, spark.createDataFrame([(1,)], "k long"), path=p, key="k")
    assert {r.k for r in out.collect()} == {2, 3}
    assert table_meta(spark, p)["buckets"] == "4"
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {2, 3}


def test_cli_upsert_buckets_flag(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    from howto_mongo_bulk_update_from_parquet_spark.sources.generate import (
        generate_pipeline_data)
    data = str(tmp_path / "src")
    table = str(tmp_path / "cli_bkt")
    generate_pipeline_data(spark, 200, seed=3).write.parquet(data)
    assert main(["upsert", "--path", data, "--table", table,
                 "--buckets", "4"]) == 0
    meta = table_meta(spark, table)
    assert meta["buckets"] == "4" and meta["bucket_key"] == "_id"
    assert any("_0000" in f for f in _bucket_files(table, 1))
    # second round inherits without the flag
    assert main(["upsert", "--path", data, "--table", table]) == 0
    assert table_meta(spark, table)["buckets"] == "4"
    assert read_keyed_table(spark, table).count() == 200


def test_honor_buckets_read_feeds_exchange_free_probe_join(spark, tmp_path):
    """r11: `read_keyed_table(honor_buckets=True)` attaches the bucket
    metadata, so an index-table probe join keyed on the bucket key
    (the dedup-incremental gram index, bucket-keyed on h) plans with
    NO Exchange on the index side — only the arriving batch shuffles.
    A plain read of the same table still re-shuffles both sides."""
    from pyspark.sql import functions as F
    p = str(tmp_path / "probe_idx")
    pins = {"spark.sql.shuffle.partitions": "8",
            # force the shuffle-join shape the pin is about — at real
            # index sizes the index side is far past any broadcast cut
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    prev = {k: spark.conf.get(k, None) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    try:
        idx = spark.range(200).select(
            F.md5(F.col("id").cast("string")).alias("h"),
            F.col("id").alias("rep_id"))
        upsert_into_keyed_table(spark, idx, path=p, key="h",
                                updated_at_col=None, buckets=8)
        batch = spark.range(50).select(
            F.md5((F.col("id") * 3).cast("string")).alias("h"),
            F.col("id").alias("doc_id"))
        bucketed = read_keyed_table(spark, p, honor_buckets=True)
        probe = batch.join(bucketed.select("h"), "h", "left_semi")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount" in plan
        # exactly ONE Exchange in the whole plan — the batch side; the
        # bucketed index scan feeds the join distribution as-is
        assert plan.count("Exchange") == 1
        # the plain read of the same table re-shuffles BOTH sides
        plain = read_keyed_table(spark, p)
        plain_probe = batch.join(plain.select("h"), "h", "left_semi")
        plain_plan = plain_probe._jdf.queryExecution() \
                                     .executedPlan().toString()
        assert plain_plan.count("Exchange") == 2
        # correctness unchanged between the two reads
        want = {r.h for r in plain_probe.collect()}
        got = {r.h for r in probe.collect()}
        assert got == want and len(got) > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
