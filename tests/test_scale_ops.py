"""Tests for skew-salted aggregation and the stateful streaming op."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.skew import salted_sum_count

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0), ("cold", 2.0)],
        "k string, v double")
    salted = {r.k: (r.sum_value, r.n_rows)
              for r in salted_sum_count(df, "k", F.col("v").cast("decimal(18,6)"), 8)
              .select("k", F.col("sum_value").cast("double").alias("sum_value"), "n_rows")
              .collect()}
    plain = {r.k: (float(r.s), r.n) for r in
             df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain


def test_salted_partial_stage_spreads_key(spark):
    # the partial stage must produce multiple rows for a hot key
    from howto_mongo_bulk_update_from_parquet_spark.operators.skew import salted_agg
    df = spark.createDataFrame([("hot", 1.0)] * 500, "k string, v double")
    partial_rows = (df.withColumn("__salt",
                                  (F.crc32(F.monotonically_increasing_id().cast("string")) % 8))
                    .groupBy("k", "__salt").count().count())
    assert partial_rows > 1


def test_salted_join_default_salt_spreads_duplicate_rows(spark):
    """ADVICE r5: a content-derived salt maps fully-duplicated fact
    rows (the common hot-key shape) all to ONE salt, recreating the
    hot reducer. The row-position default must spread them."""
    df = spark.createDataFrame([("hot", 1.0)] * 400, "k string, v double")
    from howto_mongo_bulk_update_from_parquet_spark.operators.skew import salted_join
    dim = spark.createDataFrame([("hot", "d")], "k string, d string")
    out = salted_join(df, dim, "k", n_salts=8)
    assert out.count() == 400                       # row-identical join
    # reproduce the default salt expression: identical duplicate rows
    # must still land on >1 salt
    n_salts_hit = (df.withColumn(
        "__salt", F.crc32(F.monotonically_increasing_id().cast("string")) % 8)
        .select("__salt").distinct().count())
    assert n_salts_hit > 1


def _winsorize_exact_rank_form(spark, sf_dir):
    """Test oracle: value-inclusive winsorization via the naive full
    per-group sort (the form q_winsorize_bounds must reproduce
    without the sort)."""
    from pyspark.sql.window import Window
    from howto_mongo_bulk_update_from_parquet_spark.functions.numeric import dec
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag", "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    cut = F.expr("n * 5 DIV 100")
    bounds = (ranked.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("rn") == cut + 1, F.col("l_extendedprice")))
         .alias("lo"),
        F.min(F.when(F.col("rn") == F.col("n") - cut,
                     F.col("l_extendedprice"))).alias("hi")))
    v = F.col("l_extendedprice")
    return {r["l_returnflag"]:
            (r["lo_cut"], r["hi_cut"], r["n_kept"], r["avg_price_winsor"])
            for r in (li.join(F.broadcast(bounds), "l_returnflag")
                      .filter((v >= F.col("lo")) & (v <= F.col("hi")))
                      .groupBy("l_returnflag")
                      .agg(F.min("lo").cast("double").alias("lo_cut"),
                           F.min("hi").cast("double").alias("hi_cut"),
                           F.count(F.lit(1)).alias("n_kept"),
                           (F.sum(dec("l_extendedprice", 12, 2))
                            .cast("double") / F.count(F.lit(1)))
                           .alias("avg_price_winsor"))).collect()}


def test_winsorize_bounds_exact_on_both_paths(spark):
    """q_winsorize_bounds must equal the naive rank form on BOTH code
    paths: sf0.001 groups are under the 5000-row threshold (whole-
    group bracket), sf0.01 groups are over it (approx-percentile
    bracket + local refinement)."""
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.plans.quality import (
        _WINSOR_SMALL_N)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
    for sf_dir, expect_small in [("/root/testdata/sf0.001", True),
                                 ("/root/testdata/sf0.01", False)]:
        sizes = [r["n"] for r in
                 load_table(spark, sf_dir, "lineitem")
                 .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
                 .collect()]
        # confirm which branch this SF exercises
        assert all((n < _WINSOR_SMALL_N) == expect_small
                   for n in sizes), (sf_dir, sizes)
        got = {r["l_returnflag"]:
               (r["lo_cut"], r["hi_cut"], r["n_kept"], r["avg_price_winsor"])
               for r in all_queries()["q_winsorize_bounds"](
                   spark, sf_dir).collect()}
        want = _winsorize_exact_rank_form(spark, sf_dir)
        assert got == want, sf_dir


def test_winsorize_bracket_logic_survives_heavy_ties(spark, tmp_path):
    """Order statistics with MASSIVE ties (10 distinct values over
    8000 rows/group — far past the 5000 approx-path threshold): the
    bracket refinement must still land the exact rank-(cut+1) and
    rank-(n-cut) values, because whole runs of equal values straddle
    both brackets and the strict-below anchors."""
    import numpy as np
    from pyspark.sql import functions as F
    rng = np.random.default_rng(3)
    rows = [(("G1" if i % 2 == 0 else "G2"),
             int(i),
             int(i % 4),
             float(rng.integers(0, 10) * 10.0))
            for i in range(16000)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_orderkey long, l_linenumber int, "
              "l_extendedprice double")
    d = tmp_path / "lineitem.parquet"
    df.repartition(4).write.mode("overwrite").parquet(str(d))
    # load_table applies the full lineitem schema; columns absent from
    # this synthetic file read as null, and the query touches neither
    from howto_mongo_bulk_update_from_parquet_spark.plans.quality import (
        q_winsorize_bounds)
    got = {r["l_returnflag"]:
           (r["lo_cut"], r["hi_cut"], r["n_kept"], r["avg_price_winsor"])
           for r in q_winsorize_bounds(spark, str(tmp_path)).collect()}
    want = _winsorize_exact_rank_form(spark, str(tmp_path))
    assert got == want


def test_stream_first_seen_matches_batch(spark):
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
    from howto_mongo_bulk_update_from_parquet_spark.streaming.stateful import stream_first_seen
    from pyspark.sql.window import Window
    streamed = (stream_first_seen(spark, SF)
                .orderBy("user_id", "event_type").toPandas())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    batch = (load_table(spark, SF, "events")
             .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
             .select("user_id", "event_type",
                     F.col("event_id").alias("first_event_id"),
                     F.col("ts").alias("first_ts"))
             .orderBy("user_id", "event_type").toPandas())
    assert streamed.reset_index(drop=True).equals(batch.reset_index(drop=True))


def test_aqe_splits_skewed_join_partition(spark):
    """The automatic complement to operators/skew.py's manual salting:
    with AQE skew-join on, a sort-merge join whose one reducer holds a
    hot key gets that partition split at runtime (OptimizeSkewedJoin
    marks the join `skew=true`). Thresholds are scaled down to fixture
    size — the same optimizer path fires at the 256 MB defaults on a
    cluster."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(0, 200_000).select(
            F.lit(0).cast("long").alias("k"), F.col("id").alias("v"))
        cold = spark.range(0, 2_000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"))
        small = spark.range(0, 51).select(
            F.col("id").alias("k"), F.col("id").alias("w"))
        joined = hot.union(cold).join(small, "k")
        # collect() (not count()) so THIS dataframe's QueryExecution is
        # the one that runs — count() builds a separate plan tree and
        # joined's own adaptive plan would stay isFinalPlan=false
        assert len(joined.collect()) == 202_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_state_merge_equals_full_recompute(spark):
    """base ⊕ delta (any slicing, any merge order) == full recompute —
    bit-exact thanks to the decimal accumulators."""
    from howto_mongo_bulk_update_from_parquet_spark.operators.incremental import (
        aggregate_state, merge_agg_state, read_view)
    rows = [(f"g{i % 5}", float(i) * 1.01 if i % 7 else None)
            for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v double")
    full = {tuple(r)[:1]: tuple(r)[1:] for r in
            read_view(aggregate_state(df, ["k"], "v")).collect()}
    # slice into 3 uneven batches, merge pairwise in a skewed order
    b0 = df.filter("v IS NULL OR v < 30")
    b1 = df.filter("v >= 30 AND v < 150")
    b2 = df.filter("v >= 150")
    s = merge_agg_state(
        merge_agg_state(aggregate_state(b2, ["k"], "v"),
                        aggregate_state(b0, ["k"], "v"), ["k"]),
        aggregate_state(b1, ["k"], "v"), ["k"])
    inc = {tuple(r)[:1]: tuple(r)[1:] for r in read_view(s).collect()}
    assert inc == full
    # a group entirely inside ONE batch must pass through the merges
    only = spark.createDataFrame([("solo", 1.5)], "k string, v double")
    s2 = merge_agg_state(s, aggregate_state(only, ["k"], "v"), ["k"])
    got = {r.k: r.n_rows for r in read_view(s2).collect()}
    assert got["solo"] == 1
