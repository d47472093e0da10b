"""Bloom-prefiltered semi join: no-false-negative guarantee, real
selectivity, bounded build state, and a JVM-only probe plan."""

from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.operators.bloom import (
    bloom_semi_join, build_bloom_bits, might_contain)

M, K = 1 << 14, 5


def test_no_false_negatives(spark):
    keys = spark.range(0, 1000, 3).withColumnRenamed("id", "k")
    bits = build_bloom_bits(keys, "k", m_bits=M, n_hashes=K)
    probe = spark.range(0, 1000).withColumnRenamed("id", "k")
    passed = {r.k for r in probe.filter(
        might_contain(bits, F.col("k"), m_bits=M, n_hashes=K)).collect()}
    assert set(range(0, 1000, 3)) <= passed  # every inserted key passes


def test_false_positive_rate_is_small(spark):
    keys = spark.range(0, 1000).withColumnRenamed("id", "k")
    bits = build_bloom_bits(keys, "k", m_bits=M, n_hashes=K)
    # disjoint probe range: every hit is a false positive
    probe = spark.range(100_000, 120_000).withColumnRenamed("id", "k")
    fp = probe.filter(might_contain(bits, F.col("k"),
                                    m_bits=M, n_hashes=K)).count()
    # kn/m ≈ 0.3 → theoretical fp ≈ 0.2%; allow 10x headroom
    assert fp / 20_000 < 0.02


def test_build_state_bounded_by_m(spark):
    bits = build_bloom_bits(spark.range(50_000).withColumnRenamed("id", "k"),
                            "k", m_bits=M, n_hashes=K)
    assert len(bits) == M // 64  # constant, independent of build rows


def test_semi_join_exact_and_jvm_only(spark):
    probe = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    keys = (spark.range(0, 5000, 11).withColumnRenamed("id", "kk"))
    got = bloom_semi_join(probe, keys, "k", "kk", m_bits=M, n_hashes=K)
    expect = probe.join(keys.withColumnRenamed("kk", "k"), "k", "left_semi")
    assert sorted((r.k, r.v) for r in got.collect()) == \
        sorted((r.k, r.v) for r in expect.collect())
    # the probe prefilter must be pure JVM expressions — no Python
    # worker anywhere in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_auto_sizing_follows_bits_per_key_rule(spark):
    from howto_mongo_bulk_update_from_parquet_spark.operators.bloom import auto_m_bits
    assert auto_m_bits(1000) == 1 << 14          # floor
    assert auto_m_bits(30_000) == 1 << 19        # 14*30k = 420k -> 2^19
    assert auto_m_bits(10**9) == 1 << 24         # cap
    # auto-sized join stays exact
    from howto_mongo_bulk_update_from_parquet_spark.operators.bloom import bloom_semi_join
    from pyspark.sql import functions as F
    probe = spark.range(0, 3000).withColumnRenamed("id", "k")
    keys = spark.range(0, 3000, 7).withColumnRenamed("id", "kk")
    got = bloom_semi_join(probe, keys, "k", "kk").count()
    assert got == len(range(0, 3000, 7))
