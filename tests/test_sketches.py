"""HLL sketch accuracy + mergeability pins (the catalog entry is
rows-only at the driver, so the numeric contract lives here)."""

import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.plans.sketches import LG_K, q_hll_distinct

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def hll_rows(spark):
    return {r.scope: r.approx_users
            for r in q_hll_distinct(spark, SF).collect()}


def test_estimates_within_hll_error(spark, hll_rows):
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table
    e = load_table(spark, SF, "events")
    exact = {r.event_type: r.n for r in
             e.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["__all__"] = e.select("user_id").distinct().count()
    # lgK=14 → RSE ≈ 1.04/sqrt(2^14) ≈ 0.8%; allow 3 sigma
    for scope, est in hll_rows.items():
        rel = abs(est - exact[scope]) / max(exact[scope], 1)
        assert rel < 0.025, (scope, est, exact[scope])


def test_union_dominates_parts_and_bounded_by_sum(hll_rows):
    parts = [v for k, v in hll_rows.items() if k != "__all__"]
    total = hll_rows["__all__"]
    assert total >= max(parts) * 0.975   # union ⊇ every part (± est err)
    assert total <= sum(parts) * 1.025   # union ⊆ disjoint sum (± est err)


def test_sketch_merge_equals_single_pass(spark):
    """Mergeability: sketching two halves and unioning gives the SAME
    estimate as one sketch over the whole — the property that lets
    per-partition/per-day sketches compose without rescans."""
    df = spark.range(0, 20_000).select((F.col("id") % 7919).alias("u"),
                                       (F.col("id") % 2).alias("half"))
    merged = (df.groupBy("half").agg(F.hll_sketch_agg("u", F.lit(LG_K)).alias("sk"))
              .agg(F.hll_union_agg("sk").alias("sk"))
              .select(F.hll_sketch_estimate("sk").alias("est")).collect()[0].est)
    single = (df.agg(F.hll_sketch_agg("u", F.lit(LG_K)).alias("sk"))
              .select(F.hll_sketch_estimate("sk").alias("est")).collect()[0].est)
    assert merged == pytest.approx(single, rel=1e-9)
