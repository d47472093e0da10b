"""Operator-level contracts for grouped_topk and
exact_grouped_percentile — the r7 ADVICE edges: payload columns and
NULL group keys must survive grouped_topk exactly as they survive the
row_number window idiom, and NULL values must not shift
exact_grouped_percentile's positions (built-ins ignore them)."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from howto_mongo_bulk_update_from_parquet_spark.operators.percentiles import (
    exact_grouped_percentile)
from howto_mongo_bulk_update_from_parquet_spark.operators.topk import grouped_topk


def _window_topk(df, group, order, k, tie):
    w = Window.partitionBy(group).orderBy(F.col(order).desc(),
                                          F.col(tie).asc())
    return (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k))


def test_grouped_topk_keeps_payload_and_null_groups(spark):
    rows = [("a", 1, 10.0, "p1"), ("a", 2, 30.0, "p2"),
            ("a", 3, 20.0, "p3"), ("b", 4, 5.0, "p4"),
            (None, 5, 7.0, "p5"), (None, 6, 9.0, "p6"),
            (None, 7, 8.0, "p7")]
    df = spark.createDataFrame(rows, "g string, id long, v double, payload string")
    got = grouped_topk(df, ["g"], "v", 2, tie_cols=["id"])
    want = _window_topk(df, "g", "v", 2, "id")
    assert sorted(got.columns) == sorted(want.columns)
    key = lambda r: (r["g"] is None, r["g"] or "", r["id"])  # noqa: E731
    g, w = (sorted([r.asDict() for r in x.collect()], key=key)
            for x in (got, want))
    assert g == w
    # payload survived and the NULL group ranked as its own partition
    assert any(r["g"] is None for r in g)
    assert all(r["payload"] for r in g)


def test_exact_grouped_percentile_ignores_nulls(spark):
    rows = ([("a", float(i)) for i in range(1, 101)]
            + [("a", None)] * 37
            + [("b", v) for v in (1.0, 2.0, 3.0, 4.0)]
            + [("b", None)]
            + [("c", None)])   # all-NULL group: drops from output
    df = spark.createDataFrame(rows, "g string, v double")
    got = exact_grouped_percentile(df, "g", "v", [0.5, 0.9],
                                   out_cols=["p50", "p90"])
    builtin = (df.groupBy("g")
               .agg(F.expr("percentile(v, 0.5)").alias("p50"),
                    F.expr("percentile(v, 0.9)").alias("p90"))
               .filter(F.col("p50").isNotNull()))
    g = {r.g: (r.p50, r.p90) for r in got.collect()}
    b = {r.g: (r.p50, r.p90) for r in builtin.collect()}
    assert g == b
    assert "c" not in g


def test_exact_grouped_percentile_ignores_nulls_large_group(spark):
    """Same contract on the bracket-refine (non-small) path."""
    df = (spark.range(20000)
          .select((F.col("id") % 2).alias("g"),
                  F.when(F.col("id") % 7 == 0, None)
                   .otherwise((F.col("id") * 37 % 9973).cast("double"))
                  .alias("v")))
    got = exact_grouped_percentile(df, "g", "v", [0.25, 0.95],
                                   out_cols=["p25", "p95"], small_n=100)
    builtin = (df.groupBy("g")
               .agg(F.expr("percentile(v, 0.25)").alias("p25"),
                    F.expr("percentile(v, 0.95)").alias("p95")))
    g = {r.g: (r.p25, r.p95) for r in got.collect()}
    b = {r.g: (r.p25, r.p95) for r in builtin.collect()}
    assert g == b


def test_grouped_topk_null_order_values_match_window(spark):
    """Spark windows place NULL order values FIRST under ASC and LAST
    under DESC; pandas puts NaN last regardless — the operator must
    inject na_position so both directions match the window idiom."""
    rows = [("a", 1, None), ("a", 2, 5.0), ("a", 3, 1.0), ("a", 4, None),
            ("b", 5, 2.0), ("b", 6, None)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    for ascending in (True, False):
        got = grouped_topk(df, ["g"], "v", 2, tie_cols=["id"],
                           ascending=ascending)
        direction = F.col("v").asc() if ascending else F.col("v").desc()
        w = Window.partitionBy("g").orderBy(direction, F.col("id").asc())
        want = (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 2))
        key = lambda r: (r["g"], r["id"])  # noqa: E731
        g = sorted([r.asDict() for r in got.collect()], key=key)
        x = sorted([r.asDict() for r in want.collect()], key=key)
        assert g == x, f"ascending={ascending}"


def test_grouped_topk_property_matches_window(spark):
    """Hypothesis: over random small frames (null groups, null order
    values, heavy ties, both directions, k in 1..4), grouped_topk's
    row set equals the row_number window filter exactly."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    rows = st.lists(
        st.tuples(st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                  st.integers(0, 10**6),
                  st.one_of(st.none(),
                            st.sampled_from([0.0, 1.5, 2.5, -3.0, 7.25]))),
        min_size=1, max_size=30, unique_by=lambda t: t[1])

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(rows=rows, k=st.integers(1, 4), asc=st.booleans())
    def check(rows, k, asc):
        df = spark.createDataFrame(rows, "g string, id long, v double")
        got = grouped_topk(df, ["g"], "v", k, tie_cols=["id"],
                           ascending=asc)
        direction = F.col("v").asc() if asc else F.col("v").desc()
        w = Window.partitionBy("g").orderBy(direction, F.col("id").asc())
        want = (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k))
        key = lambda r: r["id"]  # noqa: E731
        g = sorted([r.asDict() for r in got.collect()], key=key)
        x = sorted([r.asDict() for r in want.collect()], key=key)
        assert g == x

    check()
