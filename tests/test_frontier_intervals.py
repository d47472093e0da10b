"""Skyline kernel + gaps-and-islands semantics tests (the catalog
oracle equivalence runs in selfcheck; these pin the tricky edges:
dominance ties, duplicate points, local-prune soundness, island
merging of touching/disjoint/nested intervals)."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from howto_mongo_bulk_update_from_parquet_spark.operators.skyline import (
    _skyline_kernel, skyline_2d)


def brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in points)
        if not dominated:
            out.append(p)
    return sorted(out)


def kernel(points):
    pdf = pd.DataFrame(points, columns=["m1", "m2"])
    res = _skyline_kernel(pdf, "m1", "m2")
    return sorted(map(tuple, res.values))


def test_kernel_ties_and_duplicates():
    # duplicate maximal points both survive; equal-m2-at-higher-m1
    # dominates; in-class lower m2 dominated
    pts = [(5, 1.0), (5, 1.0), (4, 1.0), (4, 0.5), (3, 2.0), (2, 2.0)]
    assert kernel(pts) == brute_skyline(pts)
    assert kernel(pts) == [(3, 2.0), (5, 1.0), (5, 1.0)]


def test_kernel_single_and_empty():
    assert kernel([(1, 1.0)]) == [(1, 1.0)]
    assert _skyline_kernel(pd.DataFrame(columns=["m1", "m2"]), "m1", "m2").empty


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_kernel_matches_bruteforce(pts):
    pts = [(a, float(b)) for a, b in pts]
    assert kernel(pts) == brute_skyline(pts)


def test_skyline_2d_distributed_equals_bruteforce(spark):
    # spread across many partitions so the local-prune + global-merge
    # path actually exercises both stages
    pts = [(i, float((i * 7) % 13)) for i in range(200)] + [(199, 12.0)]
    df = spark.createDataFrame(pts, "m1 long, m2 double").repartition(8)
    got = sorted((r.m1, r.m2) for r in skyline_2d(df, "m1", "m2").collect())
    assert got == brute_skyline(pts)


def test_gaps_islands_merges_touching_and_nested(spark, tmp_path):
    # orders for one customer: overlapping, exactly-adjacent (start ==
    # prev end + 1 day is a NEW island: strict > on running max end),
    # and nested intervals
    days = [dt.datetime(2024, 1, d) for d in (1, 4, 2, 20, 27)]
    rows = [(i + 1, 7, "O", 1.0, d, "1-URGENT") for i, d in enumerate(days)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    from howto_mongo_bulk_update_from_parquet_spark.plans.intervals import q_gaps_islands
    out = {r.custkey: r for r in q_gaps_islands(spark, str(tmp_path)).collect()}
    r = out[7]
    # [1..10] (1,2,4 merge: 1+6=7 overlaps 2 and 4; ends 10), [20..26]
    # starts a new island (20 > 10), [27..2/2] touches 26+1 — strict >
    # makes 27 > 26 TRUE → third island [27..33]
    assert r.n_islands == 3
    assert r.covered_days == 10 + 7 + 7
    assert r.widest_days == 10


@pytest.mark.parametrize("n", [1])
def test_gaps_islands_single_order(spark, tmp_path, n):
    df = spark.createDataFrame(
        [(1, 1, "O", 1.0, dt.datetime(2024, 3, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    from howto_mongo_bulk_update_from_parquet_spark.plans.intervals import q_gaps_islands
    [r] = q_gaps_islands(spark, str(tmp_path)).collect()
    assert (r.n_islands, r.covered_days, r.widest_days) == (1, 7, 7)
