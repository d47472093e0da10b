"""Invariants for the round-6 analytics tail (each already has an
oracle; these pin the properties the oracle can't state)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.01"
SF_S = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF_S, SF])
def test_quota_sums_exactly_to_budget(spark, sf):
    rows = all_queries()["q_quota_allocation"](spark, sf).collect()
    assert sum(r.quota for r in rows) == 1000
    # proportionality: quota within 1 slot of the exact share
    total = sum(r.n for r in rows)
    for r in rows:
        assert abs(r.quota - 1000 * r.n / total) < 1.0 + 1e-9


def test_weighted_median_matches_bruteforce(spark):
    got = {r.l_returnflag: (r.total_qty, r.weighted_median_price)
           for r in all_queries()["q_weighted_median"](spark, SF_S).collect()}
    li = load_table(spark, SF_S, "lineitem") \
        .select("l_returnflag", "l_extendedprice", "l_quantity",
                "l_orderkey", "l_linenumber").collect()
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, rows in by_flag.items():
        rows.sort(key=lambda r: (r.l_extendedprice, r.l_orderkey,
                                 r.l_linenumber))
        tot = sum(int(r.l_quantity) for r in rows)
        cum = 0
        for r in rows:
            cum += int(r.l_quantity)
            if 2 * cum >= tot:
                want = round(r.l_extendedprice, 6)
                break
        assert got[flag] == (tot, want), flag


def test_contrastive_negatives_clean_and_deterministic(spark):
    q = all_queries()["q_contrastive_negatives"]
    a = sorted(map(tuple, (r for r in q(spark, SF_S).collect())))
    b = sorted(map(tuple, (r for r in q(spark, SF_S).collect())))
    assert a == b                      # arithmetic probes: no RNG
    from howto_mongo_bulk_update_from_parquet_spark.operators.dedup import (
        lsh_bands, lsh_candidate_pairs, minhash_signatures, shingles)
    d = load_table(spark, SF_S, "documents")
    sig = minhash_signatures(shingles(d, "doc_id", "text", 3), "doc_id", 16)
    dups = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in lsh_candidate_pairs(
                lsh_bands(sig, "doc_id", 4), "doc_id").collect()}
    for id_a, id_b, _, neg in a:
        assert neg not in (id_a, id_b)
        assert (min(id_a, neg), max(id_a, neg)) not in dups
        assert (min(id_b, neg), max(id_b, neg)) not in dups


def test_gini_bounds_and_known_values(spark):
    rows = all_queries()["q_gini_by_group"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.gini <= 1.0  # shifted-value Gini is in [0, 1)


def test_shortest_paths_monotone_under_extra_round(spark):
    """One more relaxation round can only shrink distances (and the
    3-round result is already correct for every node within 3 hops)."""
    from howto_mongo_bulk_update_from_parquet_spark.plans import graph_rank as g
    d3 = {r.node: r.dist for r in
          all_queries()["q_shortest_paths"](spark, SF_S).collect()}
    old = g.SSSP_ROUNDS
    try:
        g.SSSP_ROUNDS = 4
        d4 = {r.node: r.dist for r in
              g.q_shortest_paths(spark, SF_S).collect()}
    finally:
        g.SSSP_ROUNDS = old
    assert set(d3) <= set(d4)
    for node, dist in d3.items():
        assert d4[node] <= dist + 1e-9
