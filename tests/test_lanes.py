"""Bench lane classification (verdict r12 #3): every catalog query
gets exactly one lane; the CYCLE set names only real catalog queries;
the known multi-job and streaming members land where the bench
reporting expects them."""

from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
from howto_mongo_bulk_update_from_parquet_spark.plans.lanes import (
    CYCLE_QUERIES, LANES, lane_of)


def test_every_query_classified_and_cycle_set_is_live():
    names = set(all_queries())
    assert CYCLE_QUERIES <= names, (
        "CYCLE_QUERIES names queries absent from the catalog: "
        f"{sorted(CYCLE_QUERIES - names)}")
    for n in names:
        assert lane_of(n) in LANES


def test_known_members():
    assert lane_of("q_keyed_pruned_compact") == "cycle"
    assert lane_of("q_curate_pipeline") == "cycle"
    assert lane_of("q_generate") == "cycle"
    assert lane_of("q_stream_dedup") == "streaming"
    assert lane_of("q_stream_first_seen_ttl") == "streaming"
    assert lane_of("q1_pricing_summary") == "analytics"
    assert lane_of("q_pagerank") == "analytics"


def test_lane_sizes_are_sane():
    names = list(all_queries())
    by = {ln: [n for n in names if lane_of(n) == ln] for ln in LANES}
    assert len(by["cycle"]) == len(CYCLE_QUERIES)
    assert len(by["streaming"]) >= 10       # the q_stream_ family
    # analytics dominates: the headline lane is the bulk of the catalog
    assert len(by["analytics"]) > 0.8 * len(names)
