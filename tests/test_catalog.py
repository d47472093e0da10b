"""Catalog integrity + driver-contract shape tests. Full oracle
equivalence runs in selfcheck.py / the driver; here we check the
contract invariants cheaply."""


import __spark_entry__ as entrymod
from howto_mongo_bulk_update_from_parquet_spark.plans import all_oracles, all_queries
from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def test_catalog_nonempty_and_oracle_coverage():
    qs, os_ = all_queries(), all_oracles()
    assert len(qs) >= 30
    # every oracle key corresponds to a query
    assert set(os_) <= set(qs)
    # SQL-expressible coverage should be the overwhelming majority
    assert len(os_) >= len(qs) - 5


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_every_query_returns_dataframe_lazily(spark):
    # construction (no action) must be cheap and not raise
    for name, fn in all_queries().items():
        df = fn(spark, SF)
        assert df.columns, f"{name} produced no columns"


def test_docstrings_present():
    for q in CATALOG.values():
        assert q.doc, f"{q.name} missing doc"


def test_head50_spans_every_capability():
    """The correctness harness attests a bounded prefix (cap 50) of the
    registration order, so the first 50 names must cover every SURVEY
    §2.2 category and LLM-pipeline operator — pin both the ordering
    mechanism and the category spread. (The head ROTATES between
    rounds: queries already driver-attested in CORRECTNESS_r*.json may
    yield their slot to unattested ones in the same category — e.g.
    q_simhash and q_stream_first_seen_ttl, attested r3, moved to the
    selfcheck-covered tail in r4.)"""
    from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import _HEAD
    names = list(all_queries())
    assert names[:50] == list(_HEAD)
    assert len(set(_HEAD)) == 50
    head = set(_HEAD)
    # r6 map: the never-attested 26 rotated in wholesale, so several
    # capabilities are now represented by their formerly-tail query
    required = {
        "scan_agg": "q1_pricing_summary",
        "filter_project": "q_filter_project",
        "merge_sink": "q_merge_upsert",
        "generator": "q_generate",
        "joins": "q_tpch_q7_volume",
        "left_join_agg": "q_tpch_q13_order_dist",
        "scalar_subquery": "q_tpch_q15_top_supplier",
        "correlated_window": "q_tpch_q17_small_quantity",
        "semi_anti": "q_in_not_in",
        "lateral": "q_lateral_topk",
        "asof": "q_asof_join",
        "aggregation": "q_grouping_id",
        "having": "q_having",
        "skew": "q_skew_salted_join",
        "winsorize": "q_winsorize_bounds",
        "window_frames": "q_window_range_frame",
        "window_rank": "q_window_rank_dist",
        "window_value": "q_window_value_funcs",
        "distinct_on": "q_distinct_on",
        "sort_limit": "q_orderby_limit",
        "weighted_sampling": "q_weighted_sample",
        "set_ops": "q_setops",
        "null_funcs": "q_null_funcs",
        "string_normalize": "q_string_normalize",
        "tokenize": "q_token_regex",
        "events_funnel": "q_event_funnel",
        "events_window": "q_event_sliding",
        "retention": "q_retention_cohorts",
        "dedup_signatures": "q_minhash_signatures",
        "vector_lsh": "q_rhp_lsh_buckets",
        "dedup_cluster": "q_dedup_clusters",
        "ivf": "q_ann_ivf_search",
        "semantic_dedup": "q_semdedup",
        "corpus_pipeline": "q_doc_packing",
        "mixture_sampling": "q_mixture_sample",
        "decontamination": "q_decontaminate",
        "timeseries": "q_time_resample",
        "udtf": "q_udtf_bigrams",
        "dynamic_partition_pruning": "q_dpp_partition_pruned_join",
        "bucketed_join": "q_bucketed_colocated_join",
        "multimodal": "q_multimodal_meta",
        "feature_extract": "q_feature_extract",
        "streaming_state": "q_stream_first_seen",
        "streaming_dedup": "q_stream_dedup",
        "scd2": "q_scd2_history",
        "cdc": "q_cdc_diff",
        "profiling": "q_profile_approx",
        "source_overlap": "q_source_overlap",
    }
    for cap, q in required.items():
        assert q in head, f"capability {cap} not in attested head-50 ({q})"
    # every head query must actually exist and (bar rows-only ops)
    # carry an oracle
    oracles = all_oracles()
    # rows-only by design (HLL sketches have no deterministic SQL
    # twin; accuracy is pytest-pinned instead): the driver records
    # the weaker rows-only check for these, knowingly
    rows_only_ok = {"q_profile_approx"}
    missing_oracle = [n for n in _HEAD
                      if n not in oracles and n not in rows_only_ok]
    assert missing_oracle == [], f"head queries without oracle: {missing_oracle}"


def test_every_oracle_plans_in_duckdb():
    """Cheap guard against oracle SQL rot: every oracle must at least
    EXPLAIN cleanly against the real table views (full value
    equivalence runs in selfcheck.py / the driver)."""
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    for name, sql in all_oracles().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"oracle for {name} fails to plan: {exc}")
