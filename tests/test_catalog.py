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
    """The correctness harness attests a bounded prefix (cap 50) of
    the registration order. The r7 head is 50 of the 55 oracle-
    bearing queries that had never had a driver-attested CORRECTNESS
    row after six rounds (the r6 verdict's top priority) — pin the
    ordering mechanism, the all-never-attested property, and the
    §2.2 category spread within it."""
    import json
    import os
    from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import _HEAD
    names = list(all_queries())
    assert names[:50] == list(_HEAD)
    assert len(set(_HEAD)) == 50
    head = set(_HEAD)
    # every head slot goes to a query with NO green row in any prior
    # round's driver artifact (the attestation-debt priority)
    attested = set()
    for i in range(1, 7):
        p = f"/root/repo/CORRECTNESS_r{i:02d}.json"
        if os.path.exists(p):
            with open(p) as fh:
                for k, v in json.load(fh).items():
                    if v.get("rows_match"):
                        attested.add(k)
    already = sorted(head & attested)
    assert already == [], f"head slots wasted on attested queries: {already}"
    # §2.2 category spread: one exemplar per capability family
    required = {
        "scans_ingest": "q_jsonl_ingest",
        "scans_custom_source": "q_fixedwidth_ingest",
        "scans_schema_evolution": "q_schema_evolution_read",
        "scans_variant": "q_variant_shred",
        "sinks_reconcile": "q_table_checksum",
        "sinks_layout": "q_zorder_layout",
        "aggregation": "q_incremental_rollup",
        "joins_runtime_filter": "q_bloom_semi_join",
        "joins_band": "q_band_join_binned",
        "joins_temporal": "q_scd2_pointintime",
        "windows_sequences": "q_gaps_islands",
        "quality_constraints": "q_constraint_audit",
        "quality_robust_stats": "q_mad_outliers",
        "quality_drift": "q_distribution_drift",
        "text_retrieval": "q_bm25_topk",
        "text_sketch": "q_heavy_hitters",
        "text_tokenizer": "q_bpe_merges",
        "dedup": "q_edit_distance_pairs",
        "decontamination": "q_phrase_decontaminate",
        "similarity": "q_sparse_cosine_pairs",
        "vectors_quantization": "q_sq_int8_quantize",
        "streaming_stateful": "q_stream_threshold_alarm",
        "streaming_enrich": "q_stream_static_enrich",
        "udf_arrow": "q_arrow_batch_norms",
        "graph": "q_pagerank",
        "curation": "q_quota_allocation",
        "timeseries": "q_time_interpolate",
        "pii": "q_pii_scrub",
    }
    for cap, q in required.items():
        assert q in head, f"capability {cap} not in attested head-50 ({q})"
    # every head query must carry an oracle (the r7 head deliberately
    # excludes the 4 rows-only-by-design sketch queries — a head slot
    # would only record the weaker rows-only check)
    oracles = all_oracles()
    missing_oracle = [n for n in _HEAD if n not in oracles]
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
