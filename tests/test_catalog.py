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
    the registration order. The r8 head (the r7 verdict's item 5)
    finishes the attestation debt and starts the freshness cycle:
    (a) all 16 oracle-bearing never-attested queries, (b) the
    rewritten fixed-width reader re-attests, (c) 33 least-recently-
    attested slots, all last green in rounds 2-3. Pin each property
    mechanically against the committed driver artifacts."""
    import json
    import os
    from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import _HEAD
    names = list(all_queries())
    assert names[:50] == list(_HEAD)
    assert len(set(_HEAD)) == 50

    last_green = {}
    for i in range(1, 8):
        p = f"/root/repo/CORRECTNESS_r{i:02d}.json"
        if not os.path.exists(p):
            continue
        with open(p) as fh:
            for k, v in json.load(fh).items():
                if (v.get("rows_match") and v.get("schema_match", True)
                        and v.get("hash_match", True) and not v.get("err")):
                    last_green[k] = max(last_green.get(k, 0), i)

    head = set(_HEAD)
    # (a) every oracle-bearing query with NO green driver row in
    # rounds 1-7 must hold a head slot (the debt is finished)
    oracles = all_oracles()
    rows_only_sketches = {"q_profile_approx", "q_approx_stats",
                          "q_hll_distinct", "q_pca_project"}
    # queries ADDED this round (after the r8 head froze) are tail
    # additions by design — selfcheck-attested now, head-rotated next
    # round, exactly like the r7 post-attestation additions were
    from howto_mongo_bulk_update_from_parquet_spark.plans import relational11
    r8_additions = {n for n in names
                    if getattr(CATALOG[n].fn, "__module__", "")
                    == relational11.__name__}
    r8_additions |= {"q_stratified_sample_scalable", "q_ewma_smoothing",
                     "q_merge_upsert_delete", "q_cluster_balanced_sample"}
    never = ({n for n in names if n not in last_green}
             - rows_only_sketches - r8_additions)
    missing_debt = sorted(n for n in never if n in oracles and n not in head)
    assert missing_debt == [], f"never-attested queries left out: {missing_debt}"
    # (b) the reader rewritten this round re-attests
    assert "q_fixedwidth_ingest" in head
    # (c) every remaining slot goes to a least-recently-attested query
    # (nothing fresher than round 3 may occupy a fill slot)
    fill = head - never - {"q_fixedwidth_ingest"}
    too_fresh = sorted(n for n in fill if last_green.get(n, 99) > 3)
    assert too_fresh == [], f"fill slots wasted on fresh attestations: {too_fresh}"
    # every head query must carry an oracle (rows-only sketches would
    # record only the weaker rows-only check from a head slot)
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


def test_selfcheck_compare_is_dtype_faithful():
    """The driver's value-hash distinguishes int64 from float64 —
    r7's four red rows were DuckDB HUGEINT sums surfacing as float64
    against Spark bigints with identical values. selfcheck.compare
    must flag that (driver-faithful) while still tolerating int-width
    differences (the driver demonstrably does)."""
    import pandas as pd
    import selfcheck

    ints = pd.DataFrame({"k": [1, 2], "v": pd.array([10, 20], dtype="int64")})
    floats = pd.DataFrame({"k": [1, 2], "v": pd.array([10.0, 20.0],
                                                     dtype="float64")})
    narrow = pd.DataFrame({"k": [1, 2], "v": pd.array([10, 20], dtype="int32")})

    assert any("dtype kind mismatch" in p
               for p in selfcheck.compare("x", ints, floats))
    assert any("dtype kind mismatch" in p
               for p in selfcheck.compare("x", floats, ints))
    assert selfcheck.compare("x", ints, narrow) == []
    assert selfcheck.compare("x", ints, ints.copy()) == []
