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
