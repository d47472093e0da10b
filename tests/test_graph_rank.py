"""PageRank: cross-checks the Spark implementation against an
independent pure-Python reference with the identical rounding
discipline (the DuckDB oracle is the third implementation, checked by
selfcheck/driver)."""

from decimal import Decimal

import duckdb

from howto_mongo_bulk_update_from_parquet_spark.plans.graph_rank import (
    DAMPING, N_ITER, q_pagerank)

SF = "/root/testdata/sf0.001"


def _python_pagerank(edges):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: round(1.0 / n, 9) for v in nodes}
    base = (1 - DAMPING) / n
    for _ in range(N_ITER):
        acc = {}
        for s, d in edges:
            c = Decimal(str(round(pr[s] / outdeg[s], 9)))
            acc[d] = acc.get(d, Decimal(0)) + c
        pr = {v: round(base + DAMPING * float(acc.get(v, Decimal(0))), 9)
              for v in nodes}
    return pr


def test_pagerank_matches_python_reference(spark):
    con = duckdb.connect()
    edges = con.execute(f"""
        SELECT DISTINCT 's' || l.l_suppkey, 'c' || o.o_custkey
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
    """).fetchall()
    want = _python_pagerank(edges)
    got = {r.node: r.pagerank for r in q_pagerank(spark, SF).collect()}
    assert got == want


def test_pagerank_mass_properties(spark):
    rows = q_pagerank(spark, SF).collect()
    total = sum(r.pagerank for r in rows)
    # dangling mass leaks by design (documented), so total < 1 but
    # bounded below by the teleport term alone
    assert (1 - DAMPING) - 1e-6 < total < 1 + 1e-6
    # customers receive mass, suppliers only teleport: every supplier
    # rank is the minimum
    sup = [r.pagerank for r in rows if r.node.startswith("s")]
    cust = [r.pagerank for r in rows if r.node.startswith("c")]
    assert max(sup) <= min(cust)
