"""True driver emulation for the expected CORRECTNESS head: build a
VANILLA SparkSession (no engine confs — the external driver's
posture), import only the `__spark_entry__` contract, derive the
50-slot head the rotation mandates, and run those queries against
DuckDB with selfcheck's comparator. This is the strongest pre-driver
gate: it catches anything the engine's own session factory was
silently papering over (timezone, AQE, Arrow, shuffle width).

Usage: python head_emulation.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.abspath(__file__))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("head-emulation").getOrCreate())

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries, oracles = entry.queries(), entry.oracle_sql()

    from howto_mongo_bulk_update_from_parquet_spark.plans.rotation import (
        ROWS_ONLY, expected_head, last_green_by_query)
    head = expected_head(list(queries), set(oracles),
                         last_green_by_query(REPO))
    print(f"# emulating the {len(head)}-slot head on a vanilla session")

    # entry smoke check, same as the driver
    n = entry.entry(spark).count()
    print(f"entry(): {n} rows")

    sys.path.insert(0, REPO)
    from selfcheck import compare

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in head:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    assert name not in ROWS_ONLY  # the head never holds rows-only slots
    print(f"\nhead emulation: {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
