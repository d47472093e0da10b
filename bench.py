"""Benchmark harness: run the full query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line with per-query and total wall-clock seconds.

Each query executes fully via the `noop` sink (computes every column,
no write cost, no driver-side materialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM/session + file-listing caches so fixed startup cost
    # isn't charged to whichever query happens to run first
    spark.range(1).count()
    try:
        queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001 - warm-up failures surface in the timed run
        pass

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 3)

    print(json.dumps({
        "metric": "catalog_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
