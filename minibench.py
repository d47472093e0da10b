"""Targeted re-measure of a query subset with bench.py's methodology
(noop sink, warmed session, local[$SPARK_GRAFT_CPUS], sf dir from
$SPARK_GRAFT_SF_DIR). Usage: python minibench.py [-r N] q_a q_b ...

Prints one JSON line {"queries": {name: [rep1, rep2, ...]}} — raw
repeats, no substitution; interpret against BENCH_FULL.json slots.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark

    from bench import spark_probe

    spark = get_spark("minibench")
    queries = all_queries()
    spark.range(1).count()
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    spark_probe(spark)
    probes = [round(spark_probe(spark), 3)]
    out: dict[str, list[float]] = {}
    for name in args:
        fn = queries[name]
        out[name] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                out[name].append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                out[name].append(-1.0)
                print(f"error in {name}: {exc}", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
        probes.append(round(spark_probe(spark), 3))
    print(json.dumps({"sf_dir": sf_dir, "queries": out,
                      "probes": probes}))


if __name__ == "__main__":
    main()
