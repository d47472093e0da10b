"""Per-job census of one query: run it under the bench's noop-sink
methodology and dump every Spark job (description, duration, stages)
from the local UI's REST API. Usage:

    python profile_jobs.py q_name [q_name2 ...]

Prints one JSON line per query:
  {"query": ..., "wall_sec": ..., "n_jobs": N,
   "jobs": [{"id", "desc", "sec"}, ...]}

Standalone profiling tool — bench.py never imports this.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _jobs(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark

    spark = get_spark("profile_jobs",
                      extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    queries = all_queries()
    spark.range(1).count()
    # bench-style warm-up so first-session costs don't land on job 0
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    for name in names:
        before = {j["jobId"] for j in _jobs(ui)}
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [j for j in _jobs(ui) if j["jobId"] not in before]
        out = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sub = j.get("submissionTime"), j.get("completionTime")
            sec = None
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                sec = (datetime.strptime(sub[1], fmt)
                       - datetime.strptime(sub[0], fmt)).total_seconds()
            except Exception:
                pass
            out.append({"id": j["jobId"],
                        "desc": (j.get("description") or j["name"])[:110],
                        "sec": round(sec, 3) if sec is not None else None})
        print(json.dumps({"query": name, "wall_sec": round(wall, 3),
                          "n_jobs": len(out), "jobs": out}))


if __name__ == "__main__":
    main()
