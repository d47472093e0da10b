"""Write <outdir>/<query>_<tag>.txt with explain('formatted') output.

Usage: python capture_plan.py <tag> q_a q_b ...          (-> plans/r16)
       PLAN_OUTDIR=plans/r17 python capture_plan.py <tag> q_a ...
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.environ.get("PLAN_OUTDIR", "plans/r16")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark

    spark = get_spark("capture_plan")
    queries = all_queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", os.path.join(outdir, f"{name}_{tag}.txt"))


if __name__ == "__main__":
    main()
