"""Local replica of the driver's correctness gate: run every catalog
query on Spark and its oracle on DuckDB at a given SF, compare
row-count, sorted-column schema, and order-insensitive values.

Usage: python selfcheck.py [sf_dir] [query ...]

A full-catalog run (no query filter) also writes SELFCHECK_FULL.json —
the committed attestation record for every registered query, including
the ones past the driver harness's 50-entry CORRECTNESS window.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c], d[c]
            # Dtype parity, faithful to the driver's value-hash: the
            # driver tolerates int-WIDTH and datetime-UNIT differences
            # but hashes int64 and float64 columns differently, so a
            # DuckDB HUGEINT sum (→ float64 in pandas) against a Spark
            # bigint is a driver hash-fail even when every value is
            # numerically identical. Flag integer-vs-float here so the
            # local gate catches what the value compare below cannot.
            sk, dk = sv.dtype.kind, dv.dtype.kind
            int_kinds, float_kinds = set("iu"), set("f")
            if ((sk in int_kinds and dk in float_kinds)
                    or (sk in float_kinds and dk in int_kinds)):
                problems.append(
                    f"col {c}: dtype kind mismatch spark={sv.dtype}"
                    f" duck={dv.dtype} (int vs float hashes differently"
                    f" in the driver gate — CAST the oracle)")
            try:
                if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                    import numpy as np
                    both_nan = sv.isna() & dv.isna()
                    eq = (sv == dv) | both_nan
                    if not eq.all():
                        bad = (~eq).idxmax()
                        mx = float((sv.fillna(0) - dv.fillna(0)).abs().max())
                        problems.append(
                            f"col {c}: {int((~eq).sum())} mismatches, max|Δ|={mx:.3e},"
                            f" first at row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}")
                else:
                    eq = (sv.astype(str) == dv.astype(str))
                    if not eq.all():
                        bad = (~eq).idxmax()
                        problems.append(
                            f"col {c}: {int((~eq).sum())} mismatches,"
                            f" first at row {bad}: spark={sv[bad]!r} duck={dv[bad]!r}")
            except Exception as exc:  # noqa: BLE001
                problems.append(f"col {c}: compare error {exc}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from howto_mongo_bulk_update_from_parquet_spark.plans import all_queries
    from howto_mongo_bulk_update_from_parquet_spark.session import get_spark

    all_queries()  # trigger catalog registration

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    from howto_mongo_bulk_update_from_parquet_spark.plans.catalog import CATALOG as cat
    for name, q in cat.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = {"status": "fail", "err": f"spark: {exc}"}
            n_fail += 1
            continue
        if q.oracle is None:
            n_rows_only += 1
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            print(f"ROWS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            ddf = con.execute(q.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            results[name] = {"status": "fail", "err": f"duckdb: {exc}"}
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            results[name] = {"status": "fail", "spark_rows": len(sdf),
                             "oracle_rows": len(ddf), "problems": problems}
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            results[name] = {"status": "pass", "spark_rows": len(sdf),
                             "oracle_rows": len(ddf),
                             "seconds": round(time.time() - t0, 2)}
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if not only:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SELFCHECK_FULL.json")
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_rows_only, "queries": results},
                      fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
