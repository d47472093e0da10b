"""Attestation-freshness report: which catalog queries the driver has
attested green, when, and what the NEXT head rotation should contain.

Usage: python attestation_report.py [n_mandated_slots]

Reads every committed CORRECTNESS_r{N}.json, computes each query's
most recent green driver row, and prints:
  1. never-attested oracle-bearing queries (must take head slots),
  2. rows-only-by-design queries (stay in the tail),
  3. the least-recently-attested ranking that fills the remaining
     slots (sorted by (last-green round, name)).
The round's builder still decides which CHANGED queries must re-attest
(this script cannot know what changed); everything else is mechanical.
"""

from __future__ import annotations

import glob
import json
import sys

ROWS_ONLY = {"q_profile_approx", "q_approx_stats", "q_hll_distinct",
             "q_pca_project"}
HEAD_SIZE = 50


def last_green_by_query() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        with open(f) as fh:
            for q, v in json.load(fh).items():
                if (v.get("rows_match") and v.get("schema_match", True)
                        and v.get("hash_match", True) and not v.get("err")):
                    last[q] = max(last.get(q, 0), rnd)
    return last


def main() -> int:
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_oracles, all_queries
    names = list(all_queries())
    oracles = all_oracles()
    last = last_green_by_query()

    never = [n for n in names
             if n not in last and n in oracles and n not in ROWS_ONLY]
    print(f"# catalog: {len(names)} queries, {len(oracles)} oracle-bearing")
    print(f"\n## never-attested oracle-bearing ({len(never)}) — "
          "mandatory head slots:")
    for n in never:
        print(f"  {n}")
    print(f"\n## rows-only-by-design (stay in tail): {sorted(ROWS_ONLY)}")

    fill_budget = HEAD_SIZE - len(never)
    ranked = sorted((n for n in names if n in last and n in oracles),
                    key=lambda n: (last[n], n))
    print(f"\n## least-recently-attested fill (next {max(fill_budget, 0)} "
          f"of {len(ranked)}):")
    for n in ranked[:max(fill_budget, 0)]:
        print(f"  {n}  (last green r{last[n]})")
    stale = sum(1 for n in ranked if last[n] <= max(last.values()) - 5)
    print(f"\n# {stale} attestations are 5+ rounds stale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
