"""Attestation-freshness report: which catalog queries the driver has
attested green, when, and what this round's head rotation contains.

Usage: python attestation_report.py

Since round 9 the rotation itself is MECHANICAL: `plans/rotation.py`
derives the head from the committed CORRECTNESS_r{N}.json artifacts
(never-attested first, then FORCE_REATTEST changed-this-round entries,
then least-recently-attested fill) and `plans/catalog.py` orders the
registry with it at load time. This script just prints that derivation
so the rotation is reviewable before a round's driver run.
"""

from __future__ import annotations

import sys


def main() -> int:
    from howto_mongo_bulk_update_from_parquet_spark.plans import all_oracles, all_queries
    from howto_mongo_bulk_update_from_parquet_spark.plans.rotation import (
        FORCE_REATTEST, HEAD_SIZE, ROWS_ONLY, expected_head,
        last_green_by_query)

    names = list(all_queries())
    oracles = all_oracles()
    last = last_green_by_query()
    head = expected_head(names, oracles, last)
    assert names[:len(head)] == head, "catalog order disagrees with rotation"

    never = [n for n in head if n not in last]
    print(f"# catalog: {len(names)} queries, {len(oracles)} oracle-bearing")
    print(f"\n## never-attested oracle-bearing ({len(never)}) — "
          "mandatory head slots:")
    for n in never:
        print(f"  {n}")
    force = [n for n in FORCE_REATTEST if n in head and n not in never]
    print(f"\n## changed-this-round re-attests ({len(force)}):")
    for n in force:
        print(f"  {n}  (last green r{last[n]})")
    print(f"\n## rows-only-by-design (stay in tail): {sorted(ROWS_ONLY)}")

    fill = [n for n in head if n in last and n not in force]
    print(f"\n## least-recently-attested fill ({len(fill)} of "
          f"{HEAD_SIZE} slots):")
    for n in fill:
        print(f"  {n}  (last green r{last[n]})")
    ranked = [n for n in names if n in last and n in oracles]
    stale = sum(1 for n in ranked if last[n] <= max(last.values()) - 5)
    print(f"\n# {stale} attestations are 5+ rounds stale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
