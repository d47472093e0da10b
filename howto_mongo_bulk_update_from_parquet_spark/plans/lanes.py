"""Benchmark lane classification (verdict r12 #3).

The catalog mixes three structurally different query classes, and an
aggregate Spark/DuckDB wall-clock ratio over all of them degrades
every time coverage improves — not because any plan regressed, but
because the mix shifted. The lanes:

- ``analytics`` — single-DAG queries: one logical plan, one noop-sink
  execution. The "within 2x of DuckDB" budget is meaningful here and
  this lane's total is the tracked round-over-round headline.
- ``cycle`` — multi-job storage/pipeline cycles BY CONSTRUCTION:
  the keyed-table round-trips build a versioned table, commit deltas,
  fold, and read back (write + commit-protocol + metadata jobs, all
  timed inside one "query" slot); the curation pipeline collects
  driver-side stage statistics mid-build; the generator runs its
  generation contract's audit jobs. Their DuckDB oracles check the
  FINAL result in milliseconds, so per-query "ratios" of 40-400x are
  an artifact of comparing a full storage cycle to one SELECT — the
  lane is reported separately with absolute seconds as its metric.
- ``streaming`` — Structured Streaming micro-batch queries: each slot
  carries the engine's fixed micro-batch/state-store/checkpoint cost,
  which DuckDB's batch replay of the same semantics never pays.

Classification is mechanical: membership in the explicit CYCLE set,
else the ``q_stream_`` prefix, else analytics. A NEW multi-job query
must be added to CYCLE_QUERIES when registered — tests/test_lanes.py
pins the catalog coverage and the known members so the set can't
silently rot.
"""

from __future__ import annotations

# Queries that execute MULTIPLE Spark jobs (writes, commits, driver
# collects) inside their timed slot, by construction — see module
# docstring. Keep sorted.
CYCLE_QUERIES = frozenset({
    "q_curate_pipeline",
    "q_generate",
    "q_keyed_lsm_roundtrip",
    "q_keyed_merged_read",
    "q_keyed_pruned_compact",
    "q_keyed_zonemap_lookup",
    "q_keyed_zonemap_scan",
    "q_keyed_zorder_scan",
    "q_keyed_lookup_join",
    "q_keyed_autosize",
    "q_keyed_table_changes",
    "q_keyed_bloom_scan",
    "q_keyed_view_maintain",
    "q_keyed_constraints",
    "q_keyed_view_minmax",
    "q_keyed_schema_strict",
    "q_keyed_view_recover",
    "q_keyed_view_avg",
    "q_keyed_sql_scan",
    "q_keyed_sql_merge",
    "q_keyed_sql_update_delete",
    "q_keyed_sql_copy_lifecycle",
    "q_keyed_sql_restore",
    "q_keyed_sql_changes",
    "q_keyed_view_follow",
})

LANES = ("analytics", "cycle", "streaming")


def lane_of(name: str) -> str:
    if name in CYCLE_QUERIES:
        return "cycle"
    if name.startswith("q_stream_"):
        return "streaming"
    return "analytics"
