"""Keyed-table SINK attestation: the same op-typed changefeed MERGE as
`q_merge_upsert_delete` (reference semantics:
/root/reference/src/func/mongo.py:28-79 null-skip upsert + the DELETE
half the upsert-only reference lacks), but materialized through the
REAL storage layer instead of an in-memory join — bucketed versioned
base write → LSM upsert delta → tombstone delta → compaction fold →
committed-base read. Until round 10 the sink was proven only by
pytest; this query puts the full write/merge-on-read/compact path
under the driver's DuckDB oracle gate, so a wrong commit protocol,
watermark, tombstone cut, or bucketed write surfaces as a value-hash
mismatch, not just a unit-test failure.

Scale notes (100 TB): identical posture to the production sink — the
bucketed base keeps every merge exchange-free on the base side, the
delta appends are O(batch), and the compaction is one write + an
atomic manifest flip. The table is written under a fresh temp
directory per invocation (the driver may run the catalog from any
state; the OS reclaims /tmp), so the query stays deterministic and
idempotent.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..sinks.keyed_table import (append_delete_delta, append_delta, compact,
                                 compact_pruned, lookup_join_keyed_table,
                                 lookup_keyed_table, read_keyed_table,
                                 read_merged, scan_keyed_table,
                                 upsert_into_keyed_table)
from ..sources.parquet import load_table
from .catalog import register
from .reference_core import MERGE_DELETE_ORACLE


@register("q_keyed_lsm_roundtrip", MERGE_DELETE_ORACLE,
          "changefeed MERGE through the real keyed-table sink: bucketed "
          "base write + LSM upsert delta + tombstone + compaction, read "
          "back from the committed base — oracle-exact storage layer")
def q_keyed_lsm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    target = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("segment"))
    src = (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
           .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("bal"))
           .withColumn("op", F.when(F.col("c_custkey") % 7 == 0, "D")
                              .otherwise(F.lit("U"))))
    ups = (src.filter(F.col("op") == "U")
           .select("c_custkey", "bal",
                   F.when(F.col("c_custkey") % 3 == 0, None)
                    .otherwise(F.lit("UPDATED")).alias("segment")))
    dels = src.filter(F.col("op") == "D").select("c_custkey")
    path = tempfile.mkdtemp(prefix="keyed_rt_")
    # bucketed base: the production layout (merge joins exchange-free
    # on the base side); 8 buckets keeps the tiny-SF write cheap
    upsert_into_keyed_table(spark, target, path=path, key="c_custkey",
                            updated_at_col=None, buckets=8)
    append_delta(spark, ups, path=path, key="c_custkey")
    append_delete_delta(spark, dels, path=path, key="c_custkey")
    compact(spark, path, "c_custkey")
    # read the COMMITTED base (not merge-on-read): proves the fold
    # itself — watermark, tombstone purge, bucketed rewrite — landed
    return read_keyed_table(spark, path).select(
        "c_custkey", "bal", "segment")


ZONEMAP_ORACLE = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 10 = 0
            THEN CAST(o_totalprice AS DOUBLE) * 2
            ELSE CAST(o_totalprice AS DOUBLE) END AS price,
       o_orderstatus AS status
FROM orders
WHERE o_orderkey BETWEEN 100 AND 700 AND o_orderkey % 7 <> 0
"""


@register("q_keyed_zonemap_lookup", ZONEMAP_ORACLE,
          "range-layout keyed table with a per-file min/max zone map: "
          "upsert + delta + tombstone, then a pruned range lookup that "
          "reads only the admissible base files — oracle-exact data "
          "skipping (r12)")
def q_keyed_zonemap_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping attestation: the RANGE layout twin of
    q_keyed_lsm_roundtrip. The base is range-clustered on the key with
    a zone map; one upsert delta (price doubled for k%10==0, status
    null-skipped) and one tombstone delta (k%7==0) land on top; the
    query then answers a key-range read through `lookup_keyed_table`,
    which prunes the base scan to the files whose [min,max] admit the
    range and merges the pending deltas over it. A wrong prune drops
    rows (value-hash mismatch); a wrong merge resurrects deleted keys
    or loses the null-skip. At 100 TB the same read touches O(range
    files + delta bytes), not the table. Scale posture: the pruning
    decision is O(files) driver state from one JSON sidecar; the
    residual filter keeps correctness independent of prune precision.
    """
    import tempfile
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_zm_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=8)
    ups = (target.filter(F.col("k") % 10 == 0)
           .select("k", (F.col("price") * 2).alias("price"),
                   F.lit(None).cast("string").alias("status")))
    append_delta(spark, ups, path=path, key="k")
    append_delete_delta(
        spark, target.filter(F.col("k") % 7 == 0).select("k"),
        path=path, key="k")
    return lookup_keyed_table(spark, path, "k", lo=100, hi=700)


MERGED_READ_ORACLE = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 10 = 0
            THEN CAST(o_totalprice AS DOUBLE) * 2
            ELSE CAST(o_totalprice AS DOUBLE) END AS price,
       o_orderstatus AS status
FROM orders
WHERE o_orderkey % 7 <> 0
"""


@register("q_keyed_merged_read", MERGED_READ_ORACLE,
          "merge-on-read BETWEEN folds through the broadcast fast "
          "path: base + pending upsert delta + pending tombstone read "
          "as one merged view without compacting — untouched rows "
          "pass through unshuffled (r12)")
def q_keyed_merged_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `_merged_fast` (sinks/keyed_table.py): the
    merged view served BETWEEN folds — null-skip upserts and
    tombstones applied over the committed base with NO compaction —
    through the broadcast decomposition (untouched base rows take the
    anti-join branch, delta-keyed rows the version window). A wrong
    branch split, a lost null-skip, or a resurrected tombstoned key is
    a value-hash mismatch. The in-query guard pins that the fast path
    (not the classic whole-base window) actually served the read. At
    100 TB this is every read an LSM table answers between folds."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_mr_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None)
    ups = (target.filter(F.col("k") % 10 == 0)
           .select("k", (F.col("price") * 2).alias("price"),
                   F.lit(None).cast("string").alias("status")))
    append_delta(spark, ups, path=path, key="k")
    append_delete_delta(
        spark, target.filter(F.col("k") % 7 == 0).select("k"),
        path=path, key="k")
    out = read_merged(spark, path, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" not in plan or "LeftAnti" not in plan:
        raise AssertionError(
            "merged read did not take the broadcast fast path")
    return out.select("k", "price", "status")


ZONEMAP_SCAN_ORACLE = """
WITH merged AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey BETWEEN 400 AND 450 THEN 10.0
              WHEN o_orderkey BETWEEN 900 AND 950 THEN 99999.0
              ELSE CAST(o_totalprice AS DOUBLE) END AS price,
         o_orderstatus AS status
  FROM orders
  WHERE NOT o_orderkey BETWEEN 500 AND 510
)
SELECT k, price, status FROM merged
WHERE k BETWEEN 200 AND 1200 AND price >= 1000
"""


@register("q_keyed_zonemap_scan", ZONEMAP_SCAN_ORACLE,
          "multi-column zone-map scan of a LIVE range table (pending "
          "upsert + tombstone deltas): pruned base minus delta keys "
          "union the merged delta view, residual predicate on top; "
          "in-query assert that pruning engaged (r12, delta-aware r13)")
def q_keyed_zonemap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stats-column consumer of the multi-column zone map
    (`sinks/keyed_table.py::scan_keyed_table`): the writer records
    min/max for the key AND `stats_cols`; the scan intersects the
    per-column admissible file sets and applies the residual filter.
    r13 (verdict item 5): the table deliberately carries PENDING
    deltas — an upsert that moves keys 400-450 OUT of the price
    range and keys 900-950 INTO it, plus a tombstone for 500-510
    (all inside sf0.001's 0..1499 key space, so NO test scale is
    vacuous) — so the scan exercises the delta-aware decomposition
    (pruned base anti-joined on the broadcast delta key set, UNION
    the fast merge of delta-touched keys) instead of requiring a
    fold. The in-query assertions pin that the key predicate actually
    pruned files AND that both deltas were seen; a scan that silently
    degrades to O(table) fails instead of passing slow."""
    import tempfile
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_scan_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["price"])
    ups = (target.filter(F.col("k").between(400, 450))
           .select("k", F.lit(10.0).alias("price"),
                   F.lit(None).cast("string").alias("status"))
           .unionByName(
               target.filter(F.col("k").between(900, 950))
               .select("k", F.lit(99999.0).alias("price"),
                       F.lit(None).cast("string").alias("status"))))
    append_delta(spark, ups, path=path, key="k")
    append_delete_delta(
        spark, target.filter(F.col("k").between(500, 510)).select("k"),
        path=path, key="k")
    out, stats = scan_keyed_table(
        spark, path, where={"k": (200, 1200), "price": (1000.0, None)},
        with_stats=True)
    if not stats["files_read"] < stats["files_total"]:
        raise AssertionError(f"scan did not prune: {stats}")
    if stats["deltas"] != 2:
        raise AssertionError(f"scan missed pending deltas: {stats}")
    return out.select("k", "price", "status")


PRUNED_COMPACT_ORACLE = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey >= 1000 AND o_orderkey < 2000
            THEN CAST(o_totalprice AS DOUBLE) * 2
            ELSE CAST(o_totalprice AS DOUBLE) END AS price,
       o_orderstatus AS status
FROM orders
WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey BETWEEN 4000 AND 5000)
"""


@register("q_keyed_pruned_compact", PRUNED_COMPACT_ORACLE,
          "surgical fold of a range-layout keyed table: delta + "
          "tombstone folded by rewriting ONLY the zone-map-touched "
          "base files, untouched files carried by copy — the "
          "committed base is oracle-exact and the query itself "
          "asserts files were carried (r12)")
def q_keyed_pruned_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layer attestation of `compact_pruned`
    (sinks/keyed_table.py): an upsert delta over a NARROW key band
    (price doubled, status null-skipped) and a tombstone band land on
    a range-clustered base; the pruned fold rewrites only the files
    whose zone spans the bands intersect and CARRIES the rest, then
    the query reads the COMMITTED base. A fold that loses a delta
    row, resurrects a tombstoned key, mangles a carried file, or
    breaks the null-skip is a value-hash mismatch against the oracle.
    The in-query assertion pins the scale property itself: if pruning
    silently degrades to a full rewrite, the query fails rather than
    passing as a slow fold. At 100 TB this is the difference between
    a fold costing O(touched files + delta) and O(table) per arrival
    round."""
    import tempfile
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_pc_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=8)
    ups = (target.filter((F.col("k") >= 1000) & (F.col("k") < 2000))
           .select("k", (F.col("price") * 2).alias("price"),
                   F.lit(None).cast("string").alias("status")))
    append_delta(spark, ups, path=path, key="k")
    append_delete_delta(
        spark, target.filter((F.col("k") % 5 == 0)
                             & F.col("k").between(4000, 5000)).select("k"),
        path=path, key="k")
    _, stats = compact_pruned(spark, path, "k")
    if not (stats["pruned"] and stats["files_carried"] > 0):
        raise AssertionError(
            f"pruned fold degraded to a full rewrite: {stats}")
    return read_keyed_table(spark, path).select("k", "price", "status")


ZORDER_SCAN_ORACLE = """
SELECT o_orderkey AS k,
       CAST(o_totalprice AS DOUBLE) AS price,
       o_orderstatus AS status
FROM orders
WHERE CAST(o_totalprice AS DOUBLE) BETWEEN 1000 AND 20000
"""


@register("q_keyed_zorder_scan", ZORDER_SCAN_ORACLE,
          "stats-column scan of a Z-ORDERED range table: the base "
          "clusters on the Morton interleave of (key, price), so a "
          "price-only predicate prunes files — in-query asserts the "
          "prune beats the key-sorted layout's (r13)")
def q_keyed_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of the `zorder_col` layout (r12 verdict stretch,
    `sinks/keyed_table._write_base_and_meta`): `o_totalprice` is
    decorrelated from the order key, so on a KEY-sorted range base a
    price-only scan reads ~every file; on the z-ordered base each
    file covers a bounded (key, price) rectangle and the same scan
    prunes. The query builds BOTH layouts, asserts the z-ordered scan
    reads strictly fewer files than the key-sorted one AND fewer than
    the total (prune actually engaged), and returns the z-ordered
    scan's rows for the oracle hash. At 100 TB this is Delta OPTIMIZE
    ZORDER BY's read-side payoff, attested end to end."""
    import tempfile
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    p_key = tempfile.mkdtemp(prefix="keyed_zs_k_")
    p_z = tempfile.mkdtemp(prefix="keyed_zs_z_")
    upsert_into_keyed_table(spark, target, path=p_key, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["price"])
    upsert_into_keyed_table(spark, target, path=p_z, key="k",
                            updated_at_col=None, range_files=8,
                            stats_cols=["price"], zorder_col="price")
    where = {"price": (1000.0, 20000.0)}
    _, st_k = scan_keyed_table(spark, p_key, where=where, with_stats=True)
    out, st_z = scan_keyed_table(spark, p_z, where=where, with_stats=True)
    if not (st_z["files_read"] < st_z["files_total"]
            and st_z["files_read"] < st_k["files_read"]):
        raise AssertionError(
            f"z-order scan did not out-prune the key-sorted layout: "
            f"z={st_z} key_sorted={st_k}")
    return out.select("k", "price", "status")


LOOKUP_JOIN_ORACLE = """
WITH merged AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice AS DOUBLE) * 2
              ELSE CAST(o_totalprice AS DOUBLE) END AS price,
         o_orderstatus AS status
  FROM orders
  WHERE o_orderkey % 7 <> 0
),
probes AS (
  SELECT DISTINCT o_custkey * 4 AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
)
SELECT m.k, m.price, m.status
FROM merged m JOIN probes p ON m.k = p.k
"""


@register("q_keyed_lookup_join", LOOKUP_JOIN_ORACLE,
          "bulk probe join (feature-store enrich): a DISTRIBUTED key "
          "batch fetches its merged rows — span-pruned base read + "
          "broadcast semi join, pending upsert/tombstone deltas "
          "honored (r13)")
def q_keyed_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `lookup_join_keyed_table`: the training-batch
    enrich pattern at 100 TB — a batch of keys fetches its stored
    features from the keyed table WITHOUT collecting the keys to the
    driver (only their [min,max] plans the prune; membership is a
    broadcast semi join). The table carries the same pending
    upsert + tombstone deltas as q_keyed_zonemap_lookup, so the probe
    exercises the merge: doubled prices surface, deleted keys and
    absent probe keys don't match. The probe set (custkey*4 of urgent
    orders) is value-scattered, so this query proves CORRECTNESS of
    the bulk join; the span-prune payoff for clustered batches is
    test-pinned in tests/test_keyed_zonemap.py."""
    import tempfile
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_lj_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=8)
    ups = (target.filter(F.col("k") % 10 == 0)
           .select("k", (F.col("price") * 2).alias("price"),
                   F.lit(None).cast("string").alias("status")))
    append_delta(spark, ups, path=path, key="k")
    append_delete_delta(
        spark, target.filter(F.col("k") % 7 == 0).select("k"),
        path=path, key="k")
    probes = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .select((F.col("o_custkey") * 4).alias("k")).distinct())
    return lookup_join_keyed_table(spark, path, "k", probes)


AUTOSIZE_ORACLE = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 10 = 0
            THEN CAST(o_totalprice AS DOUBLE) * 2
            ELSE CAST(o_totalprice AS DOUBLE) END AS price,
       o_orderstatus AS status
FROM orders
"""


@register("q_keyed_autosize", AUTOSIZE_ORACLE,
          "adaptive file sizing (target_file_bytes): a growing range "
          "table re-plans its file COUNT from observed bytes each fold "
          "— in-query asserts the count grew and file size stayed "
          "bounded (r13)")
def q_keyed_autosize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `target_file_bytes` (`sinks/keyed_table.
    _autosize_range`): the table starts with a 20% slice of orders as
    ONE seeded file, absorbs the remaining 80% (the write after that
    observes the grown footprint — the documented one-commit lag),
    then a price-update round re-plans again. The query asserts the
    file count grew strictly across the growth folds AND every data
    file stayed within 4x the byte target (a pinned count would have
    kept ONE ever-fatter file), then returns the merged rows for the
    oracle hash — so a wrong re-plan that drops or duplicates rows
    fails on values, not just on layout. At 100 TB this is the
    Iceberg/Delta target-file-size discipline: file size — and with
    it zone-map prune selectivity — stays flat while the table grows.
    """
    import tempfile

    from ..sinks import fs as hfs
    from ..sinks.keyed_table import _current_manifest, base_file_map

    target_b = 8 * 1024
    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_asz_")
    upsert_into_keyed_table(spark, rows.filter(F.col("k") % 5 == 0),
                            path=path, key="k", updated_at_col=None,
                            range_files=1, target_file_bytes=target_b)
    upsert_into_keyed_table(spark, rows.filter(F.col("k") % 5 != 0),
                            path=path, key="k", updated_at_col=None)
    v2, _ = _current_manifest(spark, path)
    n2 = len(base_file_map(spark, path, v2))
    ups = rows.filter(F.col("k") % 10 == 0).select(
        "k", (F.col("price") * 2).alias("price"), "status")
    upsert_into_keyed_table(spark, ups, path=path, key="k",
                            updated_at_col=None)
    v3, meta = _current_manifest(spark, path)
    n3 = len(base_file_map(spark, path, v3))
    sizes = hfs.listdir_sizes(spark, hfs.join(path, f"base_v{v3:05d}"))
    fat = {n: s for n, s in sizes.items()
           if not n.startswith("_") and s > 4 * target_b}
    if not (n3 > n2 >= 1 and n3 > 1) or fat or \
            meta.get("target_file_bytes") != str(target_b):
        raise AssertionError(
            f"autosize did not engage: files {n2}->{n3}, oversized "
            f"{fat}, meta target {meta.get('target_file_bytes')}")
    return read_keyed_table(spark, path).select("k", "price", "status")


TABLE_CHANGES_ORACLE = """
SELECT o_orderkey AS k,
       CAST(o_totalprice AS DOUBLE) * 2 AS price,
       o_orderstatus AS status,
       CAST(1 AS INTEGER) AS _change_version,
       'U' AS _change_op
FROM orders WHERE o_orderkey % 10 = 0
UNION ALL
SELECT o_orderkey AS k,
       CAST(NULL AS DOUBLE) AS price,
       CAST(NULL AS VARCHAR) AS status,
       CAST(2 AS INTEGER) AS _change_version,
       'D' AS _change_op
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT CAST(o_orderkey + 20000000 AS BIGINT) AS k,
       CAST(o_totalprice AS DOUBLE) AS price,
       o_orderstatus AS status,
       CAST(3 AS INTEGER) AS _change_version,
       'U' AS _change_op
FROM orders WHERE o_orderkey % 13 = 0
"""


@register("q_keyed_table_changes", TABLE_CHANGES_ORACLE,
          "change-data-feed read served from the LSM delta files: "
          "three arrivals (update / tombstone / insert) come back as "
          "versioned, op-typed change rows — O(changes), never "
          "O(table) (r13)")
def q_keyed_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/changes.read_table_changes` (the Delta
    CDF posture: the LSM arrival log IS the feed). Three arrivals
    land on a keyed base — a price-doubling upsert delta, a tombstone
    delta, an insert delta of brand-new keys — and the feed must
    return exactly those rows tagged (_change_version, _change_op),
    with tombstones carrying NULL payloads and no base row leaking
    in. A wrong version order, op type, or a feed that rescans the
    base instead of the deltas surfaces as a value-hash mismatch. At
    100 TB the read costs O(requested change bytes): it opens only
    the requested delta directories, zero shuffle, zero base I/O —
    the downstream-consumer half of the arrival loop (the reference
    emits only upsert counts; cf src/func/mongo.py write results)."""
    import tempfile

    from ..sinks.changes import read_table_changes

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_cdf_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=4)
    append_delta(spark,
                 target.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("price") * 2).alias("price"),
                         "status"),
                 path=path, key="k")
    append_delete_delta(
        spark, target.filter(F.col("k") % 7 == 0).select("k"),
        path=path, key="k")
    append_delta(spark,
                 target.filter(F.col("k") % 13 == 0)
                 .select((F.col("k") + 20000000).cast("bigint").alias("k"),
                         "price", "status"),
                 path=path, key="k")
    return read_table_changes(spark, path)


BLOOM_SCAN_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k,
         md5(CAST(o_orderkey AS VARCHAR)) AS uid,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
bounds AS (SELECT MIN(k) AS kmin, MAX(k) AS kmax FROM t),
probes AS (
  SELECT kmin AS pk FROM bounds
  UNION ALL SELECT kmax FROM bounds
  UNION ALL
  SELECT MIN(k) FROM t, bounds
  WHERE k > CAST(FLOOR((kmin + kmax) / 2.0) AS BIGINT)
)
SELECT t.k, t.uid, t.price
FROM t WHERE t.k IN (SELECT pk FROM probes)
"""


@register("q_keyed_bloom_scan", BLOOM_SCAN_ORACLE,
          "per-file bloom index: equality probes on a high-cardinality "
          "md5 column skip files min/max cannot — in-query asserts the "
          "prune engaged on every probe (r13)")
def q_keyed_bloom_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/bloom_index.py` through `scan_keyed_
    table`: the base carries a bloom index on `uid = md5(orderkey)` —
    a uniformly-scattered column whose per-file [min,max] admits
    every file, the exact shape zone maps cannot prune. Three point
    probes (uid of the min / mid / max key) each run as an equality
    scan; the query asserts each probe read FEWER files than the
    base holds and that the bloom engaged (`bloom_cols_used`), then
    returns the matched rows for the oracle hash — so a false
    negative (lost row), a hash-parity break between build and probe,
    or an index that silently never engages all fail the driver gate.
    At 100 TB this is Delta's bloom-filter-index read path: an
    equality needle costs O(admissible files), not a table scan."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.md5(F.col("o_orderkey").cast("string")).alias("uid"),
        F.col("o_totalprice").cast("double").alias("price"))
    path = tempfile.mkdtemp(prefix="keyed_bl_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, range_files=8,
                            bloom_cols=["uid"])
    b = target.agg(F.min("k").alias("kmin"), F.max("k").alias("kmax")
                   ).first()
    mid = (b.kmin + b.kmax) // 2
    k3 = target.filter(F.col("k") > mid).agg(F.min("k")).first()[0]
    # ONE probe-uid lookup job for all three keys (r17, guide §1.4 —
    # the per-key first() loop paid three scans of the source for
    # three 1-row answers); same probes, same scans, same result
    uid_by_k = {r["k"]: r["uid"] for r in
                target.filter(F.col("k").isin([b.kmin, b.kmax, k3]))
                .select("k", "uid").collect()}
    parts = []
    for pk in (b.kmin, b.kmax, k3):
        probe = uid_by_k[pk]
        out, st = scan_keyed_table(spark, path,
                                   where={"uid": (probe, probe)},
                                   with_stats=True)
        if not (st["bloom_cols_used"] == ["uid"]
                and st["files_read"] < st["files_total"]):
            raise AssertionError(
                f"bloom prune did not engage for k={pk}: {st}")
        parts.append(out.select("k", "uid", "price"))
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


VIEW_MAINTAIN_ORACLE = """
WITH fin AS (
  SELECT CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_custkey + 1000000 AS BIGINT)
              ELSE CAST(o_custkey AS BIGINT) END AS g,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice AS DOUBLE) * 2
              ELSE CAST(o_totalprice AS DOUBLE) END AS val
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT CAST(o_custkey AS BIGINT), CAST(o_totalprice AS DOUBLE)
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM fin GROUP BY g
"""


@register("q_keyed_view_maintain", VIEW_MAINTAIN_ORACLE,
          "incremental materialized view over the change feed: "
          "snapshot bootstrap, then one differential window (move + "
          "delete + insert via pre-image retractions) — view equals "
          "the full recompute, exactly (r13)")
def q_keyed_view_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/views.maintain_grouped_view` + the feed's
    pre-image enrichment (`sinks/changes.py::with_preimage`): a
    grouped COUNT/SUM view bootstraps from the orders snapshot, then
    three LSM arrivals land — a group-moving price update, a
    tombstone batch, an insert batch — and ONE maintenance call
    applies the whole multi-version window differentially (+post
    groups, -pre groups; decimal-exact, so incremental == recompute
    bit-for-bit). The query asserts the increment round was NOT a
    re-bootstrap, reached offset 3, and that a follow-up call is a
    no-op (offset idempotence), then returns the live view rows for
    the oracle hash. At 100 TB the round costs O(changes in the
    window + touched groups): the source table is never rescanned
    after bootstrap — the derived-table pattern that keeps dashboards
    and feature aggregates in step with an LSM-ingested table."""
    import tempfile

    from ..sinks.views import maintain_grouped_view, read_grouped_view

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"))
    tp = tempfile.mkdtemp(prefix="keyed_vm_t_")
    vp = tempfile.mkdtemp(prefix="keyed_vm_v_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    st = maintain_grouped_view(spark, table_path=tp, key="k",
                               view_path=vp, group_col="g",
                               sum_col="val")
    if not st.get("bootstrap"):
        raise AssertionError(f"expected a bootstrap round: {st}")
    append_delta(spark,
                 rows.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("g") + 1000000).alias("g"),
                         (F.col("val") * 2).alias("val")),
                 path=tp, key="k")
    append_delete_delta(
        spark, rows.filter(F.col("k") % 7 == 0).select("k"),
        path=tp, key="k")
    append_delta(spark,
                 rows.filter(F.col("k") % 13 == 0)
                 .select((F.col("k") + 20000000).alias("k"), "g", "val"),
                 path=tp, key="k")
    st = maintain_grouped_view(spark, table_path=tp, key="k",
                               view_path=vp, group_col="g",
                               sum_col="val")
    if st.get("bootstrap") or st["applied_through"] != 3 \
            or st["changes"] <= 0:
        raise AssertionError(f"increment round wrong: {st}")
    st2 = maintain_grouped_view(spark, table_path=tp, key="k",
                                view_path=vp, group_col="g",
                                sum_col="val")
    if st2["groups_touched"] != 0 or st2["changes"] != 0:
        raise AssertionError(f"re-run was not a no-op: {st2}")
    return read_grouped_view(spark, vp, "g")


@register("q_keyed_constraints", AUTOSIZE_ORACLE,
          "write-time CHECK constraints: a violating batch is refused "
          "BEFORE commit (in-query assert: raised + zero trace), valid "
          "writes flow — table contents oracle-exact (r13)")
def q_keyed_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of the keyed table's CHECK constraints
    (`sinks/keyed_table._enforce_checks` — Delta constraint posture):
    the table carries `price > 0` and `status IS NOT NULL`; a valid
    price-doubling delta lands, then a NEGATED-price batch must raise
    `ConstraintViolation` and leave NO delta directory behind (the
    table never holds a violating row, even transiently). The query
    asserts both, folds, and returns the merged rows — so enforcement
    that silently skips (violations admitted) or over-fires (valid
    rows rejected) both surface as a value-hash mismatch against the
    oracle. SQL CHECK semantics: NULL passes, demanded non-null is an
    explicit constraint. At 100 TB the enforcement is one violation
    scan of the WRITE BATCH (O(batch)), never of the table."""
    import tempfile

    from ..sinks import fs as hfs
    from ..sinks.keyed_table import ConstraintViolation

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_ck_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None,
                            checks={"pos_price": "price > 0",
                                    "status_set": "status IS NOT NULL"})
    append_delta(spark,
                 target.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("price") * 2).alias("price"),
                         "status"),
                 path=path, key="k")
    bad = (target.filter(F.col("k") % 5 == 0)
           .select("k", (-F.col("price")).alias("price"), "status"))
    try:
        append_delta(spark, bad, path=path, key="k")
        raise AssertionError("violating batch was accepted")
    except ConstraintViolation:
        pass
    if hfs.exists(spark, hfs.join(path, "delta_00002")):
        raise AssertionError("violating batch left a delta behind")
    compact(spark, path, "k")
    return read_keyed_table(spark, path).select("k", "price", "status")


VIEW_MINMAX_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS g,
         CAST(o_totalprice AS DOUBLE) AS val
  FROM orders
),
ins AS (
  SELECT k + 20000000 AS k, g, val + 5 AS val FROM t WHERE k % 13 = 0
),
allr AS (SELECT * FROM t UNION ALL SELECT * FROM ins),
victims AS (
  SELECT k FROM (
    SELECT k, ROW_NUMBER() OVER (PARTITION BY g
                                 ORDER BY val DESC, k) AS rn
    FROM allr WHERE g % 5 = 0) WHERE rn = 1
),
fin AS (SELECT * FROM allr WHERE k NOT IN (SELECT k FROM victims))
SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total,
       MIN(val) AS vmin, MAX(val) AS vmax
FROM fin GROUP BY g
"""


@register("q_keyed_view_minmax", VIEW_MINMAX_ORACLE,
          "MIN/MAX view maintenance: monotone inserts stay "
          "pure-differential (in-query: 0 recomputes), deleting each "
          "victim group's MAX forces the bounded recompute path — "
          "both attested against one oracle (r13)")
def q_keyed_view_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `track_minmax` view maintenance — BOTH paths of
    the non-invertible-aggregate problem: round 1 is pure inserts
    (new keys, no pre-images), so the monotone least/greatest path
    must apply with ZERO group recomputes (asserted — a maintainer
    that secretly rescans fails here); round 2 deletes each g%5
    group's current MAXIMUM row (computed by the same deterministic
    window both engines run), invalidating those extremes, so the
    recompute path must engage (asserted > 0) and rebuild exactly the
    flagged groups from the offset-consistent merged state. The final
    view hashes against a plain GROUP BY MIN/MAX oracle, so a stale
    extremum, a resurrected emptied-group value, or a drifted total
    all fail on values. At 100 TB: inserts cost O(changes); extremum
    retractions cost O(flagged groups' rows) — the structural bound
    for MIN/MAX without per-group heaps."""
    import tempfile

    from pyspark.sql.window import Window

    from ..sinks.views import maintain_grouped_view, read_grouped_view

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"))
    tp = tempfile.mkdtemp(prefix="keyed_mm_t_")
    vp = tempfile.mkdtemp(prefix="keyed_mm_v_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    maintain_grouped_view(spark, table_path=tp, key="k", view_path=vp,
                          group_col="g", sum_col="val",
                          track_minmax=True)
    append_delta(spark,
                 rows.filter(F.col("k") % 13 == 0)
                 .select((F.col("k") + 20000000).alias("k"), "g",
                         (F.col("val") + 5).alias("val")),
                 path=tp, key="k")
    st1 = maintain_grouped_view(spark, table_path=tp, key="k",
                                view_path=vp, group_col="g",
                                sum_col="val", track_minmax=True)
    if st1["recomputed_groups"] != 0:
        raise AssertionError(
            f"insert-only round must stay pure-differential: {st1}")
    state = read_merged(spark, tp, "k")
    w = Window.partitionBy("g").orderBy(F.col("val").desc(),
                                        F.col("k").asc())
    victims = (state.filter(F.col("g") % 5 == 0)
               .withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).select("k"))
    append_delete_delta(spark, victims, path=tp, key="k")
    st2 = maintain_grouped_view(spark, table_path=tp, key="k",
                                view_path=vp, group_col="g",
                                sum_col="val", track_minmax=True)
    if st2["recomputed_groups"] <= 0:
        raise AssertionError(
            f"deleting group maxima must engage the recompute: {st2}")
    return read_grouped_view(spark, vp, "g")


SCHEMA_STRICT_ORACLE = """
SELECT o_orderkey AS k,
       CASE WHEN o_orderkey % 10 = 0
            THEN CAST(o_totalprice AS DOUBLE) * 2
            ELSE CAST(o_totalprice AS DOUBLE) END AS price,
       o_orderstatus AS status,
       CASE WHEN o_orderkey % 13 = 0 THEN 'N'
            ELSE CAST(NULL AS VARCHAR) END AS flag
FROM orders
"""


@register("q_keyed_schema_strict", SCHEMA_STRICT_ORACLE,
          "schema enforcement + explicit evolution: strict refuses an "
          "unknown column with zero trace (in-query assert), one merge "
          "round evolves while the strict pin SURVIVES (r14 — no "
          "re-pin round) — final table oracle-exact")
def q_keyed_schema_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `schema.mode=strict` (`sinks/keyed_table.
    _enforce_schema_mode` — Delta schema-enforcement posture) plus the
    EVOLUTION path: the strict table refuses a batch carrying an
    unknown column (asserted: raised AND no delta directory landed),
    one explicit merge round adds `flag` for k%13==0 (a PARTIAL
    payload — null-skip must keep every other column) WITHOUT
    dropping the recorded strict pin (ADVICE r13: Delta's mergeSchema
    is a per-write override, not a table-mode change — asserted via
    manifest AND by a second rogue column being refused with no
    re-pin round), a price-doubling delta lands under the evolved
    schema, and the fold's result hashes against the oracle — so
    enforcement that leaks a column, an evolution that clobbers
    untouched payloads, or a pin lost to the merge round all fail
    in-query or on values. At 100 TB enforcement is one footer read +
    a column-set check per batch — O(1) data cost."""
    import tempfile

    from ..sinks import fs as hfs
    from ..sinks.keyed_table import SchemaViolation

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_sm_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None, schema_mode="strict")
    wide = target.limit(1).select("k", "price", "status",
                                  F.lit(1).alias("rogue"))
    try:
        append_delta(spark, wide, path=path, key="k")
        raise AssertionError("strict admitted an unknown column")
    except SchemaViolation:
        pass
    if hfs.exists(spark, hfs.join(path, "delta_00001")):
        raise AssertionError("refused batch left a delta behind")
    upsert_into_keyed_table(spark,
                            target.filter(F.col("k") % 13 == 0)
                            .select("k", F.lit("N").alias("flag")),
                            path=path, key="k", updated_at_col=None,
                            schema_mode="merge")
    from ..sinks.keyed_table import table_meta
    if table_meta(spark, path).get("schema.mode") != "strict":
        raise AssertionError("merge round dropped the strict pin")
    rogue2 = target.limit(1).select("k", "price", "status",
                                    F.lit(1).alias("rogue2"))
    try:
        append_delta(spark, rogue2, path=path, key="k")
        raise AssertionError("pin lost: rogue2 admitted after merge "
                             "round with no re-pin")
    except SchemaViolation:
        pass
    append_delta(spark,
                 target.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("price") * 2).alias("price"),
                         "status"),
                 path=path, key="k")
    compact(spark, path, "k")
    return read_keyed_table(spark, path).select("k", "price", "status",
                                                "flag")


VIEW_RECOVER_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_custkey % 100 AS BIGINT) AS g,
         CAST(o_totalprice AS DOUBLE) AS val
  FROM orders WHERE o_orderkey % 3 = 0
),
updated AS (
  SELECT k,
         CASE WHEN k % 10 = 0 THEN g + 1000 ELSE g END AS g,
         CASE WHEN k % 10 = 0 THEN val * 2 ELSE val END AS val
  FROM t WHERE g <> 7
),
ins3 AS (
  SELECT k + 30000000 AS k, CAST(200 + k % 5 AS BIGINT) AS g,
         val + 1 AS val
  FROM t WHERE k % 13 = 0
),
ins4 AS (
  SELECT k + 40000000 AS k, CAST(300 AS BIGINT) AS g, val
  FROM t WHERE k % 11 = 0
),
fin AS (SELECT * FROM updated UNION ALL SELECT * FROM ins3
        UNION ALL SELECT * FROM ins4)
SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM fin GROUP BY g
"""


@register("q_keyed_view_recover", VIEW_RECOVER_ORACLE,
          "view maintenance survives vacuumed feed history: offset "
          "dead-ends (in-query assert), auto_recover re-bootstraps "
          "from a snapshot incl. vanished-group retraction, then "
          "differential maintenance RESUMES — final view oracle-exact "
          "(r14)")
def q_keyed_view_recover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/views._recover_rebootstrap` (r14 verdict
    item 2 — the self-healing path): a COUNT/SUM view bootstraps,
    then the source takes a whole-group delete, a group-moving
    update, and an insert batch, and a fold bakes those arrivals'
    pre-images into the base before the maintainer runs again (the
    fold-cadence dead-end — the common way a maintainer falls
    behind; the fully-reclaimed-history class is unit-test-pinned
    and recovers through the same code path). The query asserts the
    default call dead-ends with `ChangeHistoryUnavailable` (the
    alerting contract), that `auto_recover=True` commits a recovery
    round (recovered flag, O(table) snapshot + vanished-group
    retraction — group 7 must NOT survive as stale rows), and that a
    FOURTH arrival afterwards applies through the ordinary
    O(changes) differential path off the recovered offset (asserted:
    changes == its rows, no recovery flag). The final view hashes
    against the full GROUP BY oracle, so a recovery that
    double-counts, misses the vanished group, or records a stale
    offset fails on values. At 100 TB: recovery costs one table
    re-aggregate — the structural floor after losing the log — and
    the query proves the system returns to O(changes) immediately
    after."""
    import tempfile

    from ..sinks.changes import ChangeHistoryUnavailable
    from ..sinks.views import maintain_grouped_view, read_grouped_view

    orders = load_table(spark, sf_dir, "orders")
    rows = (orders.filter(F.col("o_orderkey") % 3 == 0)
            .select(F.col("o_orderkey").alias("k"),
                    (F.col("o_custkey") % 100).cast("bigint").alias("g"),
                    F.col("o_totalprice").cast("double").alias("val")))
    tp = tempfile.mkdtemp(prefix="keyed_vr_t_")
    vp = tempfile.mkdtemp(prefix="keyed_vr_v_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    maintain_grouped_view(spark, table_path=tp, key="k", view_path=vp,
                          group_col="g", sum_col="val")
    append_delete_delta(spark, rows.filter(F.col("g") == 7).select("k"),
                        path=tp, key="k")
    append_delta(spark,
                 rows.filter((F.col("k") % 10 == 0) & (F.col("g") != 7))
                 .select("k", (F.col("g") + 1000).alias("g"),
                         (F.col("val") * 2).alias("val")),
                 path=tp, key="k")
    append_delta(spark,
                 rows.filter(F.col("k") % 13 == 0)
                 .select((F.col("k") + 30000000).alias("k"),
                         (F.lit(200) + F.col("k") % 5).cast("bigint")
                         .alias("g"),
                         (F.col("val") + 1).alias("val")),
                 path=tp, key="k")
    # ONE fold bakes all three arrivals' pre-images into the base —
    # the fold-cadence dead-end (the common way a maintainer falls
    # behind; the fully-RECLAIMED-history class takes one more commit
    # and is unit-test-pinned in test_view_maintenance.py — the
    # recovery path is identical for both)
    compact(spark, tp, "k")
    try:
        maintain_grouped_view(spark, table_path=tp, key="k",
                              view_path=vp, group_col="g",
                              sum_col="val")
        raise AssertionError("vacuumed history did not dead-end")
    except ChangeHistoryUnavailable:
        pass
    st = maintain_grouped_view(spark, table_path=tp, key="k",
                               view_path=vp, group_col="g",
                               sum_col="val", auto_recover=True)
    if not st.get("recovered"):
        raise AssertionError(f"expected a recovery round: {st}")
    ins4 = (rows.filter(F.col("k") % 11 == 0)
            .select((F.col("k") + 40000000).alias("k"),
                    F.lit(300).cast("bigint").alias("g"), "val"))
    n4 = ins4.count()
    append_delta(spark, ins4, path=tp, key="k")
    st = maintain_grouped_view(spark, table_path=tp, key="k",
                               view_path=vp, group_col="g",
                               sum_col="val")
    if st.get("recovered") or st["changes"] != n4:
        raise AssertionError(
            f"post-recovery round must be plain differential: {st}")
    return read_grouped_view(spark, vp, "g")


VIEW_AVG_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS g,
         CAST(o_totalprice AS DOUBLE) AS val,
         CAST(o_orderkey % 97 AS DOUBLE) AS w
  FROM orders
),
fin AS (
  SELECT k, g,
         CASE WHEN k % 10 = 0 THEN val * 2 ELSE val END AS val, w
  FROM t WHERE k % 7 <> 0
)
SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total_val,
       CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS total_w,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_val,
       CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_w,
       MIN(val) AS vmin_val, MAX(val) AS vmax_val,
       MIN(w) AS vmin_w, MAX(w) AS vmax_w
FROM fin GROUP BY g
"""


@register("q_keyed_view_avg", VIEW_AVG_ORACLE,
          "multi-aggregate MULTI-COLUMN view: COUNT + per-column "
          "SUM/AVG/MIN/MAX maintained through one feed read per "
          "round; a partial update touching one column must leave "
          "the other's aggregates exactly unmoved — oracle-exact "
          "(r14)")
def q_keyed_view_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of the multi-aggregate, MULTI-COLUMN view surface
    (r14 verdict item 4): one maintained view carries COUNT plus SUM,
    MIN and MAX for TWO value columns (`sum_col=['val', 'w']`,
    track_minmax) and serves per-column AVG derived from the
    maintained COUNT+SUM pairs (`read_grouped_view(with_avg=True)`)
    — AVG is not self-maintainable under retractions, so SUM/COUNT
    derivation is the standard differential treatment (exact:
    decimal total over exact count, both engines compute the same
    double division). The window mixes tombstone deletes (k%7) with
    PARTIAL updates (k%10 doubles `val` while OMITTING `w` — the
    null-skip post-image per column means w's (−pre, +pre)
    contributions must cancel exactly; a maintainer that retracts
    what it never replaced drifts total_w and fails the hash). Each
    update also retracts val's pre-image, potentially invalidating a
    group extremum, so the monotone and recompute MIN/MAX paths both
    exercise under the same oracle. All nine aggregates hash against
    one GROUP BY recompute. At 100 TB: every added column rides the
    SAME feed read, delta aggregation, and one-commit round — N
    aggregates cost one pipeline, not N."""
    import tempfile

    from ..sinks.views import maintain_grouped_view, read_grouped_view

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"),
        (F.col("o_orderkey") % 97).cast("double").alias("w"))
    tp = tempfile.mkdtemp(prefix="keyed_va_t_")
    vp = tempfile.mkdtemp(prefix="keyed_va_v_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    maintain_grouped_view(spark, table_path=tp, key="k", view_path=vp,
                          group_col="g", sum_col=["val", "w"],
                          track_minmax=True)
    append_delete_delta(spark, rows.filter(F.col("k") % 7 == 0)
                        .select("k"), path=tp, key="k")
    # k%70 keys are deleted above — updating them would RE-INSERT
    # after the tombstone (clean-slate semantics); keep them dead so
    # the oracle's delete-then-update order holds. The update batch
    # OMITS w entirely: the null-skip partial-payload pattern.
    append_delta(spark,
                 rows.filter((F.col("k") % 10 == 0)
                             & (F.col("k") % 7 != 0))
                 .select("k", "g", (F.col("val") * 2).alias("val")),
                 path=tp, key="k")
    maintain_grouped_view(spark, table_path=tp, key="k", view_path=vp,
                          group_col="g", sum_col=["val", "w"],
                          track_minmax=True)
    return read_grouped_view(spark, vp, "g", with_avg=True)


SQL_SCAN_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status
  FROM orders
),
fin AS (
  SELECT k, status,
         CASE WHEN k % 13 = 0 THEN price + 5
              WHEN k % 10 = 0 THEN price * 2
              ELSE price END AS price
  FROM t
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total,
       MIN(price) AS pmin, MAX(price) AS pmax
FROM fin GROUP BY status
"""


@register("q_keyed_sql_scan", SQL_SCAN_ORACLE,
          "pure spark.sql over the keyed table: merged state "
          "registered as a temp view, snapshot-consistent across a "
          "post-registration arrival (in-query assert), re-registered "
          "head oracle-exact (r14)")
def q_keyed_sql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/keyed_table.register_sql_view` (r14
    verdict item 8 — the SQL migration surface): the keyed table's
    merged state (base + an unfolded price-doubling delta) is
    registered as a temp view and queried with PURE SQL TEXT — no
    DataFrame API in the consumer's hands. Snapshot consistency is
    asserted in-query: a delta committed AFTER registration must NOT
    change what the registered view serves (same aggregate before and
    after the arrival — the time-travel discipline every reader gets,
    now from SQL), while RE-registering surfaces it. The final
    re-registered aggregate hashes against the oracle, so a view that
    leaks post-registration arrivals, drops the merge-on-read deltas,
    or breaks null-skip merge semantics under SQL all fail. At 100 TB
    the view is the same plan as `read_merged` — registration adds
    one manifest read, zero data cost."""
    import tempfile

    from ..sinks.keyed_table import register_sql_view

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    path = tempfile.mkdtemp(prefix="keyed_sql_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None)
    append_delta(spark,
                 target.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("price") * 2).alias("price"),
                         "status"),
                 path=path, key="k")
    import uuid as _uuid
    view = f"keyed_sql_{_uuid.uuid4().hex[:8]}"
    register_sql_view(spark, path, "k", view)
    sql_text = f"""
        SELECT status, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE)
                 AS total,
               MIN(price) AS pmin, MAX(price) AS pmax
        FROM {view} GROUP BY status"""
    before = {r["status"]: (r["cnt"], r["total"])
              for r in spark.sql(sql_text).collect()}
    # an arrival AFTER registration: the registered view must not move
    append_delta(spark,
                 target.filter(F.col("k") % 13 == 0)
                 .select("k", (F.col("price") + 5).alias("price"),
                         "status"),
                 path=path, key="k")
    after = {r["status"]: (r["cnt"], r["total"])
             for r in spark.sql(sql_text).collect()}
    if before != after:
        raise AssertionError(
            f"registered view leaked a post-registration arrival: "
            f"{before} vs {after}")
    register_sql_view(spark, path, "k", view)     # refresh = see it
    # the returned frame is consumed by the HARNESS after this
    # function exits — dropping the uuid-unique temp view here would
    # work only because spark.sql analyzes eagerly (brittle against
    # lazy analysis — r14 verdict item 4); the view is session-scoped
    # and uniquely named, so it is left to die with the session
    return spark.sql(sql_text)


SQL_MERGE_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status
  FROM orders WHERE o_orderkey % 3 <> 0
),
s AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS sprice
  FROM orders WHERE o_orderkey % 2 = 0
),
merged AS (
  SELECT COALESCE(t.k, s.k) AS k,
         CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL
                THEN t.price + s.sprice
              WHEN s.k IS NOT NULL THEN s.sprice
              ELSE t.price END AS price,
         CASE WHEN t.k IS NOT NULL THEN t.status
              ELSE 'XX' END AS status,
         CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL
                   AND s.sprice > 400000 THEN 1
              ELSE 0 END AS del1
  FROM t FULL OUTER JOIN s ON t.k = s.k
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM merged WHERE del1 = 0 AND k % 1000 <> 0 GROUP BY status
"""


@register("q_keyed_sql_merge", SQL_MERGE_ORACLE,
          "pure SQL MERGE INTO against the keyed table: conditional "
          "DELETE + cross-alias UPDATE + INSERT * with first-match-"
          "wins clause ordering, then a tombstone DELETE merge — "
          "final merged state oracle-exact (r15)")
def q_keyed_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/sql_merge.sql_merge` (r15 verdict item
    6 — the SQL WRITE migration surface): two pure-SQL-text MERGE
    statements perform (1) a THREE-CLAUSE merge with ANSI
    first-match-wins ordering — `WHEN MATCHED AND s.price > 400000
    THEN DELETE` (conditional tombstones), else a cross-alias
    accumulating update (`SET price = t.price + s.price` — the
    partial SET leaves `status` untouched, proving null-skip subset
    semantics under SQL), plus `INSERT *` for unmatched stage rows —
    then (2) a tombstone DELETE of a key slice — all through the
    engine's normal delta appends (reference null-skip semantics:
    /root/reference/src/func/mongo.py:28-79). The final merged state
    aggregates oracle-exact, so a wrong clause-reach predicate (a
    delete-matched row also updated, or vice versa), a SET leaking
    into unassigned columns, an insert duplicating matched keys, or
    a DELETE missing the tombstone path all fail the value hash. At
    100 TB: one left join of stage against the merged snapshot + one
    tombstone append + one O(stage) delta append per statement —
    driver-side work is string parsing only."""
    import uuid as _uuid

    from ..sinks.sql_merge import sql_merge

    orders = load_table(spark, sf_dir, "orders")
    target = (orders.filter(F.col("o_orderkey") % 3 != 0)
              .select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").cast("double").alias("price"),
                      F.col("o_orderstatus").alias("status")))
    path = tempfile.mkdtemp(prefix="keyed_sqlmerge_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None)
    stage = f"stage_{_uuid.uuid4().hex[:8]}"
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select(F.col("o_orderkey").alias("k"),
             F.col("o_totalprice").cast("double").alias("price"),
             F.lit("XX").alias("status"))
     .createOrReplaceTempView(stage))
    sql_merge(spark, f"""
        MERGE INTO tbl AS t USING {stage} AS s ON t.k = s.k
        WHEN MATCHED AND s.price > 400000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = t.price + s.price
        WHEN NOT MATCHED THEN INSERT *""",
        tables={"tbl": (path, "k")})
    # every merged key with k%1000==0 is even, hence in the stage —
    # the subquery-USING victims cover exactly the oracle's filter
    sql_merge(spark, f"""
        MERGE INTO tbl AS t
        USING (SELECT k FROM {stage} WHERE k % 1000 = 0) AS v
        ON t.k = v.k
        WHEN MATCHED THEN DELETE""", tables={"tbl": (path, "k")})
    return (read_merged(spark, path, "k")
            .groupBy("status")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                 F.sum(dec("price", 38, 6)).cast("double").alias("total")))


SQL_CHANGES_ORACLE = """
WITH d1 AS (
  SELECT 'U' AS op, 1 AS v, CAST(o_totalprice AS DOUBLE) * 2 AS price
  FROM orders WHERE o_orderkey % 5 = 0
),
d2 AS (
  SELECT 'D' AS op, 2 AS v, CAST(NULL AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT op, CAST(v AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2) u
GROUP BY op, v
"""


@register("q_keyed_sql_changes", SQL_CHANGES_ORACLE,
          "pure SQL over the registered change feed: bounded "
          "(after, until] window, op/version aggregation oracle-exact, "
          "schema stable under a later evolved delta (in-query "
          "asserts, r15)")
def q_keyed_sql_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/changes.register_sql_changes` (r15
    verdict item 7 — the CDC migration surface): the keyed table's
    change feed (one upsert delta + one tombstone delta) is
    registered as a BOUNDED temp view and aggregated with pure SQL
    text. Two contracts asserted in-query: (1) the bounded window's
    SCHEMA is stable under later delta evolution — a delta that
    introduces a new column lands AFTER registration and the
    re-registered bounded view still excludes it (the r14
    bounded-window regression, now via SQL); (2) the bounded window
    excludes the evolved delta's ROWS. The op/version aggregate
    hashes against the oracle, so a feed that drops tombstones,
    mis-normalizes payloads, leaks future versions, or renumbers
    deltas fails the value hash. At 100 TB the view is the feed's
    normal bounded delta union — registration adds a metadata
    listing, zero data cost."""
    import uuid as _uuid

    from ..sinks.changes import register_sql_changes

    orders = load_table(spark, sf_dir, "orders")
    target = (orders.filter(F.col("o_orderkey") % 3 != 0)
              .select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").cast("double").alias("price"),
                      F.col("o_orderstatus").alias("status")))
    path = tempfile.mkdtemp(prefix="keyed_sqlchg_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None)     # base: NOT in feed
    append_delta(spark,                               # version 1: U rows
                 orders.filter(F.col("o_orderkey") % 5 == 0)
                 .select(F.col("o_orderkey").alias("k"),
                         (F.col("o_totalprice").cast("double") * 2)
                         .alias("price"),
                         F.lit("XX").alias("status")),
                 path=path, key="k")
    append_delete_delta(spark,                        # version 2: D rows
                        orders.filter(F.col("o_orderkey") % 7 == 0)
                        .select(F.col("o_orderkey").alias("k")),
                        path=path, key="k")
    view = f"chg_{_uuid.uuid4().hex[:8]}"
    register_sql_changes(spark, path, view, after=0, until=2)
    sql_text = f"""
        SELECT _change_op AS op,
               CAST(_change_version AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE)
                 AS total
        FROM {view} GROUP BY _change_op, _change_version"""
    before = spark.sql(sql_text).collect()
    # version 3 EVOLVES the schema (new column) — the bounded view,
    # re-registered, must neither grow the column nor leak the rows
    append_delta(spark,
                 orders.filter(F.col("o_orderkey") % 11 == 0)
                 .select(F.col("o_orderkey").alias("k"),
                         F.col("o_totalprice").cast("double")
                         .alias("price"),
                         F.lit("YY").alias("status"),
                         F.lit("evolved").alias("extra")),
                 path=path, key="k")
    register_sql_changes(spark, path, view, after=0, until=2)
    out = spark.sql(sql_text)
    if "extra" in spark.table(view).columns:
        raise AssertionError(
            "bounded change view leaked a future delta's column")
    after_rows = out.collect()
    if sorted(map(tuple, before)) != sorted(map(tuple, after_rows)):
        raise AssertionError(
            f"bounded change view leaked future rows: {before} vs "
            f"{after_rows}")
    return out


@register("q_keyed_view_follow", VIEW_MAINTAIN_ORACLE,
          "CONTINUOUS view maintenance (stream_maintain_view, "
          "availableNow): two checkpointed drains — bootstrap, then "
          "a 3-delta arrival window — leave the view oracle-exact "
          "(r15)")
def q_keyed_view_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `sinks/views.stream_maintain_view` (r15 — the
    arrival-driven maintainer): the SAME table/delta scenario as
    q_keyed_view_maintain, but maintenance is driven by the change
    feed's FILE STREAM instead of scheduled calls. Drain 1 (fresh
    checkpoint) bootstraps the view; three LSM arrivals land (group
    move, tombstones, inserts); drain 2 with the SAME checkpoint (the
    same logical maintainer, lease re-acquired reentrantly) applies
    the window through the stream's foreachBatch signal. In-query
    asserts: the offset reached 3 and a follow-up BATCH maintainer
    round is a pure no-op (the stream left nothing behind and
    released its lease — a held lease would make that call raise).
    The final view rows hash against the SAME oracle as the scheduled
    form, so the two maintenance drivers are provably equivalent. At
    100 TB the stream lists O(delta dirs) per trigger and each round
    is O(changes) — identical cost to the scheduled form minus idle
    rescans."""
    import tempfile

    from ..sinks.views import (maintain_grouped_view, read_grouped_view,
                               stream_maintain_view, view_offset)

    orders = load_table(spark, sf_dir, "orders")
    rows = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"))
    tp = tempfile.mkdtemp(prefix="keyed_vf_t_")
    vp = tempfile.mkdtemp(prefix="keyed_vf_v_")
    ckpt = tempfile.mkdtemp(prefix="keyed_vf_c_")
    upsert_into_keyed_table(spark, rows, path=tp, key="k",
                            updated_at_col=None)
    stream_maintain_view(spark, table_path=tp, key="k", view_path=vp,
                         group_col="g", sum_col="val", checkpoint=ckpt)
    if view_offset(spark, vp) != 0:
        raise AssertionError("drain 1 should bootstrap at offset 0")
    append_delta(spark,
                 rows.filter(F.col("k") % 10 == 0)
                 .select("k", (F.col("g") + 1000000).alias("g"),
                         (F.col("val") * 2).alias("val")),
                 path=tp, key="k")
    append_delete_delta(
        spark, rows.filter(F.col("k") % 7 == 0).select("k"),
        path=tp, key="k")
    append_delta(spark,
                 rows.filter(F.col("k") % 13 == 0)
                 .select((F.col("k") + 20000000).alias("k"), "g", "val"),
                 path=tp, key="k")
    stream_maintain_view(spark, table_path=tp, key="k", view_path=vp,
                         group_col="g", sum_col="val", checkpoint=ckpt)
    if view_offset(spark, vp) != 3:
        raise AssertionError(
            f"drain 2 should reach offset 3, got "
            f"{view_offset(spark, vp)}")
    st = maintain_grouped_view(spark, table_path=tp, key="k",
                               view_path=vp, group_col="g",
                               sum_col="val")
    if st["changes"] != 0 or st["groups_touched"] != 0:
        raise AssertionError(
            f"batch round after the drain was not a no-op: {st}")
    return read_grouped_view(spark, vp, "g")


SQL_UPDATE_DELETE_ORACLE = """
WITH t AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status
  FROM orders WHERE o_orderkey % 3 <> 0
),
s AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS sprice
  FROM orders WHERE o_orderkey % 2 = 0
),
merged AS (
  SELECT COALESCE(t.k, s.k) AS k,
         CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL
                   AND s.sprice > 300000 THEN t.price + s.sprice
              WHEN t.k IS NOT NULL THEN t.price
              ELSE s.sprice END AS price,
         CASE WHEN t.k IS NOT NULL THEN t.status
              ELSE 'XX' END AS status,
         CASE WHEN t.k IS NULL AND s.sprice > 200000 THEN 1
              ELSE 0 END AS skipped
  FROM t FULL OUTER JOIN s ON t.k = s.k
),
inserted AS (
  SELECT k, price, status FROM merged WHERE skipped = 0
  UNION ALL
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         'IN' AS status
  FROM orders WHERE o_orderkey % 6 = 3
),
updated AS (
  SELECT k,
         CASE WHEN status = 'F' THEN price * 2 ELSE price END AS price,
         status
  FROM inserted
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM updated WHERE price <= 500000 GROUP BY status
"""


@register("q_keyed_sql_update_delete", SQL_UPDATE_DELETE_ORACLE,
          "pure-SQL write statements r16: MERGE with a CONDITIONAL "
          "INSERT clause, INSERT INTO ... SELECT, then plain UPDATE "
          "... WHERE and DELETE FROM ... WHERE through the write "
          "dispatcher — final merged state oracle-exact")
def q_keyed_sql_update_delete(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Attestation of the r16 SQL write surface (verdict items 4+5):
    (1) a MERGE whose not-matched group is CONDITIONAL — `WHEN NOT
    MATCHED AND s.price <= 200000 THEN INSERT *` composed with a
    conditional matched update in the SAME statement (the shape the
    r15 filter-the-source workaround could not express; both clauses
    fire non-vacuously at every SF); (2) a plain `UPDATE tbl SET
    price = price * 2 WHERE status = 'F'` (partial-payload upsert
    delta; *2 stays exact in doubles so the oracle hash is
    bit-stable); (3) a plain `DELETE FROM tbl WHERE price > 500000`
    (tombstone delta — the LSM path, no base rewrite). All three
    route through `sql_write`, the CLI dispatcher's entry point, and
    land as ONE delta commit each; the final merged aggregate is
    oracle-exact, so a mis-scoped WHERE, a null-skip violation, a
    wrong conditional-insert reach, or a mistyped tombstone all fail
    the value hash. Reference null-skip semantics:
    /root/reference/src/func/mongo.py:28-79. At 100 TB: the UPDATE/
    DELETE predicates push into the merged snapshot's base scan
    (Catalyst row-group pruning); deltas are O(matched rows)."""
    import uuid as _uuid

    from ..sinks.sql_merge import sql_write

    orders = load_table(spark, sf_dir, "orders")
    target = (orders.filter(F.col("o_orderkey") % 3 != 0)
              .select(F.col("o_orderkey").alias("k"),
                      F.col("o_totalprice").cast("double").alias("price"),
                      F.col("o_orderstatus").alias("status")))
    path = tempfile.mkdtemp(prefix="keyed_sqlupddel_")
    upsert_into_keyed_table(spark, target, path=path, key="k",
                            updated_at_col=None)
    stage = f"stage_{_uuid.uuid4().hex[:8]}"
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select(F.col("o_orderkey").alias("k"),
             F.col("o_totalprice").cast("double").alias("price"),
             F.lit("XX").alias("status"))
     .createOrReplaceTempView(stage))
    tables = {"tbl": (path, "k")}
    sql_write(spark, f"""
        MERGE INTO tbl AS t USING {stage} AS s ON t.k = s.k
        WHEN MATCHED AND s.price > 300000
             THEN UPDATE SET price = t.price + s.price
        WHEN NOT MATCHED AND s.price <= 200000 THEN INSERT *""",
        tables=tables)
    ins = f"ins_{_uuid.uuid4().hex[:8]}"
    (orders.filter(F.col("o_orderkey") % 6 == 3)
     .select(F.col("o_orderkey").alias("k"),
             F.col("o_totalprice").cast("double").alias("price"),
             F.lit("IN").alias("status"))
     .createOrReplaceTempView(ins))
    sql_write(spark, f"INSERT INTO tbl SELECT k, price, status "
                     f"FROM {ins}", tables=tables)
    sql_write(spark, "UPDATE tbl SET price = price * 2 "
                     "WHERE status = 'F'", tables=tables)
    sql_write(spark, "DELETE FROM tbl WHERE price > 500000",
              tables=tables)
    return (read_merged(spark, path, "k")
            .groupBy("status")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                 F.sum(dec("price", 38, 6)).cast("double").alias("total")))


SQL_COPY_LIFECYCLE_ORACLE = """
WITH seed AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status
  FROM orders WHERE o_orderkey % 3 = 0
),
c1 AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) * 2 AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
a1 AS (
  SELECT COALESCE(c1.k, seed.k) AS k,
         COALESCE(c1.price, seed.price) AS price,
         seed.status AS status
  FROM seed FULL OUTER JOIN c1 ON seed.k = c1.k
),
c2 AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) / 2 AS price
  FROM orders WHERE o_orderkey % 5 = 0
),
a2 AS (
  SELECT COALESCE(c2.k, a1.k) AS k,
         COALESCE(c2.price, a1.price) AS price,
         a1.status AS status
  FROM a1 FULL OUTER JOIN c2 ON a1.k = c2.k
)
SELECT COALESCE(status, 'NEW') AS status,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM a2 GROUP BY COALESCE(status, 'NEW')
"""


@register("q_keyed_sql_copy_lifecycle", SQL_COPY_LIFECYCLE_ORACLE,
          "r16 SQL maintenance surface: COPY INTO bulk loads (parquet "
          "name-aligned, CSV with FORMAT_OPTIONS), OPTIMIZE fold, "
          "VACUUM RETAIN 0 reclamation — final merged state "
          "oracle-exact")
def q_keyed_sql_copy_lifecycle(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Attestation of the r16 CREATE TABLE AS SELECT / COPY INTO /
    OPTIMIZE / VACUUM statements as one table lifecycle, all through
    `sql_write` (the CLI dispatcher's entry point): (1) the table is
    BORN from pure SQL — a keyed CTAS whose registration the later
    statements reuse; (2) `COPY INTO` a parquet directory whose columns are
    deliberately name-misordered and OMIT `status` — name alignment
    plus null-skip (existing keys keep their status, new keys read
    back NULL) are both load-bearing for the oracle hash; (3)
    `OPTIMIZE tbl` folds base + deltas into a new base (state must
    be invariant); (4) `COPY INTO ... FILEFORMAT = CSV
    FORMAT_OPTIONS(header = 'true')` loads a header CSV — string
    columns cast to the table dtypes (Java shortest-roundtrip double
    formatting makes the write/read exact); (5) `VACUUM tbl RETAIN 0
    HOURS` reclaims the folded delta files — a vacuum that removed a
    LIVE file would break the final read. COPY is the SQL spelling
    of the reference's whole pipeline (read parquet, upsert keyed —
    reference src/pipeline.py end to end). At 100 TB: each COPY is
    one distributed source scan + one O(source rows) delta append;
    OPTIMIZE is one write + manifest flip; VACUUM is metadata-only.
    """
    from ..sinks.sql_merge import sql_write

    import uuid as _uuid

    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    seedv = f"seed_{_uuid.uuid4().hex[:8]}"
    (orders.filter(F.col("o_orderkey") % 3 == 0)
     .select(F.col("o_orderkey").alias("k"),
             price.alias("price"),
             F.col("o_orderstatus").alias("status"))
     .createOrReplaceTempView(seedv))
    stage = tempfile.mkdtemp(prefix="copy_src_")
    path = f"{stage}/tbl"
    tables: dict[str, tuple[str, str]] = {}
    # keyed CTAS (r16): version 1 born from pure SQL — the statement
    # registers 'tbl' in the live mapping the later statements use
    sql_write(spark, f"CREATE TABLE tbl KEY (k) LOCATION '{path}' "
                     f"AS SELECT k, price, status FROM {seedv}",
              tables=tables)
    src1 = f"{stage}/evens"
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select((price * 2).alias("price"),        # misordered, no status
             F.col("o_orderkey").alias("k"))
     .write.parquet(src1))
    sql_write(spark, f"COPY INTO tbl FROM '{src1}'", tables=tables)
    sql_write(spark, "OPTIMIZE tbl", tables=tables)
    src2 = f"{stage}/fives"
    (orders.filter(F.col("o_orderkey") % 5 == 0)
     .select(F.col("o_orderkey").alias("k"),
             (price / 2).alias("price"))
     .write.option("header", "true").csv(src2))
    sql_write(spark, f"""COPY INTO tbl FROM '{src2}'
        FILEFORMAT = CSV FORMAT_OPTIONS(header = 'true')""",
        tables=tables)
    sql_write(spark, "VACUUM tbl RETAIN 0 HOURS", tables=tables)
    return (read_merged(spark, path, "k")
            .groupBy(F.coalesce(F.col("status"), F.lit("NEW"))
                     .alias("status"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                 F.sum(dec("price", 38, 6)).cast("double").alias("total")))


SQL_RESTORE_ORACLE = """
WITH seed AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
         o_orderstatus AS status
  FROM orders WHERE o_orderkey % 3 = 0
),
ins AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) / 2 AS price,
         'NEW' AS status
  FROM orders WHERE o_orderkey % 7 = 0
),
final AS (
  SELECT COALESCE(ins.k, seed.k) AS k,
         COALESCE(ins.price, seed.price) AS price,
         COALESCE(ins.status, seed.status) AS status
  FROM seed FULL OUTER JOIN ins ON seed.k = ins.k
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM final GROUP BY status
"""


@register("q_keyed_sql_restore", SQL_RESTORE_ORACLE,
          "r16 RESTORE TABLE: metadata-only rollback (carry-by-"
          "reference base, zero bytes moved) erases a full upsert "
          "round; post-restore INSERT proves the table keeps "
          "rolling — final state oracle-exact")
def q_keyed_sql_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attestation of `RESTORE TABLE ... TO VERSION AS OF n` (r16):
    seed a keyed table (version 1), run a SECOND full upsert round
    that rewrites half the rows' price AND status (version 2), then
    `RESTORE TABLE tbl TO VERSION AS OF 1` — a METADATA-ONLY commit
    (the new base carries version 1's files by `_CARRIED.json`
    reference; zero data bytes move, constant in table size — Delta
    Lake's RESTORE is the same manifest trick). The oracle sees ONLY
    the seed + the post-restore INSERT: any residue of the erased
    round — a price doubled, a status overwritten, a key the round
    added — fails the value hash, as would a restore that broke the
    table for later writes. Restore must be a base flip, not a delta:
    the engine's null-skip merge cannot overwrite a newer non-null
    with the snapshot's NULL. At 100 TB: O(files) driver metadata +
    one manifest flip; the post-restore read plans through the
    carried refs in one hop."""
    from ..sinks.sql_merge import sql_write

    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    seed = (orders.filter(F.col("o_orderkey") % 3 == 0)
            .select(F.col("o_orderkey").alias("k"),
                    price.alias("price"),
                    F.col("o_orderstatus").alias("status")))
    path = tempfile.mkdtemp(prefix="keyed_sqlrestore_")
    upsert_into_keyed_table(spark, seed, path=path, key="k",
                            updated_at_col=None, retain_versions=3)
    round2 = (orders.filter(F.col("o_orderkey") % 2 == 0)
              .select(F.col("o_orderkey").alias("k"),
                      (price * 2).alias("price"),
                      F.lit("EV").alias("status")))
    upsert_into_keyed_table(spark, round2, path=path, key="k",
                            updated_at_col=None, retain_versions=3)
    tables = {"tbl": (path, "k")}
    sql_write(spark, "RESTORE TABLE tbl TO VERSION AS OF 1",
              tables=tables)
    import uuid as _uuid
    ins = f"ins_{_uuid.uuid4().hex[:8]}"
    (orders.filter(F.col("o_orderkey") % 7 == 0)
     .select(F.col("o_orderkey").alias("k"),
             (price / 2).alias("price"),
             F.lit("NEW").alias("status"))
     .createOrReplaceTempView(ins))
    sql_write(spark, f"INSERT INTO tbl SELECT k, price, status "
                     f"FROM {ins}", tables=tables)
    return (read_merged(spark, path, "k")
            .groupBy("status")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                 F.sum(dec("price", 38, 6)).cast("double").alias("total")))
