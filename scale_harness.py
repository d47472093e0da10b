"""Scale-up experiment: measure how headline operators scale when the
fact tables grow x10 / x100 while the query stays fixed.

The committed bench (BENCH_FULL.json, sf0.1) proves correctness-with-
reasonable-cost at one size; this harness supplies the missing axis —
the empirical scaling CURVE. It replicates the sf0.1 fact tables K
times with key remapping (dimension tables stay fixed, mirroring how
real warehouses grow), runs unmodified catalog queries at each scale
through the same noop-sink protocol as bench.py, and reports per-query
wall-clock plus the log-log slope between the largest two scales. A
slope near 1.0 is linear scaling; anything super-linear flags a plan
that would not survive 100 TB.

Replication scheme (copy k = 0..K-1, crossJoin with a broadcast
copies frame so the source is scanned once, never K times):
- lineitem / orders : orderkey += k * 10M (joins stay within-copy);
  o_custkey unchanged — the fixed customer dimension fans out exactly
  like a real dim at higher SF.
- events            : event_id += k * 10M, user_id += k * 1M (window /
  session partitions multiply; per-user history stays constant).
- documents         : doc_id += k * 10M; every inter-word gap gets a
  copy-specific salt token, so EVERY 3-shingle is copy-local: the K
  copies are disjoint near-dup corpora (linear candidate growth), not
  one corpus duplicated K times (which would be quadratic cross-copy
  pair blowup — a different experiment than "more data").
- embeddings        : vec_id += k * 10M; each copy k > 0 gets a
  copy-specific ±1 SIGN FLIP per dimension (md5 parity of (k, j)).
  An elementwise sign vector s preserves every within-copy dot
  product exactly (<s⊙a, s⊙b> = <a, b>) — IVF/ANN structure inside
  a copy is untouched — while cross-copy cosines decorrelate to
  ~±1/√dim, far below any dedup threshold, so near-dup slots see
  "more data", not "the same data duplicated K times" (the earlier
  k·1e-3 jitter preserved cross-copy cosine ≈ 1.0, which made every
  copy a true near-dup of its siblings: candidate growth quadratic
  in K by CONSTRUCTION, the vector analog of why document shingles
  get copy-salted). Copy 0 is identity, so the catalog query's fixed
  10-vector query set (vec_id 100..110) is bit-identical at every
  scale — the realistic fixed-workload / growing-corpus posture.
- region/nation/customer/supplier/part: written through unchanged.

Every scale (including x1) is materialized by the same writer so file
layout and compression are identical; timings differ only by data
volume. Usage:

    python scale_harness.py [--factors 1,10,100] [--repeats 2]

Writes SCALE_RESULTS.json and prints a per-query table. Data lands in
.scale_data/ (gitignored, like the bench's .bench_layout/).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.path.join(REPO, ".scale_data")

DIMS = ["region", "nation", "customer", "supplier", "part"]
KEY_OFF = 10_000_000
USER_OFF = 1_000_000

QUERIES = [
    # scan + aggregate over the widest fact
    "q1_pricing_summary",
    # customer x orders x lineitem shuffle join + top-k
    "q_tpch_q3_shipping",
    # window rank per user (partition count grows, per-partition work
    # constant)
    "q_window_topk",
    # lag/gap sessionization per user
    "q_sessionize",
    # exact hash dedup over documents
    "q_dedup_exact",
    # MinHash-LSH banded near-dup candidates + exact verify
    "q_minhash_lsh_pairs",
    # cross-batch probe against the history band index
    "q_incremental_dedup",
    # substring-level exact dedup: rolling k-gram count + span merge
    # (salted gaps keep every k-gram copy-local -> linear dup growth)
    "q_dup_spans",
    # ...and the applied cut: explode covered positions, anti-join,
    # per-doc ordered rebuild of the trimmed corpus
    "q_dedup_trim",
    # IVF ANN: fixed query set, growing corpus
    "q_ann_ivf_search",
    # stateful streaming: applyInPandasWithState first-seen + TTL over
    # the staged events feed (state keys grow with users; per-key
    # state bounded by the TTL eviction)
    "q_stream_first_seen_ttl",
    # NOT swept: q_incremental_vec_dedup. Its banded RHP index uses
    # FIXED 6-bit bands (64 buckets) tuned for the fixture scale —
    # bucket space does not grow with N, so on decorrelated data the
    # candidate count is ~N²/2^bits per band and a fixed-parameter
    # sweep measures index MIS-TUNING, not the plan (LSH practice:
    # bits-per-band grows with log2 N; re-tune per deployment size).
    # The sub-linear evidence for the banded-LSH probe SHAPE is the
    # MinHash slot (q_minhash_lsh_pairs, slope 0.31), whose band_sig
    # buckets are content-derived strings — bucket space grows with
    # the data, which is the property the sweep needs.
]

# Sink-family slots (r10 verdict #5): one keyed-table upsert ROUND —
# read current base, merge a 1%-of-keys batch, write the next version,
# flip the manifest — against a PRE-BUILT base (setup untimed). The
# plain/bucketed pair turns the 2M-row BENCH_NOTES point measurement
# into a curve: the plain base re-shuffles the full table every round,
# the bucketed base's scan already satisfies the merge join's
# distribution, so its per-round cost should grow by the merge+write
# only.
SINK_SLOTS = ["sink_upsert_plain", "sink_upsert_bucketed"]

# Data-skipping slots (r12): a 3-key point lookup against a
# RANGE-layout keyed base built from the xK orders (setup untimed; the
# file count grows with the data so file SIZE stays constant, the
# production sizing rule). `lookup_zonemap` goes through
# `lookup_keyed_table` — the zone map admits ~one file per probed key,
# so the timed cost should stay FLAT as the table grows x100.
# `lookup_fullscan` answers the identical probe by filtering the full
# base read — the O(table) baseline the zone map exists to avoid.
# The pair turns the skipping claim into a measured curve.
LOOKUP_SLOTS = ["lookup_zonemap", "lookup_fullscan", "lookup_join_bulk"]

# Fold slots (r12): one LSM arrival round — append a CONSTANT-size
# delta (copy-0 keys 0..8000, ~2k rows at every scale) and fold it —
# against a pre-built range-layout base whose file count grows with
# the data (setup untimed). `compact_full_arrival` is the O(table)
# baseline: every fold re-reads, re-sorts and re-writes the whole
# base. `compact_pruned_arrival` rewrites only the zone-map-touched
# files and carries the rest by filesystem copy, so its timed cost
# should stay ~flat while the full fold grows ~linearly — the pair
# measures exactly the property that keeps a 100 TB LSM table
# foldable per arrival round.
COMPACT_SLOTS = ["compact_pruned_arrival", "compact_full_arrival"]

# Merged-read slots (r12): the full merge-on-read view (base + one
# constant 2k-row pending delta) written to noop. `merged_view_fast`
# is the broadcast-delta-keys decomposition (untouched base rows never
# shuffle); `merged_view_classic` forces the window-over-union form
# (whole base through the per-key version window). The pair measures
# the read-between-folds cost the fast path exists to remove.
MERGED_SLOTS = ["merged_view_fast", "merged_view_classic"]

# Zone-map PLANNING slots (r13, verdict item 4): the driver-side cost
# of turning a 3-key point probe into a kept-file list, isolated from
# any data I/O — at 100 TB (~100k files) this is the metadata parse a
# lookup pays before its first executor task. The file-count axis is
# 80*k entries (x100 = 8,000 files, the verdict's target size),
# synthesized as a real on-disk sidecar via the production writer.
# `zonemap_plan_sharded` plans through ZoneMapIndex (index doc + only
# the span-intersecting shards, O(probe) entry parse); `zonemap_plan_
# fullparse` is the r12 baseline — materialize every entry, prune the
# whole list (O(files) parse per plan). Timed body = 20 independent
# plans (fresh parse each, as a driver serving lookups would pay
# without a cache). Expect: fullparse grows ~linearly with the file
# count, sharded stays near-flat.
ZONEMAP_PLAN_SLOTS = ["zonemap_plan_sharded", "zonemap_plan_fullparse",
                      "zonemap_plan_100k"]

# Noise sentinel (r14, verdict item 6): every slot's committed number
# must be able to defend itself. The same fixed CPU-bound Spark probe
# bench.py calibrates (hash-agg over a generated 20M range, no I/O,
# no Python workers) runs before AND after each slot's reps; the
# worse of the two, relative to the idle-box calibration, is the
# slot's recorded `noise`. A slot whose noise exceeds the threshold
# is re-run once and the cleaner attempt is committed — the r13
# stream_dedup_drain x100 episode (reps [185 s, 42 s] under builder
# CPU steal, no way to tell from the artifact) is exactly what this
# closes.
SPARK_PROBE_REF_SEC = 0.13       # bench.py's idle-box calibration
NOISY_PROBE_FACTOR = 3.0
MAX_SLOT_ATTEMPTS = 2


def spark_probe(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "sum(hash(id)) AS h", "count(1) AS n").collect()
    return time.perf_counter() - t0


def timed_slot(spark, thunk, repeats: int) -> dict:
    """Run one slot's reps bracketed by calibration probes; retry the
    whole slot once when the bracket shows CPU steal. Returns the
    committed record {sec, reps, noise[, attempts]}."""
    attempts = []
    for _ in range(MAX_SLOT_ATTEMPTS):
        p0 = spark_probe(spark)
        reps = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            thunk()
            reps.append(round(time.perf_counter() - t0, 3))
        p1 = spark_probe(spark)
        noise = round(max(p0, p1) / SPARK_PROBE_REF_SEC, 2)
        attempts.append({"sec": min(reps), "reps": reps,
                         "noise": noise})
        if noise <= NOISY_PROBE_FACTOR:
            break
    best = min(attempts,
               key=lambda r: (r["noise"] > NOISY_PROBE_FACTOR, r["sec"]))
    if len(attempts) > 1:
        best = dict(best)
        best["attempts"] = len(attempts)
    return best

# Streaming dedup drain slot (r13, verdict item 6): one full
# availableNow drain of the xK documents corpus, arriving as 4
# parquet batch files, through stream_dedup_parquet (near mode, LSM
# index appends + probe-the-tail). Fresh index/checkpoint per rep —
# the measured work IS the drain: per-epoch signing, history probe,
# verdict write, survivor fold. Copy-salted shingles make every copy
# a disjoint corpus, so docs grow xK with ~linear candidate growth;
# the slope measures whether the streaming cycle keeps up with corpus
# growth (state = the band index, growing with survivors).
DEDUP_STREAM_SLOT = "stream_dedup_drain"

# Bloom-index slots (r13): one EQUALITY scan probing uid =
# md5(orderkey) of a fixed copy-0 key against a range base built from
# the xK orders (setup untimed). The uid column is uniformly
# scattered, so every file's [min,max] admits the probe — the zone
# map prunes NOTHING here by construction. `scan_bloom` consults the
# per-file bloom sidecar and should read ~1 file at every scale
# (in-run asserted); `scan_bloom_noindex` is the same probe on an
# identical table WITHOUT the index — the O(table) read the bloom
# exists to avoid. The pair turns the equality-skipping claim into a
# measured curve.
BLOOM_SLOTS = ["scan_bloom", "scan_bloom_noindex"]


def _bloom_scan_factory(spark, data_dir: str, scratch: str, k: int,
                        indexed: bool):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        scan_keyed_table, upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    tag = "idx" if indexed else "noidx"
    path = os.path.join(scratch, f"kt_bloom_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("_id"),
        F.md5(F.col("o_orderkey").cast("string")).alias("uid"),
        "o_totalprice")
    upsert_into_keyed_table(
        spark, orders, path=path, key="_id", updated_at_col=None,
        range_files=8 * k, bloom_cols=(["uid"] if indexed else None))
    # copy-0 key 1000 exists at every scale; its md5 is scale-invariant
    probe = orders.filter(F.col("_id") == 1000).select("uid").first()[0]

    def run():
        out, st = scan_keyed_table(spark, path,
                                   where={"uid": (probe, probe)},
                                   with_stats=True)
        n = out.count()
        if n != 1:
            raise AssertionError(f"probe returned {n} rows")
        if indexed and not (st["bloom_cols_used"] == ["uid"]
                            and st["files_read"] <= 4):
            raise AssertionError(f"bloom did not engage: {st}")
    return run


# View-maintenance slot (r13): one feed round — a constant-size
# arrival (copy-0 keys 0..8000) lands as an LSM delta and ONE
# maintain_grouped_view call applies it differentially to a grouped
# COUNT/SUM view over the xK orders (bootstrap is untimed setup).
# The increment costs O(changes + touched groups): pre-images read
# zone-span-pruned base hits, retract/add contributions are exact
# decimal, and the source table is never rescanned — so the timed
# cost should stay ~flat while the table grows x100. The run asserts
# the round was incremental (not a re-bootstrap) and that the view
# stays offset-consistent.
VIEW_SLOT = "view_maintain_arrival"


def _view_maintain_factory(spark, data_dir: str, scratch: str, k: int):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        append_delta, upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sinks.views import (
        maintain_grouped_view)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    tp = os.path.join(scratch, "kt_view_src")
    vp = os.path.join(scratch, "kt_view_agg")
    shutil.rmtree(tp, ignore_errors=True)
    shutil.rmtree(vp, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("_id"),
        F.col("o_custkey").cast("bigint").alias("g"),
        F.col("o_totalprice").cast("double").alias("val"))
    upsert_into_keyed_table(spark, orders, path=tp, key="_id",
                            updated_at_col=None, range_files=8 * k)
    st = maintain_grouped_view(spark, table_path=tp, key="_id",
                               view_path=vp, group_col="g",
                               sum_col="val")
    if not st.get("bootstrap"):
        raise AssertionError(f"setup bootstrap failed: {st}")
    batch = (orders.filter(F.col("_id").between(0, 8000))
             .withColumn("val", F.col("val") + 1.0)
             .localCheckpoint())

    def run():
        append_delta(spark, batch, path=tp, key="_id")
        st = maintain_grouped_view(spark, table_path=tp, key="_id",
                                   view_path=vp, group_col="g",
                                   sum_col="val")
        if st.get("bootstrap") or st["changes"] <= 0:
            raise AssertionError(f"round was not incremental: {st}")
    return run


# Adaptive file-sizing slot (r13): the arrival round of
# compact_pruned_arrival, but the pre-built base is sized by a FIXED
# byte target instead of a hand-scaled 8*k file count — the planner
# must grow the count itself as the table grows xK. The timed body is
# the same constant-size append + pruned fold; the run ASSERTS that
# the fold stayed pruned AND that no data file of the new base
# exceeds 4x the target (the property a pinned count loses at scale:
# ever-fatter files whose zone-map spans stop pruning). Expect the
# same ~flat curve as compact_pruned_arrival — the target discipline
# must not cost the surgical fold its O(touched) bound.
AUTOSIZE_SLOT = "autosize_pruned_arrival"
AUTOSIZE_TARGET = 512 * 1024


def _autosize_factory(spark, data_dir: str, scratch: str, k: int):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        _base_dir, append_delta, compact_pruned, current_base_version,
        upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    path = os.path.join(scratch, "kt_autosize")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("_id"), "o_totalprice", "o_orderstatus")
    upsert_into_keyed_table(spark, orders, path=path, key="_id",
                            updated_at_col=None, range_files=4,
                            target_file_bytes=AUTOSIZE_TARGET)
    # the seed write plans blind (range_files=4 — deliberately wrong
    # at every k); one more full round re-plans from observed bytes,
    # so the timed arrivals start from a correctly-sized base. Both
    # writes are untimed setup; pruned folds then keep every
    # REWRITTEN group on target and carry the rest untouched.
    upsert_into_keyed_table(spark, orders.filter(F.col("_id") == 0),
                            path=path, key="_id", updated_at_col=None)
    batch = (orders.filter(F.col("_id").between(0, 8000))
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
             .localCheckpoint())

    def run():
        append_delta(spark, batch, path=path, key="_id")
        _, stats = compact_pruned(spark, path, "_id")
        if not (stats["pruned"] and stats["files_carried"] > 0):
            raise AssertionError(f"fold not pruned: {stats}")
        v = current_base_version(spark, path)
        sizes = hfs.listdir_sizes(spark, _base_dir(path, v))
        fat = {n: s for n, s in sizes.items()
               if not n.startswith("_") and s > 4 * AUTOSIZE_TARGET}
        if fat:
            raise AssertionError(
                f"autosized base has files past 4x target: {fat}")
    return run


def _dedup_stream_factory(spark, data_dir: str, scratch: str):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)
    from howto_mongo_bulk_update_from_parquet_spark.streaming.dedup_stream import (
        stream_dedup_parquet)

    landing = os.path.join(scratch, "dstream_landing")
    marker = os.path.join(landing, "_SCALE_READY")
    if not os.path.exists(marker):
        shutil.rmtree(landing, ignore_errors=True)
        docs = (load_table(spark, data_dir, "documents")
                .select("doc_id", "text"))
        # 4 arrival batches, deterministic split, ONE file each so
        # maxFilesPerTrigger=1 below means one micro-batch per arrival
        # (multi-file batch dirs would shred the drain into dozens of
        # micro-batches, each paying the fixed epoch cost over a
        # growing unfolded tail — measured 15x super-linear before
        # this was pinned)
        for b in range(4):
            (docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == b)
             .coalesce(1)
             .write.parquet(os.path.join(landing, f"b{b}")))
        with open(marker, "w") as fh:
            fh.write("ok")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    runs = {"n": 0}

    def run():
        runs["n"] += 1
        work = os.path.join(scratch, f"dstream_run{runs['n']}")
        shutil.rmtree(work, ignore_errors=True)
        stream_dedup_parquet(
            spark, os.path.join(landing, "*"), schema=schema,
            index_path=os.path.join(work, "index"),
            verdicts_dir=os.path.join(work, "verdicts"),
            checkpoint=os.path.join(work, "ckpt"),
            mode="near", index_lsm=True, max_files_per_trigger=1)
    return run


def _zonemap_plan_factory(spark, scratch: str, k: int, sharded: bool,
                          n_files: int | None = None):
    from howto_mongo_bulk_update_from_parquet_spark.sinks import (
        zonemap as zm)

    if n_files is None:
        n_files = 80 * k
    d = os.path.join(scratch, f"zmplan_{n_files}")
    marker = os.path.join(d, "_SCALE_READY")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        rows_per = 100
        entries = [{"file": f"part-{i:05d}.parquet", "rows": rows_per,
                    "min_k": i * rows_per,
                    "max_k": (i + 1) * rows_per - 1}
                   for i in range(n_files)]
        zm.write_zone_map(spark, d, {"version": 1,
                                     "cols": {"k": "bigint"},
                                     "files": entries})
        with open(marker, "w") as fh:
            fh.write(str(n_files))
    span = n_files * 100

    def run():
        for it in range(20):
            probes = [(it * 7919 + j * 104729) % span for j in range(3)]
            if sharded:
                idx = zm.load_zone_map_index(spark, d)
                kept = idx.prune("k", values=probes)
            else:
                full = zm.read_zone_map(spark, d)
                kept = zm.prune_files(full, "k", values=probes)
            assert kept is not None and len(kept) <= 3
    return run


def _merged_view_factory(spark, data_dir: str, scratch: str, fast: bool):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks import (
        keyed_table as kt)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    path = os.path.join(scratch, "kt_merged")
    marker = os.path.join(path, "_SCALE_READY")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        orders = load_table(spark, data_dir, "orders").select(
            F.col("o_orderkey").alias("_id"), "o_totalprice",
            "o_orderstatus")
        kt.upsert_into_keyed_table(spark, orders, path=path, key="_id",
                                   updated_at_col=None)
        batch = (orders.filter(F.col("_id").between(0, 8000))
                 .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
        kt.append_delta(spark, batch, path=path, key="_id")
        with open(marker, "w") as fh:
            fh.write("1")

    def run():
        guard = kt.FAST_MERGE_MAX_DELTA_BYTES
        try:
            kt.FAST_MERGE_MAX_DELTA_BYTES = guard if fast else 0
            (kt.read_merged(spark, path, "_id")
             .write.format("noop").mode("overwrite").save())
        finally:
            kt.FAST_MERGE_MAX_DELTA_BYTES = guard
    return run


def _compact_factory(spark, data_dir: str, scratch: str, k: int,
                     pruned: bool):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        append_delta, compact, compact_pruned, upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    tag = "pruned" if pruned else "full"
    path = os.path.join(scratch, f"kt_compact_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("_id"), "o_totalprice", "o_orderstatus")
    upsert_into_keyed_table(spark, orders, path=path, key="_id",
                            updated_at_col=None, range_files=8 * k)
    # constant-size arrival batch, computed once (copy-0 keys — a
    # narrow band that lands in ~one file's span at every scale)
    batch = (orders.filter(F.col("_id").between(0, 8000))
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
             .localCheckpoint())

    def run():
        append_delta(spark, batch, path=path, key="_id")
        if pruned:
            _, stats = compact_pruned(spark, path, "_id")
            if not (stats["pruned"] and stats["files_carried"] > 0):
                raise AssertionError(f"fold not pruned: {stats}")
        else:
            compact(spark, path, "_id")
    return run


def _lookup_factory(spark, data_dir: str, scratch: str, k: int,
                    mode: str):
    """mode: 'zonemap' (pruned point lookup), 'fullscan' (the O(table)
    baseline), 'join_bulk' (r13: a CLUSTERED 2k-key probe batch
    through lookup_join_keyed_table — the feature-store enrich; its
    span admits a constant key slice, so the timed cost should stay
    ~flat while the table grows x100)."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        lookup_join_keyed_table, lookup_keyed_table, read_keyed_table,
        upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    path = os.path.join(scratch, "kt_range")
    marker = os.path.join(path, "_SCALE_READY")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        orders = load_table(spark, data_dir, "orders").select(
            F.col("o_orderkey").alias("_id"), "o_totalprice",
            "o_orderstatus")
        # files grow with the data so each file stays ~constant-sized
        upsert_into_keyed_table(spark, orders, path=path, key="_id",
                                updated_at_col=None, range_files=8 * k)
        with open(marker, "w") as fh:
            fh.write(str(k))
    # copy-0 keys, present at every scale
    probes = [11, 50_011, 100_011]
    bulk = (spark.range(40_000, 48_000, 4)        # 2k clustered keys
            .select(F.col("id").alias("_id")))

    def run():
        if mode == "zonemap":
            out = lookup_keyed_table(spark, path, "_id", values=probes)
        elif mode == "join_bulk":
            out = lookup_join_keyed_table(spark, path, "_id", bulk)
        else:
            out = read_keyed_table(spark, path).filter(
                F.col("_id").isin(probes))
        out.write.format("noop").mode("overwrite").save()
    return run

# The TUNED vec-dedup slot (r11): q_incremental_vec_dedup is excluded
# above because its fixture-scale 6-bit bands are mis-tuned for a
# bigger corpus; this slot applies the documented tuning rule —
# bits_per_band grows with log2(N) so the bucket space tracks the
# data — and runs the SAME probe/verify pipeline. Expected: per-vector
# candidates roughly constant, total cost ~linear (recall per band
# falls as bits rise; production raises the band count L alongside —
# held fixed here so the sweep isolates the bucket-space axis).
VEC_TUNED_SLOT = "vec_dedup_tuned"


def _vec_tuned_bits(k: int) -> int:
    """8 bits at the x1 fixture, +log2 of the growth factor — the
    bucket space tracks the corpus (8/11/15 at x1/x10/x100). Derived,
    not a lookup, so an unlisted --factors value can never silently
    run the "tuned" slot with fixture-scale bands."""
    import math
    return 8 + round(math.log2(max(k, 1)))


def _vec_dedup_tuned_thunk(spark, data_dir: str, k: int):
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.plans.incremental_vec import (
        incremental_vec_dup_flags)
    from howto_mongo_bulk_update_from_parquet_spark.plans import incremental_vec as iv
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    bits = _vec_tuned_bits(k)

    def run():
        e = load_table(spark, data_dir, "embeddings")
        new_emb = e.filter(F.col("vec_id") % 3 == 0)
        history = e.filter(F.col("vec_id") % 3 != 0)
        index = iv.vec_index_rows(history, "vec_id", bits=bits) \
            .select("band", "bucket", "member_id")
        out = incremental_vec_dup_flags(
            new_emb, index,
            history.select(F.col("vec_id").alias("member_id"),
                           "embedding"), "vec_id", bits=bits)
        out.write.format("noop").mode("overwrite").save()
    return run


def _sink_upsert_factory(spark, data_dir: str, scratch: str,
                         bucketed: bool):
    """Build the keyed base from the xK orders once; return a thunk
    that performs one timed upsert round (repeats add versions; the
    default retain window keeps disk at ~2x base)."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    tag = "bucketed" if bucketed else "plain"
    path = os.path.join(scratch, f"kt_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("_id"), "o_totalprice", "o_orderstatus")
    upsert_into_keyed_table(spark, orders, path=path, key="_id",
                            updated_at_col=None,
                            buckets=32 if bucketed else 0)
    batch = (orders.filter(F.col("_id") % 100 == 7)
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))

    def run():
        upsert_into_keyed_table(spark, batch, path=path, key="_id",
                                updated_at_col=None)
    return run


SQL_MERGE_SLOT = "sql_merge_statement"


def _sql_merge_factory(spark, data_dir: str, scratch: str):
    """One timed 3-clause MERGE statement (conditional DELETE +
    cross-alias UPDATE + INSERT *) against a prebuilt keyed base of
    the xK orders — the r16 single-join single-commit execution
    (sinks/sql_merge.py): the source batch is ~2% of the xK orders
    (scaling WITH the table, the honest CDC shape), so the slot
    should track the sink_upsert slots' O(source + snapshot-probe)
    growth and stay within a small constant of them (same delta
    append underneath, plus the left join and the observe-carried
    counts) — never with the number of clauses. Repeats accumulate
    pending deltas, so within a factor the FIRST rep is the clean
    reading (the harness records the min)."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sinks.sql_merge import (
        sql_merge)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    path = os.path.join(scratch, "kt_sqlmerge")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    upsert_into_keyed_table(spark, orders, path=path, key="k",
                            updated_at_col=None)
    # fixed-size source batch: half hits (updates/deletes), half new
    batch = orders.filter(F.col("k") % 100 == 7).unionByName(
        orders.filter(F.col("k") % 100 == 13)
        .withColumn("k", -F.col("k")))
    batch.createOrReplaceTempView("sqlmerge_stage")

    def run():
        sql_merge(spark, """
            MERGE INTO t USING sqlmerge_stage s ON t.k = s.k
            WHEN MATCHED AND s.price > 400000 THEN DELETE
            WHEN MATCHED THEN UPDATE SET price = t.price + s.price
            WHEN NOT MATCHED AND s.price <= 200000 THEN INSERT *""",
            tables={"t": (path, "k")})
    return run


SQL_RESTORE_SLOT = "sql_restore_statement"


def _sql_restore_factory(spark, data_dir: str, scratch: str):
    """One timed `RESTORE TABLE ... TO VERSION AS OF 1` against a
    2-version keyed table of the xK orders (version 2 rewrote half
    the rows) — the r16 metadata-only rollback. The restore carries
    version 1's files by `_CARRIED.json` reference and flips the
    manifest: O(files) driver metadata, ZERO data bytes moved — the
    slot's reading should be FLAT across x1→x100 while the
    sink_upsert slots (which write the data the restore merely
    re-points at) grow linearly; a slope near the sinks' would mean
    the carry degenerated into a copy. Each rep commits a fresh
    restore version on top (version 1 stays retained as the carried
    owner), so repeats are honest re-runs, not no-ops."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        upsert_into_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.sinks.sql_merge import (
        sql_restore)
    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import (
        load_table)

    path = os.path.join(scratch, "kt_sqlrestore")
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, data_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderstatus").alias("status"))
    upsert_into_keyed_table(spark, orders, path=path, key="k",
                            updated_at_col=None, retain_versions=3)
    upsert_into_keyed_table(
        spark,
        orders.filter(F.col("k") % 2 == 0)
        .withColumn("price", F.col("price") * 2),
        path=path, key="k", updated_at_col=None, retain_versions=3)

    def run():
        sql_restore(spark, "RESTORE TABLE t TO VERSION AS OF 1",
                    tables={"t": (path, "k")})
    return run


def _spark():
    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("scale-harness")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.driver.memory", "96g")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            # ns-unit event fixtures must not round-trip as INT96
            .config("spark.sql.parquet.outputTimestampType",
                    "TIMESTAMP_MICROS")
            .getOrCreate())


def _flip_embedding(c, v):
    """Copy-specific ±1 sign flip per dimension (identity for copy 0):
    preserves within-copy dot products exactly, decorrelates cross-copy
    cosine to ~±1/sqrt(dim) — see the replication-scheme note above."""
    from pyspark.sql import functions as F

    def sign(i):
        parity = (F.conv(F.substring(
            F.md5(F.concat_ws(":", c.cast("string"), i.cast("string"))),
            1, 1), 16, 10).cast("int") % 2)
        return (parity * 2 - 1).cast("float")

    return F.when(c == F.lit(0), v).otherwise(
        F.transform(v, lambda x, i: (x * sign(i)).cast("float")))


def build_scale(spark, k: int, out_dir: str) -> None:
    """Materialize the xK dataset under out_dir (skip if present)."""
    from pyspark.sql import functions as F

    from howto_mongo_bulk_update_from_parquet_spark.sources.parquet import load_table

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    copies = F.broadcast(
        spark.range(k).select(F.col("id").alias("__copy")))

    def fan(name, **overrides):
        # Repartition the SOURCE before the fan-out so the k-way
        # explode runs on n_files parallel tasks and the exploded
        # rows stream straight into the writer — no post-explosion
        # shuffle (at k=1000 that shuffle serialized a 600M-row map
        # side behind the single-file source scan). Each output file
        # holds 1/n_files of the source rows x all k copies: same
        # file count and balance as the old round-robin writer.
        n_files = max(4, min(32, 4 * k))
        df = load_table(spark, BASE, name).repartition(n_files)
        out = df.crossJoin(copies)
        for col, expr in overrides.items():
            out = out.withColumn(col, expr(F.col("__copy"), F.col(col)))
        (out.drop("__copy")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet")))

    off = lambda c, v: v + c * KEY_OFF  # noqa: E731
    fan("orders", o_orderkey=off)
    fan("lineitem", l_orderkey=off)
    fan("events", event_id=off,
        user_id=lambda c, v: v + c * USER_OFF)
    fan("documents", doc_id=off,
        # salt every inter-word gap so all 3-shingles are copy-local
        text=lambda c, v: F.regexp_replace(
            v, F.lit(" "),
            F.concat(F.lit(" s"), c.cast("string"), F.lit(" "))))
    fan("embeddings", vec_id=off, embedding=_flip_embedding)
    for name in DIMS:
        df = load_table(spark, BASE, name)
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))
    with open(os.path.join(out_dir, "_DONE"), "w") as fh:
        fh.write(str(k))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--queries", default=",".join(
        QUERIES + SINK_SLOTS + LOOKUP_SLOTS + COMPACT_SLOTS
        + MERGED_SLOTS + ZONEMAP_PLAN_SLOTS
        + BLOOM_SLOTS
        + [DEDUP_STREAM_SLOT, VEC_TUNED_SLOT, AUTOSIZE_SLOT,
           VIEW_SLOT, SQL_MERGE_SLOT, SQL_RESTORE_SLOT]))
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    names = [q for q in args.queries.split(",") if q]

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.queries()

    spark = _spark()
    # merge into the existing artifact so targeted re-measures of a
    # noisy (query, factor) slot don't clobber the rest of the grid
    out_path = os.path.join(REPO, "SCALE_RESULTS.json")
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh).get("queries", {})
    for q in names:
        results.setdefault(q, {})
    for k in factors:
        out_dir = os.path.join(OUT_ROOT, f"x{k}")
        t0 = time.perf_counter()
        build_scale(spark, k, out_dir)
        print(f"[scale] x{k} data ready "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        # codegen / Python-worker warm-up outside the timed slots
        warm = next((n for n in names
                     if n not in SINK_SLOTS and n not in LOOKUP_SLOTS
                     and n not in COMPACT_SLOTS and n not in MERGED_SLOTS
                     and n not in ZONEMAP_PLAN_SLOTS
                     and n not in BLOOM_SLOTS
                     and n not in (DEDUP_STREAM_SLOT, VEC_TUNED_SLOT,
                                   AUTOSIZE_SLOT, VIEW_SLOT,
                                   SQL_MERGE_SLOT,
                                   SQL_RESTORE_SLOT)), None)
        if warm:
            queries[warm](spark, out_dir).write.format("noop") \
                .mode("overwrite").save()
        for q in names:
            if q in SINK_SLOTS:
                thunk = _sink_upsert_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    bucketed=q.endswith("bucketed"))
            elif q in LOOKUP_SLOTS:
                thunk = _lookup_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k, mode=q.split("lookup_")[1].replace("join_bulk",
                                                          "join_bulk"))
            elif q in COMPACT_SLOTS:
                thunk = _compact_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k, pruned=("pruned" in q))
            elif q in MERGED_SLOTS:
                thunk = _merged_view_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    fast=q.endswith("fast"))
            elif q == "zonemap_plan_100k":
                # verdict item 7 (r14): planning cost alone at an
                # extrapolated 100k-file table — stats rows only, no
                # data, factor-independent (synthesized once)
                thunk = _zonemap_plan_factory(
                    spark, os.path.join(OUT_ROOT, "scratch_zm100k"),
                    k, sharded=True, n_files=100_000)
            elif q in ZONEMAP_PLAN_SLOTS:
                thunk = _zonemap_plan_factory(
                    spark, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k, sharded=q.endswith("sharded"))
            elif q == VIEW_SLOT:
                thunk = _view_maintain_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k)
            elif q in BLOOM_SLOTS:
                thunk = _bloom_scan_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k, indexed=(q == "scan_bloom"))
            elif q == SQL_MERGE_SLOT:
                thunk = _sql_merge_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"))
            elif q == SQL_RESTORE_SLOT:
                thunk = _sql_restore_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"))
            elif q == AUTOSIZE_SLOT:
                thunk = _autosize_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"),
                    k)
            elif q == DEDUP_STREAM_SLOT:
                thunk = _dedup_stream_factory(
                    spark, out_dir, os.path.join(OUT_ROOT, f"scratch_x{k}"))
            elif q == VEC_TUNED_SLOT:
                thunk = _vec_dedup_tuned_thunk(spark, out_dir, k)
            else:
                thunk = (lambda fn=queries[q]:
                         fn(spark, out_dir).write.format("noop")
                         .mode("overwrite").save())
            rec = timed_slot(spark, thunk, args.repeats)
            results[q][str(k)] = rec
            print(f"[scale] x{k} {q}: {rec['sec']:.2f}s "
                  f"{rec['reps']} noise={rec['noise']}"
                  + (f" attempts={rec['attempts']}"
                     if "attempts" in rec else ""),
                  flush=True)

    import math
    all_factors = sorted({int(k) for r in results.values()
                          for k in r if k.isdigit()})
    for q, r in results.items():
        ks = sorted(int(k) for k in r if k.isdigit())
        if len(ks) >= 2 and r[str(ks[0])]["sec"] > 0:
            lo, hi = str(ks[0]), str(ks[-1])
            r["slope"] = round(
                math.log(r[hi]["sec"] / r[lo]["sec"])
                / math.log(ks[-1] / ks[0]), 3)
    payload = {"base": BASE, "factors": all_factors,
               "repeats": args.repeats, "queries": results}
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
