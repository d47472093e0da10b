"""Sharded zone-map manifest (r12 verdict item 4 — Iceberg-manifest
posture): past SHARD_TARGET files the single `_zonemap.json` becomes
a per-shard-span index plus `_zonemap_shard_NNNNN.json` entry files,
and probe planning reads ONLY the intersecting shards. Pins: write/
read round-trip equivalence with the inline form, prune equality,
sub-linear shard reads for point probes, the keyed-table lookup/scan/
merged-read/pruned-compact cycle over a sharded table, and the
count-mismatch conservative fallback."""

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks import zonemap as zm
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    append_delta, compact_pruned, current_base_version, lookup_keyed_table,
    read_keyed_table, read_merged, scan_keyed_table, upsert_into_keyed_table)


def _entries(n, per_file=10):
    out = []
    for i in range(n):
        out.append({"file": f"part-{i:05d}.parquet", "rows": per_file,
                    "min_k": i * per_file, "max_k": (i + 1) * per_file - 1})
    return out


def _mk_map(n):
    return {"version": 1, "cols": {"k": "bigint"}, "files": _entries(n)}


def test_inline_below_target_sharded_above(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(zm, "SHARD_TARGET", 4)
    small = str(tmp_path / "small")
    os.makedirs(small)
    zm.write_zone_map(spark, small, _mk_map(4))
    doc = json.loads(hfs.read_text(spark, hfs.join(small, zm.ZONEMAP_FILE)))
    assert doc["version"] == 1 and len(doc["files"]) == 4

    big = str(tmp_path / "big")
    os.makedirs(big)
    zm.write_zone_map(spark, big, _mk_map(10))
    doc = json.loads(hfs.read_text(spark, hfs.join(big, zm.ZONEMAP_FILE)))
    assert doc["version"] == 2 and doc["n_files"] == 10
    assert len(doc["shards"]) == 3           # 4+4+2
    assert sorted(f for f in os.listdir(big)
                  if f.startswith("_zonemap_shard_")) == \
        [s["shard"] for s in doc["shards"]]
    # materialized read == the inline form
    got = zm.read_zone_map(spark, big)
    assert got["cols"] == {"k": "bigint"}
    assert got["files"] == _mk_map(10)["files"]


def test_index_prune_matches_full_and_is_sublinear(spark, tmp_path,
                                                   monkeypatch):
    monkeypatch.setattr(zm, "SHARD_TARGET", 8)
    d = str(tmp_path / "m")
    os.makedirs(d)
    full = _mk_map(64)                       # 8 shards
    zm.write_zone_map(spark, d, full)
    for probe in [dict(values=[5]), dict(values=[555]),
                  dict(values=[5, 320, 639]), dict(lo=100, hi=130),
                  dict(lo=None, hi=15), dict(lo=630, hi=None)]:
        idx = zm.load_zone_map_index(spark, d)
        lazy = idx.prune("k", **probe)
        ref = zm.prune_files(full, "k", **probe)
        assert lazy == ref, probe
    # a point probe reads exactly ONE of the 8 shards
    idx = zm.load_zone_map_index(spark, d)
    kept = idx.prune("k", values=[321])
    assert kept == ["part-00032.parquet"]
    assert idx.shards_read == 1
    # unknown column → None (caller reads everything)
    assert idx.prune("nope", values=[1]) is None


def test_none_span_shard_always_read(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(zm, "SHARD_TARGET", 2)
    d = str(tmp_path / "n")
    os.makedirs(d)
    ents = _entries(4)
    ents[3]["min_k"] = None                  # stats hole in shard 2
    zm.write_zone_map(spark, d, {"version": 1, "cols": {"k": "bigint"},
                                 "files": ents})
    idx = zm.load_zone_map_index(spark, d)
    # probe hits shard 0 only by span, but shard 1 (None span) is
    # unskippable and its null-stats member must be kept
    kept = idx.prune("k", values=[5])
    assert "part-00000.parquet" in kept
    assert "part-00003.parquet" in kept      # conservative keep
    assert idx.shards_read == 2


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("val"),
        (F.col("id") % 7).cast("string").alias("tag"))


@pytest.fixture
def sharded_table(spark, tmp_path, monkeypatch):
    """Range-layout table whose zone map shards (8 files, target 2 →
    4 shards)."""
    monkeypatch.setattr(zm, "SHARD_TARGET", 2)
    path = str(tmp_path / "stab")
    upsert_into_keyed_table(spark, _docs(spark), path=path, key="k",
                            updated_at_col=None, range_files=8)
    doc = json.loads(hfs.read_text(
        spark, hfs.join(path, f"base_v{1:05d}", zm.ZONEMAP_FILE)))
    assert doc["version"] == 2               # actually sharded
    return path


def test_lookup_and_scan_on_sharded_table(spark, sharded_table):
    out, st = lookup_keyed_table(spark, sharded_table, "k",
                                 values=[20], with_stats=True)
    assert st["files_total"] == 8 and st["files_read"] == 1
    assert [(r["k"], r["val"]) for r in out.collect()] == [(20, 60)]
    out, st = scan_keyed_table(spark, sharded_table,
                               where={"k": (100, 140)}, with_stats=True)
    assert st["files_read"] < st["files_total"]
    assert out.count() == 41


def test_merged_read_and_pruned_fold_on_sharded_table(spark,
                                                      sharded_table,
                                                      tmp_path):
    append_delta(spark, spark.createDataFrame(
        [Row(k=20, val=-1, tag="x"), Row(k=10_000, val=1, tag="i")]),
        path=sharded_table, key="k")
    merged = {r["k"]: r["val"] for r in
              read_merged(spark, sharded_table, "k").collect()}
    assert merged[20] == -1 and merged[10_000] == 1 and len(merged) == 401
    df, stats = compact_pruned(spark, sharded_table, "k")
    assert stats["pruned"] is True
    assert stats["files_rewritten"] < stats["files_total"]
    got = {r["k"]: r["val"] for r in df.collect()}
    assert got == merged
    # the new version's map still shards and still prunes
    v = current_base_version(spark, sharded_table)
    doc = json.loads(hfs.read_text(
        spark, hfs.join(sharded_table, f"base_v{v:05d}", zm.ZONEMAP_FILE)))
    assert doc["version"] == 2
    out, st = lookup_keyed_table(spark, sharded_table, "k",
                                 values=[20], with_stats=True)
    assert st["files_read"] < st["files_total"]
    assert out.collect()[0]["val"] == -1


def test_count_mismatch_falls_back_conservative(spark, sharded_table):
    # corrupt the index's n_files: planning must degrade to the
    # materialized conservative path, never to a wrong prune
    p = hfs.join(sharded_table, f"base_v{1:05d}", zm.ZONEMAP_FILE)
    doc = json.loads(hfs.read_text(spark, p))
    doc["n_files"] = doc["n_files"] + 5
    hfs.write_text(spark, p, json.dumps(doc, separators=(",", ":")))
    out, st = lookup_keyed_table(spark, sharded_table, "k",
                                 values=[20], with_stats=True)
    assert [(r["k"], r["val"]) for r in out.collect()] == [(20, 60)]
    assert st["files_read"] <= st["files_total"]
