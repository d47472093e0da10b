"""Versioned keyed-table layout: one write per round, manifest flip,
Hadoop-FileSystem path routing, legacy (round-1 flat parquet) upgrade."""

import os

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    append_delta, compact, current_base_version, read_keyed_table,
    read_merged, upsert_into_keyed_table)


def test_hadoop_fs_helpers_roundtrip(spark, tmp_path):
    # exercised through the Hadoop FileSystem API (file: scheme here;
    # identical call path for hdfs:// and s3a://)
    root = f"file://{tmp_path}/fsapi"
    assert not hfs.exists(spark, root)
    hfs.write_text(spark, hfs.join(root, "_CURRENT"), "7")
    assert hfs.exists(spark, root)
    assert hfs.read_text(spark, hfs.join(root, "_CURRENT")) == "7"
    assert hfs.read_text(spark, hfs.join(root, "nope")) is None
    assert hfs.listdir(spark, root) == ["_CURRENT"]
    assert hfs.rename(spark, hfs.join(root, "_CURRENT"),
                      hfs.join(root, "renamed"))
    assert hfs.listdir(spark, root) == ["renamed"]
    assert hfs.delete(spark, hfs.join(root, "renamed"))
    assert hfs.listdir(spark, root) == []
    assert hfs.join("s3a://bucket/t/", "a", "b") == "s3a://bucket/t/a/b"


def test_versioned_layout_single_write_per_round(spark, tmp_path):
    path = os.path.join(str(tmp_path), "versioned")
    r1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r1, path=path, key="_id")
    assert current_base_version(spark, path) == 1
    r2 = spark.createDataFrame([("a", 9.0), ("c", 3.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r2, path=path, key="_id")
    assert current_base_version(spark, path) == 2
    # each round wrote the merged table exactly once (no __tmp_write
    # double-write dance); the default retain window keeps current +
    # previous so in-flight readers of v1 can finish
    base_dirs = sorted(d for d in os.listdir(path) if d.startswith("base_v"))
    assert base_dirs == ["base_v00001", "base_v00002"]
    assert not [d for d in os.listdir(path) if "tmp" in d.lower()]
    rows = {r["_id"]: r["v"] for r in read_keyed_table(spark, path).collect()}
    assert rows == {"a": 9.0, "b": 2.0, "c": 3.0}
    # a third round pushes v1 out of the retain window
    r3 = spark.createDataFrame([("d", 4.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r3, path=path, key="_id")
    base_dirs = sorted(d for d in os.listdir(path) if d.startswith("base_v"))
    assert base_dirs == ["base_v00002", "base_v00003"]


def test_retain_versions_keeps_previous_snapshot(spark, tmp_path):
    import pytest
    path = os.path.join(str(tmp_path), "retained")
    r1 = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r1, path=path, key="_id")
    r2 = spark.createDataFrame([("b", 2.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r2, path=path, key="_id",
                            retain_versions=2)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("base_v"))
    assert dirs == ["base_v00001", "base_v00002"]
    # reader follows the manifest to the newest version
    assert read_keyed_table(spark, path).count() == 2
    # time travel: the retained v1 snapshot is still readable as-of
    v1 = read_keyed_table(spark, path, version=1)
    assert {r["_id"] for r in v1.collect()} == {"a"}
    with pytest.raises(FileNotFoundError, match="does not exist or was"):
        read_keyed_table(spark, path, version=7)


def test_legacy_flat_table_upgrades_in_place(spark, tmp_path):
    path = os.path.join(str(tmp_path), "legacy")
    spark.createDataFrame([("a", 1.0), ("b", 2.0)],
                          "_id string, v double").write.parquet(path)
    assert read_keyed_table(spark, path).count() == 2   # reads flat layout
    src = spark.createDataFrame([("a", None), ("c", 3.0)], "_id string, v double")
    out = upsert_into_keyed_table(spark, src, path=path, key="_id")
    rows = {r["_id"]: r["v"] for r in out.collect()}
    assert rows == {"a": 1.0, "b": 2.0, "c": 3.0}       # null-skip kept a=1.0
    # table is now versioned and the flat files are gone
    assert current_base_version(spark, path) == 1
    assert not [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_reader_ignores_incomplete_version_dirs(spark, tmp_path):
    """Crash-safety: a base_v dir without _SUCCESS (writer died before
    commit) and a stale manifest must never surface partial data —
    readers stay on the last COMMITTED version."""
    path = os.path.join(str(tmp_path), "crashy")
    r1 = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r1, path=path, key="_id")
    # simulate a writer that died mid-write: version dir, no _SUCCESS
    os.makedirs(os.path.join(path, "base_v00009"))
    with open(os.path.join(path, "base_v00009", "part-junk.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    # manifest still points at v1 → reader sees committed data only
    assert current_base_version(spark, path) == 1
    assert {r["_id"] for r in read_keyed_table(spark, path).collect()} == {"a"}
    # even with every pointer gone, the fallback counts only COMPLETE
    # versions (those with _SUCCESS)
    for f in os.listdir(path):
        if f.startswith("_CURRENT"):
            hfs.delete(spark, hfs.join(path, f))
    assert current_base_version(spark, path) == 1


def test_interleaved_writers_loser_gets_clean_conflict(spark, tmp_path, monkeypatch):
    """Two upsert rounds that both read base version N: the winner
    commits N+1; the loser must raise ConcurrentWriteError (not
    silently drop the winner's round), and the table must still hold
    the winner's data."""
    import pytest

    from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt

    path = os.path.join(str(tmp_path), "race")
    r0 = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r0, path=path, key="_id")     # v1
    winner = spark.createDataFrame([("b", 2.0)], "_id string, v double")
    upsert_into_keyed_table(spark, winner, path=path, key="_id")  # v2 committed
    # loser read version 1 before the winner's commit landed (writers
    # resolve version + metadata through the single manifest read)
    monkeypatch.setattr(kt, "_current_manifest", lambda *a, **k: (1, {}))
    loser = spark.createDataFrame([("c", 3.0)], "_id string, v double")
    with pytest.raises(kt.ConcurrentWriteError, match="re-read and retry"):
        upsert_into_keyed_table(spark, loser, path=path, key="_id")
    monkeypatch.undo()
    rows = {r["_id"]: r["v"] for r in read_keyed_table(spark, path).collect()}
    assert rows == {"a": 1.0, "b": 2.0}          # winner's commit intact
    # and the retry path works: re-reading the true version succeeds
    out = upsert_into_keyed_table(spark, loser, path=path, key="_id")
    assert {r["_id"] for r in out.collect()} == {"a", "b", "c"}


def test_manifest_publish_cas_refuses_stale_commit(spark, tmp_path):
    """The pointer publish itself is a CAS: a pointer at or past the
    target version makes _commit_version raise instead of republishing."""
    import pytest

    from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt

    path = os.path.join(str(tmp_path), "cas")
    r0 = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    upsert_into_keyed_table(spark, r0, path=path, key="_id")     # publishes v1
    with pytest.raises(kt.ConcurrentWriteError, match="advanced"):
        kt._commit_version(spark, path, 1)
    # commit of the NEXT version still proceeds normally
    kt._commit_version(spark, path, 2, retain_versions=2)
    assert current_base_version(spark, path) == 2


def test_versioned_manifest_layout_and_legacy_pointer(spark, tmp_path):
    """Commits publish _CURRENT.v{N} (no pointerless window: old
    pointers retire only after the new one is visible); a pre-round-4
    single _CURRENT file is still honored and migrated away on the
    next commit."""
    path = os.path.join(str(tmp_path), "layout")
    for i in range(2):
        src = spark.createDataFrame([("a", float(i))], "_id string, v double")
        upsert_into_keyed_table(spark, src, path=path, key="_id")
    names = set(os.listdir(path))
    assert "_CURRENT.v00002" in names
    assert "_CURRENT.v00001" not in names and "_CURRENT" not in names
    assert not [n for n in names if n.endswith(".tmp")]
    # legacy layout: only the old single-file pointer present
    legacy = os.path.join(str(tmp_path), "legacy_ptr")
    src = spark.createDataFrame([("a", 1.0)], "_id string, v double")
    src.write.parquet(os.path.join(legacy, "base_v00001"))
    hfs.write_text(spark, hfs.join(legacy, "_CURRENT"), "1")
    assert current_base_version(spark, legacy) == 1
    upsert_into_keyed_table(spark, src, path=legacy, key="_id")
    names = set(os.listdir(legacy))
    assert "_CURRENT.v00002" in names and "_CURRENT" not in names


def test_pointerless_fallback_prefers_second_newest(spark, tmp_path):
    """Recovery semantics: with every pointer gone and 2+ complete
    bases, the newest may be an unconfirmed commit — the reader takes
    the second-newest (stale-but-committed)."""
    path = os.path.join(str(tmp_path), "fallback")
    for i in range(2):
        src = spark.createDataFrame([("a", float(i))], "_id string, v double")
        upsert_into_keyed_table(spark, src, path=path, key="_id")
    for f in os.listdir(path):
        if f.startswith("_CURRENT"):
            hfs.delete(spark, hfs.join(path, f))
    assert current_base_version(spark, path) == 1


def test_read_missing_table_raises(spark, tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        read_keyed_table(spark, os.path.join(str(tmp_path), "nope"))


def test_compact_single_write_versioned_base(spark, tmp_path):
    path = os.path.join(str(tmp_path), "lsm_v")
    spark.createDataFrame([("a", 1.0)], "_id string, v double") \
        .write.parquet(os.path.join(path, "base"))
    append_delta(spark, spark.createDataFrame([("b", 2.0)], "_id string, v double"),
                 path=path, key="_id")
    compact(spark, path, "_id")
    entries = set(os.listdir(path))
    assert "base_v00001" in entries
    assert "base" not in entries                        # legacy base removed
    assert not [d for d in entries if "tmp" in d.lower()]
    # the freshly-folded delta keeps its files one more commit (the
    # delta analog of retain_versions) but is invisible to readers
    from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt
    assert kt._complete_deltas(spark, path) == []
    # second compact rolls the version forward (GC'ing the previous
    # fold's files); the default retain window keeps current + previous
    append_delta(spark, spark.createDataFrame([("c", 3.0)], "_id string, v double"),
                 path=path, key="_id")
    compact(spark, path, "_id")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("base_v"))
    assert dirs == ["base_v00001", "base_v00002"]
    assert "delta_00001" not in os.listdir(path)        # prior fold GC'd
    assert {r["_id"] for r in read_merged(spark, path, "_id").collect()} == \
        {"a", "b", "c"}


def test_local_path_resolution(spark, tmp_path):
    """The metadata-read fast path must engage ONLY for provably-local
    paths: bare paths under a file: default FS, file:///-style URIs
    without an authority; every remote scheme (and authority-bearing
    file: URIs) stays on the JVM FileSystem."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.fs import _local_path
    assert _local_path(spark, "/tmp/x") == "/tmp/x"
    assert _local_path(spark, f"file://{tmp_path}/y") == f"{tmp_path}/y"
    assert _local_path(spark, "file:///a/b") == "/a/b"
    assert _local_path(spark, "s3a://bucket/key") is None
    assert _local_path(spark, "hdfs://nn/a") is None
    assert _local_path(spark, "file://host/a") is None   # authority


def test_fast_and_jvm_reads_agree(spark, tmp_path):
    import os
    d = str(tmp_path / "agree")
    os.makedirs(d)
    with open(os.path.join(d, "m.json"), "w") as fh:
        fh.write('{"v": 1}\n')
    # bare local path (fast) and file: URI (fast) and the JVM answer
    # for the same file must agree modulo the trailing newline
    bare = hfs.read_text(spark, os.path.join(d, "m.json"))
    uri = hfs.read_text(spark, f"file://{d}/m.json")
    assert bare.strip() == uri.strip() == '{"v": 1}'
    assert hfs.read_text(spark, os.path.join(d, "absent")) is None
    assert sorted(hfs.listdir(spark, d)) == ["m.json"]
