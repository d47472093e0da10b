"""Round-10 keyed-table hardening: the folded-through watermark (a
reader racing a fold never sees folded deltas re-applied), live-claim
protection (an incomplete-but-fresh directory is occupied, not debris),
the legacy root-layout LSM fold, and Java-side exists-error mapping."""

import os
import shutil
import time

import pytest

from howto_mongo_bulk_update_from_parquet_spark.sinks import fs as hfs
from howto_mongo_bulk_update_from_parquet_spark.sinks import keyed_table as kt
from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
    ConcurrentWriteError, append_delta, append_delete_delta, compact,
    delete_from_keyed_table, folded_through, read_merged,
    upsert_into_keyed_table)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _age(path, seconds=3600):
    """Backdate a directory and everything in it (make a claim stale)."""
    stamp = time.time() - seconds
    for root, dirs, files in os.walk(path):
        for n in [root, *[os.path.join(root, f) for f in files]]:
            os.utime(n, (stamp, stamp))
    os.utime(path, (stamp, stamp))


def test_reader_between_fold_commit_and_delta_gc(spark, tmp_path):
    """r9 verdict #3: a read_merged after the fold's base commit must
    see the post-delete row set even though the folded delta's files
    are still on disk — the manifest's folded_through watermark makes
    them invisible. The files are deliberately RETAINED for one more
    commit (the delta analog of retain_versions: an in-flight reader
    that resolved the pre-fold manifest finishes its scan), then the
    next committing operation GCs them."""
    p = str(tmp_path / "wm")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                            path=p, key="k", updated_at_col=None)
    append_delta(spark, _df(spark, [(3, "c")]), path=p, key="k")
    out = delete_from_keyed_table(
        spark, spark.createDataFrame([(3,)], "k long"), path=p, key="k")
    assert {r.k for r in out.collect()} == {1, 2}
    # the folded delta's files are still on disk (one-commit
    # retention) — and invisible to every reader
    assert os.path.exists(os.path.join(p, "delta_00001"))
    assert folded_through(spark, p) == 1
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2}
    # next fold: absorbs the new delta AND GCs the previous fold's
    # files; the new fold's files are retained in turn
    append_delta(spark, _df(spark, [(2, "b2")]), path=p, key="k")
    compact(spark, p, "k")
    assert folded_through(spark, p) == 2
    assert not os.path.exists(os.path.join(p, "delta_00001"))
    assert os.path.exists(os.path.join(p, "delta_00002"))
    got = {r.k: r.v for r in read_merged(spark, p, "k").collect()}
    assert got == {1: "a", 2: "b2"}
    # and new appends claim ABOVE the watermark
    assert append_delta(spark, _df(spark, [(4, "d")]), path=p, key="k") == 3


def test_tombstone_watermark_survives_upsert_commit(spark, tmp_path):
    """An upsert round must carry the folded_through watermark forward
    in its own manifest — dropping it would resurrect folded-but-not-
    yet-GC'd tombstoned rows for every reader."""
    p = str(tmp_path / "carry")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                            path=p, key="k", updated_at_col=None)
    append_delete_delta(spark, spark.createDataFrame([(2,)], "k long"),
                        path=p, key="k")
    compact(spark, p, "k")
    assert folded_through(spark, p) == 1
    upsert_into_keyed_table(spark, _df(spark, [(5, "e")]),
                            path=p, key="k", updated_at_col=None)
    assert folded_through(spark, p) == 1


def test_fresh_incomplete_delta_dir_is_occupied_not_clobbered(spark, tmp_path):
    """ADVICE r9: a delta dir without _SUCCESS may belong to a LIVE
    appender mid-write — the claimer must bump to the next number, not
    delete it. Once it is stale (untouched past the grace window) it
    is dead-writer debris and the slot is re-claimed."""
    p = str(tmp_path / "live")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]),
                            path=p, key="k", updated_at_col=None)
    inflight = os.path.join(p, "delta_00001")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-live.parquet"), "wb") as fh:
        fh.write(b"mid-write task file")
    v = append_delta(spark, _df(spark, [(2, "b")]), path=p, key="k")
    assert v == 2                                    # bumped past the slot
    assert os.path.exists(os.path.join(inflight, "part-live.parquet"))
    # while fresh, the debris also blocks compaction's fold run (the
    # appender may still complete slot 1)
    compact(spark, p, "k")
    assert folded_through(spark, p) == 0
    assert os.path.exists(inflight)
    # aged past the grace window → dead-writer debris: the next fold
    # GCs it and the run continues through the committed delta
    _age(inflight)
    compact(spark, p, "k")
    assert not os.path.exists(inflight)
    assert folded_through(spark, p) == 2
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2}


def test_fresh_incomplete_base_dir_raises_clean_conflict(spark, tmp_path):
    """Same rule on the versioned-base path: a fresh incomplete
    base_v{N+1} is a concurrent writer → ConcurrentWriteError (no
    version bump exists for bases); stale → cleared and claimed."""
    p = str(tmp_path / "basewrite")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]),
                            path=p, key="k", updated_at_col=None)
    inflight = os.path.join(p, "base_v00002")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-live.parquet"), "wb") as fh:
        fh.write(b"mid-write task file")
    with pytest.raises(ConcurrentWriteError, match="recently touched"):
        upsert_into_keyed_table(spark, _df(spark, [(2, "b")]),
                                path=p, key="k", updated_at_col=None)
    _age(inflight)
    out = upsert_into_keyed_table(spark, _df(spark, [(2, "b")]),
                                  path=p, key="k", updated_at_col=None)
    assert {r.k for r in out.collect()} == {1, 2}


def test_legacy_root_layout_delete_with_pending_deltas(spark, tmp_path):
    """ADVICE r9: a round-1 layout (plain parquet at the table root)
    with pending LSM deltas — the fold must absorb the root files so
    the migrate-away after the commit cannot lose the base rows."""
    p = str(tmp_path / "legacy")
    _df(spark, [(1, "a"), (2, "b"), (3, "c")]).write.parquet(p)
    append_delta(spark, _df(spark, [(4, "d"), (1, "a2")]), path=p, key="k")
    out, n = delete_from_keyed_table(
        spark, spark.createDataFrame([(2,)], "k long"),
        path=p, key="k", return_counts=True)
    assert n == 1
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a2", 3: "c", 4: "d"}          # base rows survived
    assert {r.k: r.v for r in read_merged(spark, p, "k").collect()} == got
    # root files migrated away, table now versioned
    assert not [f for f in os.listdir(p) if f.endswith(".parquet")]


def test_legacy_root_layout_compact_with_pending_deltas(spark, tmp_path):
    p = str(tmp_path / "legacy2")
    _df(spark, [(1, "a"), (2, "b")]).write.parquet(p)
    append_delta(spark, _df(spark, [(3, "c")]), path=p, key="k")
    out = compact(spark, p, "k")
    assert {r.k for r in out.collect()} == {1, 2, 3}
    assert not [f for f in os.listdir(p) if f.endswith(".parquet")]


def test_fold_stops_at_inflight_gap(spark, tmp_path):
    """A claimed-but-incomplete slot between committed deltas: compact
    folds only the contiguous complete run (a watermark past the gap
    would hide the in-flight delta forever); delete refuses cleanly
    (folding only the run would let the later delta re-apply over the
    anti-join — the resurrect bug again)."""
    p = str(tmp_path / "gap")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]),
                            path=p, key="k", updated_at_col=None)
    append_delta(spark, _df(spark, [(2, "b")]), path=p, key="k")   # v1
    os.makedirs(os.path.join(p, "delta_00002"))                    # in-flight
    with open(os.path.join(p, "delta_00002", "part-live.parquet"), "wb") as fh:
        fh.write(b"mid-write")
    v3 = append_delta(spark, _df(spark, [(3, "c")]), path=p, key="k")
    assert v3 == 3
    # reader applies every COMMITTED delta (1 and 3), skips in-flight 2
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2, 3}
    with pytest.raises(ConcurrentWriteError, match="in-flight append"):
        delete_from_keyed_table(
            spark, spark.createDataFrame([(1,)], "k long"), path=p, key="k")
    compact(spark, p, "k")
    assert folded_through(spark, p) == 1             # run stopped at the gap
    # in-flight slot 2 and committed delta 3 left in place above the
    # watermark; the freshly-folded delta 1 is retained one commit
    assert sorted(d for d in os.listdir(p) if d.startswith("delta_")) == \
        ["delta_00001", "delta_00002", "delta_00003"]
    assert kt._complete_deltas(spark, p) == [3]
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2, 3}


class _FakeJavaThrowable:
    """Py4J-side JVM throwable stand-in: getClass().getName() +
    getCause() are the only methods the matcher may rely on."""

    def __init__(self, class_name, cause=None):
        self._name, self._cause = class_name, cause

    def getClass(self):
        outer = self

        class _Cls:
            def getName(self):
                return outer._name
        return _Cls()

    def getCause(self):
        return self._cause


def test_is_path_exists_error_detection():
    """ADVICE r9 + r10: the Java-side job-commit failure (two writers
    passed the pre-check) must be recognized through the Py4J wrapper
    by its ACTUAL exception class — never by substring-matching the
    full stringified trace, where an unrelated error that merely
    MENTIONS the class would misread as a clean conflict."""
    # raw Py4JJavaError shape: java_exception carries the throwable
    py4j_style = RuntimeError("An error occurred while calling o123.parquet.")
    py4j_style.java_exception = _FakeJavaThrowable(
        "org.apache.hadoop.fs.FileAlreadyExistsException")
    assert kt._is_path_exists_error(py4j_style)
    # ... including when it is a nested getCause(), not the top frame
    nested = RuntimeError("An error occurred while calling o9.save.")
    nested.java_exception = _FakeJavaThrowable(
        "org.apache.spark.SparkException",
        cause=_FakeJavaThrowable(
            "org.apache.hadoop.fs.FileAlreadyExistsException"))
    assert kt._is_path_exists_error(nested)
    # a java-backed error whose PYTHON str() mentions the class in the
    # embedded trace but whose real class chain does not → NOT a
    # conflict (the r10 false-positive: 64 futile re-write attempts)
    trap = RuntimeError(
        "executor OOM\n  Suppressed: "
        "org.apache.hadoop.fs.FileAlreadyExistsException: /x")
    trap.java_exception = _FakeJavaThrowable(
        "java.lang.OutOfMemoryError")
    assert not kt._is_path_exists_error(trap)
    # plain Python wrapper: only the FIRST LINE of the message counts
    first_line = RuntimeError(
        "org.apache.hadoop.fs.FileAlreadyExistsException: /t/delta_00004")
    assert kt._is_path_exists_error(first_line)
    wrapped = RuntimeError("job aborted")
    wrapped.__cause__ = first_line
    assert kt._is_path_exists_error(wrapped)
    deep_trace_only = RuntimeError(
        "job aborted\n: org.apache.hadoop.fs.FileAlreadyExistsException: /x")
    assert not kt._is_path_exists_error(deep_trace_only)
    assert not kt._is_path_exists_error(RuntimeError("executor lost"))


def test_upsert_folds_pending_deltas(spark, tmp_path):
    """r10, same class as the r8 delete bug: a versioned upsert on a
    table with pending LSM deltas must fold them — unfolded, the
    deltas would re-apply over the NEW base and win over this newer
    round. The fold also records the watermark, so resurrected delta
    files stay invisible."""
    p = str(tmp_path / "upfold")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a"), (2, "b")]),
                            path=p, key="k", updated_at_col=None)
    append_delta(spark, _df(spark, [(2, "b_delta"), (3, "c")]),
                 path=p, key="k")
    # the upsert round is NEWER than the delta and must win on key 2
    out = upsert_into_keyed_table(spark, _df(spark, [(2, "b_up"), (4, "d")]),
                                  path=p, key="k", updated_at_col=None)
    want = {1: "a", 2: "b_up", 3: "c", 4: "d"}
    assert {r.k: r.v for r in out.collect()} == want
    assert {r.k: r.v for r in read_merged(spark, p, "k").collect()} == want
    assert folded_through(spark, p) == 1
    # folded: invisible to readers, files retained one commit
    assert kt._complete_deltas(spark, p) == []
    # an in-flight gap refuses cleanly, same as delete
    append_delta(spark, _df(spark, [(5, "e")]), path=p, key="k")   # v2
    os.makedirs(os.path.join(p, "delta_00002"), exist_ok=True)
    # v2 exists committed; claim 3 as in-flight debris then commit 4
    os.makedirs(os.path.join(p, "delta_00003"))
    with open(os.path.join(p, "delta_00003", "part-live.parquet"), "wb") as fh:
        fh.write(b"mid-write")
    append_delta(spark, _df(spark, [(6, "f")]), path=p, key="k")   # v4
    with pytest.raises(ConcurrentWriteError, match="in-flight append"):
        upsert_into_keyed_table(spark, _df(spark, [(7, "g")]),
                                path=p, key="k", updated_at_col=None)


def test_mixed_path_random_op_sequences_match_model(spark, tmp_path):
    """Model-based property test over BOTH write paths: random
    interleavings of LSM upsert deltas, tombstone deltas, compactions,
    versioned fold-upserts, and versioned fold-deletes must always
    read back exactly what a dict model predicts (newest wins,
    per-column null-skip, tombstone cuts history, folds + the
    watermark invisible to readers). This is the r8/r9/r10 bug class —
    every one of those bugs was a mixed-path interaction."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    keys = st.integers(0, 5)
    rows = st.lists(
        st.tuples(keys,
                  st.one_of(st.none(), st.sampled_from(["p", "q", "r"])),
                  st.one_of(st.none(), st.sampled_from([1.0, 2.5, -3.0]))),
        min_size=1, max_size=4, unique_by=lambda t: t[0])
    ops = st.lists(
        st.one_of(
            st.tuples(st.just("lsm_upsert"), rows),
            st.tuples(st.just("tombstone"), st.lists(keys, min_size=1,
                                                     max_size=3)),
            st.tuples(st.just("compact"), st.just(None)),
            st.tuples(st.just("v_upsert"), rows),
            st.tuples(st.just("v_delete"), st.lists(keys, min_size=1,
                                                    max_size=3))),
        min_size=2, max_size=7)

    def _src(rows_):
        return spark.createDataFrame(rows_, "k long, a string, b double")

    counter = [0]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(ops=ops)
    def check(ops):
        counter[0] += 1
        p = str(tmp_path / f"mix{counter[0]}")
        model: dict[int, dict[str, object]] = {}
        wrote = False

        def apply_merge(rows_):
            for k, a, b in rows_:
                row = model.setdefault(k, {"a": None, "b": None})
                if a is not None:
                    row["a"] = a
                if b is not None:
                    row["b"] = b

        for kind, arg in ops:
            if kind == "lsm_upsert":
                append_delta(spark, _src(arg), path=p, key="k")
                wrote = True
                apply_merge(arg)
            elif kind == "v_upsert":
                upsert_into_keyed_table(spark, _src(arg), path=p, key="k",
                                        updated_at_col=None)
                wrote = True
                apply_merge(arg)
            elif kind == "tombstone":
                if not wrote:
                    continue
                append_delete_delta(
                    spark, spark.createDataFrame([(k,) for k in arg],
                                                 "k long"),
                    path=p, key="k")
                for k in arg:
                    model.pop(k, None)
            elif kind == "v_delete":
                if not wrote:
                    continue
                delete_from_keyed_table(
                    spark, spark.createDataFrame([(k,) for k in arg],
                                                 "k long"),
                    path=p, key="k")
                for k in arg:
                    model.pop(k, None)
            elif kind == "compact" and wrote:
                compact(spark, p, "k")
        if not wrote:
            return
        got = {r.k: (r.a, r.b)
               for r in read_merged(spark, p, "k").collect()}
        want = {k: (v["a"], v["b"]) for k, v in model.items()}
        assert got == want, ops
        # after a fold (no reader-visible deltas — retained folded
        # files don't count), the committed snapshot IS the merged view
        if not kt._complete_deltas(spark, p):
            from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
                read_keyed_table)
            snap = {r.k: (r.a, r.b)
                    for r in read_keyed_table(spark, p)
                    .select("k", "a", "b").collect()}
            assert snap == want, ops

    check()


def test_truncated_metadata_scan_reads_as_occupied(spark, tmp_path):
    """ADVICE r10 (the medium): when newest_mtime's listing is cut off
    at max_entries the partial maximum can be OLDER than the true
    newest (a live writer's fresh task files may sit past the cap) —
    the claimer must treat the directory as occupied, never clear it."""
    d = str(tmp_path / "truncated_claim")
    os.makedirs(os.path.join(d, "_temporary"))
    for i in range(5):
        with open(os.path.join(d, "_temporary", f"part-{i}"), "w") as fh:
            fh.write("x")
    # exhaustive scan of an aged dir → provably stale
    _age(d)
    mt, truncated = hfs.newest_mtime(spark, d)
    assert mt is not None and not truncated
    assert kt._claim_is_stale(spark, d)
    # capped scan (listing not exhausted) → truncated → occupied,
    # even though every entry it DID see is old
    mt, truncated = hfs.newest_mtime(spark, d, max_entries=2)
    assert truncated
    import unittest.mock as mock
    with mock.patch.object(hfs, "newest_mtime", return_value=(mt, True)):
        assert not kt._claim_is_stale(spark, d)


def test_claimed_write_reraises_permanent_analysis_errors(spark, tmp_path):
    """ADVICE r10: only already-exists AnalysisExceptions map to the
    retryable ConcurrentWriteError; the bucketed CTAS's broader
    analysis surface (bad CLUSTERED BY column, catalog errors) is a
    permanent failure and must surface as itself."""
    from pyspark.errors import AnalysisException
    df = _df(spark, [(1, "a")])
    dst = str(tmp_path / "ctas_bad")
    # permanent: bucket column that does not exist → re-raised
    with pytest.raises(AnalysisException):
        kt._run_claimed_write(
            dst, lambda: df.write.format("parquet")
            .bucketBy(4, "no_such_col").sortBy("no_such_col")
            .option("path", dst).saveAsTable("tmp_adv_r10_badcol"))
    # conflict: plain errorifexists onto an existing path → mapped
    taken = str(tmp_path / "taken")
    df.write.parquet(taken)
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        kt._run_claimed_write(
            taken, lambda: df.write.mode("errorifexists").parquet(taken))
    # conflict: bucketed CTAS onto a non-empty location → mapped
    spark.sql("DROP TABLE IF EXISTS tmp_adv_r10_loc")
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        kt._run_claimed_write(
            taken, lambda: df.write.format("parquet")
            .bucketBy(4, "k").sortBy("k")
            .option("path", taken).saveAsTable("tmp_adv_r10_loc"))
    spark.sql("DROP TABLE IF EXISTS tmp_adv_r10_loc")


def test_manifest_retry_exhaustion_raises_not_empty_meta(spark, tmp_path,
                                                         monkeypatch):
    """ADVICE r10: when every manifest read races a retirement, the
    resolver must fail retryable — returning (version, {}) would
    collapse folded_through to 0 and transiently resurrect folded
    deltas, the exact failure the one-pointer read exists to prevent."""
    p = str(tmp_path / "mexhaust")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]), path=p, key="k",
                            updated_at_col=None)
    # sanity: the healthy final re-read path still resolves
    v, meta = kt._current_manifest(spark, p, retries=0)
    assert v == 1
    monkeypatch.setattr(hfs, "read_text", lambda s, path: None)
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        kt._current_manifest(spark, p, retries=2)
    # legacy table (no pointer at all) still reads as (0, {})
    legacy = str(tmp_path / "legacy_empty")
    os.makedirs(legacy)
    assert kt._current_manifest(spark, legacy) == (0, {})


def test_vacuum_reclaims_dormant_folded_deltas(spark, tmp_path):
    """r10 verdict #8: the one-commit-deferred GC never fires on a
    table that stops receiving commits — vacuum reclaims folded deltas
    once aged, leaves fresh folds and unfolded deltas alone, and never
    needs a new commit."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import vacuum
    p = str(tmp_path / "dormant")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]),
                            path=p, key="k", updated_at_col=None)
    append_delta(spark, _df(spark, [(2, "b")]), path=p, key="k")
    compact(spark, p, "k")                        # folds delta 1, retains it
    assert os.path.exists(os.path.join(p, "delta_00001"))
    # fresh fold: age gate refuses (an in-flight pre-fold reader may
    # still be scanning)
    assert vacuum(spark, p) == []
    assert os.path.exists(os.path.join(p, "delta_00001"))
    # aged past the window: reclaimed without any new commit
    _age(os.path.join(p, "delta_00001"))
    assert vacuum(spark, p, older_than_ms=60_000) == [1]
    assert not os.path.exists(os.path.join(p, "delta_00001"))
    # table still reads correctly and keeps committing afterwards
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2}
    # an UNFOLDED delta above the watermark is never touched, aged or not
    append_delta(spark, _df(spark, [(3, "c")]), path=p, key="k")
    _age(os.path.join(p, "delta_00002"))
    assert vacuum(spark, p, older_than_ms=60_000) == []
    assert os.path.exists(os.path.join(p, "delta_00002"))
    assert {r.k for r in read_merged(spark, p, "k").collect()} == {1, 2, 3}
    # idempotent on an empty backlog / legacy table without a watermark
    assert vacuum(spark, p, older_than_ms=60_000) == []


def test_cli_vacuum(spark, tmp_path, capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    p = str(tmp_path / "cli_vac")
    upsert_into_keyed_table(spark, _df(spark, [(1, "a")]),
                            path=p, key="k", updated_at_col=None)
    append_delta(spark, _df(spark, [(2, "b")]), path=p, key="k")
    compact(spark, p, "k")
    assert main(["vacuum", "--table", p]) == 0
    assert "nothing to vacuum" in capsys.readouterr().out
    _age(os.path.join(p, "delta_00001"))
    assert main(["vacuum", "--table", p, "--older-than-hours", "0.01"]) == 0
    assert "vacuumed 1 folded delta(s)" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(p, "delta_00001"))
