"""Writer lease (`sinks/lease.py`, r14 verdict item 3): the stream
drain's exclusive-writer contract over its stores is enforced — a
second drain on one store fails fast with `WriterLeaseHeld` instead
of force-clearing (and thereby corrupting) the live writer's claim
staging; a kill/restart with the same checkpoint re-acquires its own
lease reentrantly with no TTL wait."""

import os
import time

import pytest

from howto_mongo_bulk_update_from_parquet_spark.sinks.lease import (
    WriterLeaseHeld, acquire_writer_lease, release_writer_lease,
    renew_writer_lease)


def test_acquire_conflict_release_cycle(spark, tmp_path):
    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="a")
    with pytest.raises(WriterLeaseHeld, match="leased to writer 'a'"):
        acquire_writer_lease(spark, t, owner="b")
    release_writer_lease(spark, t, "a")
    acquire_writer_lease(spark, t, owner="b")     # free again
    release_writer_lease(spark, t, "b")


def test_reentrant_same_owner(spark, tmp_path):
    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="a")
    # the same logical writer (restart on the same checkpoint)
    # re-acquires immediately — no TTL wait, no error
    acquire_writer_lease(spark, t, owner="a")
    renew_writer_lease(spark, t, "a")
    release_writer_lease(spark, t, "a")


def test_expired_lease_is_broken(spark, tmp_path):
    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="dead", ttl_ms=500)
    time.sleep(2.0)
    acquire_writer_lease(spark, t, owner="next")  # breaks the corpse
    # ...and the dead writer discovers the takeover on its heartbeat
    with pytest.raises(WriterLeaseHeld, match="taken over"):
        renew_writer_lease(spark, t, "dead")
    release_writer_lease(spark, t, "next")


def test_multi_breaker_race_exactly_one_winner(spark, tmp_path):
    """r15 (r14 verdict item 2): N threads racing to break ONE expired
    lease must resolve to exactly one installed writer per round —
    the break is displace-verify-commit, so a breaker that displaces
    a competitor's freshly-installed LIVE lease sees it fresh on the
    tombstone and restores it instead of deleting it. The winner's
    heartbeat is never invalidated, and no tombstone debris leaks."""
    import threading

    t = str(tmp_path / "store")
    for rnd in range(3):
        acquire_writer_lease(spark, t, owner="dead", ttl_ms=400)
        time.sleep(1.5)                  # let the corpse expire
        winners, losers, errors = [], [], []
        barrier = threading.Barrier(6)

        def _race(i):
            barrier.wait()
            try:
                acquire_writer_lease(spark, t, owner=f"w{rnd}-{i}",
                                     ttl_ms=60_000)
                winners.append(f"w{rnd}-{i}")
            except WriterLeaseHeld:
                losers.append(i)
            except Exception as exc:  # noqa: BLE001 - fail the round
                errors.append(exc)

        threads = [threading.Thread(target=_race, args=(i,))
                   for i in range(6)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert not errors, errors
        assert len(winners) == 1, winners
        assert len(losers) == 5
        # the winner's exclusivity survived every competitor's break
        # attempt: its heartbeat still succeeds...
        renew_writer_lease(spark, t, winners[0])
        # ...and a fresh foreign acquire still loses to it
        with pytest.raises(WriterLeaseHeld):
            acquire_writer_lease(spark, t, owner="late")
        release_writer_lease(spark, t, winners[0])
        # no tombstone/staging debris left behind
        debris = [d for d in os.listdir(t)
                  if d.startswith((".broken-lease-", ".stage-lease-",
                                   ".released-lease-"))]
        assert debris == [], debris


def test_break_restores_displaced_live_lease(spark, tmp_path,
                                             monkeypatch):
    """The displace-verify step directly: breaking a LIVE lease (a
    misjudged breaker) renames it back intact — holder, ttl, and
    heartbeat all survive the round-trip. The r16 pre-displace expiry
    re-check would normally catch the misjudgment before the rename,
    so the stale judgment is FORCED here (patching `_is_expired`,
    which only the pre-displace re-check uses on the live path) to
    keep the tombstone-verify-restore machinery itself covered."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks import lease

    t = str(tmp_path / "store")
    os.makedirs(t)
    acquire_writer_lease(spark, t, owner="live", ttl_ms=60_000)
    monkeypatch.setattr(lease, "_is_expired",
                        lambda *a, **k: True)   # stale breaker judgment
    lease._break_dead_lease(spark, t)    # misjudged: lease is fresh
    monkeypatch.undo()
    assert lease._holder(spark, t) == ("live", 60_000)
    renew_writer_lease(spark, t, "live")
    release_writer_lease(spark, t, "live")
    debris = [d for d in os.listdir(t) if d.startswith(".broken-")]
    assert debris == [], debris


def test_break_noop_when_lease_freshens(spark, tmp_path):
    """r16: the pre-displace expiry re-check — a lease that reads
    LIVE at break time is left untouched (no displace, no tombstone,
    no renew disturbance), closing most of the ADVICE-r15 window
    where a fresh post-break installee was spuriously displaced."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks import lease

    t = str(tmp_path / "store")
    os.makedirs(t)
    acquire_writer_lease(spark, t, owner="fresh", ttl_ms=60_000)
    lease._break_dead_lease(spark, t)
    assert lease._holder(spark, t) == ("fresh", 60_000)
    assert [d for d in os.listdir(t)
            if d.startswith(".broken-")] == []
    release_writer_lease(spark, t, "fresh")


def test_orphan_heartbeat_debris_self_heals(spark, tmp_path):
    """ADVICE r15: a lease dir holding only `hb` (a heartbeat that
    raced a release recreated it) must not wedge the store forever.
    While fresh it reads as possibly-live (conservative); past the
    default TTL it is breakable debris."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks import lease

    t = str(tmp_path / "store")
    lease_dir = os.path.join(t, ".writer-lease")
    os.makedirs(lease_dir)
    with open(os.path.join(lease_dir, "hb"), "w") as fh:
        fh.write("orphan")
    # fresh debris: conservative refusal (might be a mid-install dir)
    with pytest.raises(WriterLeaseHeld, match="no readable owner"):
        acquire_writer_lease(spark, t, owner="next")
    # age it past the default TTL: now breakable, store self-heals
    old = time.time() - (lease.DEFAULT_TTL_MS / 1000.0 + 60)
    os.utime(os.path.join(lease_dir, "hb"), (old, old))
    os.utime(lease_dir, (old, old))
    acquire_writer_lease(spark, t, owner="next")
    renew_writer_lease(spark, t, "next")
    release_writer_lease(spark, t, "next")


def test_renew_after_release_leaves_store_immediately_acquirable(
        spark, tmp_path):
    """ADVICE r15 (lease.py renew debris): a heartbeat racing a
    release recreates an owner-less `.writer-lease/` dir; the renew's
    post-check must remove the WHOLE dir it created — not just the hb
    file — or the empty dir's fresh mtime blocks every acquire for a
    full default TTL. Simulated deterministically: the release is
    injected BETWEEN the renew's holder check and its hb write by
    patching `_holder` to report the stale pre-release view once."""
    from howto_mongo_bulk_update_from_parquet_spark.sinks import lease

    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="a")
    real_holder, first = lease._holder, [True]

    def _stale_once(sp, path):
        if first:
            first.clear()
            release_writer_lease(sp, path, "a")   # lands mid-renew
            return "a", lease.DEFAULT_TTL_MS      # stale view
        return real_holder(sp, path)

    lease._holder = _stale_once
    try:
        # the heartbeat recreates the dir, detects the release on its
        # post-check, and must clean up after itself entirely
        with pytest.raises(WriterLeaseHeld, match="broken mid-renew"):
            renew_writer_lease(spark, t, "a")
    finally:
        lease._holder = real_holder
    assert not os.path.exists(os.path.join(t, lease.LEASE_DIR))
    # the store is acquirable RIGHT NOW — no TTL wait on debris
    acquire_writer_lease(spark, t, owner="b")
    release_writer_lease(spark, t, "b")


def test_release_after_takeover_leaves_successor_intact(spark, tmp_path):
    """The release TOCTOU surface: a writer whose lease expired and
    was taken over must not destroy the successor's lease when it
    finally calls release — the owner check plus rename-out-verify
    leaves the successor untouched."""
    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="old", ttl_ms=400)
    time.sleep(1.5)
    acquire_writer_lease(spark, t, owner="new")   # takeover
    release_writer_lease(spark, t, "old")         # must be a no-op
    renew_writer_lease(spark, t, "new")           # successor intact
    with pytest.raises(WriterLeaseHeld):
        acquire_writer_lease(spark, t, owner="third")
    release_writer_lease(spark, t, "new")


def test_release_is_owner_checked_and_idempotent(spark, tmp_path):
    t = str(tmp_path / "store")
    acquire_writer_lease(spark, t, owner="a")
    release_writer_lease(spark, t, "not-a")       # no-op, not a theft
    with pytest.raises(WriterLeaseHeld):
        acquire_writer_lease(spark, t, owner="not-a")
    release_writer_lease(spark, t, "a")
    release_writer_lease(spark, t, "a")           # idempotent


def test_two_drains_one_store_clean_loser(spark, tmp_path):
    """The verdict's Done criterion: drain A live on a store, drain B
    (different checkpoint = different logical writer) pointed at the
    SAME index store loses CLEANLY — WriterLeaseHeld, zero swept
    claims, index state exactly A's — and A keeps draining."""
    from pyspark.sql import types as T

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        read_keyed_table)
    from howto_mongo_bulk_update_from_parquet_spark.streaming.dedup_stream import (
        stream_dedup_parquet)

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "pack my box with five dozen liquor jugs right now",
        3: "sphinx of black quartz judge my vow they said loudly",
    }
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    index = os.path.join(str(tmp_path), "index")
    verdicts = os.path.join(str(tmp_path), "verdicts")

    def _write(name, rows):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.parquet(os.path.join(landing, name)))

    def _verdicts():
        try:
            return {r["doc_id"]: r["verdict"]
                    for r in spark.read.parquet(verdicts).collect()}
        except Exception:  # noqa: BLE001 - not written yet
            return {}

    _write("b1", [(1, texts[1]), (2, texts[2])])
    q = stream_dedup_parquet(
        spark, os.path.join(landing, "*"), schema=schema,
        index_path=index, verdicts_dir=verdicts,
        checkpoint=os.path.join(str(tmp_path), "ckpt_a"),
        mode="near", buckets=4, processing_time="1 seconds")
    try:
        t0 = time.time()
        while len(_verdicts()) < 2 and time.time() - t0 < 150:
            if q.exception() is not None:
                raise AssertionError(f"drain A died: {q.exception()}")
            time.sleep(0.5)
        assert {1, 2} <= set(_verdicts())

        def _reps():
            try:
                return {r["rep_id"] for r in
                        read_keyed_table(spark, index).collect()}
            except FileNotFoundError:    # epoch's fold still landing
                return set()

        t0 = time.time()
        while _reps() != {1, 2} and time.time() - t0 < 150:
            time.sleep(0.5)
        reps_before = _reps()
        assert reps_before == {1, 2}
        # drain B: different checkpoint, same index store — must lose
        # fast and touch NOTHING
        with pytest.raises(WriterLeaseHeld, match="second drain"):
            stream_dedup_parquet(
                spark, os.path.join(landing, "*"), schema=schema,
                index_path=index,
                verdicts_dir=os.path.join(str(tmp_path), "verdicts_b"),
                checkpoint=os.path.join(str(tmp_path), "ckpt_b"),
                mode="near", buckets=4)
        assert not os.path.exists(
            os.path.join(str(tmp_path), "verdicts_b"))
        reps_mid = {r["rep_id"]
                    for r in read_keyed_table(spark, index).collect()}
        assert reps_mid == reps_before       # zero swept / zero writes
        # A is still the writer: a new file drains normally
        _write("b2", [(11, texts[1]), (12, texts[3])])
        t0 = time.time()
        while 12 not in _verdicts() and time.time() - t0 < 150:
            if q.exception() is not None:
                raise AssertionError(f"drain A died: {q.exception()}")
            time.sleep(0.5)
        v = _verdicts()
        assert v[11] == "dup_vs_index" and v[12] == "unique"
    finally:
        q.stop()


def test_recover_refuses_under_foreign_live_lease(spark, tmp_path):
    """r14: the force-clear itself checks the lease — a batch
    operator cannot sweep a live drain's staging, even calling
    `recover_dead_claims` directly."""
    from pyspark.sql import Row

    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        recover_dead_claims, upsert_into_keyed_table)

    t = str(tmp_path / "store")
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=1, v=1.0)]), path=t,
        key="k", updated_at_col=None)
    acquire_writer_lease(spark, t, owner="live-drain")
    with pytest.raises(WriterLeaseHeld, match="in flight"):
        recover_dead_claims(spark, t)
    # the holder itself may sweep...
    recover_dead_claims(spark, t, lease_owner="live-drain")
    release_writer_lease(spark, t, "live-drain")
    # ...and with the lease gone the unleased form works again
    recover_dead_claims(spark, t)


def test_table_info_surfaces_lease(spark, tmp_path, capsys):
    import json

    from pyspark.sql import Row

    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    from howto_mongo_bulk_update_from_parquet_spark.sinks.keyed_table import (
        upsert_into_keyed_table)

    t = str(tmp_path / "store")
    upsert_into_keyed_table(
        spark, spark.createDataFrame([Row(k=1, v=1.0)]), path=t,
        key="k", updated_at_col=None)
    acquire_writer_lease(spark, t, owner="drain-abc")
    assert main(["table-info", "--table", t]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["writer_lease"]["owner"] == "drain-abc"
    assert info["writer_lease"]["live_hint"] is True
    assert info["writer_lease"]["hb_age_ms"] >= 0
    release_writer_lease(spark, t, "drain-abc")
    assert main(["table-info", "--table", t]) == 0
    assert "writer_lease" not in json.loads(capsys.readouterr().out)


def test_idle_continuous_drain_keeps_lease_alive(spark, tmp_path):
    """r14: an IDLE live drain (no arrivals → no epochs) must not
    silently outlive its lease TTL — the heartbeat thread keeps it
    held while the query is active; after a stop, the TTL becomes
    the kill detector and a foreign drain may break it."""
    from pyspark.sql import types as T

    from howto_mongo_bulk_update_from_parquet_spark.streaming.dedup_stream import (
        stream_dedup_parquet)

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    landing = os.path.join(str(tmp_path), "landing")
    os.makedirs(landing)
    (spark.createDataFrame([(1, "the quick brown fox jumps tonight")],
                           schema).coalesce(1)
     .write.parquet(os.path.join(landing, "b1")))
    index = os.path.join(str(tmp_path), "index")
    q = stream_dedup_parquet(
        spark, os.path.join(landing, "*"), schema=schema,
        index_path=index,
        verdicts_dir=os.path.join(str(tmp_path), "verdicts"),
        checkpoint=os.path.join(str(tmp_path), "ckpt_a"),
        mode="near", buckets=4, processing_time="1 seconds",
        lease_ttl_ms=2000)
    try:
        # idle well past the 2s TTL: a foreign drain must STILL lose
        time.sleep(6.0)
        assert q.isActive
        with pytest.raises(WriterLeaseHeld):
            stream_dedup_parquet(
                spark, os.path.join(landing, "*"), schema=schema,
                index_path=index,
                verdicts_dir=os.path.join(str(tmp_path), "verdicts_b"),
                checkpoint=os.path.join(str(tmp_path), "ckpt_b"),
                mode="near", buckets=4)
    finally:
        q.stop()
    # dead: the TTL expires and a foreign drain may break the corpse
    time.sleep(4.0)
    acquire_writer_lease(spark, index, owner="other")
    release_writer_lease(spark, index, "other")
