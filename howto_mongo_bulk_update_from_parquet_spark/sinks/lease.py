"""Writer lease for exclusive-writer stores (r14, verdict item 3).

`recover_dead_claims` force-clears claim debris and is sound ONLY
when the caller is the table's single writer — two concurrent stream
drains pointed at one index store would sweep each other's LIVE
staging (the r13 verdict's standing hazard). This module makes that
contract CHECKABLE instead of assumed: a drain acquires a lease on
each store it owns before touching claims, and a competing drain
fails fast with `WriterLeaseHeld` instead of corrupting state.

Mechanics — filesystem-only, no coordination service (the same
posture as the table's manifest CAS):

- The lease is a dot-prefixed directory `<table>/.writer-lease/`
  (invisible to parquet readers, outside the `base_v*`/`delta_*`
  claim namespace, untouched by `recover_dead_claims`).
- ACQUISITION is one atomic directory rename (`rename_no_clobber`,
  the r13 staged-write primitive): stage a private dir holding an
  `owner` file, rename it onto the lease path — exclusive on HDFS
  and local rename(2) alike, so two racers get exactly one winner.
- IDENTITY is the caller's stable owner string — the stream drain
  derives it from its CHECKPOINT path, which is the true identity
  of "the same logical writer": a kill/restart with the same
  checkpoint RE-acquires its own lease immediately (reentrant, no
  TTL wait — the r13 restart-liveness behavior is preserved), while
  a different drain (different checkpoint) is a foreign writer.
- LIVENESS is a heartbeat file the holder rewrites (`renew`); a
  lease whose newest mtime is older than its recorded TTL is a dead
  writer's and may be BROKEN by the next acquirer. 'Now' comes from
  the filesystem's own clock (`probe_now_ms`), so driver clock skew
  cannot shrink the window — same discipline as `_claim_is_stale`.
  Two breakers racing both delete-then-rename; the rename picks one
  winner, the loser raises cleanly.

At 100 TB / a 1000-executor deployment the lease is two metadata
ops per acquisition and one per heartbeat — nothing scales with
data. It fences OPERATORS (two drains misconfigured onto one
store), not storage-level races: those stay closed by the claim
fence and staged renames underneath.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession

from . import fs as hfs

LEASE_DIR = ".writer-lease"
DEFAULT_TTL_MS = 120_000


class WriterLeaseHeld(RuntimeError):
    """Another live writer holds this store's lease — refusing to
    touch its claims. Stop the other writer (or let its lease
    expire) instead of racing it."""


def _lease_path(table_path: str) -> str:
    return hfs.join(table_path, LEASE_DIR)


def _holder(spark: SparkSession, table_path: str
            ) -> tuple[str | None, int]:
    """(owner, ttl_ms) recorded in the lease dir; (None, 0) when no
    readable lease exists."""
    txt = hfs.read_text(spark, hfs.join(_lease_path(table_path),
                                        "owner"))
    if not txt:
        return None, 0
    parts = txt.strip().split("\n")
    try:
        ttl = int(parts[1]) if len(parts) > 1 else DEFAULT_TTL_MS
    except ValueError:
        ttl = DEFAULT_TTL_MS
    return parts[0], ttl


def _is_expired(spark: SparkSession, table_path: str,
                ttl_ms: int) -> bool:
    """Dead-writer check: nothing under the lease dir touched within
    its TTL, judged by the filesystem's own clock. A truncated
    listing or an unwritable probe reads as LIVE (never break a
    lease we cannot prove dead)."""
    lp = _lease_path(table_path)
    newest, truncated = hfs.newest_mtime(spark, lp)
    if newest is None:
        return True                      # vanished
    if truncated:
        return False
    try:
        now = hfs.probe_now_ms(spark, table_path)
    except Exception:
        return False
    return (now - newest) > ttl_ms


def acquire_writer_lease(spark: SparkSession, table_path: str, *,
                         owner: str,
                         ttl_ms: int = DEFAULT_TTL_MS) -> str:
    """Acquire (or reentrantly renew) the store's writer lease for
    `owner`. Returns the owner token to pass to renew/release.
    Raises `WriterLeaseHeld` when a DIFFERENT owner holds a
    non-expired lease. An expired foreign lease is broken; the
    delete+rename race between two breakers resolves to one winner.
    """
    lp = _lease_path(table_path)
    for _ in range(3):
        if hfs.exists(spark, hfs.join(lp, "owner")):
            holder, holder_ttl = _holder(spark, table_path)
            if holder == owner:
                if holder_ttl != ttl_ms:
                    # reentrant re-acquire with a DIFFERENT ttl must
                    # re-record it: a restart that heartbeats on the
                    # new (longer) cadence against a stale short
                    # recorded ttl would read expired between beats
                    # and lose the store to a competitor (review r14)
                    hfs.write_text(spark, hfs.join(lp, "owner"),
                                   f"{owner}\n{ttl_ms}")
                renew_writer_lease(spark, table_path, owner)
                return owner
            if not _is_expired(spark, table_path, holder_ttl):
                raise WriterLeaseHeld(
                    f"{table_path} is leased to writer {holder!r} "
                    f"(heartbeat within {holder_ttl} ms) — a second "
                    f"drain on one store would sweep the live "
                    f"writer's claims; stop it or let the lease "
                    f"expire")
            hfs.delete(spark, lp)        # dead writer: break it
        parent = table_path.rstrip("/")
        staging = hfs.join(parent,
                           f".stage-lease-{uuid.uuid4().hex[:12]}")
        hfs.write_text(spark, hfs.join(staging, "owner"),
                       f"{owner}\n{ttl_ms}")
        hfs.write_text(spark, hfs.join(staging, "hb"), "0")
        if hfs.rename_no_clobber(spark, staging, lp):
            return owner
        hfs.delete(spark, staging)       # lost the race — re-examine
    raise WriterLeaseHeld(
        f"could not acquire the writer lease on {table_path} after "
        f"3 attempts (another writer keeps winning the rename)")


def renew_writer_lease(spark: SparkSession, table_path: str,
                       owner: str) -> None:
    """Heartbeat: refresh the lease's mtime. Raises if the lease is
    no longer this owner's (expired and taken over — the writer must
    stop, its exclusivity is gone)."""
    holder, _ = _holder(spark, table_path)
    if holder != owner:
        raise WriterLeaseHeld(
            f"lease on {table_path} is now held by {holder!r}, not "
            f"{owner!r} — this writer's lease expired and was taken "
            f"over; stop writing")
    hfs.write_text(spark, hfs.join(_lease_path(table_path), "hb"),
                   uuid.uuid4().hex)


def release_writer_lease(spark: SparkSession, table_path: str,
                         owner: str) -> None:
    """Drop the lease if still this owner's (idempotent — a lease
    already broken or re-acquired by another writer is left alone)."""
    holder, _ = _holder(spark, table_path)
    if holder == owner:
        hfs.delete(spark, _lease_path(table_path))
