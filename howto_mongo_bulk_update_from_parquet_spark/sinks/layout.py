"""Write-side data layout: z-ordered parquet writes.

`q_zorder_layout` (plans/reconcile.py) audits clustering quality;
this module is the write path that CREATES it — the engine-side
equivalent of Delta's OPTIMIZE ZORDER BY: scale both cluster keys to
16-bit range, Morton-interleave, `repartitionByRange` on the z-value
(contiguous z-ranges per output file) and sort within each partition,
then write WITHOUT the helper columns. Every parquet footer then
carries min/max stats covering a bounded rectangle in BOTH dimensions,
so a reader's predicate on EITHER column skips most files/row-groups —
a single-column sort gives that for one column only.

The per-file bound is geometric: N contiguous z-range files at
N = 4^k cut each dimension's span by ~2^k (a z-curve segment of
length L spans at most ~sqrt(L) per axis) — pytest pins the halving
against a naive write where every file spans the full key range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.reconcile import zorder2


def zorder_scaled(df: DataFrame, x_col: str, y_col: str) -> Column:
    """Morton code of the two columns min-max scaled to 16 bits each.

    The bounds aggregate is one tiny job (4 values) broadcast back —
    same shape as the generator contract; exact integer `div` keeps
    the scaling deterministic."""
    b = df.agg(F.min(x_col).alias("xmin"), F.max(x_col).alias("xmax"),
               F.min(y_col).alias("ymin"), F.max(y_col).alias("ymax")
               ).first()
    x = F.expr(f"(({x_col} - {b.xmin}) * 65536) "
               f"div ({b.xmax} - {b.xmin} + 1)")
    y = F.expr(f"(({y_col} - {b.ymin}) * 65536) "
               f"div ({b.ymax} - {b.ymin} + 1)")
    return zorder2(x, y)


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   n_files: int = 16) -> None:
    """Z-order-clustered parquet write on two integer-valued columns.

    `repartitionByRange` gives each output file a CONTIGUOUS z-range
    (a range shuffle with sampled bounds), `sortWithinPartitions`
    orders rows inside it so row-group stats nest the same way, and
    the z helper column is dropped before the write — layout is
    physical, the schema stays clean."""
    z = zorder_scaled(df, x_col, y_col)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def compact_small_files(spark: SparkSession, path: str,
                        target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Small-file compaction: rewrite a FLAT parquet directory into
    ceil(total_bytes / target_bytes) files of ~target size.

    The 100 TB operational reality this addresses: streaming /
    incremental writers leave thousands of KB-scale files per
    partition, and scan throughput collapses under per-file open
    costs (footer reads, S3 GETs) long before data volume matters.
    Sizing from the ACTUAL byte total (not a guessed partition count)
    keeps output files near the parquet sweet spot at any input
    skew.

    Hive-partitioned datasets (key=value subdirectories) are REFUSED:
    a flat rewrite would squash the layout and silently break
    partition pruning for every downstream reader — compact each leaf
    directory instead.

    Safety protocol (the swap is two renames, NOT one atomic op):
      1. write the compacted copy to `{path}.__compact_tmp`;
      2. verify it — `_SUCCESS` present AND row count equals the
         source's, counted from the same session — BEFORE touching
         the original;
      3. rename path → `{path}.__compact_old`, rename tmp → path
         (the only unprotected window: a crash exactly between these
         leaves no dataset at `path`, with BOTH copies intact beside
         it — run :func:`recover_compaction` on startup to heal);
      4. delete the old copy only after the swapped-in directory
         re-validates.

    Returns {"files_before", "files_after", "bytes"} for the caller's
    telemetry.
    """
    import math
    import os
    import shutil

    files, total, subdirs = [], 0, []
    for root, dirs, names in os.walk(path):
        if root == path:
            subdirs = [d for d in dirs if not d.startswith(".")]
        for f in names:
            if f.endswith(".parquet") or f.startswith("part-"):
                files.append(os.path.join(root, f))
                total += os.path.getsize(os.path.join(root, f))
    if subdirs:
        raise ValueError(
            f"{path} is a partitioned dataset (subdirs {subdirs[:3]}...); "
            "flat compaction would destroy the partition layout — "
            "compact each leaf directory instead")

    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = f"{path}.__compact_tmp"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        raise RuntimeError(f"compaction write incomplete: {tmp}")
    n_new = spark.read.parquet(tmp).count()
    if n_new != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch ({n_rows} -> {n_new}); "
            f"original untouched at {path}")
    old = f"{path}.__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.rename(path, tmp)          # undo; leave both copies intact
        os.rename(old, path)
        raise RuntimeError(f"post-swap validation failed for {path}")
    shutil.rmtree(old)
    after = len([e for e in os.scandir(path)
                 if e.name.endswith(".parquet")])
    return {"files_before": len(files), "files_after": after,
            "bytes": total}


def recover_compaction(path: str) -> str | None:
    """Heal a crash inside compact_small_files' two-rename window.

    If `path` is missing but `{path}.__compact_old` exists, the crash
    hit between the renames: restore the verified compacted copy if
    it's complete, else the original. Returns which copy was restored
    ('tmp' | 'old') or None when no recovery was needed."""
    import os
    import shutil

    old, tmp = f"{path}.__compact_old", f"{path}.__compact_tmp"
    if os.path.exists(path) or not os.path.exists(old):
        return None
    if os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, path)
        shutil.rmtree(old)
        return "tmp"
    os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)
    return "old"
