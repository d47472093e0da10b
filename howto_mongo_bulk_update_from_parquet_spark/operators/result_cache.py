"""Content-addressed query-result cache — the engine-level result
reuse every serving layer wants: a query's CANONICALIZED optimized
plan plus the identity (path, size, mtime) of every input file it
scans form a fingerprint; the materialized parquet under that
fingerprint answers any logically-identical future query until an
input changes.

Design points:
  - Keyed on Catalyst's own `canonicalized` optimized plan, not the
    user's code: expression ids (session-global counters) normalize
    to positional ids while LITERALS keep their text, so two
    DataFrame phrasings that optimize identically share one entry and
    two queries differing only in a literal (`'tag#1'` vs `'tag#2'`)
    never collide. (A regex that stripped every `#<digits>` would
    merge those literals — the bug this replaced.)
  - Input versioning rides on (path, size, mtime_ns) of
    `df.inputFiles()` — touch one source file and the key changes, so
    staleness is structural, never TTL-guessed. A plan with NO file
    inputs (pure range/generated data) gets "inputless" keying on the
    plan alone.
  - LOCAL filesystems only, enforced: the fingerprint stats files
    through `os.stat` and the publish step relies on same-directory
    `os.rename` atomicity — neither holds on object stores. A
    non-file input or cache_dir raises immediately rather than
    silently serving stale results (a remote path that can't be
    stat'ed would otherwise never invalidate). Extending to s3a/hdfs
    means resolving size/mtime through the Hadoop FileSystem API and
    publishing via a manifest commit (see sources/docstore_sink.py
    for that protocol).
  - The cache write is atomic-by-rename at the directory level: write
    to `{key}.tmp-{pid}` then rename onto `{key}`; a concurrent loser
    deletes its temp. Readers only trust a directory containing
    parquet's `_SUCCESS`.
  - Parquet round-trips every engine type used here (decimals,
    timestamps, arrays, structs), so the cached result is
    schema-faithful.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _local_path(uri: str, what: str) -> str:
    """Resolve a file URI to a local path; reject remote schemes."""
    parsed = urlparse(uri)
    if parsed.scheme not in ("", "file"):
        raise ValueError(
            f"result cache supports local filesystems only; {what} "
            f"'{uri}' has scheme '{parsed.scheme}'. Remote inputs can't "
            "be versioned via os.stat and rename-publish isn't atomic "
            "there — see module docstring for the extension path.")
    return parsed.path or uri


def plan_fingerprint(df: DataFrame) -> str:
    """Stable key: canonicalized optimized-plan text + every input
    file's identity. Raises on non-local inputs (see module doc)."""
    plan = (df._jdf.queryExecution().optimizedPlan()
            .canonicalized().toString())
    h = hashlib.sha256(plan.encode())
    # Canonicalization rewrites Alias to its child, so two queries
    # differing ONLY in output column names share a canonical plan —
    # and with swapped aliases the cache would serve wrongly-labeled
    # columns. The requesting query's output names (in order) are
    # part of the result's identity, so mix them into the key.
    # repr() is an unambiguous encoding: a plain "|".join would let
    # ['a|b', 'c'] collide with ['a', 'b|c'].
    h.update(("|cols|" + repr(df.columns)).encode())
    for f in sorted(df.inputFiles()):
        p = _local_path(f, "input file")
        st = os.stat(p)      # missing input = real error, propagate
        h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:32]


def _is_valid(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def cached(df: DataFrame, cache_dir: str,
           spark: SparkSession | None = None) -> tuple[DataFrame, bool]:
    """Return (result_df, was_hit). On miss, materializes `df` into
    the cache and serves the materialized copy (so the caller never
    recomputes the plan either)."""
    _local_path(cache_dir, "cache_dir")
    spark = spark or df.sparkSession
    key = plan_fingerprint(df)
    slot = os.path.join(cache_dir, key)
    if _is_valid(slot):
        return spark.read.parquet(slot), True
    tmp = f"{slot}.tmp-{os.getpid()}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, slot)
    except OSError:           # concurrent writer won the rename
        shutil.rmtree(tmp, ignore_errors=True)
        if not _is_valid(slot):
            raise
    return spark.read.parquet(slot), False
