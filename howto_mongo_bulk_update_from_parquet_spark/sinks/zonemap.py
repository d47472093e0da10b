"""File-level zone maps (min/max statistics) for keyed-table bases —
the data-skipping layer a 100 TB table needs so a point or range read
touches a handful of files instead of scanning the base.

Why a separate layout: the bucketed base (hash layout) keeps merge
joins exchange-free, but hash partitioning scatters the key space so
every file spans nearly the full key range — a min/max map prunes
NOTHING there (bucket pruning by key hash is the right tool, and
`keyed_table.pruned_base_files` applies it). The RANGE layout
(`range_files=N` on the writer: `repartitionByRange(key)` +
`sortWithinPartitions(key)`) gives files DISJOINT key ranges, so the
zone map prunes an equality or range predicate down to the one or two
files that can hold it. The two layouts are alternatives per table:
hash for upsert-heavy tables (merge cost dominates), range for
read-heavy tables (lookup cost dominates) — the same trade Delta
Lake's users make between bucketing/partitioning and Z-ORDER
clustering, carried here in the engine's own minimal form because the
table-format jars are absent (see sinks/table_formats.py).

The map is one JSON sidecar `_zonemap.json` INSIDE the versioned base
directory, so it is committed, time-traveled, and garbage-collected
with its base — a reader can never pair version N's stats with
version M's files. Collection is one column-pruned scan of the
just-written base (`_metadata.file_path` + the stat columns only —
for a wide table this reads a few percent of the bytes, once, at
write time); the collected list is O(files) driver state, the same
bounded class as the engine's centroid/bounds tables.

Underscore-prefixed sidecars are invisible to Spark's parquet reader,
so plain `spark.read.parquet(base)` consumers are unaffected.
"""

from __future__ import annotations

import json
from bisect import bisect_left
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs as hfs

ZONEMAP_FILE = "_zonemap.json"

# dtypes the map can order client-side; anything else is recorded as
# unprunable (the file list degrades to "keep all" for that column)
_ORDERED_DTYPES = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "float", "double", "string", "date", "timestamp", "timestamp_ntz",
}


def _dtype_name(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def _to_json_value(v: Any) -> Any:
    """JSON-encodable form of a min/max value, ordering-preserving per
    dtype: date/timestamp → ISO-8601 strings (lexicographic order ==
    chronological order), numerics and strings pass through."""
    if v is None:
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_probe(v: Any) -> Any:
    """Normalize a caller's probe value the same way stored min/max
    values were normalized, so comparisons are like-for-like."""
    return _to_json_value(v)


def collect_zone_map(spark: SparkSession, base_dir: str,
                     cols: list[str],
                     paths: list[str] | None = None) -> dict | None:
    """Per-file min/max/row-count for `cols` over the parquet files of
    `base_dir`, as the zone-map document (not yet written). One
    aggregation job, grouped on the hidden `_metadata.file_path`
    column so Spark prunes the scan to exactly the stat columns.
    Columns with un-orderable dtypes are dropped from the map (never
    silently recorded as prunable). Returns None when nothing usable
    remains. `paths` restricts the scan to an explicit file subset —
    the pruned-compaction path stats ONLY its rewritten files and
    carries the untouched files' entries forward verbatim, so the
    stats job is O(rewritten bytes), never O(base)."""
    df = spark.read.parquet(*(paths if paths else [base_dir]))
    usable = [c for c in cols
              if c in df.columns and _dtype_name(df, c) in _ORDERED_DTYPES]
    if not usable:
        return None
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in usable:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    rows = (df.select(F.col("_metadata.file_path").alias("__path"), *usable)
            .groupBy("__path").agg(*aggs).collect())
    files = []
    for r in rows:
        entry: dict[str, Any] = {
            # store the NAME only — the map stays valid if the table
            # directory is moved or mounted under a different URI
            "file": r["__path"].rsplit("/", 1)[-1],
            "rows": r["__rows"],
        }
        for c in usable:
            entry[f"min_{c}"] = _to_json_value(r[f"__min_{c}"])
            entry[f"max_{c}"] = _to_json_value(r[f"__max_{c}"])
        files.append(entry)
    return {
        "version": 1,
        "cols": {c: _dtype_name(df, c) for c in usable},
        "files": sorted(files, key=lambda e: e["file"]),
    }


def write_zone_map(spark: SparkSession, base_dir: str,
                   zmap: dict) -> None:
    hfs.write_text(spark, hfs.join(base_dir, ZONEMAP_FILE),
                   json.dumps(zmap, separators=(",", ":")))


def read_zone_map(spark: SparkSession, base_dir: str) -> dict | None:
    txt = hfs.read_text(spark, hfs.join(base_dir, ZONEMAP_FILE))
    if txt is None:
        return None
    try:
        zmap = json.loads(txt)
    except ValueError:
        return None
    return zmap if zmap.get("version") == 1 else None


def prune_files(zmap: dict, col: str, *,
                values: list[Any] | None = None,
                lo: Any = None, hi: Any = None) -> list[str] | None:
    """File names whose [min,max] interval for `col` can intersect the
    predicate — an equality set (`values`) or a closed range
    [`lo`,`hi`] (either bound may be None = unbounded). Conservative
    by construction: a kept file may hold no matching row (the
    caller's residual filter removes those rows), but a matching row
    is NEVER in a dropped file — a file whose stats omit the column
    or carry nulls is kept. Returns None when the map cannot answer
    for this column at all (caller reads everything)."""
    if col not in zmap.get("cols", {}):
        return None
    kept: list[str] = []
    # probe values and stored min/max share one normalization (ISO
    # strings for temporals, numerics/strings as-is), so plain Python
    # ordering compares like with like; a TypeError from a wrong-typed
    # probe should surface, not be swallowed into a wrong prune
    probe = sorted(norm_probe(v) for v in values) \
        if values is not None else None
    n_lo = norm_probe(lo)
    n_hi = norm_probe(hi)
    for entry in zmap["files"]:
        f_min = entry.get(f"min_{col}")
        f_max = entry.get(f"max_{col}")
        if f_min is None or f_max is None:
            kept.append(entry["file"])   # stats absent/null — keep
            continue
        if probe is not None:
            # any probe value inside [f_min, f_max]? (smallest probe
            # >= f_min decides — probe list is sorted)
            i = bisect_left(probe, f_min)
            if i < len(probe) and probe[i] <= f_max:
                kept.append(entry["file"])
            continue
        if n_lo is not None and f_max < n_lo:
            continue
        if n_hi is not None and n_hi < f_min:
            continue
        kept.append(entry["file"])
    return kept
