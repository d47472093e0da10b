"""Parquet source/sink (reference S1/S2/G2 — /root/reference/src/func/parquet.py:18-79).

The reference opens a directory of parquet files through PyArrow with a
fixed declared schema and streams columnar record batches; Spark's
vectorized parquet reader + whole-stage codegen subsume the batching,
threading, and projection machinery, so the whole module reduces to
`spark.read.schema(...).parquet(path)` plus an S3A conf bridge
(replacing /root/reference/src/func/aws.py).

Scale notes (100 TB):
- Explicit schema skips footer inference across millions of files.
- Catalyst pushes projections and predicates into the scan
  (verify with `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
- `spark.sql.files.maxPartitionBytes` (default 128 MB) controls scan
  task granularity; at 100 TB that's ~800k tasks — fine for a
  1000-executor cluster, or raise to 256-512 MB to halve scheduler load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS


def _set_if_differs(spark: SparkSession, key: str, value: str) -> None:
    try:
        current = spark.conf.get(key)
    except Exception:  # noqa: BLE001 - unset conf
        current = None
    if current != value:
        spark.conf.set(key, value)


def load_table(spark: SparkSession, sf_dir: str, name: str,
               schema: T.StructType | None = None) -> DataFrame:
    """Scan one parquet table with its explicit schema (no inference).

    The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader can't widen to TimestampType (µs). We read
    it as raw nanos (`nanosAsLong`) and convert with exact integer
    division — same ns→µs truncation DuckDB applies, so results stay
    oracle-comparable.
    """
    # Parquet timestamps here are timezone-naive; pin the session to UTC
    # so their epoch interpretation (and pandas conversion) is stable no
    # matter what timezone the caller's session started with. These are
    # defensive sets for externally-owned sessions (the driver imports
    # the contract with a vanilla session); `_set_if_differs` keeps the
    # per-load mutation from churning sessions that are already right.
    _set_if_differs(spark, "spark.sql.session.timeZone", "UTC")
    # Small single-file tables would otherwise scan as ONE partition,
    # serializing every downstream pipeline stage; splitting to the
    # core count parallelizes compute on narrow inputs (no effect on
    # large multi-file tables, which already exceed this minimum).
    _set_if_differs(spark, "spark.sql.files.minPartitionNum",
                    str(spark.sparkContext.defaultParallelism))
    schema = schema or TESTDATA_SCHEMAS.get(name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _set_if_differs(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = T.StructType([
            T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
            for f in (schema or TESTDATA_SCHEMAS["events"]).fields])
        from pyspark.sql import functions as F
        return (spark.read.schema(raw_schema).parquet(path)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or tuple(TESTDATA_SCHEMAS)
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register test tables as temp views for the SQL API."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def configure_s3(spark: SparkSession, access_key: str | None = None,
                 secret_key: str | None = None, endpoint: str | None = None) -> None:
    """S3 access via Hadoop S3A conf — replaces the reference's boto3→env
    bridge (/root/reference/src/func/aws.py:8-31). With no keys given,
    S3A falls back to the instance-profile/default provider chain, which
    is the right posture on a real cluster."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key:
        hconf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)


def load_any(spark: SparkSession, path: str, fmt: str,
             schema: T.StructType, **options) -> DataFrame:
    """Format-generic scan with a mandatory explicit schema. CSV/JSON
    inference is never used on the pipeline path — at 100 TB an
    inference pass is a full extra read."""
    reader = spark.read.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite",
              **options) -> None:
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).save(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  n_files: int | None = None,
                  partition_by: list[str] | None = None) -> None:
    """Parquet sink (reference G2 — one file per batch at
    /root/reference/src/cli/generate_data.py:71-81). `n_files` mirrors the
    reference's file-count knob via repartition; `partition_by` gives the
    partition-pruned layout a 100 TB table needs (e.g. by date)."""
    if n_files:
        df = df.repartition(n_files)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
