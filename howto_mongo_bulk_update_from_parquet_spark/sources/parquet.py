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


_TS_NANOS_CACHE: dict[tuple[str, float], bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """True iff the parquet file stores `ts` with nanosecond unit
    (TIMESTAMP(NANOS) / timestamp[ns]), which Spark must read as raw
    int64. One driver-side footer read, cached per (path, mtime) — so
    a fixture regenerated IN PLACE with a different unit re-probes
    instead of serving a stale verdict (the driver has done exactly
    that between rounds). Only the EXPECTED failures fall through to
    the native reader: path absent / not locally readable (includes
    remote URIs the driver can't open — native read is the only
    option there) and a missing `ts` field. Anything else — corrupt
    footer, pyarrow import failure — propagates, so a genuinely
    ns-unit file can't silently route to the native reader and die
    later with an obscure vectorized-reader error."""
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return False  # absent / non-local path: native read
    key = (path, mtime)
    got = _TS_NANOS_CACHE.get(key)
    if got is None:
        import glob
        import pyarrow as pa
        import pyarrow.parquet as pq
        probe = path
        if os.path.isdir(path):
            # directory dataset (e.g. the bench's 32-file staged copy):
            # every member shares one writer/unit, probe the first part
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                _TS_NANOS_CACHE[key] = False
                return False
            probe = parts[0]
        try:
            fld = pq.ParquetFile(probe).schema_arrow.field("ts")
        except (FileNotFoundError, KeyError):
            got = False  # raced-away file / no ts field: native read
        else:
            got = ((pa.types.is_timestamp(fld.type) and fld.type.unit == "ns")
                   or pa.types.is_integer(fld.type))
        _TS_NANOS_CACHE[key] = got
    return got


def load_table(spark: SparkSession, sf_dir: str, name: str,
               schema: T.StructType | None = None) -> DataFrame:
    """Scan one parquet table with its explicit schema (no inference).

    The `events` table has shipped `ts` as either parquet
    TIMESTAMP(NANOS) (older fixtures) or TIMESTAMP(MICROS). Spark's
    vectorized reader can't widen NANOS to TimestampType (µs), so for
    ns-unit files we read raw nanos (`nanosAsLong`) and convert with
    exact integer division — the same ns→µs truncation DuckDB applies,
    so results stay oracle-comparable. µs-unit files read natively.
    The unit is detected once per file from the parquet footer.
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
    if name == "events" and events_ts_is_nanos(path):
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
                 secret_key: str | None = None, endpoint: str | None = None,
                 session_token: str | None = None,
                 region: str | None = None) -> None:
    """S3 access via Hadoop S3A conf — replaces the reference's boto3→env
    bridge (/root/reference/src/func/aws.py:8-31). With no keys given,
    S3A falls back to the instance-profile/default provider chain, which
    is the right posture on a real cluster."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if access_key:
        hconf.set("fs.s3a.access.key", access_key)
    if secret_key:
        hconf.set("fs.s3a.secret.key", secret_key)
    if session_token:
        hconf.set("fs.s3a.session.token", session_token)
        hconf.set("fs.s3a.aws.credentials.provider",
                  "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    if region:
        hconf.set("fs.s3a.endpoint.region", region)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)


def load_aws_profile(profile: str | None = None,
                     credentials_path: str | None = None,
                     config_path: str | None = None) -> dict[str, str | None]:
    """Named-profile AWS credentials from the shared credentials/config
    files (the same public file format boto3's Session reads) — parity
    with the reference's boto3 profile bridge
    (/root/reference/src/func/aws.py:8-31 get_credentials), without a
    boto3 dependency: stdlib configparser over ~/.aws/credentials and
    ~/.aws/config, honoring $AWS_PROFILE / $AWS_SHARED_CREDENTIALS_FILE
    / $AWS_CONFIG_FILE.

    Returns {access_key, secret_key, session_token, region} (values
    None when absent). Like boto3, the profile may live in EITHER file:
    the credentials file wins for static keys, and a profile present
    only in the config file ("[profile NAME]" section — the common
    shape for SSO/role-based profiles) resolves too, usually to a
    region-only result. Raises KeyError only when neither file knows
    the profile."""
    import configparser
    import os

    profile = profile or os.environ.get("AWS_PROFILE") or "default"
    cred_file = (credentials_path
                 or os.environ.get("AWS_SHARED_CREDENTIALS_FILE")
                 or os.path.expanduser("~/.aws/credentials"))
    conf_file = (config_path
                 or os.environ.get("AWS_CONFIG_FILE")
                 or os.path.expanduser("~/.aws/config"))
    creds = configparser.ConfigParser()
    creds.read(cred_file)
    conf = configparser.ConfigParser()
    conf.read(conf_file)
    # config-file section header is "[profile NAME]" except for default
    conf_sec = None
    for section in (profile if profile == "default"
                    else f"profile {profile}", profile):
        if section in conf:
            conf_sec = conf[section]
            break
    if profile in creds:
        sec = creds[profile]
    elif conf_sec is not None:
        sec = conf_sec            # config-only profile (e.g. SSO/role)
    else:
        raise KeyError(f"profile {profile!r} not found in "
                       f"{cred_file} or {conf_file}")
    # region may live next to the keys, or in the config file
    region = sec.get("region") or (conf_sec.get("region")
                                   if conf_sec is not None else None)
    return {
        "access_key": sec.get("aws_access_key_id"),
        "secret_key": sec.get("aws_secret_access_key"),
        "session_token": sec.get("aws_session_token"),
        "region": region,
    }


def configure_s3_from_profile(spark: SparkSession,
                              profile: str | None = None,
                              endpoint: str | None = None,
                              credentials_path: str | None = None,
                              config_path: str | None = None) -> None:
    """Reference parity for `set_env_to_credentials(profile)`: resolve a
    named profile and apply it to the session's S3A configuration."""
    p = load_aws_profile(profile, credentials_path=credentials_path,
                         config_path=config_path)
    configure_s3(spark, access_key=p["access_key"],
                 secret_key=p["secret_key"], endpoint=endpoint,
                 session_token=p["session_token"], region=p["region"])


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
