"""Keyed-table SINK attestation: the same op-typed changefeed MERGE as
`q_merge_upsert_delete` (reference semantics:
/root/reference/src/func/mongo.py:28-79 null-skip upsert + the DELETE
half the upsert-only reference lacks), but materialized through the
REAL storage layer instead of an in-memory join — bucketed versioned
base write → LSM upsert delta → tombstone delta → compaction fold →
committed-base read. Until round 10 the sink was proven only by
pytest; this query puts the full write/merge-on-read/compact path
under the driver's DuckDB oracle gate, so a wrong commit protocol,
watermark, tombstone cut, or bucketed write surfaces as a value-hash
mismatch, not just a unit-test failure.

Scale notes (100 TB): identical posture to the production sink — the
bucketed base keeps every merge exchange-free on the base side, the
delta appends are O(batch), and the compaction is one write + an
atomic manifest flip. The table is written under a fresh temp
directory per invocation (the driver may run the catalog from any
state; the OS reclaims /tmp), so the query stays deterministic and
idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..sinks.keyed_table import (append_delete_delta, append_delta, compact,
                                 read_keyed_table, upsert_into_keyed_table)
from ..sources.parquet import load_table
from .catalog import register
from .reference_core import MERGE_DELETE_ORACLE


@register("q_keyed_lsm_roundtrip", MERGE_DELETE_ORACLE,
          "changefeed MERGE through the real keyed-table sink: bucketed "
          "base write + LSM upsert delta + tombstone + compaction, read "
          "back from the committed base — oracle-exact storage layer")
def q_keyed_lsm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    target = customer.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("segment"))
    src = (orders.groupBy(F.col("o_custkey").alias("c_custkey"))
           .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("bal"))
           .withColumn("op", F.when(F.col("c_custkey") % 7 == 0, "D")
                              .otherwise(F.lit("U"))))
    ups = (src.filter(F.col("op") == "U")
           .select("c_custkey", "bal",
                   F.when(F.col("c_custkey") % 3 == 0, None)
                    .otherwise(F.lit("UPDATED")).alias("segment")))
    dels = src.filter(F.col("op") == "D").select("c_custkey")
    path = tempfile.mkdtemp(prefix="keyed_rt_")
    # bucketed base: the production layout (merge joins exchange-free
    # on the base side); 8 buckets keeps the tiny-SF write cheap
    upsert_into_keyed_table(spark, target, path=path, key="c_custkey",
                            updated_at_col=None, buckets=8)
    append_delta(spark, ups, path=path, key="c_custkey")
    append_delete_delta(spark, dels, path=path, key="c_custkey")
    compact(spark, path, "c_custkey")
    # read the COMMITTED base (not merge-on-read): proves the fold
    # itself — watermark, tombstone purge, bucketed rewrite — landed
    return read_keyed_table(spark, path).select(
        "c_custkey", "bal", "segment")
