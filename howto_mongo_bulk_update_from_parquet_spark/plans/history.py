"""History-keeping queries: the SCD2 and snapshot-diff operators
driven end-to-end under the oracle gate (deterministic effective
timestamps and synthetic-but-fixed second batches make the full
history SQL-expressible).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.diff import diff_snapshots
from ..operators.scd2 import scd2_apply, scd2_init
from ..sources.parquet import load_table
from .catalog import register

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)

SCD2_ORACLE = """
SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
       TIMESTAMP '2024-01-01' AS valid_from,
       CASE WHEN c_custkey < 100 THEN TIMESTAMP '2024-02-01' END AS valid_to,
       c_custkey >= 100 AS is_current
FROM customer
UNION ALL
SELECT c_custkey, CAST(c_acctbal + 100 AS DOUBLE),
       TIMESTAMP '2024-02-01', NULL, TRUE
FROM customer WHERE c_custkey < 100
"""


@register("q_scd2_history", SCD2_ORACLE,
          "SCD2 dimension history: init from customer, apply a batch "
          "that bumps acctbal for custkey<100 — closed + fresh versions")
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    h = scd2_init(c.select("c_custkey",
                           F.col("c_acctbal").alias("acctbal")),
                  "c_custkey", ["acctbal"], effective=T0)
    src = (c.filter(F.col("c_custkey") < 100)
           .select("c_custkey", (F.col("c_acctbal") + 100).alias("acctbal")))
    return scd2_apply(h, src, "c_custkey", ["acctbal"], effective=T1)


# CDC between two deterministic projections of orders: the "new"
# snapshot drops finished orders and reprices urgent ones — yielding
# all three change kinds from one source table.
CDC_ORACLE = """
WITH old AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders
),
new AS (
  SELECT o_orderkey,
         CAST(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN o_totalprice * 1.1 ELSE o_totalprice END AS DOUBLE) AS price
  FROM orders WHERE o_orderstatus <> 'F'
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'inserted'
            WHEN new.o_orderkey IS NULL THEN 'deleted'
            WHEN old.price IS DISTINCT FROM new.price THEN 'updated'
       END AS change,
       old.price AS price_old, new.price AS price_new
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE (old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.price IS DISTINCT FROM new.price)
"""


@register("q_cdc_diff", CDC_ORACLE,
          "snapshot diff (CDC): deleted finished orders + repriced "
          "urgent orders between two projections, null-safe compare")
def q_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.select("o_orderkey", F.col("o_totalprice").alias("price"))
    new = (o.filter(F.col("o_orderstatus") != "F")
           .select("o_orderkey",
                   F.when(F.col("o_orderpriority") == "1-URGENT",
                          F.col("o_totalprice") * 1.1)
                    .otherwise(F.col("o_totalprice")).alias("price")))
    return diff_snapshots(old, new, "o_orderkey", payload=["price"])


# ---------------------------------------------------------------------------
# Point-in-time temporal join: every event resolved against the SCD2
# version valid AT ITS OWN timestamp — the per-row generalization of
# scd2_as_of's scalar snapshot, and the standard "enrich facts with
# the dimension as it was" lookup. The mid-stream effective date
# (Jan 15, inside the events range) makes both versions reachable, so
# the oracle discriminates version selection, not just the join.
# ---------------------------------------------------------------------------

P0 = datetime.datetime(2024, 1, 1)
P1 = datetime.datetime(2024, 1, 15)

SCD2_PIT_ORACLE = """
WITH hist AS (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
         TIMESTAMP '2024-01-01' AS valid_from,
         CASE WHEN c_custkey < 100 THEN TIMESTAMP '2024-01-15' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, CAST(c_acctbal + 100 AS DOUBLE),
         TIMESTAMP '2024-01-15', NULL
  FROM customer WHERE c_custkey < 100
)
SELECT e.user_id, h.acctbal,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN hist h
  ON e.user_id = h.c_custkey
 AND e.ts >= h.valid_from AND (h.valid_to IS NULL OR e.ts < h.valid_to)
GROUP BY e.user_id, h.acctbal
"""


@register("q_scd2_pointintime", SCD2_PIT_ORACLE,
          "point-in-time temporal join: each event enriched with the "
          "SCD2 dimension version valid at its own timestamp")
def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row AS OF lookup against the SCD2 history.

    Plan shape: an EQUI hash join on the key with the validity
    interval as a residual filter — never an interval-only non-equi
    join (which would be a broadcast nested loop). At 100 TB the fact
    side shuffles once on the key; the dimension history (versions ×
    keys, small) broadcasts. Versions never overlap for a key by SCD2
    construction, so the join is at most 1:1 per event.
    """
    c = load_table(spark, sf_dir, "customer")
    h = scd2_init(c.select("c_custkey", F.col("c_acctbal").alias("acctbal")),
                  "c_custkey", ["acctbal"], effective=P0)
    bump = c.filter(F.col("c_custkey") < 100).select(
        "c_custkey", (F.col("c_acctbal") + 100).alias("acctbal"))
    h = scd2_apply(h, bump, "c_custkey", ["acctbal"], effective=P1)
    e = load_table(spark, sf_dir, "events")
    cond = ((e.user_id == h.c_custkey)
            & (e.ts >= h.valid_from)
            & (h.valid_to.isNull() | (e.ts < h.valid_to)))
    return (e.join(h, cond)
            .groupBy("user_id", F.col("acctbal").cast("double").alias("acctbal"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value")))
