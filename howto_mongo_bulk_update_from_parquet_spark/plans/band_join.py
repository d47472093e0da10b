"""ε-band self-join via neighbor-bin candidates — the scale rewrite of
the inequality (theta) join `|a.v − b.v| ≤ ε`.

A naive theta join is a cross product with a filter (Spark plans
BroadcastNestedLoopJoin — O(n²) compares). Binning rewrites it as an
EQUI-join: every row lands in bin ⌊v/ε⌋; a qualifying pair's bins
differ by at most 1, so probing bins {b−1, b, b+1} (a 3-element
explode on one side) finds every candidate, and the exact |Δ| ≤ ε
filter keeps the result identical to the theta join — which is what
the oracle states declaratively (DuckDB plans it as an IEJoin).

At 100 TB: the equi-join shuffles on the bin key, candidates per row
are bounded by the 3-bin neighborhood's occupancy (data density × ε),
and a hot bin is an ordinary skew problem the repo's salting/AQE
machinery already handles — none of which exists for a nested-loop
theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import oracle_davg
from ..sources.parquet import load_table
from .catalog import register

EPS = 2.0  # dollars of o_totalprice

BAND_JOIN_ORACLE = f"""
WITH pairs AS (
  SELECT a.o_orderstatus AS status_a, b.o_orderstatus AS status_b,
         ABS(a.o_totalprice - b.o_totalprice) AS gap
  FROM orders a JOIN orders b
    ON b.o_totalprice BETWEEN a.o_totalprice - {EPS}
                          AND a.o_totalprice + {EPS}
   AND a.o_orderkey < b.o_orderkey
)
SELECT status_a, status_b, COUNT(*) AS n_pairs,
       ROUND({oracle_davg('gap', 18, 9)}, 6) AS avg_gap
FROM pairs GROUP BY status_a, status_b
"""


@register("q_band_join_binned", BAND_JOIN_ORACLE,
          "|Δprice| <= eps self-join rewritten as a binned equi-join "
          "(3-bin probe + exact filter) — identical result to the "
          "theta join the oracle states; no nested loop anywhere")
def q_band_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    binned = o.withColumn("bin", F.floor(F.col("o_totalprice") / EPS))
    probe = binned.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderstatus").alias("status_a"),
        F.col("o_totalprice").alias("price_a"),
        F.explode(F.array(F.col("bin") - 1, F.col("bin"),
                          F.col("bin") + 1)).alias("bin"))
    build = binned.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderstatus").alias("status_b"),
        F.col("o_totalprice").alias("price_b"), "bin")
    gap = F.abs(F.col("price_a") - F.col("price_b"))
    pairs = (probe.join(build, "bin")
             .filter((F.col("key_a") < F.col("key_b")) & (gap <= EPS)))
    return (pairs.groupBy("status_a", "status_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.sum(gap.cast("decimal(18,9)")).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_gap")))
