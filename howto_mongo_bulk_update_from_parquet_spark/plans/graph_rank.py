"""PageRank over the supplier→customer shipment graph — the classic
iterative-propagation algorithm, run for a fixed 3 iterations with a
full cross-engine oracle (the DuckDB side unrolls the iterations as
chained CTEs).

Iterative float discipline (same as `plans/kmeans.py` /
`plans/text_stats.py`): every per-edge contribution is a SINGLE IEEE
operation chain (pr/outdeg — one divide), rounded to 9 decimals and
summed as DECIMAL(20,9) so the fold is order-independent; the damping
update is single-multiply + single-add, re-rounded each iteration.
Identical inputs → identical bits in both engines, no shuffle-order
noise — proven by the value-hash gate.

Scale: each iteration is one groupBy(dst) shuffle of (dst, 9-decimal
contribution) pairs — map-side combinable, state is the rank vector
itself (a DataFrame, never driver-side). 3 fixed iterations keep the
lineage shallow; a convergence-driven variant would checkpoint every
~5 rounds exactly like `operators/graph.connected_components`.
Dangling mass (customers have no out-edges) is deliberately NOT
redistributed — both sides implement the same simplified update, so
ranks stay comparable; the docstring, not the oracle, carries the
caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

DAMPING = 0.85
N_ITER = 3

PAGERANK_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), outdeg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
), n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
pr0 AS (
  SELECT node, ROUND(1.0 / (SELECT n_nodes FROM n), 9) AS pr FROM nodes
),
pr1 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr0 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
),
pr2 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr1 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
),
pr3 AS (
  SELECT nd.node,
         ROUND((1 - {DAMPING}) / (SELECT n_nodes FROM n)
               + {DAMPING} * COALESCE(CAST(s.acc AS DOUBLE), 0), 9) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.pr / d.deg, 9) AS DECIMAL(20,9))) AS acc
    FROM edges e JOIN pr2 p ON e.src = p.node JOIN outdeg d ON e.src = d.src
    GROUP BY e.dst) s ON nd.node = s.node
)
SELECT node, pr AS pagerank FROM pr3
"""


@register("q_pagerank", PAGERANK_ORACLE,
          "3-iteration PageRank over the supplier->customer graph — "
          "iterative propagation with an unrolled-CTE oracle, "
          "order-independent decimal contribution sums")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                     F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"))
             .distinct()
             .cache())  # reused 1 + N_ITER times; edge list ≪ fact table
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select("dst")).distinct().cache())
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # driver scalar, like the oracle's (SELECT n)

    pr = nodes.select("node", F.round(F.lit(1.0) / n_nodes, 9).alias("pr"))
    base = (1.0 - DAMPING) / n_nodes
    for _ in range(N_ITER):
        contrib = (edges.join(pr, edges.src == pr.node)
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           F.round(F.col("pr") / F.col("deg"), 9)
                            .cast("decimal(20,9)").alias("c")))
        acc = contrib.groupBy("node").agg(F.sum("c").alias("acc"))
        pr = (nodes.join(acc, "node", "left")
              .select("node",
                      F.round(F.lit(base) + DAMPING
                              * F.coalesce(F.col("acc").cast("double"),
                                           F.lit(0.0)), 9).alias("pr")))
    return pr.select("node", F.col("pr").alias("pagerank"))
